#!/bin/bash
# Semi-supervised pose training with reference hyperparameters
# (main/config.py: lr 1e-4, decay x0.1 @ [30,60], 400 epochs, batch 32).
python -m hand_integral_pose_estimation_tpu.cli.train \
    --data-dir "${FREIHAND_DIR:?set FREIHAND_DIR}" \
    --model-dir output/model_dump --log-dir output/log "$@"
