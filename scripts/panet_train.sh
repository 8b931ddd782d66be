#!/bin/bash
# PANet training with the reference's canonical hyperparameters
# (procrustes_encoding/test_scripts/train.sh: 500k iters, batch 500, Adam 1e-3).
python -m hand_integral_pose_estimation_tpu.cli.train_panet \
    --train-npy "${PANET_TRAIN:?set PANET_TRAIN}" \
    --test-npy "${PANET_TEST:?set PANET_TEST}" \
    --steps 500000 --batch-size 500 --lr 1e-3 --out output/panet "$@"
