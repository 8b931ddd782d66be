#!/bin/bash
# Test-split PA-MPJPE / MPJPE evaluation (main/test.py equivalent).
python -m hand_integral_pose_estimation_tpu.cli.test \
    --data-dir "${FREIHAND_DIR:?set FREIHAND_DIR}" \
    --model-dir output/model_dump --result-dir output/result "$@"
