#!/bin/bash
# PANet reconstruction regression (test_scripts/PANet_test.sh equivalent):
# works directly against the reference's shipped artifacts.
python -m hand_integral_pose_estimation_tpu.cli.panet_test \
    --ckpt "${PANET_CKPT:-/root/reference/procrustes_encoding/logs/hand_pa/model_best.pth}" \
    --pts-npy "${PANET_PTS:-/root/reference/procrustes_encoding/local_data/hand_test.npy}" "$@"
