#!/bin/bash
# Filtered pseudo-label generation (main/generate_filtered_teacher_labels.py).
python -m hand_integral_pose_estimation_tpu.cli.generate_teacher_labels \
    --data-dir "${FREIHAND_DIR:?set FREIHAND_DIR}" \
    --model-dir output/teacher_model --out output/filtered_teacher_labels.npz "$@"
