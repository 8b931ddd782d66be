#!/bin/bash
# The reference's full semi-supervised recipe (base.py:111-128 +
# main/train.py): student trained with the frozen teacher's cached filtered
# pseudo-labels and the PANet NRSfM prior. Prereqs:
#   1. a teacher snapshot in output/teacher_model  (scripts/train.sh)
#   2. scripts/generate_teacher_labels.sh          (filtered db)
#   3. scripts/panet_train.sh                      (PANet weights)
python -m hand_integral_pose_estimation_tpu.cli.train \
    --data-dir "${FREIHAND_DIR:?set FREIHAND_DIR}" \
    --filtered-db output/filtered_teacher_labels.npz \
    --panet-ckpt "${PANET_CKPT:-output/panet/model_best}" --lam 0.0 \
    --model-dir output/model_dump --test-sweep "$@"
