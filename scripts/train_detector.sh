#!/bin/bash
# In-tree Faster R-CNN hand-detector training (the reference loads
# externally-trained checkpoints, common/hand_detector.py:117-118; this
# trains one natively — from-scratch recipe: GroupNorm + roi_bg_thresh_lo=0,
# see the convergence study in PERFORMANCE.md).
python -m hand_integral_pose_estimation_tpu.cli.train_detector \
    --data-dir "${FREIHAND_DIR:?set FREIHAND_DIR}" \
    --steps 50000 --batch 4 --lr 1e-3 \
    --model-dir output/detector "$@"
