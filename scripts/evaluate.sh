#!/bin/bash
# FreiHAND-challenge pred.json dump (main/evaluate.py equivalent).
python -m hand_integral_pose_estimation_tpu.cli.evaluate \
    --model-dir output/model_dump --result-dir output/result/evaluation "$@"
