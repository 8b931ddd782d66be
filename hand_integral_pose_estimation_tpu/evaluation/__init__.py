"""Evaluation stack: PA-MPJPE/MPJPE pipeline, PCK/AUC, challenge dumps."""

from hand_integral_pose_estimation_tpu.evaluation.metrics import (  # noqa: F401
    EvalResult,
    PCKResult,
    aligned_pck_auc,
    backproject_to_camera,
    evaluate_coords,
    pck_auc,
    scale_by_ref_bone,
)
from hand_integral_pose_estimation_tpu.evaluation.evaluator import (  # noqa: F401
    evaluate_challenge,
    evaluate_test_split,
    score_predictions,
)
