"""Data layer: FreiHAND dataset model + on-device preprocessing pipeline."""

from hand_integral_pose_estimation_tpu.data.pipeline import (  # noqa: F401
    Batch,
    make_eval_batch,
    make_train_batch,
)
