"""TPU compute ops: Pallas kernels and their XLA reference formulations."""

from hand_integral_pose_estimation_tpu.ops.integral import (  # noqa: F401
    heatmap_entropy,
    softmax_integral,
    softmax_integral_flat,
    softmax_probs,
)
