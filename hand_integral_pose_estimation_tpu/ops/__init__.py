"""TPU compute ops: Pallas kernels and their XLA reference formulations."""

from hand_integral_pose_estimation_tpu.ops.integral import (  # noqa: F401
    heatmap_entropy,
    softmax_integral,
    softmax_integral_flat,
    softmax_probs,
)
from hand_integral_pose_estimation_tpu.ops.fused_head import (  # noqa: F401
    head_projection_integral,
)
from hand_integral_pose_estimation_tpu.ops.warp import (  # noqa: F401
    warp_perspective,
    warp_perspective_batch,
    warp_perspective_pallas,
    warp_perspective_twopass,
)
from hand_integral_pose_estimation_tpu.ops.nms import box_iou, nms  # noqa: F401
from hand_integral_pose_estimation_tpu.ops.roi_align import (  # noqa: F401
    roi_align,
    roi_pool,
)
from hand_integral_pose_estimation_tpu.ops.yuv import (  # noqa: F401
    upsample_h2v2_fancy,
    ycc_to_rgb,
    yuv420_to_rgb,
)
