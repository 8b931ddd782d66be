"""Pure, vmappable geometry: the single source of truth for all projective
math used by data prep, the loss, and eval (the reference kept three copies:
common/augment.py, common/normalization.py, procrustes_encoding norm_lite)."""

from hand_integral_pose_estimation_tpu.geometry.camera import (  # noqa: F401
    cam2pixel,
    pixel2cam,
    project_points,
)
from hand_integral_pose_estimation_tpu.geometry.transforms import (  # noqa: F401
    get_perspective_transform,
    patch_corner_points,
    rotation_homography,
    trans_from_patch,
    transform_points_2d,
)
from hand_integral_pose_estimation_tpu.geometry.bbox import (  # noqa: F401
    bbox_from_detection,
    bbox_from_keypoints,
    kpt_bound,
    scale_bbox,
    tprime_from_bbox,
)
from hand_integral_pose_estimation_tpu.geometry.rotation import (  # noqa: F401
    rodrigues,
    rotation_z,
    sample_color_scale,
    sample_rotation_matrix,
)
from hand_integral_pose_estimation_tpu.geometry.procrustes import (  # noqa: F401
    SimilarityTransform,
    align_w_scale,
    compute_similarity_transform,
    procrustes_align,
)
from hand_integral_pose_estimation_tpu.geometry.labels import (  # noqa: F401
    PatchLabels,
    compute_patch_labels,
    decode_labels,
    encode_labels,
    patch_label_to_camera,
    patch_to_image_3d,
)
