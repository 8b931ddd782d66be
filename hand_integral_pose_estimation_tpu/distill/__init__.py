"""Teacher-label distillation: rotation-variance filtering."""

from hand_integral_pose_estimation_tpu.distill.cascade import (  # noqa: F401
    CascadeRunner,
    pass1_rotation_indices,
)
from hand_integral_pose_estimation_tpu.distill.teacher_labels import (  # noqa: F401
    FilteredLabels,
    filter_precision_curve,
    generate_filtered_labels,
    quantized_teacher_apply,
    rotation_sweep_camera,
    teacher_error_vs_variance,
)
