"""hand_integral_pose_estimation_tpu — TPU-native 3D hand-pose estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
mqadri9/hand-integral-pose-estimation (semi-supervised integral hand pose on
FreiHAND): ResNet + deconv 3D-heatmap pose net with a fused softmax-integral
(soft-argmax) decode, batched on-device geometric preprocessing, a Faster R-CNN
hand detector with fixed-shape TPU NMS/ROIAlign, a PANet NRSfM Procrustes prior,
teacher-label distillation, and the full FreiHAND metric stack.

Everything on the compute path is pure-functional, jittable, vmappable and
shardable over a `jax.sharding.Mesh`; host code only decodes images.
"""

__version__ = "0.1.0"

from hand_integral_pose_estimation_tpu.config import (  # noqa: F401
    Config,
    FreiHandJoints,
    default_config,
)
