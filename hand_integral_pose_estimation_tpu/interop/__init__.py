"""Torch-weight interop: converters from the reference's .pth layouts to
this package's flax variable trees."""

from hand_integral_pose_estimation_tpu.interop.torch_weights import (
    convert_faster_rcnn_state_dict,
    convert_pose_snapshot,
    convert_resnet_stage4,
    convert_torchvision_resnet,
    imagenet_init_pose_variables,
    load_torch_state_dict,
)

__all__ = [
    "convert_faster_rcnn_state_dict",
    "convert_pose_snapshot",
    "convert_resnet_stage4",
    "convert_torchvision_resnet",
    "imagenet_init_pose_variables",
    "load_torch_state_dict",
]
