"""Model zoo: pose net (ResNet + deconv head), detector, PANet."""

from hand_integral_pose_estimation_tpu.models.resnet import (  # noqa: F401
    BasicBlock,
    Bottleneck,
    ResNetBackbone,
    ResNetStage4,
)
from hand_integral_pose_estimation_tpu.models.pose_net import (  # noqa: F401
    DeconvHead,
    ResPoseNet,
    get_pose_net,
)
