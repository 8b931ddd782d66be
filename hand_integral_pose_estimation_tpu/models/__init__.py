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
from hand_integral_pose_estimation_tpu.models.panet import (  # noqa: F401
    PANet,
    convert_torch_state_dict,
    make_orthonormal,
    panet_loss,
    panet_reconstruction_fn,
)
