"""Faster R-CNN hand detector (TPU-native: fixed-shape NMS/ROIAlign)."""

from hand_integral_pose_estimation_tpu.detect.box_ops import (  # noqa: F401
    clip_boxes,
    decode_boxes,
    encode_boxes,
    generate_base_anchors,
    grid_anchors,
)
from hand_integral_pose_estimation_tpu.detect.rpn import (  # noqa: F401
    AnchorTargets,
    Proposals,
    RPNHead,
    anchor_target_layer,
    proposal_layer,
    rpn_losses,
    smooth_l1,
)
from hand_integral_pose_estimation_tpu.detect.targets import (  # noqa: F401
    ProposalTargets,
    detection_head_losses,
    proposal_target_layer,
)
from hand_integral_pose_estimation_tpu.detect.config_compat import (  # noqa: F401,E501
    apply_rcnn_overrides,
    cfg_from_file,
    cfg_from_list,
)
from hand_integral_pose_estimation_tpu.detect.data import (  # noqa: F401
    aspect_ratio_batches,
    build_grouped_batches,
    crop_pad_to_ratio,
    rank_aspect_ratios,
)
from hand_integral_pose_estimation_tpu.detect.faster_rcnn import (  # noqa: F401
    DetectionOutputs,
    FasterRCNN,
)
from hand_integral_pose_estimation_tpu.detect.hand_detector import (  # noqa: F401
    Detections,
    detect,
    detect_hand_crop_bbox,
    detect_split,
    prepare_blob,
)
from hand_integral_pose_estimation_tpu.detect.synthetic import (  # noqa: F401
    SyntheticBoxes,
    flip_batch,
    make_synthetic_box_dataset,
)
from hand_integral_pose_estimation_tpu.detect.vgg import (  # noqa: F401
    VGG16Base,
    VGG16Tail,
)
