"""Faster R-CNN meta-architecture (ResNet-C4), TPU-first.

Equivalent of lib/model_rcnn/faster_rcnn/faster_rcnn.py:40-104 +
faster_rcnn/resnet.py:229-288: conv1..layer3 base -> RPN -> proposals
(fixed-size, ops/nms.py) -> ROIAlign (gather-free, ops/roi_align.py) ->
layer4 head-to-tail -> spatial mean -> class scores + bbox deltas. Training
adds the anchor/proposal target layers (detect/rpn.py, detect/targets.py)
and the CE + smooth-L1 losses.

The reference freezes BN in the detector backbone at all times
(resnet.py:261-284) because it always fine-tunes from ImageNet weights whose
BN statistics are real; `cfg.freeze_bn=True` (default) reproduces that. When
training from scratch set `freeze_bn=False` — identity-BN statistics let
residual activations grow ~100x by layer3 and stall RPN optimisation (see
the convergence study, cli/detector_convergence.py + PERFORMANCE.md).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hand_integral_pose_estimation_tpu.config import DetectorConfig
from hand_integral_pose_estimation_tpu.detect import box_ops
from hand_integral_pose_estimation_tpu.detect.rpn import (
    AnchorTargets,
    Proposals,
    anchor_target_layer,
    proposal_layer,
    rpn_losses,
)
from hand_integral_pose_estimation_tpu.detect.targets import (
    ProposalTargets,
    detection_head_losses,
    proposal_target_layer,
)
from hand_integral_pose_estimation_tpu.models.resnet import (
    ResNetBackbone,
    ResNetStage4,
)
from hand_integral_pose_estimation_tpu.ops.roi_align import (
    roi_align_batched,
)


class DetectionOutputs(NamedTuple):
    rois: jnp.ndarray         # (B, R, 4)
    roi_valid: jnp.ndarray    # (B, R)
    cls_scores: jnp.ndarray   # (B, R, num_classes) softmax probs
    bbox_deltas: jnp.ndarray  # (B, R, 4*num_classes) (std-denormalised)
    losses: Optional[dict]


class FasterRCNN(nn.Module):
    cfg: DetectorConfig = DetectorConfig()
    #: compute dtype override; None defers to cfg.compute_dtype (params are
    #: float32 either way — box decode/NMS/softmax always run float32)
    dtype: Any = None

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False,
                 gt_boxes: Optional[jnp.ndarray] = None,
                 gt_classes: Optional[jnp.ndarray] = None,
                 gt_valid: Optional[jnp.ndarray] = None) -> DetectionOutputs:
        """images: (B, H, W, 3) BGR blobs, pixel-means subtracted
        (blob.py:20-49). gt_* required when train=True."""
        c = self.cfg
        dtype = (jnp.dtype(c.compute_dtype) if self.dtype is None
                 else self.dtype)
        B, H, W = images.shape[0], images.shape[1], images.shape[2]
        num_classes = len(c.classes)
        A = len(c.anchor_scales) * len(c.anchor_ratios)

        # BN mode: frozen (inference stats) in the reference's fine-tuning
        # setup; live when training from scratch (cfg.freeze_bn=False)
        bn_train = train and not c.freeze_bn
        base = ResNetBackbone(c.resnet_type, dtype, None,
                              num_stages=3, norm=c.norm,
                              style=c.resnet_style, name="base")
        feats = base(images.astype(dtype), train=bn_train)
        fh, fw = feats.shape[1], feats.shape[2]

        # RPN is convolutional: run batched directly (rpn.py:31-56)
        rpn_trunk = nn.relu(nn.Conv(512, (3, 3), padding=1,
                                    dtype=dtype, name="rpn_conv")(feats))
        rpn_cls = nn.Conv(2 * A, (1, 1), dtype=dtype,
                          name="rpn_cls")(rpn_trunk).reshape(B, fh, fw, A, 2)
        rpn_reg = nn.Conv(4 * A, (1, 1), dtype=dtype,
                          name="rpn_bbox")(rpn_trunk).reshape(B, fh, fw, A, 4)

        anchors = box_ops.grid_anchors(
            (fh, fw), c.feat_stride,
            box_ops.generate_base_anchors(c.feat_stride, c.anchor_ratios,
                                          c.anchor_scales))

        pre_n = (c.rpn_pre_nms_top_n_train if train
                 else c.rpn_pre_nms_top_n_test)
        post_n = (c.rpn_post_nms_top_n_train if train
                  else c.rpn_post_nms_top_n_test)
        props: Proposals = jax.vmap(
            lambda cl, rg: proposal_layer(cl, rg, anchors, (H, W), pre_n,
                                          post_n, c.rpn_nms_thresh,
                                          c.rpn_min_size))(rpn_cls, rpn_reg)

        losses = None
        rois, roi_valid = props.rois, props.valid
        ptargets = None
        if train:
            key = self.make_rng("sampling")
            keys = jax.random.split(key, 2 * B).reshape(B, 2, 2)
            atargets: AnchorTargets = jax.vmap(
                lambda k, gb, gv: anchor_target_layer(
                    k, anchors, gb, gv, (H, W), c)
            )(keys[:, 0], gt_boxes, gt_valid)
            rpn_cls_loss, rpn_reg_loss = jax.vmap(
                rpn_losses, in_axes=(0, 0, 0, None))(
                rpn_cls, rpn_reg, atargets, 3.0)

            ptargets: ProposalTargets = jax.vmap(
                lambda k, r, rv, gb, gc, gv: proposal_target_layer(
                    k, r, rv, gb, gc, gv, c)
            )(keys[:, 1], props.rois, props.valid, gt_boxes, gt_classes,
              gt_valid)
            rois, roi_valid = ptargets.rois, ptargets.valid

        # inference: VMEM-resident Pallas kernel (auto, TPU only); training
        # keeps the XLA formulation — its backward comes from autodiff,
        # which pallas_call does not provide
        pooled = roi_align_batched(
            feats.astype(jnp.float32), rois, c.pooling_size,
            c.spatial_scale, c.sampling_ratio,
            impl="xla" if train else "auto")
        R = rois.shape[1]
        pooled = pooled.reshape(B * R, c.pooling_size, c.pooling_size, -1)

        tail = ResNetStage4(c.resnet_type, dtype, None, norm=c.norm,
                            style=c.resnet_style, name="tail")
        h = tail(pooled, train=bn_train).mean(axis=(1, 2))  # (B*R, 2048)

        cls_logits = nn.Dense(num_classes, dtype=dtype,
                              name="cls_score")(h).reshape(B, R, num_classes)
        bbox_pred = nn.Dense(4 * num_classes, dtype=dtype,
                             name="bbox_pred")(h).reshape(B, R,
                                                          4 * num_classes)

        if train:
            def _head_losses(cl, bp, t):
                # class-specific regression: use each ROI's target-class
                # deltas (faster_rcnn.py:88-94 gather)
                bp_cls = bp.reshape(R, num_classes, 4)
                sel = jnp.take_along_axis(
                    bp_cls, t.labels[:, None, None].astype(jnp.int32)
                    .repeat(4, axis=2), axis=1)[:, 0]
                return detection_head_losses(cl, sel, t)

            cls_loss, reg_loss = jax.vmap(_head_losses)(
                cls_logits, bbox_pred, ptargets)
            losses = {
                "rpn_cls": rpn_cls_loss.mean(),
                "rpn_reg": rpn_reg_loss.mean(),
                "det_cls": cls_loss.mean(),
                "det_reg": reg_loss.mean(),
            }

        probs = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
        return DetectionOutputs(rois=rois, roi_valid=roi_valid,
                                cls_scores=probs,
                                bbox_deltas=bbox_pred.astype(jnp.float32),
                                losses=losses)
