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

The forward is split into `upstream` (base -> RPN -> proposals) and
`downstream` (ROIAlign -> tail -> heads) halves exposed as apply methods:
the round-5 glue probe measured that XLA loses ~29 % compiling both halves
into ONE program (layout/scheduling, immune to `optimization_barrier`), so
serving can dispatch the halves as two back-to-back programs
(hand_detector.detect_split) and recover the gap.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

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

    def setup(self):
        c = self.cfg
        dtype = (jnp.dtype(c.compute_dtype) if self.dtype is None
                 else self.dtype)
        self._compute_dtype = dtype
        # attribute names == param-tree keys (checkpoint/interop contract)
        self.base = ResNetBackbone(c.resnet_type, dtype, None,
                                   num_stages=3, norm=c.norm,
                                   style=c.resnet_style)
        self.rpn_conv = nn.Conv(512, (3, 3), padding=1, dtype=dtype)
        A = len(c.anchor_scales) * len(c.anchor_ratios)
        self.rpn_cls = nn.Conv(2 * A, (1, 1), dtype=dtype)
        self.rpn_bbox = nn.Conv(4 * A, (1, 1), dtype=dtype)
        self.tail = ResNetStage4(c.resnet_type, dtype, None, norm=c.norm,
                                 style=c.resnet_style)
        num_classes = len(c.classes)
        self.cls_score = nn.Dense(num_classes, dtype=dtype)
        self.bbox_pred = nn.Dense(4 * num_classes, dtype=dtype)

    # ---- upstream half: base convs -> RPN -> proposal layer -------------

    def _rpn_proposals(self, images: jnp.ndarray, train: bool):
        """base -> RPN heads -> fixed-size proposals. Returns everything
        the training target layers need; inference uses (feats, props)."""
        c = self.cfg
        B, H, W = images.shape[0], images.shape[1], images.shape[2]
        A = len(c.anchor_scales) * len(c.anchor_ratios)
        bn_train = train and not c.freeze_bn
        feats = self.base(images.astype(self._compute_dtype), train=bn_train)
        fh, fw = feats.shape[1], feats.shape[2]

        # RPN is convolutional: run batched directly (rpn.py:31-56)
        trunk = nn.relu(self.rpn_conv(feats))
        rpn_cls = self.rpn_cls(trunk).reshape(B, fh, fw, A, 2)
        rpn_reg = self.rpn_bbox(trunk).reshape(B, fh, fw, A, 4)

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
        return feats, rpn_cls, rpn_reg, anchors, props

    def upstream(self, images: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                     jnp.ndarray,
                                                     jnp.ndarray]:
        """Inference upstream program half: (B, H, W, 3) BGR blob ->
        (feats, rois, roi_valid). feats stay in the compute dtype so the
        inter-program transfer is half-size under bf16."""
        feats, _, _, _, props = self._rpn_proposals(images, train=False)
        return feats, props.rois, props.valid

    # ---- downstream half: ROIAlign -> stage-4 tail -> heads --------------

    def _head_outputs(self, feats: jnp.ndarray, rois: jnp.ndarray,
                      train: bool):
        """ROIAlign -> layer4 -> spatial mean -> class/bbox heads."""
        c = self.cfg
        B, R = rois.shape[0], rois.shape[1]
        num_classes = len(c.classes)
        # inference: VMEM-resident Pallas kernel (auto, TPU only); training
        # keeps the XLA formulation — its backward comes from autodiff,
        # which pallas_call does not provide
        pooled = roi_align_batched(
            feats.astype(jnp.float32), rois, c.pooling_size,
            c.spatial_scale, c.sampling_ratio,
            impl="xla" if train else "auto")
        pooled = pooled.reshape(B * R, c.pooling_size, c.pooling_size, -1)

        bn_train = train and not c.freeze_bn
        h = self.tail(pooled, train=bn_train).mean(axis=(1, 2))  # (B*R, C)

        cls_logits = self.cls_score(h).reshape(B, R, num_classes)
        bbox_pred = self.bbox_pred(h).reshape(B, R, 4 * num_classes)
        return cls_logits, bbox_pred

    def downstream(self, feats: jnp.ndarray, rois: jnp.ndarray,
                   roi_valid: jnp.ndarray) -> DetectionOutputs:
        """Inference downstream program half: `upstream`'s outputs ->
        DetectionOutputs (losses=None)."""
        cls_logits, bbox_pred = self._head_outputs(feats, rois, train=False)
        probs = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
        return DetectionOutputs(rois=rois, roi_valid=roi_valid,
                                cls_scores=probs,
                                bbox_deltas=bbox_pred.astype(jnp.float32),
                                losses=None)

    # ---- full forward -----------------------------------------------------

    def __call__(self, images: jnp.ndarray, train: bool = False,
                 gt_boxes: Optional[jnp.ndarray] = None,
                 gt_classes: Optional[jnp.ndarray] = None,
                 gt_valid: Optional[jnp.ndarray] = None) -> DetectionOutputs:
        """images: (B, H, W, 3) BGR blobs, pixel-means subtracted
        (blob.py:20-49). gt_* required when train=True."""
        c = self.cfg
        B, H, W = images.shape[0], images.shape[1], images.shape[2]
        num_classes = len(c.classes)

        feats, rpn_cls, rpn_reg, anchors, props = self._rpn_proposals(
            images, train)

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

        cls_logits, bbox_pred = self._head_outputs(feats, rois, train)
        R = rois.shape[1]

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
