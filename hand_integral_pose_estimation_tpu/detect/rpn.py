"""Region proposal network: head, proposal layer, anchor targets.

Equivalents of the reference's rpn/rpn.py:31-108 (3x3 conv trunk + 2A/4A
heads), rpn/proposal_layer.py:77-160 (decode -> clip -> top-K -> NMS ->
fixed-size zero-padded proposals) and rpn/anchor_target_layer.py:48-194
(IoU-based fg/bg anchor labelling with fixed-count subsampling) — all as
fixed-shape jittable functions; the subsampling uses random priorities +
top_k instead of host-side np.random.choice.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hand_integral_pose_estimation_tpu.config import DetectorConfig
from hand_integral_pose_estimation_tpu.detect import box_ops
from hand_integral_pose_estimation_tpu.ops.nms import box_iou, nms


class RPNHead(nn.Module):
    """feat (H, W, C) -> (cls_logits (H, W, A, 2), deltas (H, W, A, 4))
    (rpn.py:31-56)."""

    num_anchors: int = 12
    channels: int = 512
    dtype=jnp.float32

    @nn.compact
    def __call__(self, x):
        A = self.num_anchors
        h = nn.relu(nn.Conv(self.channels, (3, 3), padding=1,
                            dtype=self.dtype, name="conv")(x))
        cls = nn.Conv(2 * A, (1, 1), dtype=self.dtype, name="cls")(h)
        reg = nn.Conv(4 * A, (1, 1), dtype=self.dtype, name="bbox")(h)
        H, W = x.shape[0], x.shape[1]
        return cls.reshape(H, W, A, 2), reg.reshape(H, W, A, 4)


class Proposals(NamedTuple):
    rois: jnp.ndarray     # (post_nms_top_n, 4)
    scores: jnp.ndarray   # (post_nms_top_n,)
    valid: jnp.ndarray    # (post_nms_top_n,) bool


def proposal_layer(cls_logits: jnp.ndarray, deltas: jnp.ndarray,
                   anchors: jnp.ndarray, im_hw,
                   pre_nms_top_n: int, post_nms_top_n: int,
                   nms_thresh: float = 0.7,
                   min_size: float = 8.0) -> Proposals:
    """Anchors + RPN outputs -> fixed-size proposal set
    (proposal_layer.py:77-160).

    Args:
        cls_logits: (H, W, A, 2) — softmax over the last axis gives bg/fg.
        deltas: (H, W, A, 4).
        anchors: (H*W*A, 4) from box_ops.grid_anchors (same (y, x, a) order).
        im_hw: image (height, width) for clipping.
    """
    N = anchors.shape[0]
    fg = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)[..., 1]
    scores = fg.reshape(N)
    boxes = box_ops.decode_boxes(anchors, deltas.reshape(N, 4)
                                 .astype(jnp.float32))
    boxes = box_ops.clip_boxes(boxes, im_hw)

    # drop tiny boxes by zeroing their scores (fixed-shape min-size filter)
    w = boxes[:, 2] - boxes[:, 0] + 1.0
    h = boxes[:, 3] - boxes[:, 1] + 1.0
    scores = jnp.where((w >= min_size) & (h >= min_size), scores, -1.0)

    # pre-NMS top-K
    k = min(pre_nms_top_n, N)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[top_idx]

    rois, roi_scores, valid = nms(top_boxes, top_scores, nms_thresh,
                                  post_nms_top_n, score_threshold=0.0)
    return Proposals(rois=rois, scores=roi_scores, valid=valid)


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray        # (N,) 1 fg / 0 bg / -1 ignore
    bbox_targets: jnp.ndarray  # (N, 4)
    fg_mask: jnp.ndarray       # (N,) bool — selected positives
    sample_mask: jnp.ndarray   # (N,) bool — selected for the cls loss


def _subsample(key, mask: jnp.ndarray, num: int) -> jnp.ndarray:
    """Keep at most `num` True entries of `mask`, chosen uniformly — the
    fixed-shape analogue of npr.choice disabling (anchor_target_layer.py:
    124-138). Returns the thinned mask."""
    N = mask.shape[0]
    pri = jax.random.uniform(key, (N,)) + (~mask) * 10.0
    _, idx = jax.lax.top_k(-pri, min(num, N))
    sel = jnp.zeros(N, bool).at[idx].set(True)
    return sel & mask


def anchor_target_layer(key: jax.Array, anchors: jnp.ndarray,
                        gt_boxes: jnp.ndarray, gt_valid: jnp.ndarray,
                        im_hw, cfg: DetectorConfig,
                        allowed_border: float = 0.0) -> AnchorTargets:
    """RPN training targets (anchor_target_layer.py:48-194):
    inside-image anchors only; positives = per-gt argmax anchors + anchors
    with IoU >= rpn_positive_overlap; negatives = IoU < rpn_negative_overlap;
    subsample to rpn_batch_size with rpn_fg_fraction positives; regression
    targets encode the best-overlap gt box.

    Args:
        gt_boxes: (G, 4) zero-padded; gt_valid: (G,) mask.
    """
    N = anchors.shape[0]
    h, w = im_hw
    inside = ((anchors[:, 0] >= -allowed_border)
              & (anchors[:, 1] >= -allowed_border)
              & (anchors[:, 2] < w + allowed_border)
              & (anchors[:, 3] < h + allowed_border))

    iou = box_iou(anchors, gt_boxes)                       # (N, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    max_iou = iou.max(axis=1)
    argmax_gt = iou.argmax(axis=1)

    # per-gt best anchors count as positive (incl. ties, :100-112)
    gt_best = jnp.where(gt_valid, iou.max(axis=0), 2.0)    # (G,)
    is_gt_best = (iou >= gt_best[None, :] - 1e-9).any(axis=1) & (max_iou > 0)

    pos = inside & (is_gt_best | (max_iou >= cfg.rpn_positive_overlap))
    neg = inside & (max_iou < cfg.rpn_negative_overlap) & ~pos

    k_fg, k_bg = jax.random.split(key)
    num_fg = int(cfg.rpn_fg_fraction * cfg.rpn_batch_size)
    fg_sel = _subsample(k_fg, pos, num_fg)
    num_bg = cfg.rpn_batch_size - num_fg   # reference fills the rest with bg
    bg_sel = _subsample(k_bg, neg, num_bg)

    labels = jnp.full((N,), -1, jnp.int32)
    labels = jnp.where(bg_sel, 0, labels)
    labels = jnp.where(fg_sel, 1, labels)

    matched = gt_boxes[argmax_gt]
    bbox_targets = box_ops.encode_boxes(anchors, matched)
    bbox_targets = jnp.where(fg_sel[:, None], bbox_targets, 0.0)
    return AnchorTargets(labels=labels, bbox_targets=bbox_targets,
                         fg_mask=fg_sel, sample_mask=fg_sel | bg_sel)


def smooth_l1(diff: jnp.ndarray, sigma: float = 1.0) -> jnp.ndarray:
    """Smooth-L1 with the reference's sigma parametrisation
    (utils/net_utils.py:71-85): quadratic inside |d| < 1/sigma^2."""
    s2 = sigma * sigma
    ad = jnp.abs(diff)
    return jnp.where(ad < 1.0 / s2, 0.5 * s2 * diff * diff,
                     ad - 0.5 / s2)


def rpn_losses(cls_logits: jnp.ndarray, deltas: jnp.ndarray,
               targets: AnchorTargets, sigma: float = 3.0):
    """RPN CE + smooth-L1 (rpn.py:84-108), masked fixed-shape."""
    N = targets.labels.shape[0]
    logits = cls_logits.reshape(N, 2).astype(jnp.float32)
    sample = targets.sample_mask
    n_sample = jnp.maximum(sample.sum(), 1)
    labels = jnp.maximum(targets.labels, 0)
    ce = -jax.nn.log_softmax(logits)[jnp.arange(N), labels]
    cls_loss = jnp.where(sample, ce, 0.0).sum() / n_sample

    reg = deltas.reshape(N, 4).astype(jnp.float32)
    l1 = smooth_l1(reg - targets.bbox_targets, sigma).sum(-1)
    reg_loss = jnp.where(targets.fg_mask, l1, 0.0).sum() / n_sample
    return cls_loss, reg_loss
