"""Proposal-target sampling for detection-head training.

Fixed-shape equivalent of rpn/proposal_target_layer_cascade.py:33-213: GT
boxes are appended to the proposals, `roi_batch_size` ROIs are sampled with
`roi_fg_fraction` foreground (IoU >= fg_thresh) and background in
[bg_thresh_lo, bg_thresh_hi), and regression targets are mean/std normalised
(config_rcnn.py:76-119)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hand_integral_pose_estimation_tpu.config import DetectorConfig
from hand_integral_pose_estimation_tpu.detect import box_ops
from hand_integral_pose_estimation_tpu.detect.rpn import _subsample
from hand_integral_pose_estimation_tpu.ops.nms import box_iou


class ProposalTargets(NamedTuple):
    rois: jnp.ndarray          # (roi_batch_size, 4)
    labels: jnp.ndarray        # (roi_batch_size,) class id (0 = bg)
    bbox_targets: jnp.ndarray  # (roi_batch_size, 4) normalised deltas
    fg_mask: jnp.ndarray       # (roi_batch_size,)
    valid: jnp.ndarray         # (roi_batch_size,) sampled-slot mask


def proposal_target_layer(key: jax.Array, rois: jnp.ndarray,
                          roi_valid: jnp.ndarray, gt_boxes: jnp.ndarray,
                          gt_classes: jnp.ndarray, gt_valid: jnp.ndarray,
                          cfg: DetectorConfig) -> ProposalTargets:
    """Sample training ROIs for the detection head.

    Args:
        rois: (R, 4) proposals (zero-padded); roi_valid: (R,).
        gt_boxes: (G, 4); gt_classes: (G,) int; gt_valid: (G,).
    """
    # append GT boxes to the candidate pool (:39-42)
    cand = jnp.concatenate([rois, gt_boxes], axis=0)
    cand_valid = jnp.concatenate([roi_valid, gt_valid], axis=0)
    N = cand.shape[0]

    iou = box_iou(cand, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    max_iou = jnp.where(cand_valid, iou.max(axis=1), -1.0)
    argmax_gt = iou.argmax(axis=1)

    fg = max_iou >= cfg.roi_fg_thresh
    bg = (max_iou < cfg.roi_bg_thresh_hi) & (max_iou >= cfg.roi_bg_thresh_lo)

    k_fg, k_bg = jax.random.split(key)
    num_fg = int(cfg.roi_fg_fraction * cfg.roi_batch_size)
    fg_sel = _subsample(k_fg, fg, num_fg)
    num_bg = cfg.roi_batch_size - num_fg
    bg_sel = _subsample(k_bg, bg, num_bg)
    sel = fg_sel | bg_sel

    # compact selected candidates into the fixed output (fg first)
    rank = jnp.where(fg_sel, 0, jnp.where(bg_sel, 1, 2)) * N + jnp.arange(N)
    order = jnp.argsort(rank)[:cfg.roi_batch_size]
    out_rois = cand[order]
    out_fg = fg_sel[order]
    out_valid = sel[order]
    matched = argmax_gt[order]

    labels = jnp.where(out_fg, gt_classes[matched], 0)
    targets = box_ops.encode_boxes(out_rois, gt_boxes[matched])
    means = jnp.asarray(cfg.bbox_normalize_means)
    stds = jnp.asarray(cfg.bbox_normalize_stds)
    targets = (targets - means) / stds
    targets = jnp.where(out_fg[:, None], targets, 0.0)
    return ProposalTargets(rois=out_rois, labels=labels,
                           bbox_targets=targets, fg_mask=out_fg,
                           valid=out_valid)


def detection_head_losses(cls_logits: jnp.ndarray, bbox_pred: jnp.ndarray,
                          targets: ProposalTargets, sigma: float = 1.0):
    """Detection-head CE + smooth-L1 (faster_rcnn.py:96-104)."""
    from hand_integral_pose_estimation_tpu.detect.rpn import smooth_l1

    R = targets.labels.shape[0]
    n = jnp.maximum(targets.valid.sum(), 1)
    ce = -jax.nn.log_softmax(cls_logits.astype(jnp.float32))[
        jnp.arange(R), targets.labels]
    cls_loss = jnp.where(targets.valid, ce, 0.0).sum() / n

    l1 = smooth_l1(bbox_pred.astype(jnp.float32)
                   - targets.bbox_targets, sigma).sum(-1)
    reg_loss = jnp.where(targets.fg_mask, l1, 0.0).sum() / n
    return cls_loss, reg_loss
