"""Detector training data + VOC-style AP evaluation.

Capability equivalent of the reference's detector data infrastructure:
`lib/datasets/freihand.py:53-64` (the `freihand` imdb reading the GT-bbox db
derived from projected keypoints), `lib/roi_data_layer/**` (roidb/minibatch
assembly — here a fixed-shape batch builder since blobs are built on
device; horizontal flipping via `flip_rng`; the roi_data_layer's
aspect-ratio grouping exists to batch same-shaped variable-size images and
is moot here — FreiHAND images are square 224x224 and TPU batches are
fixed-shape by construction) and `lib/datasets/freihand_eval.py:109-209`
(VOC-protocol AP).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np


def gt_bbox_from_keypoints(uv: np.ndarray, margin: float = 0.0
                           ) -> np.ndarray:
    """Tight xyxy GT box around projected keypoints — how the reference built
    its `freihand_bbox_gt_{split}.npy` detector ground truth."""
    x1 = uv[..., 0].min(axis=-1) - margin
    y1 = uv[..., 1].min(axis=-1) - margin
    x2 = uv[..., 0].max(axis=-1) + margin
    y2 = uv[..., 1].max(axis=-1) + margin
    return np.stack([x1, y1, x2, y2], axis=-1)


class DetectorBatch(NamedTuple):
    images: np.ndarray      # (B, H, W, 3) RGB uint8
    gt_boxes: np.ndarray    # (B, G, 4) xyxy, zero-padded
    gt_classes: np.ndarray  # (B, G) int (1 = hand)
    gt_valid: np.ndarray    # (B, G) bool


def build_detector_batch(dataset, indices: Sequence[int],
                         max_gt: int = 1,
                         flip_rng: "np.random.RandomState | None" = None
                         ) -> DetectorBatch:
    """Host batch for detector training: images + GT hand boxes projected
    from the pose annotations (one hand per FreiHAND image).

    `flip_rng` enables the roi_data_layer horizontal-flip augmentation
    (lib/roi_data_layer/roidb.py append_flipped_images — the reference
    doubles the roidb with flipped copies; here each sample flips with
    p=0.5 per batch, the same marginal distribution without doubling
    host memory)."""
    host = dataset.host_batch(np.asarray(indices))
    imgs = host["image"]
    B = imgs.shape[0]
    jc = host["joint_cam"]
    K = host["K"]
    uv = np.einsum("bij,bnj->bni", K, jc)
    uv = uv[..., :2] / uv[..., 2:3]
    boxes = gt_bbox_from_keypoints(uv)[:, None, :]   # (B, 1, 4)

    gt_boxes = np.zeros((B, max_gt, 4), np.float32)
    gt_boxes[:, :1] = boxes
    gt_classes = np.zeros((B, max_gt), np.int32)
    gt_classes[:, 0] = 1
    gt_valid = np.zeros((B, max_gt), bool)
    gt_valid[:, 0] = True
    if flip_rng is not None:
        from hand_integral_pose_estimation_tpu.detect.synthetic import (
            flip_batch,
        )
        imgs, gt_boxes = flip_batch(imgs, gt_boxes, flip_rng.rand(B) < 0.5)
    return DetectorBatch(images=imgs, gt_boxes=gt_boxes,
                         gt_classes=gt_classes, gt_valid=gt_valid)


def voc_ap(recall: np.ndarray, precision: np.ndarray,
           use_07_metric: bool = False) -> float:
    """VOC AP from a recall/precision curve (freihand_eval.py /
    the standard VOC protocol): 11-point interpolation or the exact
    area-under-envelope form."""
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            p = precision[recall >= t].max() if (recall >= t).any() else 0.0
            ap += p / 11.0
        return float(ap)
    mrec = np.concatenate([[0.0], recall, [1.0]])
    mpre = np.concatenate([[0.0], precision, [0.0]])
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]).sum())


def evaluate_detections(det_boxes: Sequence[np.ndarray],
                        det_scores: Sequence[np.ndarray],
                        gt_boxes: Sequence[np.ndarray],
                        iou_threshold: float = 0.5,
                        use_07_metric: bool = False) -> dict:
    """VOC-protocol detection evaluation for the single `hand` class
    (freihand_eval.py:109-209): greedy matching of score-ranked detections
    to unclaimed GT boxes at the IoU threshold; returns AP, precision and
    recall arrays.

    Args:
        det_boxes[i]: (Di, 4) detections of image i; det_scores[i]: (Di,).
        gt_boxes[i]: (Gi, 4).
    """
    records = []
    npos = 0
    for i, (db, ds) in enumerate(zip(det_boxes, det_scores)):
        npos += len(gt_boxes[i])
        for b, s in zip(db, ds):
            records.append((float(s), i, b))
    records.sort(key=lambda r: -r[0])

    claimed = {i: np.zeros(len(g), bool) for i, g in enumerate(gt_boxes)}
    tp = np.zeros(len(records))
    fp = np.zeros(len(records))
    for k, (s, i, b) in enumerate(records):
        gts = gt_boxes[i]
        if len(gts) == 0:
            fp[k] = 1
            continue
        ix1 = np.maximum(gts[:, 0], b[0])
        iy1 = np.maximum(gts[:, 1], b[1])
        ix2 = np.minimum(gts[:, 2], b[2])
        iy2 = np.minimum(gts[:, 3], b[3])
        iw = np.maximum(ix2 - ix1 + 1, 0)
        ih = np.maximum(iy2 - iy1 + 1, 0)
        inter = iw * ih
        union = ((b[2] - b[0] + 1) * (b[3] - b[1] + 1)
                 + (gts[:, 2] - gts[:, 0] + 1) * (gts[:, 3] - gts[:, 1] + 1)
                 - inter)
        ious = inter / np.maximum(union, 1e-12)
        j = int(ious.argmax())
        if ious[j] > iou_threshold and not claimed[i][j]:
            tp[k] = 1
            claimed[i][j] = True
        else:
            fp[k] = 1

    tp_cum = np.cumsum(tp)
    fp_cum = np.cumsum(fp)
    recall = tp_cum / max(npos, 1)
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-12)
    ap = voc_ap(recall, precision, use_07_metric)
    return {"ap": ap, "recall": recall, "precision": precision,
            "num_gt": npos, "num_det": len(records)}
