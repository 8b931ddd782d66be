"""Hand-detector facade: image -> fixed-size hand boxes + scores.

Equivalent of common/hand_detector.py:47-246: blob preparation (BGR, pixel
means, single-scale resize short-side 600 / max-side 1000), Faster R-CNN
forward, std-denormalised delta decode + clip, score threshold 0.001, class
NMS at 0.3, and `detect_hand_crop_bbox` reproducing the caller's
best-score-box -> square -> pad x1.75 crop box (augment.py:317-342).

TPU-first: the resize is the same matmul-based warp as the crop pipeline,
the whole path jits, and outputs are fixed-size (max_detections, 5) with a
validity mask instead of the reference's variable-length cls_dets.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from hand_integral_pose_estimation_tpu.config import DetectorConfig
from hand_integral_pose_estimation_tpu.detect import box_ops
from hand_integral_pose_estimation_tpu.detect.faster_rcnn import FasterRCNN
from hand_integral_pose_estimation_tpu.geometry import bbox as bbox_mod
from hand_integral_pose_estimation_tpu.ops.nms import nms
from hand_integral_pose_estimation_tpu.ops.warp import (
    warp_axis_aligned_batch,
)


class Detections(NamedTuple):
    boxes: jnp.ndarray    # (B, max_detections, 4) xyxy, original image coords
    scores: jnp.ndarray   # (B, max_detections)
    valid: jnp.ndarray    # (B, max_detections)


def _blob_scale(im_hw, target: int, max_size: int) -> float:
    h, w = im_hw
    scale = target / min(h, w)
    if scale * max(h, w) > max_size:
        scale = max_size / max(h, w)
    return scale


def prepare_blob(images_rgb: jnp.ndarray, cfg: DetectorConfig):
    """RGB uint8/float images -> resized BGR mean-subtracted blob
    (hand_detector.py:78-109 + utils/blob.py:20-49). Returns (blob, scale).

    The blob map is a pure scale, so the resample takes the axis-aligned
    two-matmul path ((Ws,Wo)+(Hs,Ho) weights instead of the generic
    warp's per-pixel tensors), and scale == 1 skips the resample
    entirely — the generic path cost a measured 2.8 ms/batch-4 on
    IDENTITY 600² blobs (round-5 detector breakdown), 15 % of the whole
    parity detect program."""
    B, H, W = images_rgb.shape[0], images_rgb.shape[1], images_rgb.shape[2]
    scale = _blob_scale((H, W), cfg.test_scale, cfg.test_max_size)
    oh, ow = int(round(H * scale)), int(round(W * scale))
    bgr = images_rgb[..., ::-1].astype(jnp.float32)
    bgr = bgr - jnp.asarray(cfg.pixel_means, jnp.float32)
    if (oh, ow) == (H, W):
        return bgr, scale
    Hm = jnp.asarray([[scale, 0, 0], [0, scale, 0], [0, 0, 1.0]],
                     jnp.float32)
    blob = warp_axis_aligned_batch(
        bgr, jnp.broadcast_to(Hm, (B, 3, 3)), (oh, ow))
    return blob, scale


def detect(model: FasterRCNN, variables, images_rgb: jnp.ndarray,
           cfg: Optional[DetectorConfig] = None,
           mesh=None, data_axis: str = "data") -> Detections:
    """Full two-stage detection (hand_detector.py:160-246): blob -> forward
    -> decode class-1 ("hand") deltas with bbox_normalize_stds -> clip ->
    rescale to original image -> threshold 0.001 -> NMS 0.3 -> fixed top-K.

    With `mesh` set, the whole call runs inside one `shard_map` region:
    images shard over `data_axis`, weights are replicated, and every stage
    (backbone, RPN, the ROIAlign Pallas kernel, NMS fixpoint) executes on
    its own shard — the serving-side counterpart of the reference wrapping
    the detector in DataParallel (common/base.py:179-284). Per-shard batch
    = B / data_axis_size; B must divide."""
    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        data = P(data_axis)
        return jax.shard_map(
            lambda v, im: detect(model, v, im, cfg),
            mesh=mesh, in_specs=(P(), data), out_specs=data,
            check_vma=False)(variables, images_rgb)
    cfg = cfg or model.cfg
    blob, scale = prepare_blob(images_rgb, cfg)
    out = model.apply(variables, blob, train=False)
    return _postprocess(out, cfg, blob.shape[1:3], scale)


def _postprocess(out, cfg: DetectorConfig, blob_hw, scale) -> Detections:
    """Decode class-1 deltas -> clip to blob -> rescale to original image ->
    threshold -> class NMS -> fixed top-K (hand_detector.py:200-246)."""
    B = out.rois.shape[0]
    stds = jnp.asarray(cfg.bbox_normalize_stds, jnp.float32)
    means = jnp.asarray(cfg.bbox_normalize_means, jnp.float32)
    # class 1 = hand (classes = ('__background__', 'hand'))
    deltas = out.bbox_deltas.reshape(B, -1, len(cfg.classes), 4)[:, :, 1]
    deltas = deltas * stds + means
    boxes = jax.vmap(box_ops.decode_boxes)(out.rois, deltas)
    boxes = box_ops.clip_boxes(boxes, blob_hw) / scale
    scores = out.cls_scores[..., 1]
    scores = jnp.where(out.roi_valid, scores, 0.0)

    def per_image(bx, sc):
        return nms(bx, sc, cfg.det_nms_thresh, cfg.max_detections,
                   score_threshold=cfg.det_score_thresh)

    b, s, v = jax.vmap(per_image)(boxes, scores)
    return Detections(boxes=b, scores=s, valid=v)


@functools.partial(jax.jit, static_argnums=(0, 3))
def _split_upstream(model: FasterRCNN, variables, images_rgb,
                    cfg: DetectorConfig):
    blob, _ = prepare_blob(images_rgb, cfg)
    return model.apply(variables, blob, method="upstream")


@functools.partial(jax.jit, static_argnums=(0, 5, 6, 7, 8, 9))
def _split_downstream(model: FasterRCNN, variables, feats, rois, valid,
                      cfg: DetectorConfig, blob_hw: Tuple[int, int],
                      scale: float, orig_hw=None, pad_factor=None):
    out = model.apply(variables, feats, rois, valid, method="downstream")
    det = _postprocess(out, cfg, blob_hw, scale)
    if pad_factor is None:
        return det
    return _crop_from_detections(det, orig_hw, pad_factor)


def detect_split(model: FasterRCNN, variables, images_rgb: jnp.ndarray,
                 cfg: Optional[DetectorConfig] = None) -> Detections:
    """`detect`, dispatched as TWO XLA programs: upstream (blob -> base ->
    RPN -> proposals) then downstream (ROIAlign -> tail -> heads -> class
    NMS). Same outputs as the one-program `detect`.

    Why: the round-5 glue probe (scripts/detector_glue_probe.py,
    PERFORMANCE.md round-5 detector section) measured the two composed
    halves at 6.5 + 5.8 ms/batch-4 while ANY one-program combination costs
    17.2 ms — XLA's global layout/scheduling loses ~29 % when both halves
    share a program, and an `optimization_barrier` recovers none of it.
    Two dispatches sidestep the compiler: on a PCIe host the inter-program
    gap is ~50 us. Dispatch-level API — calling it under an outer `jit`
    just rebuilds the one-program composition."""
    cfg = cfg or model.cfg
    H, W = int(images_rgb.shape[1]), int(images_rgb.shape[2])
    scale = _blob_scale((H, W), cfg.test_scale, cfg.test_max_size)
    blob_hw = (int(round(H * scale)), int(round(W * scale)))
    feats, rois, valid = _split_upstream(model, variables, images_rgb, cfg)
    return _split_downstream(model, variables, feats, rois, valid, cfg,
                             blob_hw, scale)


def _crop_from_detections(det: Detections, orig_hw, pad_factor: float):
    """Best-score detection -> square + padded crop box (cx, cy, w, h)
    (augment.py:317-342 `find_bb_hand_detector`)."""
    packed = jnp.concatenate([det.boxes, det.scores[..., None]], axis=-1)
    crop = jax.vmap(
        lambda p: bbox_mod.bbox_from_detection(p, pad_factor=pad_factor)
    )(packed)
    # no valid detection (or a degenerate best box): fall back to the square
    # full-image crop so downstream tprime/warp math stays finite — the
    # fixed-shape equivalent of the reference simply having no box to crop
    # with (it would index an empty cls_dets)
    H, W = orig_hw
    full = bbox_mod.scale_bbox(
        jnp.asarray([W / 2.0, H / 2.0, float(W), float(H)], crop.dtype),
        pad_factor=1.0)
    ok = ((det.scores.max(axis=-1) > 0.0)
          & (crop[:, 2] > 0.0) & (crop[:, 3] > 0.0))
    return jnp.where(ok[:, None], crop, full[None, :])


def detect_hand_crop_bbox(model: FasterRCNN, variables,
                          images_rgb: jnp.ndarray,
                          cfg: Optional[DetectorConfig] = None,
                          pad_factor: float = 1.75,
                          mesh=None, split: bool = False) -> jnp.ndarray:
    """Best-score detection -> square + padded crop box (cx, cy, w, h) — the
    box the pose pipeline crops with (augment.py:317-342
    `find_bb_hand_detector`). Returns (B, 4). `mesh` shards the detection
    over `data` (the per-image box math after it partitions natively).
    `split=True` dispatches the detector as two programs (`detect_split`;
    the crop math folds into the downstream program, still two dispatches
    total) — serving-only, incompatible with `mesh` and outer `jit`."""
    H, W = int(images_rgb.shape[1]), int(images_rgb.shape[2])
    if split:
        assert mesh is None, "split-program detect does not take a mesh"
        cfg = cfg or model.cfg
        scale = _blob_scale((H, W), cfg.test_scale, cfg.test_max_size)
        blob_hw = (int(round(H * scale)), int(round(W * scale)))
        feats, rois, valid = _split_upstream(model, variables, images_rgb,
                                             cfg)
        return _split_downstream(model, variables, feats, rois, valid, cfg,
                                 blob_hw, scale, (H, W), pad_factor)
    det = detect(model, variables, images_rgb, cfg, mesh=mesh)
    return _crop_from_detections(det, (H, W), pad_factor)
