"""Detector-produced crop-bbox db for label-free and use_hand_detector modes.

The reference computes a detector crop box per image when loading the
evaluation split (`load_evaluation_data`, data/FreiHand/FreiHand.py:286-341,
via common/augment.py:317-342 `find_bb_hand_detector`) and caches per-image
detector boxes into the training pickle db when `use_hand_detector` is on
(FreiHand.py:382-409,468-470). Here both become one batched sweep: a single
jitted detect->best-box->square+pad program over fixed-shape image batches,
cached to an npz keyed by image filename.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hand_integral_pose_estimation_tpu.config import DetectorConfig
from hand_integral_pose_estimation_tpu.detect.hand_detector import (
    detect_hand_crop_bbox,
)


def generate_detector_bboxes(dataset, detector, det_variables,
                             det_cfg: Optional[DetectorConfig] = None,
                             pad_factor: float = 1.75,
                             batch_size: int = 16) -> np.ndarray:
    """Run the detector over every record of `dataset` (in record order) and
    return (N, 4) square+padded crop boxes (cx, cy, w, h).

    The reference's per-image `HandDetector.detect` python loop
    (FreiHand.py:296-321) becomes ceil(N / batch_size) dispatches of one
    compiled program; the tail batch is padded by repeating the last sample
    and the padding rows dropped.
    """
    det_cfg = det_cfg or detector.cfg

    @jax.jit
    def run(images):
        return detect_hand_crop_bbox(detector, det_variables, images,
                                     det_cfg, pad_factor=pad_factor)

    from hand_integral_pose_estimation_tpu.data.freihand import (
        padded_batches,
    )
    n = len(dataset)
    out = []
    for idx in padded_batches(n, batch_size):
        host = dataset.host_batch(idx)
        out.append(np.asarray(run(jnp.asarray(host["image"]))))
    return np.concatenate(out)[:n].astype(np.float32)


def _record_names(dataset) -> np.ndarray:
    if hasattr(dataset, "records"):
        return np.asarray([os.path.basename(r.img_path)
                           for r in dataset.records])
    if hasattr(dataset, "record_names"):
        # content-derived names (SyntheticFreiHand) — keeps the integrity
        # check meaningful for record-less datasets
        return np.asarray(dataset.record_names())
    return np.asarray([str(i) for i in range(len(dataset))])


def save_bbox_db(path: str, dataset, bboxes: np.ndarray) -> str:
    """Persist the per-image crop boxes (the npz analogue of the reference's
    `FreiHand_keypoint_bbox_db_*.pkl` detector-box cache,
    FreiHand.py:382-409): boxes aligned to record order plus the image
    filenames for integrity checking at load time."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, bbox=np.asarray(bboxes, np.float32),
             name=_record_names(dataset))
    return path


def load_bbox_db(path: str) -> tuple[np.ndarray, np.ndarray]:
    db = np.load(path)
    return db["name"], db["bbox"]


def attach_detector_bboxes(dataset, bboxes: np.ndarray,
                           names: Optional[np.ndarray] = None):
    """Set `SampleRecord.detector_bbox` for every record (record order).
    After this, `host_batch` emits `bbox_detector` and both the train and
    eval pipelines crop from detector boxes instead of GT-projected ones
    (the use_hand_detector contract, FreiHand.py:468-470)."""
    bboxes = np.asarray(bboxes, np.float32)
    assert len(bboxes) == len(dataset), (len(bboxes), len(dataset))
    if names is not None:
        got = _record_names(dataset)
        if not np.array_equal(np.asarray(names), got):
            raise ValueError(
                "bbox db was generated for a different record set/order")
    if hasattr(dataset, "records"):
        for r, bb in zip(dataset.records, bboxes):
            r.detector_bbox = bb
    else:
        dataset.detector_bbox = bboxes   # SyntheticFreiHand-style datasets
    return dataset


def ensure_detector_bboxes(dataset, detector, det_variables,
                           cache_path: Optional[str] = None,
                           det_cfg: Optional[DetectorConfig] = None,
                           pad_factor: float = 1.75,
                           batch_size: int = 16):
    """Attach detector crop boxes, reusing `cache_path` when it matches the
    dataset (generate + save otherwise) — the load-or-rebuild behaviour of
    the reference's pickle caches (FreiHand.py:286-293,382-388)."""
    if cache_path and os.path.exists(cache_path):
        try:
            names, bboxes = load_bbox_db(cache_path)
            return attach_detector_bboxes(dataset, bboxes, names)
        except (ValueError, AssertionError):
            pass  # stale cache: regenerate below
    if detector is None:
        raise ValueError(
            f"bbox cache {cache_path!r} is missing or stale and no detector "
            f"was provided to regenerate it")
    bboxes = generate_detector_bboxes(dataset, detector, det_variables,
                                      det_cfg, pad_factor, batch_size)
    if cache_path:
        save_bbox_db(cache_path, dataset, bboxes)
    return attach_detector_bboxes(dataset, bboxes)
