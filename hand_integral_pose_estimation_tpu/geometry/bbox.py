"""Keypoint- and detector-driven bounding boxes for the crop pipeline.

Vectorised equivalents of reference common/augment.py:282-356. Boxes use the
(center_x, center_y, width, height) convention of the reference crop path.
"""

from __future__ import annotations

import jax.numpy as jnp

_MAX_COORD = 10000.0


def kpt_bound(uv: jnp.ndarray, vis: jnp.ndarray):
    """Visible-keypoint extent (reference augment.py:282-298 `calc_kpt_bound`).

    Args:
        uv: (..., N, 2) keypoint pixel coordinates.
        vis: (..., N) visibility (0 = skip).

    Returns:
        (u, d, l, r): top, bottom, left, right extents.
    """
    visible = vis > 0
    x = uv[..., 0]
    y = uv[..., 1]
    u = jnp.min(jnp.where(visible, y, _MAX_COORD), axis=-1)
    d = jnp.max(jnp.where(visible, y, -1.0), axis=-1)
    l = jnp.min(jnp.where(visible, x, _MAX_COORD), axis=-1)
    r = jnp.max(jnp.where(visible, x, -1.0), axis=-1)
    return u, d, l, r


def scale_bbox(bbox: jnp.ndarray, aspect_ratio: float = 1.0,
               pad_factor: float = 1.75) -> jnp.ndarray:
    """Make the box square (to `aspect_ratio`) then pad (augment.py:344-356).

    Args:
        bbox: (..., 4) as (cx, cy, w, h).
    """
    cx, cy, w, h = bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3]
    h_new = jnp.where(w > aspect_ratio * h, w / aspect_ratio, h)
    w_new = jnp.where(w < aspect_ratio * h, h * aspect_ratio, w)
    return jnp.stack([cx, cy, w_new * pad_factor, h_new * pad_factor], axis=-1)


def bbox_from_keypoints(uv: jnp.ndarray, vis: jnp.ndarray,
                        aspect_ratio: float = 1.0,
                        pad_factor: float = 1.75) -> jnp.ndarray:
    """GT bbox from projected joints (augment.py:300-315 `find_bb`)."""
    u, d, l, r = kpt_bound(uv, vis)
    cx = (l + r) * 0.5
    cy = (u + d) * 0.5
    bbox = jnp.stack([cx, cy, r - l, d - u], axis=-1)
    return scale_bbox(bbox, aspect_ratio=aspect_ratio, pad_factor=pad_factor)


def bbox_from_detection(boxes_xyxy_score: jnp.ndarray,
                        aspect_ratio: float = 1.0,
                        pad_factor: float = 1.75) -> jnp.ndarray:
    """Crop bbox from detector output (augment.py:317-342
    `find_bb_hand_detector`): pick the highest-score box, centre with integer
    floor-div (// 2 in the reference), square + pad.

    Args:
        boxes_xyxy_score: (..., K, 5) of (x1, y1, x2, y2, score).
    """
    best = jnp.argmax(boxes_xyxy_score[..., 4], axis=-1)
    box = jnp.take_along_axis(
        boxes_xyxy_score, best[..., None, None], axis=-2
    )[..., 0, :]
    x1, y1, x2, y2 = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    # reference uses floor division for the centre (augment.py:336-337)
    cx = jnp.floor((x1 + x2) / 2.0)
    cy = jnp.floor((y1 + y2) / 2.0)
    bbox = jnp.stack([cx, cy, x2 - x1, y2 - y1], axis=-1)
    return scale_bbox(bbox, aspect_ratio=aspect_ratio, pad_factor=pad_factor)


def tprime_from_bbox(bbox: jnp.ndarray, K: jnp.ndarray,
                     scaling_constant: float = 100.0) -> jnp.ndarray:
    """Canonical-depth scale `tprime = c * f / L` (augment.py:387-394).

    L is the larger bbox side; fx is used when the width is the larger side,
    fy otherwise (the reference's `if L == bbox[2]` branch).
    """
    w, h = bbox[..., 2], bbox[..., 3]
    L = jnp.maximum(w, h)
    f = jnp.where(L == w, K[..., 0, 0], K[..., 1, 1])
    return scaling_constant * f / L
