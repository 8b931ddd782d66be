"""Bounding-box math: delta encode/decode, clipping, anchor generation.

Vectorised equivalents of the reference's rpn/bbox_transform.py:15-230 and
rpn/generate_anchors.py:44-55 (and the Cython utils/bbox.pyx IoU — see
ops/nms.py:box_iou). All use the legacy +1 width/height convention of that
stack.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def encode_boxes(anchors: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Box -> regression deltas (bbox_transform.py `bbox_transform`)."""
    aw = anchors[..., 2] - anchors[..., 0] + 1.0
    ah = anchors[..., 3] - anchors[..., 1] + 1.0
    ax = anchors[..., 0] + 0.5 * aw
    ay = anchors[..., 1] + 0.5 * ah
    gw = gt[..., 2] - gt[..., 0] + 1.0
    gh = gt[..., 3] - gt[..., 1] + 1.0
    gx = gt[..., 0] + 0.5 * gw
    gy = gt[..., 1] + 0.5 * gh
    return jnp.stack([
        (gx - ax) / aw,
        (gy - ay) / ah,
        jnp.log(gw / aw),
        jnp.log(gh / ah),
    ], axis=-1)


#: max log-scale delta — exp(4.135) = 62.5x growth (torchvision's
#: log(1000/16) clamp); keeps untrained/huge regression outputs finite
_MAX_SCALE_DELTA = 4.135166556742356


def decode_boxes(anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Deltas -> boxes (bbox_transform.py `bbox_transform_inv`)."""
    aw = anchors[..., 2] - anchors[..., 0] + 1.0
    ah = anchors[..., 3] - anchors[..., 1] + 1.0
    ax = anchors[..., 0] + 0.5 * aw
    ay = anchors[..., 1] + 0.5 * ah
    cx = deltas[..., 0] * aw + ax
    cy = deltas[..., 1] * ah + ay
    w = jnp.exp(jnp.minimum(deltas[..., 2], _MAX_SCALE_DELTA)) * aw
    h = jnp.exp(jnp.minimum(deltas[..., 3], _MAX_SCALE_DELTA)) * ah
    return jnp.stack([
        cx - 0.5 * w,
        cy - 0.5 * h,
        cx + 0.5 * w - 1.0,
        cy + 0.5 * h - 1.0,
    ], axis=-1)


def clip_boxes(boxes: jnp.ndarray, im_hw) -> jnp.ndarray:
    """Clip to image extent (bbox_transform.py `clip_boxes`)."""
    h, w = im_hw
    x1 = jnp.clip(boxes[..., 0], 0.0, w - 1.0)
    y1 = jnp.clip(boxes[..., 1], 0.0, h - 1.0)
    x2 = jnp.clip(boxes[..., 2], 0.0, w - 1.0)
    y2 = jnp.clip(boxes[..., 3], 0.0, h - 1.0)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def generate_base_anchors(base_size: int = 16,
                          ratios=(0.5, 1.0, 2.0),
                          scales=(8, 16, 32)) -> np.ndarray:
    """(A, 4) anchors around a base_size box at the origin
    (generate_anchors.py:44-55 semantics: ratio enumeration with rounded
    integer widths, then scale enumeration)."""
    base = np.array([0, 0, base_size - 1, base_size - 1], np.float64)
    w = base[2] - base[0] + 1
    h = base[3] - base[1] + 1
    cx = base[0] + 0.5 * (w - 1)
    cy = base[1] + 0.5 * (h - 1)

    out = []
    size = w * h
    for r in ratios:
        ws = np.round(np.sqrt(size / r))
        hs = np.round(ws * r)
        for s in scales:
            wss, hss = ws * s, hs * s
            out.append([cx - 0.5 * (wss - 1), cy - 0.5 * (hss - 1),
                        cx + 0.5 * (wss - 1), cy + 0.5 * (hss - 1)])
    # reference orders scales inner-most per ratio
    return np.asarray(out, np.float64)


def grid_anchors(feat_hw, feat_stride: int = 16,
                 base_anchors: np.ndarray | None = None) -> jnp.ndarray:
    """All anchors over a feature grid, (H*W*A, 4), row-major over (y, x, a)
    (proposal_layer.py:85-100 shift enumeration)."""
    if base_anchors is None:
        base_anchors = generate_base_anchors()
    H, W = feat_hw
    sx = np.arange(W) * feat_stride
    sy = np.arange(H) * feat_stride
    X, Y = np.meshgrid(sx, sy)
    shifts = np.stack([X.ravel(), Y.ravel(), X.ravel(), Y.ravel()], axis=1)
    all_anchors = (base_anchors[None, :, :]
                   + shifts[:, None, :]).reshape(-1, 4)
    return jnp.asarray(all_anchors.astype(np.float32))
