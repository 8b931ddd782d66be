"""Fixed-shape greedy NMS for TPU.

Replaces the reference's CUDA bitmask kernel + host greedy sweep
(lib/model_rcnn/csrc/cuda/nms.cu:23-131) and the CPU fallback
(csrc/cpu/nms_cpu.cpp:9-63). No data-dependent shapes: boxes are sorted by
score, suppression runs as a `lax.fori_loop` over the sorted order with a
vectorised O(N) inner step, and the output is a fixed top-K index set with a
validity mask — the same zero-padded contract as the reference proposal
layer (rpn/proposal_layer.py:127).

IoU convention matches the reference (+1 pixel widths, bbox_transform.py /
nms.cu:14-21).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def box_iou(a: jnp.ndarray, b: jnp.ndarray, plus_one: bool = True
            ) -> jnp.ndarray:
    """Pairwise IoU, (..., N, 4) x (..., K, 4) -> (..., N, K).

    `plus_one=True` uses the legacy +1 width/height convention of the
    reference detector stack (utils/bbox.pyx, nms.cu:14-21).
    """
    off = 1.0 if plus_one else 0.0
    ax1, ay1, ax2, ay2 = (a[..., i] for i in range(4))
    bx1, by1, bx2, by2 = (b[..., i] for i in range(4))
    area_a = (ax2 - ax1 + off) * (ay2 - ay1 + off)
    area_b = (bx2 - bx1 + off) * (by2 - by1 + off)
    ix1 = jnp.maximum(ax1[..., :, None], bx1[..., None, :])
    iy1 = jnp.maximum(ay1[..., :, None], by1[..., None, :])
    ix2 = jnp.minimum(ax2[..., :, None], bx2[..., None, :])
    iy2 = jnp.minimum(ay2[..., :, None], by2[..., None, :])
    iw = jnp.maximum(ix2 - ix1 + off, 0.0)
    ih = jnp.maximum(iy2 - iy1 + off, 0.0)
    inter = iw * ih
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
        top_k: int, score_threshold: float = -jnp.inf,
        plus_one: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with a fixed-size output.

    Args:
        boxes: (N, 4) xyxy.
        scores: (N,).
        iou_threshold: suppress boxes with IoU > threshold vs a kept box.
        top_k: number of output slots (zero-padded).
        score_threshold: boxes at or below are pre-suppressed
            (hand_detector.py:228 uses 0.001 before its NMS).

    Returns:
        (boxes (top_k, 4), scores (top_k,), valid (top_k,) bool) in
        descending score order; invalid slots are zeroed.
    """
    N = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    s = scores[order]
    alive0 = s > score_threshold

    # Tiled sweep (the TPU-standard exact-greedy formulation): process boxes
    # in score order in tiles of T; each tile is first suppressed by the
    # already-final earlier boxes via a (T, N) IoU strip, then resolved
    # internally by fixpoint self-suppression (the map
    # F(a)[i] = cand[i] & !exists j<i: a[j] & iou[j,i] > t has the greedy
    # solution as its unique fixpoint). Peak memory O(T*N), not O(N^2).
    T = int(min(512, N))
    pad = (-N) % T
    if pad:
        b = jnp.concatenate([b, jnp.zeros((pad, 4), b.dtype)])
        s = jnp.concatenate([s, jnp.full((pad,), -jnp.inf, s.dtype)])
        alive0 = jnp.concatenate([alive0, jnp.zeros((pad,), bool)])
    Np = N + pad
    num_tiles = Np // T
    idx_all = jnp.arange(Np)

    def tile_step(alive, t):
        start = t * T
        tile_boxes = jax.lax.dynamic_slice(b, (start, 0), (T, 4))
        cand = jax.lax.dynamic_slice(alive, (start,), (T,))
        iou_strip = box_iou(tile_boxes, b, plus_one=plus_one)   # (T, Np)
        hit = iou_strip > iou_threshold

        # suppression by final earlier boxes
        earlier = (idx_all < start) & alive
        cand = cand & ~(hit & earlier[None, :]).any(axis=1)

        # within-tile fixpoint self-suppression
        tile_hit = jax.lax.dynamic_slice(hit, (0, start), (T, T))
        lower = jnp.tril(jnp.ones((T, T), bool), k=-1)          # j < i
        sup_mat = tile_hit.T & lower                            # (i, j)

        def cond(state):
            a, changed = state
            return changed

        def step(state):
            a, _ = state
            new = cand & ~(sup_mat & a[None, :]).any(axis=1)
            return new, jnp.any(new != a)

        a_final, _ = jax.lax.while_loop(cond, step, (cand, jnp.array(True)))
        alive = jax.lax.dynamic_update_slice(alive, a_final, (start,))
        return alive, None

    alive, _ = jax.lax.scan(tile_step, alive0, jnp.arange(num_tiles))
    alive = alive[:N]
    b = b[:N]
    s = s[:N]
    idx = jnp.arange(N)

    # compact the survivors to the front: rank by (alive desc, score order)
    if top_k > N:  # pad when fewer candidates than output slots
        pad = top_k - N
        b = jnp.concatenate([b, jnp.zeros((pad, 4), b.dtype)])
        s = jnp.concatenate([s, jnp.zeros((pad,), s.dtype)])
        alive = jnp.concatenate([alive, jnp.zeros((pad,), bool)])
        idx = jnp.arange(top_k)
    rank = jnp.where(alive, idx, alive.shape[0] + idx)
    sel = jnp.argsort(rank)[:top_k]
    valid = alive[sel]
    out_boxes = jnp.where(valid[:, None], b[sel], 0.0)
    out_scores = jnp.where(valid, s[sel], 0.0)
    return out_boxes, out_scores, valid
