"""Procrustes alignment as vmappable JAX linear algebra.

Equivalent of the reference's MATLAB-style `compute_similarity_transform`
(common/augment.py:18-77), used for PA-MPJPE ("protocol #1") and the
teacher-label pipeline. `jnp.linalg.svd` batches natively on TPU, so the whole
eval split aligns in one fused call instead of the reference's per-sample
NumPy loop (data/FreiHand/FreiHand.py:742).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class SimilarityTransform(NamedTuple):
    d: jnp.ndarray      # residual (squared error measure)
    Z: jnp.ndarray      # transformed Y, aligned to X
    T: jnp.ndarray      # rotation applied as Y0 @ T
    b: jnp.ndarray      # scale
    c: jnp.ndarray      # translation


def compute_similarity_transform(X: jnp.ndarray, Y: jnp.ndarray,
                                 compute_optimal_scale: bool = True
                                 ) -> SimilarityTransform:
    """Align Y to X with rotation (+ optional scale) + translation.

    Args:
        X: (..., N, M) target points.
        Y: (..., N, M) input points.
        compute_optimal_scale: solve for the least-squares scale (True for
            PA-MPJPE, reference FreiHand.py:742).

    Matches reference augment.py:18-77 including the reflection fix via the
    determinant-sign flip of the last right-singular vector.
    """
    muX = X.mean(axis=-2, keepdims=True)
    muY = Y.mean(axis=-2, keepdims=True)
    X0 = X - muX
    Y0 = Y - muY

    ssX = jnp.sum(X0 ** 2, axis=(-2, -1))
    ssY = jnp.sum(Y0 ** 2, axis=(-2, -1))
    normX = jnp.sqrt(ssX)[..., None, None]
    normY = jnp.sqrt(ssY)[..., None, None]
    X0 = X0 / normX
    Y0 = Y0 / normY

    A = jnp.swapaxes(X0, -1, -2) @ Y0
    U, s, Vt = jnp.linalg.svd(A, full_matrices=False)
    V = jnp.swapaxes(Vt, -1, -2)
    T = V @ jnp.swapaxes(U, -1, -2)

    # reflection fix (augment.py:58-62): flip the last singular direction if
    # det(T) < 0 so T is a proper rotation
    detT = jnp.linalg.det(T)
    sign = jnp.sign(detT)[..., None]
    V = V.at[..., :, -1].multiply(sign)
    s = s.at[..., -1].multiply(sign[..., 0])
    T = V @ jnp.swapaxes(U, -1, -2)

    traceTA = jnp.sum(s, axis=-1)

    normX_s = normX[..., 0, 0]
    normY_s = normY[..., 0, 0]
    if compute_optimal_scale:
        b = traceTA * normX_s / normY_s
        d = 1.0 - traceTA ** 2
        Z = normX * traceTA[..., None, None] * (Y0 @ T) + muX
    else:
        b = jnp.ones_like(traceTA)
        d = 1.0 + ssY / ssX - 2.0 * traceTA * normY_s / normX_s
        Z = normY * (Y0 @ T) + muX

    c = muX[..., 0, :] - b[..., None] * jnp.einsum("...j,...jk->...k",
                                                   muY[..., 0, :], T)
    return SimilarityTransform(d=d, Z=Z, T=T, b=b, c=c)


def procrustes_align(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Aligned prediction only (the PA-MPJPE fast path)."""
    return compute_similarity_transform(gt, pred, compute_optimal_scale=True).Z


def align_w_scale(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """FreiHAND-official alignment, matching reference main/eval.py:142-165
    `align_w_scale` (scipy orthogonal_procrustes formulation).

    Both point sets are centred and Frobenius-normalised; R, s come from
    orthogonal_procrustes(gt_n, pred_n) = SVD of gt_n^T pred_n; the aligned
    prediction is pred_n @ R^T * s, rescaled and translated back to gt.
    Same optimum as :func:`compute_similarity_transform`; kept as a named
    entry point because the official scorer uses this formulation.
    """
    t1 = gt.mean(axis=-2, keepdims=True)
    t2 = pred.mean(axis=-2, keepdims=True)
    m1 = gt - t1
    m2 = pred - t2
    s1 = jnp.linalg.norm(m1, axis=(-2, -1), keepdims=True) + 1e-8
    s2 = jnp.linalg.norm(m2, axis=(-2, -1), keepdims=True) + 1e-8
    m1 = m1 / s1
    m2 = m2 / s2
    # scipy orthogonal_procrustes(A, B): R = argmin ||A R - B||_F from the
    # SVD of A^T B; scale = sum of singular values
    U, s, Vt = jnp.linalg.svd(jnp.swapaxes(m1, -1, -2) @ m2, full_matrices=False)
    R = U @ Vt
    scale = jnp.sum(s, axis=-1)[..., None, None]
    return (m2 @ jnp.swapaxes(R, -1, -2)) * scale * s1 + t1
