"""Batched perspective warp (inverse-map bilinear resampling) on device.

Replaces the reference's per-sample host cv2 pipeline, which warps every
image TWICE — once by the rotation homography K R K^-1 (augment.py:370-371)
and once by the 4-point bbox crop (augment.py:408-409). Here the two 3x3
matrices compose into a single homography and the image is resampled exactly
once, batched, on the TPU.

Semantics match cv2.warpPerspective(..., INTER_LINEAR) with constant-zero
border: dst(x, y) = src(H^-1 [x, y, 1]) with bilinear filtering at float
precision (cv2 quantises source coordinates to 1/32 px; we don't).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_sample(image: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray,
                     ) -> jnp.ndarray:
    """Sample `image` (H, W, C) at float coords (sx, sy) of shape (Ho, Wo),
    bilinear, zero outside."""
    H, W = image.shape[0], image.shape[1]
    C = image.shape[2]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    flat = image.reshape(H * W, C)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        vals = jnp.take(flat, idx.reshape(-1), axis=0)
        vals = vals.reshape(idx.shape + (C,))
        return jnp.where(valid[..., None], vals, 0.0)

    top = tap(y0, x0) * (1 - fx) + tap(y0, x0 + 1) * fx
    bot = tap(y0 + 1, x0) * (1 - fx) + tap(y0 + 1, x0 + 1) * fx
    return top * (1 - fy) + bot * fy


def warp_perspective(image: jnp.ndarray, H_mat: jnp.ndarray,
                     out_hw: tuple[int, int],
                     inverse: bool = False) -> jnp.ndarray:
    """Warp one image by a homography (cv2.warpPerspective semantics).

    Args:
        image: (H, W, C) float.
        H_mat: (3, 3) forward map src->dst (like cv2), or the dst->src map
            directly when `inverse=True` (cv2's WARP_INVERSE_MAP).
        out_hw: (Ho, Wo) output size.

    vmap over the leading axis for batches (see :func:`warp_perspective_batch`).
    """
    Ho, Wo = out_hw
    Hi = H_mat if inverse else jnp.linalg.inv(H_mat)
    xs = jnp.arange(Wo, dtype=Hi.dtype)
    ys = jnp.arange(Ho, dtype=Hi.dtype)
    X, Y = jnp.meshgrid(xs, ys)            # (Ho, Wo)
    u = Hi[0, 0] * X + Hi[0, 1] * Y + Hi[0, 2]
    v = Hi[1, 0] * X + Hi[1, 1] * Y + Hi[1, 2]
    w = Hi[2, 0] * X + Hi[2, 1] * Y + Hi[2, 2]
    sx = u / w
    sy = v / w
    return _bilinear_sample(image.astype(Hi.dtype), sx, sy)


def warp_perspective_batch(images: jnp.ndarray, H_mats: jnp.ndarray,
                           out_hw: tuple[int, int],
                           inverse: bool = False) -> jnp.ndarray:
    """(B, H, W, C) x (B, 3, 3) -> (B, Ho, Wo, C)."""
    return jax.vmap(lambda im, h: warp_perspective(im, h, out_hw, inverse))(
        images, H_mats)
