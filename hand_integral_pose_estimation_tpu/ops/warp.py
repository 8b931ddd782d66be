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


def warp_perspective_twopass(image: jnp.ndarray, H_mat: jnp.ndarray,
                             out_hw: tuple[int, int],
                             inverse: bool = False,
                             precision=jax.lax.Precision.HIGHEST
                             ) -> jnp.ndarray:
    """Exact homography warp as two separable 1D resamples (Catmull-Smith),
    each a dense bilinear-weight matmul — no gathers, all MXU work. This is
    the TPU-fast path: XLA's gather lowering makes :func:`warp_perspective`
    ~50x slower on TPU, while two matmul passes run at memory speed.

    Derivation (Hinv = dst->src, normalised so Hinv[2,2] = 1):
      u(x', y') = (a x' + b y' + c) / (g x' + h y' + 1)
      v(x', y') = (d x' + e y' + f) / (g x' + h y' + 1)
    Pass A resamples every source row ys horizontally at
      u*(x', ys) = u(x', yA)  with  yA = (ys g x' + ys - d x' - f)/(e - ys h)
    (yA solves v(x', yA) = ys), giving tmp[ys, x'] = src[ys, u*].
    Pass B resamples every intermediate column x' vertically at v*(x', y'),
    giving out[y', x'] = tmp[v*, x'] = src(u(x',y'), v(x',y')) exactly.

    Weights relu(1 - |coord - i|) reproduce 2-tap bilinear filtering and give
    the zero border for out-of-range coordinates for free.

    Filter note: for warps with cross-terms (rotations), two-pass bilinear is
    a slightly different — equally valid — resampling filter than single-pass
    bilinear (the horizontal taps are taken at the two neighbouring source
    ROWS' own u*, not at the output pixel's u). It is exactly equal to
    single-pass bilinear for axis-aligned affine warps (the 60% R == I case),
    and agrees to first order on smooth images otherwise; the reference's own
    double cv2 resample (rotation warp then crop warp) differs from a single
    warp by the same class of filter difference.
    """
    Ho, Wo = out_hw
    Hs, Ws = image.shape[0], image.shape[1]
    Hi = H_mat if inverse else jnp.linalg.inv(H_mat)
    Hi = Hi / Hi[2, 2]
    a, b, c = Hi[0, 0], Hi[0, 1], Hi[0, 2]
    d, e, f = Hi[1, 0], Hi[1, 1], Hi[1, 2]
    g, h = Hi[2, 0], Hi[2, 1]
    dt = jnp.promote_types(image.dtype, jnp.float32)

    xo = jnp.arange(Wo, dtype=dt)[None, :]            # (1, Wo)
    ys = jnp.arange(Hs, dtype=dt)[:, None]            # (Hs, 1)
    yA = (ys * g * xo + ys - d * xo - f) / (e - ys * h)
    denomA = g * xo + h * yA + 1.0
    u_star = (a * xo + b * yA + c) / denomA           # (Hs, Wo)

    # Layout choices for the MXU:
    #  * transposed contraction — channels ride the M dimension (padded to 8
    #    sublanes) instead of N (padded to 128 lanes): 2.3x faster measured;
    #  * at DEFAULT precision the MXU rounds operands to bf16 anyway, so the
    #    (H, Wo, Ws) weight tensors are stored bf16, halving HBM traffic.
    wdt = (jnp.bfloat16 if precision == jax.lax.Precision.DEFAULT
           and dt == jnp.float32 else dt)
    xs = jnp.arange(Ws, dtype=dt)
    # WaT[s, i, o] = bilinear weight of source col i for output col o, row s
    WaT = jnp.maximum(
        0.0, 1.0 - jnp.abs(xs[None, :, None] - u_star[:, None, :])
    ).astype(wdt)                                     # (Hs, Ws, Wo)
    imgT = jnp.transpose(image, (0, 2, 1)).astype(wdt)  # (Hs, C, Ws)
    # per-row matmul (C, Ws) @ (Ws, Wo)
    tmp = jnp.einsum("sci,sio->sco", imgT, WaT,
                     precision=precision,
                     preferred_element_type=dt)       # (Hs, C, Wo)

    yo = jnp.arange(Ho, dtype=dt)[:, None]            # (Ho, 1)
    denomB = g * xo + h * yo + 1.0
    v_star = (d * xo + e * yo + f) / denomB           # (Ho, Wo)
    vs = jnp.arange(Hs, dtype=dt)
    # WbT[o, v, y] = weight of intermediate row v for output row y, col o
    WbT = jnp.maximum(
        0.0, 1.0 - jnp.abs(vs[None, :, None] - v_star.T[:, None, :])
    ).astype(wdt)                                     # (Wo, Hs, Ho)
    tmpT = jnp.transpose(tmp, (2, 1, 0)).astype(wdt)  # (Wo, C, Hs)
    out = jnp.einsum("ocv,ovy->ocy", tmpT, WbT,
                     precision=precision,
                     preferred_element_type=dt)       # (Wo, C, Ho)
    return jnp.transpose(out, (2, 0, 1))              # (Ho, Wo, C)


def warp_perspective_batch(images: jnp.ndarray, H_mats: jnp.ndarray,
                           out_hw: tuple[int, int],
                           inverse: bool = False,
                           method: str = "auto",
                           precision=None) -> jnp.ndarray:
    """(B, H, W, C) x (B, 3, 3) -> (B, Ho, Wo, C).

    method: "gather" (fast on CPU), "twopass" (fast on TPU — sequential scan
    over the batch keeps the per-image weight tensors transient), or "auto".
    precision: matmul precision of the twopass path. None = DEFAULT (bf16
    multiplies, fp32 accumulate — ~0.2% pixel error, 6x less MXU work) on
    TPU and HIGHEST elsewhere; pass an explicit jax.lax.Precision to pin.
    """
    on_tpu = any(dev.platform == "tpu" for dev in jax.devices())
    if method == "auto":
        method = "twopass" if on_tpu else "gather"
    if precision is None:
        precision = (jax.lax.Precision.DEFAULT if on_tpu
                     else jax.lax.Precision.HIGHEST)
    if method == "gather":
        return jax.vmap(
            lambda im, hm: warp_perspective(im, hm, out_hw, inverse)
        )(images, H_mats)
    # sequential map: keeps only one image's weight tensors transient;
    # measured faster than chunked vmap on v5e (the weights stream through
    # VMEM-sized fusions instead of materialising batched)
    return jax.lax.map(
        lambda args: warp_perspective_twopass(args[0], args[1], out_hw,
                                              inverse, precision),
        (images, H_mats))
