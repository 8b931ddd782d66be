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

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _warp_kernel(img_ref, coef_ref, out_ref, tmp_ref, *, Hs, Ws, Ho, Wo,
                 chunk):
    """Per-image two-pass warp, weights built in VMEM (grid (B,)).

    Layouts chosen for the MXU: image arrives (Hs, C, Ws) so each row-chunk
    matmul is (chunk-batched) (C, Ws) @ (Ws, Wo) with C riding the 8-pad M
    dimension; the intermediate is kept transposed (Wo, C, Hs) so pass B has
    the same structure; the output leaves as (Wo, C, Ho) and is untransposed
    by the caller.
    """
    a = coef_ref[0, 0, 0]
    b = coef_ref[0, 0, 1]
    c = coef_ref[0, 0, 2]
    d = coef_ref[0, 0, 3]
    e = coef_ref[0, 0, 4]
    f = coef_ref[0, 0, 5]
    g = coef_ref[0, 0, 6]
    h = coef_ref[0, 0, 7]

    def fiota(shape, dim):
        # Mosaic iota is integer-only; cast to float on the VPU
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(
            jnp.float32)

    xo = fiota((chunk, Wo), 1)

    # ---- pass A: horizontal resample of each source row ----
    for rc in range(Hs // chunk):
        ys = rc * chunk + fiota((chunk, Wo), 0)
        yA = (ys * g * xo + ys - d * xo - f) / (e - ys * h)
        u = (a * xo + b * yA + c) / (g * xo + h * yA + 1.0)   # (chunk, Wo)
        xs = fiota((chunk, Ws, Wo), 1)
        WaT = jnp.maximum(0.0, 1.0 - jnp.abs(xs - u[:, None, :]))
        lhs = img_ref[0, rc * chunk:(rc + 1) * chunk]          # (chunk,C,Ws)
        part = jax.lax.dot_general(
            lhs.astype(jnp.float32), WaT,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)                # (chunk,C,Wo)
        tmp_ref[:, :, rc * chunk:(rc + 1) * chunk] = jnp.transpose(
            part, (2, 1, 0))

    # ---- pass B: vertical resample of each output column ----
    for oc in range(Wo // chunk):
        xc = oc * chunk + fiota((chunk, Ho), 0)
        yo = fiota((chunk, Ho), 1)
        v = (d * xc + e * yo + f) / (g * xc + h * yo + 1.0)    # (chunk, Ho)
        vs = fiota((chunk, Hs, Ho), 1)
        WbT = jnp.maximum(0.0, 1.0 - jnp.abs(vs - v[:, None, :]))
        lhs = tmp_ref[oc * chunk:(oc + 1) * chunk]             # (chunk,C,Hs)
        outp = jax.lax.dot_general(
            lhs, WbT,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)                # (chunk,C,Ho)
        out_ref[0, oc * chunk:(oc + 1) * chunk] = outp.astype(out_ref.dtype)


def _warp_kernel_looped(img_ref, coef_ref, out_ref, tmpA_ref, tmpB_ref, *,
                        Hs, Ws, Ho, Wo, chunk):
    """Two-pass warp with the chunk loops as lax.fori_loop (grid (B,)).

    The unrolled kernel (`_warp_kernel`) keeps every iteration's
    (chunk, Ws, Wo) weight block live on Mosaic's scoped-vmem stack, which
    OOMs past ~14 iterations (measured: 36 iters = 25.4 MB vs the 16 MB
    limit; 60 iters = 59.8 MB). Here each pass is a fori_loop whose body
    touches refs only through dynamic slices of LEADING (untiled) dims —
    one weight buffer live per pass, so VMEM use is independent of the
    iteration count and big sources (352² teacher bases, 480² directly)
    fit. Costs vs unrolled: pass A stores to an (Hs, C, Wo) scratch and
    one in-VMEM transpose rebuilds the (Wo, C, Hs) layout pass B wants
    (the dims it would need to slice are tiled ones).
    """
    a = coef_ref[0, 0, 0]
    b = coef_ref[0, 0, 1]
    c = coef_ref[0, 0, 2]
    d = coef_ref[0, 0, 3]
    e = coef_ref[0, 0, 4]
    f = coef_ref[0, 0, 5]
    g = coef_ref[0, 0, 6]
    h = coef_ref[0, 0, 7]

    def fiota(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(
            jnp.float32)

    xo = fiota((chunk, Wo), 1)

    def passA(rc, carry):
        ys = rc.astype(jnp.float32) * chunk + fiota((chunk, Wo), 0)
        yA = (ys * g * xo + ys - d * xo - f) / (e - ys * h)
        u = (a * xo + b * yA + c) / (g * xo + h * yA + 1.0)
        xs = fiota((chunk, Ws, Wo), 1)
        WaT = jnp.maximum(0.0, 1.0 - jnp.abs(xs - u[:, None, :]))
        lhs = img_ref[0, pl.ds(rc * chunk, chunk)]            # (chunk,C,Ws)
        part = jax.lax.dot_general(
            lhs.astype(jnp.float32), WaT,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)               # (chunk,C,Wo)
        tmpA_ref[pl.ds(rc * chunk, chunk)] = part
        return carry

    jax.lax.fori_loop(0, Hs // chunk, passA, 0, unroll=False)
    # Relayout (Hs, C, Wo) -> (Wo, C, Hs) as STATIC chunk-thin transposes:
    # the monolithic jnp.transpose of the full scratch crashes the Mosaic
    # compiler for dims >= 192 (isolated on hardware: passA/passB alone
    # compile, the lone transpose doesn't; 160 happens to work). Static
    # last-dim slices are fine (the unrolled kernel uses them), and each
    # iteration's (Hs, C, chunk) temp is ~30 KB, so the stacked scoped-vmem
    # cost that rules out unrolling the WEIGHT loops is negligible here.
    for oc_static in range(Wo // chunk):
        tmpB_ref[oc_static * chunk:(oc_static + 1) * chunk] = jnp.transpose(
            tmpA_ref[:, :, oc_static * chunk:(oc_static + 1) * chunk],
            (2, 1, 0))

    def passB(oc, carry):
        xc = oc.astype(jnp.float32) * chunk + fiota((chunk, Ho), 0)
        yo = fiota((chunk, Ho), 1)
        v = (d * xc + e * yo + f) / (g * xc + h * yo + 1.0)
        vs = fiota((chunk, Hs, Ho), 1)
        WbT = jnp.maximum(0.0, 1.0 - jnp.abs(vs - v[:, None, :]))
        lhs = tmpB_ref[pl.ds(oc * chunk, chunk)]              # (chunk,C,Hs)
        outp = jax.lax.dot_general(
            lhs, WbT,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)               # (chunk,C,Ho)
        out_ref[0, pl.ds(oc * chunk, chunk)] = outp.astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, Wo // chunk, passB, 0, unroll=False)


def warp_perspective_pallas(images: jnp.ndarray, H_mats: jnp.ndarray,
                            out_hw: tuple[int, int],
                            inverse: bool = False,
                            interpret: bool = False,
                            chunk: int = 32) -> jnp.ndarray:
    """Batched two-pass warp as ONE Pallas kernel: the (H, Wo, Ws) bilinear
    weight tensors are built and consumed inside VMEM (the XLA twopass path
    streams ~45 MB of weights per image through HBM), and the per-image
    dispatch overhead of a lax.map disappears into the kernel grid.

    Same math and filter as :func:`warp_perspective_twopass` (with bf16 MXU
    rounding of operands, like that path's DEFAULT precision on TPU).

    `chunk` is the row-block size of the in-VMEM weight tensors. Two body
    variants: fully UNROLLED chunk loops (fastest; every iteration's
    weight block lands on Mosaic's scoped-vmem stack, OOMs past ~14
    iterations) and fori_loop-ed (`_warp_kernel_looped`; one live weight
    buffer per pass, VMEM independent of iteration count, so big sources
    COMPILE — but measured SLOWER than the streaming twopass at the 320²
    factored-teacher shape: 14.2 (chunk 16) / 17.2 (chunk 8) vs 10.0 ms
    per 168 warps. The loop serialises the weight build (VPU) against the
    C=3-row matmuls (2 % MXU occupancy) where XLA's twopass overlaps them
    across images; see PERFORMANCE.md. Kept as the correct fallback for
    shapes the unrolled body can't compile, not selected by "auto".)
    """
    B, Hs, Ws, C = images.shape
    Ho, Wo = out_hw
    for dim in (Hs, Ws, Ho, Wo):
        assert dim % 8 == 0, (Hs, Ws, Ho, Wo)
    while Hs % chunk or Wo % chunk:
        chunk //= 2
    assert chunk >= 8, (Hs, Wo)
    looped = (Hs // chunk + Wo // chunk) > 14

    Hi = H_mats if inverse else jnp.linalg.inv(H_mats)
    Hi = Hi / Hi[:, 2:3, 2:3]
    coefs = Hi.reshape(B, 9)[:, None, :8].astype(jnp.float32)

    imgT = jnp.transpose(images.astype(jnp.float32), (0, 1, 3, 2))

    if looped:
        kernel = functools.partial(_warp_kernel_looped, Hs=Hs, Ws=Ws,
                                   Ho=Ho, Wo=Wo, chunk=chunk)
        scratch = [pltpu.VMEM((Hs, C, Wo), jnp.float32),
                   pltpu.VMEM((Wo, C, Hs), jnp.float32)]
    else:
        kernel = functools.partial(_warp_kernel, Hs=Hs, Ws=Ws, Ho=Ho,
                                   Wo=Wo, chunk=chunk)
        scratch = [pltpu.VMEM((Wo, C, Hs), jnp.float32)]

    outT = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hs, C, Ws), lambda bb: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, Wo, C, Ho), lambda bb: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Wo, C, Ho), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * C * Hs * Ws * Wo,
            bytes_accessed=2 * B * Hs * Ws * C * 4,
            transcendentals=0,
        ),
    )(imgT, coefs)
    return jnp.transpose(outT, (0, 3, 1, 2))


def warp_axis_aligned_batch(images: jnp.ndarray, H_mats: jnp.ndarray,
                            out_hw: tuple[int, int],
                            inverse: bool = False,
                            precision=None) -> jnp.ndarray:
    """Batched warp specialised for AXIS-ALIGNED affine maps
    (H = [[sx,0,tx],[0,sy,ty],[0,0,1]]): the crop/resize transform of the
    deterministic eval pipeline (trans_from_patch; R == I so the rotation
    homography is identity, dataset.py:115).

    With no cross terms the inverse map is src_x = a·x' + c, src_y = e·y' + f
    — the horizontal resample weight is independent of the row and vice
    versa, so the per-image bilinear weight tensors collapse from
    (Hs, Ws, Wo)+(Wo, Hs, Ho) (the generic two-pass path, ~22M entries/image
    of VPU work) to (Ws, Wo)+(Hs, Ho) (~100k), and the whole batch is two
    plain MXU dot_generals. Off-diagonal entries of `H_mats` are IGNORED —
    callers must guarantee axis-alignment (asserted in tests, guaranteed by
    construction in pipeline.make_eval_batch).

    Numerically identical filter to single-pass bilinear (separable resampling
    is exact for axis-aligned maps), zero border outside the source.
    """
    B, Hs, Ws, C = images.shape
    Ho, Wo = out_hw
    on_tpu = any(dev.platform == "tpu" for dev in jax.devices())
    if precision is None:
        precision = (jax.lax.Precision.DEFAULT if on_tpu
                     else jax.lax.Precision.HIGHEST)
    Hi = H_mats if inverse else jnp.linalg.inv(H_mats)
    Hi = Hi / Hi[:, 2:3, 2:3]
    dt = jnp.promote_types(images.dtype, jnp.float32)
    a = Hi[:, 0, 0][:, None, None].astype(dt)
    c = Hi[:, 0, 2][:, None, None].astype(dt)
    e = Hi[:, 1, 1][:, None, None].astype(dt)
    f = Hi[:, 1, 2][:, None, None].astype(dt)

    wdt = (jnp.bfloat16 if precision == jax.lax.Precision.DEFAULT
           and dt == jnp.float32 else dt)
    xo = jnp.arange(Wo, dtype=dt)[None, None, :]
    xs = jnp.arange(Ws, dtype=dt)[None, :, None]
    Wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs - (a * xo + c))
                     ).astype(wdt)                    # (B, Ws, Wo)
    yo = jnp.arange(Ho, dtype=dt)[None, None, :]
    ys = jnp.arange(Hs, dtype=dt)[None, :, None]
    Wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys - (e * yo + f))
                     ).astype(wdt)                    # (B, Hs, Ho)

    img = images.astype(wdt)
    tmp = jnp.einsum("bjic,bio->bjoc", img, Wx,
                     precision=precision, preferred_element_type=dt)
    out = jnp.einsum("bjoc,bjy->byoc", tmp.astype(wdt), Wy,
                     precision=precision, preferred_element_type=dt)
    return out


def warp_perspective_batch(images: jnp.ndarray, H_mats: jnp.ndarray,
                           out_hw: tuple[int, int],
                           inverse: bool = False,
                           method: str = "auto",
                           precision=None,
                           chunk: int = 32) -> jnp.ndarray:
    """(B, H, W, C) x (B, 3, 3) -> (B, Ho, Wo, C).

    method: "pallas" (fastest generic path on TPU: weights never leave
    VMEM), "twopass" (XLA matmul formulation), "gather" (fast on CPU),
    "affine" (axis-aligned maps ONLY — see
    :func:`warp_axis_aligned_batch`; off-diagonals ignored), or "auto"
    (pallas on TPU for 8-aligned shapes, else twopass there; gather on CPU).
    precision: matmul precision of the twopass path. None = DEFAULT (bf16
    multiplies, fp32 accumulate — ~0.2% pixel error, 6x less MXU work) on
    TPU and HIGHEST elsewhere; pass an explicit jax.lax.Precision to pin.
    """
    on_tpu = any(dev.platform == "tpu" for dev in jax.devices())
    B, Hs, Ws, C = images.shape
    Ho, Wo = out_hw
    aligned = all(d % 8 == 0 for d in (Hs, Ws, Ho, Wo))
    # the kernel holds a (chunk, Ws, Wo) weight block, the (Wo, C, Hs)
    # intermediate and the in/out blocks in VMEM simultaneously. Shrinking
    # the chunk to fit bigger sources (480² teacher sweeps) was tried and
    # REVERTED: Hs/chunk = 60 unrolled weight-block iterations defeat
    # Mosaic's buffer reuse (59.8 MB scoped-vmem OOM at compile) — large
    # sources stay on the streaming twopass path.
    while Hs % chunk or Wo % chunk:
        chunk //= 2
    iters = Hs // chunk + Wo // chunk
    # "auto" only routes to the UNROLLED kernel body: past ~14 chunk
    # iterations its stacked scoped-vmem weight blocks OOM (measured:
    # 36 iters = 25.4 MB, 60 iters = 59.8 MB vs 16 MB), and the looped
    # fallback body — while it compiles at any size — measured SLOWER
    # than the streaming twopass at the 320² factored-teacher shape
    # (14.2-17.2 vs 10.0 ms / 168 warps; PERFORMANCE.md). Forcing
    # method="pallas" still reaches the looped body for iters > 14.
    vmem_est = 4 * (chunk * Ws * Wo + Wo * C * Hs
                    + 2 * Hs * C * Ws + 2 * Wo * C * Ho)
    fits = (vmem_est < 11 * 1024 * 1024 and chunk >= 8 and iters <= 14)
    if method == "auto":
        method = ("pallas" if on_tpu and aligned and fits
                  else "twopass" if on_tpu else "gather")
    if precision is None:
        precision = (jax.lax.Precision.DEFAULT if on_tpu
                     else jax.lax.Precision.HIGHEST)
    if method == "affine":
        return warp_axis_aligned_batch(images, H_mats, out_hw, inverse,
                                       precision)
    if method == "pallas":
        return warp_perspective_pallas(images, H_mats, out_hw, inverse,
                                       interpret=not on_tpu, chunk=chunk)
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
