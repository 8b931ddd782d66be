"""Fused softmax-integral (soft-argmax) 3D heatmap decode.

The framework's hottest non-conv op and the north-star fusion target: the
behavioural equivalent of the reference's `softmax_integral_tensor`
(common/nets/loss.py:46-59) — softmax over the whole D*H*W volume per joint,
then per-axis expectations — redesigned for TPU:

  * heatmaps live in NHWC `(B, H, W, J*D)` (channel = j*depth + d), the native
    layout of the deconv head's 1x1 conv, so no transpose is ever needed;
  * `impl="xla"` is a fused reshape-free XLA formulation (~2 HBM passes);
  * `impl="pallas"` is a single-pass Pallas kernel: online-softmax running
    (max, sum, weighted-sum) accumulators over spatial tiles, with per-joint
    segmented reductions done as one `(TILE, J*D) @ (J*D, 2J)` mask matmul on
    the MXU. It reads the heatmap from HBM exactly once.
  * the backward is a closed-form elementwise pass (custom VJP):
    dL/dh = p * sum_a cot_a * (g_a - c_a), with p recomputed from saved
    per-joint (max, sumexp) — no 56^3 probability volume is ever stored.

Outputs match the reference contract: coords in [-0.5, 0.5] as
(x/W - 0.5, y/H - 0.5, z/D - 0.5), shape (B, J, 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _segment_masks(num_joints: int, depth: int, dtype=jnp.float32):
    """(J*D, 2J) matrix: first J columns sum each joint's channel segment,
    last J columns compute the z-index-weighted sum (for E[z])."""
    c = jnp.arange(num_joints * depth)
    j_of_c = c // depth
    d_of_c = (c % depth).astype(dtype)
    ones = (j_of_c[:, None] == jnp.arange(num_joints)[None, :]).astype(dtype)
    return jnp.concatenate([ones, ones * d_of_c[:, None]], axis=1)


# ---------------------------------------------------------------------------
# XLA implementation (reference formulation, fused by the compiler)
# ---------------------------------------------------------------------------


def _softmax_integral_xla(heatmap_nhwc, num_joints, depth):
    B, H, W, C = heatmap_nhwc.shape
    assert C == num_joints * depth, (C, num_joints, depth)
    # free reshape: split the minor channel dim into (J, D);
    # accumulate in >= fp32 (fp64 stays fp64 for CPU parity tests)
    acc_dt = jnp.promote_types(heatmap_nhwc.dtype, jnp.float32)
    h = heatmap_nhwc.reshape(B, H, W, num_joints, depth).astype(acc_dt)
    m = jnp.max(h, axis=(1, 2, 4), keepdims=True)
    e = jnp.exp(h - m)
    s = jnp.sum(e, axis=(1, 2, 4))                            # (B, J)
    ez = jnp.sum(e * jnp.arange(depth, dtype=acc_dt), axis=(1, 2, 4))
    ex = jnp.sum(e * jnp.arange(W, dtype=acc_dt)[None, None, :, None, None],
                 axis=(1, 2, 4))
    ey = jnp.sum(e * jnp.arange(H, dtype=acc_dt)[None, :, None, None, None],
                 axis=(1, 2, 4))
    coords = jnp.stack(
        [ex / s / W - 0.5, ey / s / H - 0.5, ez / s / float(depth) - 0.5],
        axis=-1,
    )
    return coords, m.reshape(B, num_joints), s


# ---------------------------------------------------------------------------
# Pallas single-pass kernel
# ---------------------------------------------------------------------------


def _integral_kernel(hm_ref, mask_ref, out_ref, m_out_ref, s_out_ref,
                     acc_ref, *, num_joints, depth, height, width, tile):
    """Grid (B, HW/tile). For a fixed batch row, spatial tiles execute
    sequentially (TPU grid order). The hot loop keeps *per-channel*
    online-softmax statistics in VMEM scratch `acc_ref` (rows: running
    channel max, sum, x-weighted sum, y-weighted sum) — exact, broadcast-free
    updates. The per-joint segmented combine (a tiny (1,J*D)->(1,J) mask
    matmul) runs once per batch row in the epilogue."""
    t = pl.program_id(1)
    num_tiles = pl.num_programs(1)
    J = num_joints
    C = J * depth

    @pl.when(t == 0)
    def _init():
        acc_ref[0, :] = jnp.full((C,), -jnp.inf, jnp.float32)   # channel max
        acc_ref[1:4, :] = jnp.zeros((3, C), jnp.float32)

    x = hm_ref[0].astype(jnp.float32)                           # (tile, C)

    cmax = jnp.max(x, axis=0, keepdims=True)                    # (1, C)
    e = jnp.exp(x - cmax)                                       # (tile, C)

    # spatial reduction: rows of L are [1, x(hw), y(hw)] -> (3, C) partials
    hw = (t * tile
          + jax.lax.broadcasted_iota(jnp.int32, (3, tile), 1))
    row = jax.lax.broadcasted_iota(jnp.int32, (3, tile), 0)
    L = jnp.where(
        row == 0, 1.0,
        jnp.where(row == 1, (hw % width).astype(jnp.float32),
                  (hw // width).astype(jnp.float32)))
    part = jax.lax.dot(L, e, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)      # (3, C)

    # per-channel online rescale
    m_run = acc_ref[0, :][None, :]
    m_new = jnp.maximum(m_run, cmax)
    scale_old = jnp.exp(m_run - m_new)[0]
    scale_new = jnp.exp(cmax - m_new)[0]
    acc_ref[0, :] = m_new[0]
    acc_ref[1, :] = acc_ref[1, :] * scale_old + part[0] * scale_new
    acc_ref[2, :] = acc_ref[2, :] * scale_old + part[1] * scale_new
    acc_ref[3, :] = acc_ref[3, :] * scale_old + part[2] * scale_new

    @pl.when(t == num_tiles - 1)
    def _finalize():
        M_c = acc_ref[0, :][None, :]                            # (1, C)
        # per-joint max: 21 tiny segment maxes of a single row
        mj = jnp.concatenate(
            [jnp.max(M_c[:, j * depth:(j + 1) * depth], axis=1, keepdims=True)
             for j in range(J)], axis=1)                        # (1, J)
        maxvec = jnp.dot(mj, mask_ref[:, :J].T,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)   # (1, C)
        w = jnp.exp(M_c - maxvec)                               # (1, C)
        s_c = acc_ref[1, :][None, :] * w
        sx_c = acc_ref[2, :][None, :] * w
        sy_c = acc_ref[3, :][None, :] * w
        # z expectation: z-index is a pure function of the channel
        packed = jnp.concatenate([s_c, sx_c, sy_c, s_c], axis=0)  # (4, C)
        # columns of mask: [ones | z-weighted]; use ones for rows 0-2, z for 3
        red = jnp.dot(packed, mask_ref[:],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)      # (4, 2J)
        s = red[0, :J]
        ex = red[1, :J]
        ey = red[2, :J]
        ez = red[3, J:]
        out_ref[0, :, 0] = ex / s / width - 0.5
        out_ref[0, :, 1] = ey / s / height - 0.5
        out_ref[0, :, 2] = ez / s / depth - 0.5
        m_out_ref[0, 0, :] = mj[0]
        s_out_ref[0, 0, :] = s


def _pick_tile(hw: int, max_tile: int = 1024) -> int:
    # candidates are sublane-aligned (multiples of 8, Mosaic block rule)
    for tile in (1024, 784, 512, 448, 392, 256, 224, 128, 112, 64, 56,
                 32, 16, 8):
        if tile <= max_tile and hw % tile == 0 and tile <= hw:
            return tile
    return hw


def _softmax_integral_pallas(heatmap_nhwc, num_joints, depth,
                             interpret: bool = False):
    B, H, W, C = heatmap_nhwc.shape
    assert C == num_joints * depth, (C, num_joints, depth)
    HW = H * W
    tile = _pick_tile(HW)
    hm = heatmap_nhwc.reshape(B, HW, C)          # free reshape
    masks = _segment_masks(num_joints, depth)

    kernel = functools.partial(
        _integral_kernel, num_joints=num_joints, depth=depth,
        height=H, width=W, tile=tile,
    )
    grid = (B, HW // tile)
    out_shape = (
        jax.ShapeDtypeStruct((B, num_joints, 3), jnp.float32),
        jax.ShapeDtypeStruct((B, 1, num_joints), jnp.float32),
        jax.ShapeDtypeStruct((B, 1, num_joints), jnp.float32),
    )
    coords, m, s = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 2 * num_joints), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, num_joints, 3), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, num_joints), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, num_joints), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((8, C), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * HW * C * (2 * num_joints),
            bytes_accessed=B * HW * C * heatmap_nhwc.dtype.itemsize,
            transcendentals=B * HW * C,
        ),
    )(hm, masks)
    return coords, m[:, 0, :], s[:, 0, :]


# ---------------------------------------------------------------------------
# custom VJP wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _softmax_integral(heatmap_nhwc, num_joints, depth, impl, interpret):
    coords, _, _ = _forward(heatmap_nhwc, num_joints, depth, impl, interpret)
    return coords


def _forward(heatmap_nhwc, num_joints, depth, impl, interpret):
    if impl == "pallas":
        return _softmax_integral_pallas(heatmap_nhwc, num_joints, depth,
                                        interpret=interpret)
    return _softmax_integral_xla(heatmap_nhwc, num_joints, depth)


def _fwd(heatmap_nhwc, num_joints, depth, impl, interpret):
    coords, m, s = _forward(heatmap_nhwc, num_joints, depth, impl, interpret)
    return coords, (heatmap_nhwc, m, s, coords)


def _integral_bwd_kernel(hm_ref, mvec_ref, t_ref, a_ref, b_ref, out_ref,
                         *, width, tile):
    """One-pass backward: grad[hw, c] = exp(h - m_c) * (T_c + A_c*gx(hw)
    + B_c*gy(hw)) with all per-channel constants folded in upstream."""
    t = pl.program_id(1)
    x = hm_ref[0].astype(jnp.float32)                           # (tile, C)
    hw = (t * tile
          + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0))
    col = (hw % width).astype(jnp.float32)      # raw units; scales live in A/B
    row = (hw // width).astype(jnp.float32)
    e = jnp.exp(x - mvec_ref[0, 0][None, :])
    out_ref[0] = (e * (t_ref[0, 0][None, :]
                       + a_ref[0, 0][None, :] * col
                       + b_ref[0, 0][None, :] * row)).astype(out_ref.dtype)


def _softmax_integral_bwd_pallas(heatmap_nhwc, m, s, coords, cot,
                                 num_joints, depth, interpret=False):
    """Pallas single-pass VJP. Per-channel constants (tiny, XLA):
    with j = c // depth, d = c % depth and gy in raw row units (scaled into
    A/B/T), grad = p * sum_a cot_a (g_a - c_a) expands to
    exp(h - m_j)/s_j * [cotx*(gx - cx) + coty*(gy/H - 0.5 - cy)
    + cotz*(gz_c - cz)]."""
    B, H, W, C = heatmap_nhwc.shape
    J = num_joints
    jidx = jnp.arange(C) // depth                               # (C,)
    gz = (jnp.arange(C) % depth).astype(jnp.float32) / depth - 0.5
    mvec = m[:, jidx]                                           # (B, C)
    svec = s[:, jidx]
    cotx = cot[..., 0][:, jidx]
    coty = cot[..., 1][:, jidx]
    cotz = cot[..., 2][:, jidx]
    cx = coords[..., 0][:, jidx]
    cy = coords[..., 1][:, jidx]
    cz = coords[..., 2][:, jidx]
    T = (cotx * (-0.5 - cx) + coty * (-0.5 - cy)
         + cotz * (gz[None, :] - cz)) / svec
    A = cotx / (svec * W)
    Bc = coty / (svec * H)

    HW = H * W
    # smaller tile than the forward: the bwd block carries input + output +
    # the exp intermediate in VMEM simultaneously
    tile = _pick_tile(HW, max_tile=392)
    hm = heatmap_nhwc.reshape(B, HW, C)
    # per-channel constants as (B, 1, C) so the last two block dims match
    # the array dims (Mosaic block constraint)
    mvec, T, A, Bc = (v[:, None, :] for v in (mvec, T, A, Bc))
    kernel = functools.partial(_integral_bwd_kernel, width=W, tile=tile)
    vec_spec = pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    grad = pl.pallas_call(
        kernel,
        grid=(B, HW // tile),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            vec_spec, vec_spec, vec_spec, vec_spec,
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HW, C), heatmap_nhwc.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * B * HW * C,
            bytes_accessed=2 * B * HW * C * heatmap_nhwc.dtype.itemsize,
            transcendentals=B * HW * C,
        ),
    )(hm, mvec, T, A, Bc)
    return grad.reshape(B, H, W, C)


def _bwd(num_joints, depth, impl, interpret, res, cot):
    """Closed-form soft-argmax Jacobian: with p = softmax(h) and
    c_a = sum_i p_i g_ai (g in units of normalised coords),
    dL/dh_i = p_i * sum_a cot_a (g_ai - c_a). One fused elementwise pass
    (single-pass Pallas kernel on the pallas path)."""
    heatmap_nhwc, m, s, coords = res
    if impl == "pallas":
        grad = _softmax_integral_bwd_pallas(
            heatmap_nhwc, m, s, coords, cot, num_joints, depth,
            interpret=interpret)
        return (grad,)
    B, H, W, C = heatmap_nhwc.shape
    acc_dt = jnp.promote_types(heatmap_nhwc.dtype, jnp.float32)
    h = heatmap_nhwc.reshape(B, H, W, num_joints, depth).astype(acc_dt)
    m = m.astype(acc_dt)
    s = s.astype(acc_dt)
    coords = coords.astype(acc_dt)
    cot = cot.astype(acc_dt)
    p = jnp.exp(h - m[:, None, None, :, None]) / s[:, None, None, :, None]
    gx = (jnp.arange(W, dtype=acc_dt) / W - 0.5)[None, None, :, None, None]
    gy = (jnp.arange(H, dtype=acc_dt) / H - 0.5)[None, :, None, None, None]
    gz = (jnp.arange(depth, dtype=acc_dt) / depth - 0.5)
    cx = coords[:, None, None, :, 0, None]
    cy = coords[:, None, None, :, 1, None]
    cz = coords[:, None, None, :, 2, None]
    common = (cot[:, None, None, :, 0, None] * (gx - cx)
              + cot[:, None, None, :, 1, None] * (gy - cy)
              + cot[:, None, None, :, 2, None] * (gz - cz))
    grad = (p * common).reshape(B, H, W, C).astype(heatmap_nhwc.dtype)
    return (grad,)


_softmax_integral.defvjp(_fwd, _bwd)


def softmax_integral(heatmap_nhwc: jnp.ndarray, num_joints: int,
                     depth: int, impl: str = "auto",
                     interpret: bool = False) -> jnp.ndarray:
    """Soft-argmax decode of an NHWC 3D heatmap stack.

    Args:
        heatmap_nhwc: (B, H, W, J*depth) logits, channel = j*depth + d.
        num_joints: J.
        depth: heatmap depth resolution D.
        impl: "pallas" (fused single-pass kernel), "xla", or "auto"
            (pallas on TPU, xla elsewhere).
        interpret: run the Pallas kernel in interpreter mode (CPU testing).

    Returns:
        (B, J, 3) coords in the reference's normalised patch units:
        (x/W - 0.5, y/H - 0.5, z/D - 0.5)  [loss.py:54-56].
    """
    if impl == "auto":
        on_tpu = any(d.platform == "tpu" for d in jax.devices())
        impl = "pallas" if on_tpu else "xla"
    return _softmax_integral(heatmap_nhwc, num_joints, depth, impl, interpret)


def softmax_integral_flat(heatmap_nhwc, num_joints, depth, **kw):
    """(B, J*3) flattened variant matching the reference's return shape
    (loss.py:58)."""
    c = softmax_integral(heatmap_nhwc, num_joints, depth, **kw)
    return c.reshape(c.shape[0], num_joints * 3)


def softmax_probs(heatmap_nhwc: jnp.ndarray, num_joints: int,
                  depth: int) -> jnp.ndarray:
    """Per-joint softmax distributions over the full volume, (B, J, D*H*W).

    Equivalent of reference `softmax_integral_tensor2` (loss.py:61-67), used
    by the entropy/correlation analysis. Note the reference's volume is
    (D, H, W)-ordered; ours is (H, W, D)-ordered — use `heatmap_entropy` and
    friends for order-independent statistics.
    """
    B, H, W, C = heatmap_nhwc.shape
    h = heatmap_nhwc.reshape(B, H * W, num_joints, depth)
    h = h.astype(jnp.float32)
    m = jnp.max(h, axis=(1, 3), keepdims=True)
    e = jnp.exp(h - m)
    s = jnp.sum(e, axis=(1, 3), keepdims=True)
    p = e / s
    return jnp.moveaxis(p, 2, 1).reshape(B, num_joints, H * W * depth)


def heatmap_entropy(heatmap_nhwc: jnp.ndarray, num_joints: int,
                    depth: int) -> jnp.ndarray:
    """Per-joint entropy of the softmax volume, (B, J) — the confidence
    signal of the reference's correlation analysis
    (main/generate_correlation_graph.py:96-160). Computed in closed form
    from logits: H = log(sum e) + m_shift - sum(e*h)/sum(e), no probability
    volume materialised."""
    B, H, W, C = heatmap_nhwc.shape
    h = heatmap_nhwc.reshape(B, H * W, num_joints, depth).astype(jnp.float32)
    m = jnp.max(h, axis=(1, 3), keepdims=True)
    e = jnp.exp(h - m)
    s = jnp.sum(e, axis=(1, 3))
    weighted = jnp.sum(e * (h - m), axis=(1, 3))
    return jnp.log(s) - weighted / s
