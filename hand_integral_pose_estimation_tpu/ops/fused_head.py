"""Fused heatmap-projection + soft-argmax: the final 1x1 conv and the
integral decode as ONE Pallas kernel.

The pose head ends in a 1x1 conv producing the (B, 56, 56, 21*56) heatmap
(main/model.py:14-20) which the integral op immediately reduces to (B, 21, 3)
coords (common/nets/loss.py:46-59). Composed naively, the ~0.5 GB heatmap
round-trips HBM between the two ops. Here the projection matmul runs
per-spatial-tile on the MXU and its output feeds the online-softmax integral
statistics directly in VMEM — the heatmap never exists in HBM, forward or
backward.

Backward (custom VJP) recomputes each heatmap tile, forms the closed-form
soft-argmax gradient in VMEM, and contracts it immediately:
    dfeat = g_hm @ W^T           (per tile)
    dW   += feat^T @ g_hm        (VMEM accumulator across the whole grid)
    db   += sum_rows(g_hm)
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hand_integral_pose_estimation_tpu.ops.integral import (
    _pick_tile,
    _segment_masks,
    softmax_integral,
)

# BWD recompute tile cap. 256 -> tile 224 at 56x56; measured vs 512
# (tile 448) on TPU — see PERFORMANCE.md "fused-head BWD tile sweep".
_BWD_MAX_TILE = int(os.environ.get("HIPE_FUSED_BWD_MAX_TILE", "256"))


def _fwd_kernel(feat_ref, w_ref, b_ref, mask_ref, out_ref, m_out_ref,
                s_out_ref, acc_ref, *, num_joints, depth, height, width,
                tile):
    """Grid (B, HW/tile); same online per-channel statistics as
    integral._integral_kernel, with the heatmap tile produced on the fly."""
    t = pl.program_id(1)
    num_tiles = pl.num_programs(1)
    J = num_joints
    C = J * depth

    @pl.when(t == 0)
    def _init():
        acc_ref[0, :] = jnp.full((C,), -jnp.inf, jnp.float32)
        acc_ref[1:4, :] = jnp.zeros((3, C), jnp.float32)

    feat = feat_ref[0]                                          # (tile, F)
    x = jnp.dot(feat, w_ref[:], preferred_element_type=jnp.float32)
    x = x + b_ref[0, 0][None, :]                                # (tile, C)

    cmax = jnp.max(x, axis=0, keepdims=True)
    e = jnp.exp(x - cmax)

    hw = (t * tile
          + jax.lax.broadcasted_iota(jnp.int32, (3, tile), 1))
    row = jax.lax.broadcasted_iota(jnp.int32, (3, tile), 0)
    L = jnp.where(
        row == 0, 1.0,
        jnp.where(row == 1, (hw % width).astype(jnp.float32),
                  (hw // width).astype(jnp.float32)))
    part = jax.lax.dot(L, e, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)      # (3, C)

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
        M_c = acc_ref[0, :][None, :]
        mj = jnp.concatenate(
            [jnp.max(M_c[:, j * depth:(j + 1) * depth], axis=1,
                     keepdims=True) for j in range(J)], axis=1)
        maxvec = jnp.dot(mj, mask_ref[:, :J].T,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        w = jnp.exp(M_c - maxvec)
        s_c = acc_ref[1, :][None, :] * w
        sx_c = acc_ref[2, :][None, :] * w
        sy_c = acc_ref[3, :][None, :] * w
        packed = jnp.concatenate([s_c, sx_c, sy_c, s_c], axis=0)
        red = jnp.dot(packed, mask_ref[:],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        s = red[0, :J]
        out_ref[0, :, 0] = red[1, :J] / s / width - 0.5
        out_ref[0, :, 1] = red[2, :J] / s / height - 0.5
        out_ref[0, :, 2] = red[3, J:] / s / depth - 0.5
        m_out_ref[0, 0, :] = mj[0]
        s_out_ref[0, 0, :] = s


def _bwd_kernel(feat_ref, w_ref, b_ref, mvec_ref, t_ref, a_ref, bc_ref,
                dfeat_ref, dw_ref, db_ref, *, width, tile):
    """Recompute the heatmap tile, form the soft-argmax cotangent, contract
    into dfeat (per tile) and accumulate dW/db in the output refs (the grid
    runs sequentially on one core, so out-ref accumulation is safe)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    is_first = (b == 0) & (t == 0)

    @pl.when(is_first)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    feat = feat_ref[0]                                          # (tile, F)
    x = jnp.dot(feat, w_ref[:], preferred_element_type=jnp.float32)
    x = x + b_ref[0, 0][None, :]

    hw = (t * tile
          + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0))
    col = (hw % width).astype(jnp.float32)
    row = (hw // width).astype(jnp.float32)
    e = jnp.exp(x - mvec_ref[0, 0][None, :])
    g_hm = e * (t_ref[0, 0][None, :]
                + a_ref[0, 0][None, :] * col
                + bc_ref[0, 0][None, :] * row)                  # (tile, C)

    g16 = g_hm.astype(w_ref.dtype)
    dfeat_ref[0] = jnp.dot(g16, w_ref[:].T,
                           preferred_element_type=jnp.float32
                           ).astype(dfeat_ref.dtype)
    dw_ref[:] += jnp.dot(feat.T, g16,
                         preferred_element_type=jnp.float32)
    db_ref[0, :] += jnp.sum(g_hm, axis=0)


def _forward_pallas(feats, W, b, num_joints, depth, interpret):
    B, H, Wd, F = feats.shape
    C = num_joints * depth
    assert W.shape == (F, C) and b.shape == (C,)
    HW = H * Wd
    tile = _pick_tile(HW, max_tile=512)
    f2 = feats.reshape(B, HW, F)
    masks = _segment_masks(num_joints, depth)
    kernel = functools.partial(
        _fwd_kernel, num_joints=num_joints, depth=depth, height=H,
        width=Wd, tile=tile)
    coords, m, s = pl.pallas_call(
        kernel,
        grid=(B, HW // tile),
        in_specs=[
            pl.BlockSpec((1, tile, F), lambda bb, tt: (bb, tt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, C), lambda bb, tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda bb, tt: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 2 * num_joints), lambda bb, tt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, num_joints, 3), lambda bb, tt: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, num_joints), lambda bb, tt: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, num_joints), lambda bb, tt: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, num_joints, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, num_joints), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, num_joints), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((8, C), jnp.float32)],
        interpret=interpret,
    )(f2, W, b[None, None, :], masks)
    return coords, m[:, 0, :], s[:, 0, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def head_projection_integral(feats, W, b, num_joints, depth, impl="auto",
                             interpret=False):
    """(B, H, W, F) features x (F, J*D) projection -> (B, J, 3) coords.

    Numerically equal to `conv1x1(feats, W, b)` followed by
    `softmax_integral` (verified in tests); the heatmap is never materialised
    outside VMEM on the pallas path.
    """
    coords, _, _ = _hp_fwd_dispatch(feats, W, b, num_joints, depth, impl,
                                    interpret)
    return coords


def _resolve_impl(impl):
    if impl == "auto":
        on_tpu = any(d.platform == "tpu" for d in jax.devices())
        return "pallas" if on_tpu else "xla"
    return impl


def _hp_fwd_dispatch(feats, W, b, num_joints, depth, impl, interpret):
    impl = _resolve_impl(impl)
    if impl == "pallas":
        return _forward_pallas(feats, W, b, num_joints, depth, interpret)
    hm = jnp.einsum("bhwf,fc->bhwc", feats, W) + b
    from hand_integral_pose_estimation_tpu.ops.integral import (
        _softmax_integral_xla,
    )
    return _softmax_integral_xla(hm, num_joints, depth)


def _hp_fwd(feats, W, b, num_joints, depth, impl, interpret):
    coords, m, s = _hp_fwd_dispatch(feats, W, b, num_joints, depth, impl,
                                    interpret)
    return coords, (feats, W, b, m, s, coords)


def _hp_bwd(num_joints, depth, impl, interpret, res, cot):
    feats, W, b, m, s, coords = res
    impl_r = _resolve_impl(impl)
    B, H, Wd, F = feats.shape
    C = num_joints * depth
    # per-channel constants (see integral._softmax_integral_bwd_pallas)
    jidx = jnp.arange(C) // depth
    gz = (jnp.arange(C) % depth).astype(jnp.float32) / depth - 0.5
    svec = s[:, jidx]
    cotx = cot[..., 0][:, jidx]
    coty = cot[..., 1][:, jidx]
    cotz = cot[..., 2][:, jidx]
    T = (cotx * (-0.5 - coords[..., 0][:, jidx])
         + coty * (-0.5 - coords[..., 1][:, jidx])
         + cotz * (gz[None, :] - coords[..., 2][:, jidx])) / svec
    A = cotx / (svec * Wd)
    Bc = coty / (svec * H)
    mvec = m[:, jidx]

    if impl_r != "pallas":
        hm = jnp.einsum("bhwf,fc->bhwc", feats, W) + b
        h2 = hm.reshape(B, H * Wd, C).astype(jnp.float32)
        hwi = jnp.arange(H * Wd)
        colv = (hwi % Wd).astype(jnp.float32)[None, :, None]
        rowv = (hwi // Wd).astype(jnp.float32)[None, :, None]
        g_hm = (jnp.exp(h2 - mvec[:, None, :])
                * (T[:, None, :] + A[:, None, :] * colv
                   + Bc[:, None, :] * rowv))
        dfeat = jnp.einsum("bsc,fc->bsf", g_hm, W).reshape(feats.shape)
        dW = jnp.einsum("bsf,bsc->fc", feats.reshape(B, -1, F), g_hm)
        db = g_hm.sum(axis=(0, 1))
        return (dfeat.astype(feats.dtype), dW.astype(W.dtype),
                db.astype(b.dtype))

    HW = H * Wd
    tile = _pick_tile(HW, max_tile=_BWD_MAX_TILE)
    f2 = feats.reshape(B, HW, F)
    vec = lambda v: v[:, None, :]
    kernel = functools.partial(_bwd_kernel, width=Wd, tile=tile)
    vec_spec = pl.BlockSpec((1, 1, C), lambda bb, tt: (bb, 0, 0),
                            memory_space=pltpu.VMEM)
    dfeat, dW, db = pl.pallas_call(
        kernel,
        grid=(B, HW // tile),
        in_specs=[
            pl.BlockSpec((1, tile, F), lambda bb, tt: (bb, tt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, C), lambda bb, tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda bb, tt: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec_spec, vec_spec, vec_spec, vec_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, tile, F), lambda bb, tt: (bb, tt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, C), lambda bb, tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda bb, tt: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, HW, F), feats.dtype),
            jax.ShapeDtypeStruct((F, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        interpret=interpret,
    )(f2, W, b[None, None, :], vec(mvec), vec(T), vec(A), vec(Bc))
    return (dfeat.reshape(feats.shape), dW.astype(W.dtype),
            db[0].astype(b.dtype))


head_projection_integral.defvjp(_hp_fwd, _hp_bwd)
