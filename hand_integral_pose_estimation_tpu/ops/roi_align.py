"""ROIAlign / ROIPool as gather-free TPU ops.

Replaces the reference's CUDA kernels (lib/model_rcnn/csrc/cuda/
ROIAlign_cuda.cu:15-345, ROIPool_cuda.cu) — same contract: 7x7 bins over a
stride-16 feature map, bilinear sampling, average (align) or max (pool)
pooling. The backward is free via autodiff (the CUDA atomic-add backward has
no equivalent here).

TPU design: an ROI crop is an axis-aligned affine resample, so bilinear
sampling is SEPARABLE — each ROI reduces to two small dense-weight matmuls
(rows then columns) on the MXU, vmapped over ROIs. No gathers (XLA gathers
are the slow path on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _linear_weights(centers: jnp.ndarray, size: int) -> jnp.ndarray:
    """(S,) float sample centres -> (S, size) bilinear weight rows.

    Matches the CUDA kernel's border handling (ROIAlign_cuda.cu:15-60):
    samples below -1 or beyond `size` contribute zero; otherwise the
    coordinate is clamped into [0, size-1] and bilinearly split.
    """
    inside = (centers >= -1.0) & (centers <= size)
    c = jnp.clip(centers, 0.0, size - 1.0)
    grid = jnp.arange(size, dtype=centers.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(c[:, None] - grid[None, :]))
    # exact-integer coordinates hit one tap with weight 1 (|d|=0)
    return w * inside[:, None].astype(centers.dtype)


def _roi_sample_grid(roi, pooled: int, sampling_ratio: int,
                     spatial_scale: float, size: int, axis: int):
    """Per-axis sample centres for one ROI: `pooled * sampling_ratio` points,
    `sampling_ratio` evenly placed per bin (ROIAlign_cuda.cu:76-107)."""
    lo = roi[axis] * spatial_scale
    hi = roi[axis + 2] * spatial_scale
    length = jnp.maximum(hi - lo, 1.0)
    bin_size = length / pooled
    S = pooled * sampling_ratio
    i = jnp.arange(S, dtype=roi.dtype)
    bin_idx = i // sampling_ratio
    within = i % sampling_ratio
    centers = lo + bin_idx * bin_size + (within + 0.5) * (bin_size
                                                          / sampling_ratio)
    return centers


def roi_align(features: jnp.ndarray, rois: jnp.ndarray,
              pooled_size: int = 7, spatial_scale: float = 1.0 / 16.0,
              sampling_ratio: int = 2) -> jnp.ndarray:
    """ROIAlign over a single feature map.

    Args:
        features: (H, W, C).
        rois: (R, 4) xyxy in image coordinates.
        sampling_ratio: samples per bin per axis (the reference passes 0 =
            adaptive ceil(roi/pooled); a fixed ratio keeps shapes static —
            the standard TPU/static-graph tradeoff, numerically equivalent
            for ROIs near the usual size).

    Returns:
        (R, pooled, pooled, C).
    """
    H, W, C = features.shape
    S = pooled_size * sampling_ratio

    def one(roi):
        cy = _roi_sample_grid(roi, pooled_size, sampling_ratio,
                              spatial_scale, H, 1)
        cx = _roi_sample_grid(roi, pooled_size, sampling_ratio,
                              spatial_scale, W, 0)
        Wy = _linear_weights(cy, H)                       # (S, H)
        Wx = _linear_weights(cx, W)                       # (S, W)
        tmp = jnp.einsum("sh,hwc->swc", Wy, features)     # rows
        samp = jnp.einsum("tw,swc->stc", Wx, tmp)         # cols -> (S, S, C)
        # average the sampling_ratio^2 samples per bin (align mode)
        samp = samp.reshape(pooled_size, sampling_ratio,
                            pooled_size, sampling_ratio, C)
        return samp.mean(axis=(1, 3))

    return jax.vmap(one)(rois)


def _ra_kernel(rois_ref, f_hbm, o_ref, f_vmem, dma_sem, *, pooled, sr,
               Hf, Wf, HWp, scale, G):
    """Grouped combined-weight ROIAlign: ONE full-width MXU matmul per G
    rois, everything resident in VMEM.

    For each output bin (p, q) the pooled value is a linear functional of
    the feature map: out[p,q,c] = sum_{h,w} wy(p,h)·wx(q,w)·F[h,w,c], where
    wy/wx are the sr-sample-per-bin MEANS of the CUDA-contract bilinear
    weights (averaging folds into the weights by linearity). Stacking G rois
    x pooled^2 bins as rows of a combined weight matrix
    W2[g·P²+p·P+q, h·Wf+w] built ELEMENTWISE from 2D iotas (no reshapes —
    Mosaic relayouts are the enemy) gives a single
    (G·P², Hf·Wf) @ (Hf·Wf, C) contraction with M in the hundreds — full
    128x128 MXU utilisation. Design history measured on v5e (batch 4, 300
    rois, 38x38x1024, vs 10.7 ms for the XLA vmap path): per-roi M=8
    two-pass matmuls 11.8 ms (6 % MXU rows); this formulation ~1 ms.

    The flattened feature map stays in HBM (ANY space) and is DMA'd into
    VMEM scratch once per image at t == 0 — a block-spec input would be
    re-fetched every grid step.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    P2 = pooled * pooled
    M = G * P2
    Mpad = -(-M // 8) * 8

    @pl.when(t == 0)
    def _load_features():
        cp = pltpu.make_async_copy(f_hbm.at[b], f_vmem, dma_sem)
        cp.start()
        cp.wait()

    row = jax.lax.broadcasted_iota(jnp.int32, (Mpad, HWp), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Mpad, HWp), 1)
    g = row // P2
    pq = row % P2
    p = (pq // pooled).astype(jnp.float32)
    q = (pq % pooled).astype(jnp.float32)
    h = (lane // Wf).astype(jnp.float32)
    w = (lane % Wf).astype(jnp.float32)

    def coord(k):
        # roi coordinate k for each row's group, gathered from SMEM scalars
        v = jnp.zeros((Mpad, HWp), jnp.float32)
        for gi in range(G):
            s = rois_ref[0, t * G + gi, k] * scale
            v = jnp.where(g == gi, s, v)
        return v

    x1, y1, x2, y2 = coord(0), coord(1), coord(2), coord(3)

    def bin_w(lo, hi, bin_idx, grid_pos, size):
        # mean over the sr sample points of the bin's bilinear weights;
        # clipped centres are <= size-1, so tile-padding columns (grid_pos
        # derived from lanes >= Hf*Wf) weight to zero against zero-padded
        # feature rows anyway
        length = jnp.maximum(hi - lo, 1.0)
        bsz = length / pooled
        acc = jnp.zeros_like(grid_pos)
        for k in range(sr):
            c = lo + bin_idx * bsz + (k + 0.5) * (bsz / sr)
            inside = (c >= -1.0) & (c <= size)
            cc = jnp.clip(c, 0.0, size - 1.0)
            acc += jnp.maximum(0.0, 1.0 - jnp.abs(cc - grid_pos)) * inside
        return acc / sr

    W2 = (bin_w(y1, y2, p, h, Hf) * bin_w(x1, x2, q, w, Wf)
          * (row < M) * (lane < Hf * Wf))

    res = jnp.dot(W2, f_vmem[:],
                  preferred_element_type=jnp.float32)       # (Mpad, C)
    for gi in range(G):
        for pi in range(pooled):
            start = gi * P2 + pi * pooled
            o_ref[0, gi, pi] = res[start:start + pooled]


def roi_align_batched(features: jnp.ndarray, rois: jnp.ndarray,
                      pooled_size: int = 7,
                      spatial_scale: float = 1.0 / 16.0,
                      sampling_ratio: int = 2,
                      impl: str = "auto",
                      interpret: bool = False) -> jnp.ndarray:
    """(B, H, W, C) x (B, R, 4) -> (B, R, P, P, C).

    impl="pallas": the VMEM-resident grouped kernel above. The XLA vmap
    path materialises a (R, S, W, C) row-resampled intermediate per image
    (~650 MB at R101-C4 scale) and is HBM-bound — measured 10.7 ms vs ~1 ms
    for the kernel on v5e (batch 4, 300 rois, 38x38x1024). "auto" = pallas
    on TPU when C is lane-aligned and the feature map fits VMEM, else the
    vmap path. MXU operands round to bf16 (DEFAULT precision — same as the
    XLA path's own TPU einsum lowering; ~4e-3 relative).
    """
    B, H, W, C = features.shape
    R = rois.shape[1]
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    HW = H * W
    HWp = -(-HW // 8) * 8        # second-minor dim must be 8-aligned for DMA
    P2 = pooled_size * pooled_size

    def vmem_est(g):
        # live VMEM residents: feature scratch, the (Mpad, HWp) W2 weight
        # matrix (elementwise temporaries stream through vregs), the
        # (Mpad, C) matmul result, and the double-buffered output block.
        # Calibrated against the working R101@600² config (~12 MB)
        mpad = -(-g * P2 // 8) * 8
        return 4 * (HWp * C + mpad * HWp + mpad * C + 2 * g * P2 * C)

    G = next((g for g in (6, 3, 2, 1)
              if vmem_est(g) < 12 * 1024 * 1024), None)
    fits = C % 128 == 0 and G is not None
    if impl == "auto":
        impl = "pallas" if (on_tpu or interpret) and fits else "xla"
    if impl != "pallas":
        return jax.vmap(
            lambda f, r: roi_align(f, r, pooled_size, spatial_scale,
                                   sampling_ratio))(features, rois)
    if G is None:
        # explicit impl="pallas" with a feature map the VMEM probe rejects:
        # fail attributably here instead of as an opaque Mosaic scoped-vmem
        # OOM at compile time (auto callers never reach this branch)
        raise ValueError(
            f"roi_align_batched(impl='pallas'): feature map {H}x{W}x{C} "
            f"does not fit the VMEM budget at any group size "
            f"(est {vmem_est(1) / 2**20:.1f} MiB at G=1); use impl='xla'")
    Rpad = -(-R // G) * G
    rois_p = rois.astype(jnp.float32)
    if Rpad != R:
        rois_p = jnp.pad(rois_p, ((0, 0), (0, Rpad - R), (0, 0)))
    f2 = features.astype(jnp.float32).reshape(B, HW, C)
    if HWp != HW:
        f2 = jnp.pad(f2, ((0, 0), (0, HWp - HW), (0, 0)))
    kernel = functools.partial(
        _ra_kernel, pooled=pooled_size, sr=sampling_ratio, Hf=H, Wf=W,
        HWp=HWp, scale=spatial_scale, G=G)
    out = pl.pallas_call(
        kernel,
        grid=(B, Rpad // G),
        in_specs=[
            pl.BlockSpec((1, Rpad, 4), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # whole array, in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, G, pooled_size, pooled_size, C),
            lambda b, t: (b, t, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, Rpad, pooled_size, pooled_size, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((HWp, C), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(rois_p, f2)
    return out[:, :R]


def roi_pool(features: jnp.ndarray, rois: jnp.ndarray,
             pooled_size: int = 7, spatial_scale: float = 1.0 / 16.0,
             samples_per_bin: int = 4) -> jnp.ndarray:
    """ROI max-pool (ROIPool_cuda.cu contract, POOLING_MODE='pool'),
    approximated on a dense per-bin sample grid so shapes stay static; max
    replaces the average of roi_align."""
    H, W, C = features.shape

    def one(roi):
        cy = _roi_sample_grid(roi, pooled_size, samples_per_bin,
                              spatial_scale, H, 1)
        cx = _roi_sample_grid(roi, pooled_size, samples_per_bin,
                              spatial_scale, W, 0)
        Wy = _linear_weights(cy, H)
        Wx = _linear_weights(cx, W)
        tmp = jnp.einsum("sh,hwc->swc", Wy, features)
        samp = jnp.einsum("tw,swc->stc", Wx, tmp)
        samp = samp.reshape(pooled_size, samples_per_bin,
                            pooled_size, samples_per_bin, C)
        return samp.max(axis=(1, 3))

    return jax.vmap(one)(rois)
