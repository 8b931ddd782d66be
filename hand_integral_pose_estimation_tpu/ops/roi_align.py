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

import jax
import jax.numpy as jnp


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
