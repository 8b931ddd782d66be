"""Teacher pseudo-label generation with the rotation-variance filter.

Capability equivalent of main/generate_filtered_teacher_labels.py:403-509:
for every unlabelled image, run the frozen teacher under 21 evenly spaced
z-rotations, back-project each prediction to the normalised camera frame,
keep the sample iff the total prediction variance over rotations is below
1e-4, and store the mean prediction as pseudo-GT `joint_cam_normalized`.

TPU-first: the reference runs 21 sequential single-image teacher forwards per
sample (:467-489); here all B*T rotated crops are produced by one batched
warp and decoded by one batched teacher forward.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from hand_integral_pose_estimation_tpu.config import AugmentConfig
from hand_integral_pose_estimation_tpu.geometry import (
    bbox as bbox_mod,
    labels as lbl,
    rotation,
    transforms,
)
from hand_integral_pose_estimation_tpu.ops.warp import warp_perspective_batch


class FilteredLabels(NamedTuple):
    joint_cam_normalized: jnp.ndarray  # (B, J, 3) pseudo-GT (mean over rots)
    tprime: jnp.ndarray                # (B,)
    variance: jnp.ndarray              # (B,) total variance over rotations
    keep: jnp.ndarray                  # (B,) bool — labelled OR var < thresh
    per_rotation: jnp.ndarray          # (B, T, J, 3) raw back-projections


def rotation_sweep_camera(
    teacher_apply: Callable[[jnp.ndarray], jnp.ndarray],
    images: jnp.ndarray,
    K: jnp.ndarray,
    bbox: jnp.ndarray,
    acfg: AugmentConfig,
    thetas,
    cover_range: float,
    patch_hw=(224, 224),
    rotation_mode: str = "factored",
    mesh=None,
    data_axis: str = "data",
):
    """Per-rotation camera-frame teacher predictions for one batch.

    The shared core of the variance filter (single-pass and cascaded): warp
    every (sample, theta) crop, run the teacher, back-project each
    prediction to the normalised camera frame
    (generate_filtered_teacher_labels.py:467-489 + convert_to_cam_coord,
    :124-131). Returns (cam (B, T, J, 3), tprime (B,)).

    `thetas` is a concrete 1-D angle array (any subset of the sweep — the
    cascade runs disjoint subsets in separate passes). `cover_range` is the
    FULL sweep's max |theta|: the factored base crop is sized for the whole
    sweep regardless of which subset this call computes, so a rotation's
    patch is bit-identical whether it is computed in a subset pass or in
    the single-pass sweep.

    With `mesh`, the WHOLE sweep (warps -> teacher forward ->
    back-projection) runs inside one shard_map region with the batch
    partitioned over `data_axis` — embarrassingly parallel per sample, no
    collectives, and the Pallas warp/decode kernels stay partitioned
    instead of hitting the SPMD partitioner's replicated fallback around
    opaque pallas_calls (parallel/shard_ops.py rationale). The teacher
    weights ride in as closed-over replicated constants, matching the
    reference's DataParallel teacher in its filter loop
    (generate_filtered_teacher_labels.py:403-509).
    """
    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        if images.shape[0] % mesh.shape[data_axis]:
            raise ValueError(
                f"batch {images.shape[0]} must divide by the mesh "
                f"{data_axis!r}-axis size {mesh.shape[data_axis]}")
        d = P(data_axis)

        def body(im, Ki, bb):
            return rotation_sweep_camera(
                teacher_apply, im, Ki, bb, acfg, thetas, cover_range,
                patch_hw, rotation_mode)
        return jax.shard_map(body, mesh=mesh, in_specs=(d, d, d),
                             out_specs=(d, d),
                             check_vma=False)(images, K, bbox)
    B = images.shape[0]
    ph, pw = patch_hw
    thetas = jnp.asarray(thetas)
    T = thetas.shape[0]
    rotation_range = cover_range

    Rz = rotation.rotation_z(thetas)                      # (T, 3, 3)
    trans = transforms.trans_from_patch(
        bbox[:, 0], bbox[:, 1], bbox[:, 2], bbox[:, 3], pw, ph,
        scale=acfg.scale)                                  # (B, 3, 3)
    trans_inv = transforms.trans_from_patch(
        bbox[:, 0], bbox[:, 1], bbox[:, 2], bbox[:, 3], pw, ph,
        scale=acfg.scale, inv=True)
    tprime = bbox_mod.tprime_from_bbox(bbox, K, acfg.scaling_constant)

    rot_h = jax.vmap(lambda Ki: jax.vmap(
        lambda R: transforms.rotation_homography(Ki, R))(Rz))(K)
    if rotation_mode == "composed":
        # (B, T, 3, 3) total homographies; one batched warp of B*T crops
        H_total = trans[:, None] @ rot_h
        imgs_rep = jnp.repeat(images.astype(jnp.float32), T, axis=0)
        patches = warp_perspective_batch(
            imgs_rep, H_total.reshape(B * T, 3, 3), patch_hw)
    elif rotation_mode == "factored":
        import math
        # The base must cover every rotated crop. Rotation is about the
        # PRINCIPAL POINT (K R K^-1), so a crop square of side L centred
        # at c needs, per axis: cover·L/2 (its own circumscribed square)
        # plus 2·sin(θmax/2)·|c - pp| (the arc its centre sweeps). Both
        # are traced — only the S x S raster is static; per-sample pixel
        # density adapts (slightly coarser than the patch only when the
        # box is far off-centre AND large).
        sweep = 2.0 * math.sin(rotation_range / 2.0)
        S = 320
        pp = K[:, 0:2, 2]                                  # (B, 2)
        d = jnp.linalg.norm(bbox[:, 0:2] - pp, axis=-1)    # (B,)
        margin = sweep * d + 4.0
        # axis-aligned cover of a w x h rect rotated by up to the range:
        # extent(θ) = w·cosθ + h·sinθ peaks at θ* = atan(h/w), so the
        # exact max over θ ∈ [0, range] evaluates at min(range, θ*) per
        # axis — capping at the diagonal sqrt(w²+h²) for elongated boxes
        # whose θ* falls inside the range (in-tree pipelines only produce
        # squares, where θ* = π/4 > any sane range and this reduces to
        # (cos+sin)·w, but generate_filtered_labels accepts any box)
        w_sc = bbox[:, 2] * acfg.scale
        h_sc = bbox[:, 3] * acfg.scale
        th_w = jnp.minimum(rotation_range, jnp.arctan2(h_sc, w_sc))
        th_h = jnp.minimum(rotation_range, jnp.arctan2(w_sc, h_sc))
        wS = w_sc * jnp.cos(th_w) + h_sc * jnp.sin(th_w) + 2.0 * margin
        hS = h_sc * jnp.cos(th_h) + w_sc * jnp.sin(th_h) + 2.0 * margin
        transS = transforms.trans_from_patch(
            bbox[:, 0], bbox[:, 1], wS, hS, S, S)          # (B, 3, 3)
        transS_inv = transforms.trans_from_patch(
            bbox[:, 0], bbox[:, 1], wS, hS, S, S, inv=True)
        base = warp_perspective_batch(
            images.astype(jnp.float32), transS, (S, S), method="affine")
        H_patch = trans[:, None] @ rot_h @ transS_inv[:, None]
        base_rep = jnp.repeat(base, T, axis=0)
        # 320² sources run the streaming twopass: the looped Pallas body
        # compiles here but measured slower (PERFORMANCE.md, round 3).
        patches = warp_perspective_batch(
            base_rep, H_patch.reshape(B * T, 3, 3), patch_hw)
    else:
        raise ValueError(rotation_mode)
    mean = jnp.asarray(acfg.pixel_mean, patches.dtype)
    patches = jnp.clip((patches - mean), 0.0, 255.0)

    coords = teacher_apply(patches)                        # (B*T, J, 3)
    J = coords.shape[-2]
    coords = coords.reshape(B, T, J, 3)

    # back-project every rotation to the normalised camera frame
    # (convert_to_cam_coord, :124-131)
    cam = jax.vmap(
        lambda c_t, ti, Ki, R_t, tp: jax.vmap(
            lambda c, R: lbl.patch_label_to_camera(
                c, ti, tp, Ki, R, pw, ph))(c_t, R_t)
    )(coords, trans_inv, K,
      jnp.broadcast_to(Rz, (B, T, 3, 3)),
      tprime)                                              # (B, T, J, 3)
    return cam, tprime


def generate_filtered_labels(
    teacher_apply: Callable[[jnp.ndarray], jnp.ndarray],
    images: jnp.ndarray,
    K: jnp.ndarray,
    bbox: jnp.ndarray,
    labelled: jnp.ndarray,
    joint_cam: jnp.ndarray,
    acfg: AugmentConfig = AugmentConfig(),
    num_rotations: int = 21,
    rotation_range: float = 0.52,
    variance_threshold: float = 1e-4,
    patch_hw=(224, 224),
    rotation_mode: str = "factored",
    mesh=None,
    data_axis: str = "data",
) -> FilteredLabels:
    """Variance-filtered pseudo-labels for one batch.

    Args:
        teacher_apply: (N, ph, pw, 3) normalised patches -> (N, J, 3)
            label-space coords (frozen teacher forward + integral decode).
        images: (B, H, W, 3) RGB.
        K: (B, 3, 3).
        bbox: (B, 4) detector crop boxes (fixed across rotations, like the
            reference's faster_rcnn_bbox).
        labelled: (B,) — labelled samples keep their GT normalisation
            (computed at theta = 0, :455-465) and are always kept.
        joint_cam: (B, J, 3) GT joints (used for labelled rows only).

    The rotations are `num_rotations` evenly spaced z-axis angles over
    [-rotation_range, rotation_range] (the reference's
    np.arange(-0.52, 0.53, 0.05), :467).

    rotation_mode selects the warp structure (same coordinate maps, two
    factorings):
      * "composed" — one warp per (sample, rotation): B*T resamples of the
        FULL-SIZE source by trans @ K R K^-1. Weight-build cost (the VPU
        bottleneck, PERFORMANCE.md) scales with Hs*Ws per warp.
      * "factored" (default) — the expensive source-space crop is SHARED
        across rotations: one axis-aligned warp per sample onto an S x S
        base whose (traced) field of view covers every rotated crop —
        the crop's circumscribed square plus the arc its centre sweeps
        rotating about the principal point — then B*T small S -> patch
        similarity warps H = trans @ (K R K^-1) @ transS^-1 that read
        only real base content. The double resample changes the filter
        the same way the reference's own rotate-then-crop double cv2
        warp does (tested: tight agreement on smooth content).

    With `mesh`, the whole per-batch filter program is partitioned over
    `data_axis` in one shard_map region (see rotation_sweep_camera) —
    the mesh equivalent of the reference running its filter loop under
    DataParallel; outputs gather when the host fetches them.
    """
    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        if images.shape[0] % mesh.shape[data_axis]:
            raise ValueError(
                f"batch {images.shape[0]} must divide by the mesh "
                f"{data_axis!r}-axis size {mesh.shape[data_axis]}")
        d = P(data_axis)

        def body(im, Ki, bb, lab, jc):
            return generate_filtered_labels(
                teacher_apply, im, Ki, bb, lab, jc, acfg, num_rotations,
                rotation_range, variance_threshold, patch_hw,
                rotation_mode)
        # out_specs is a pytree prefix: every FilteredLabels field is
        # batch-leading
        return jax.shard_map(body, mesh=mesh, in_specs=(d, d, d, d, d),
                             out_specs=d, check_vma=False)(
            images, K, bbox, labelled, joint_cam)
    thetas = jnp.linspace(-rotation_range, rotation_range, num_rotations)
    cam, tprime = rotation_sweep_camera(
        teacher_apply, images, K, bbox, acfg, thetas, rotation_range,
        patch_hw, rotation_mode)

    variance = jnp.var(cam, axis=1).sum(axis=(-2, -1))     # (B,)
    mean_pred = cam.mean(axis=1)                           # (B, J, 3)

    # labelled rows: GT normalisation at theta = 0 (:455-465)
    uv, z, _ = jax.vmap(
        lambda jc, Ki: camera_project(jc, Ki))(joint_cam, K)
    gt_norm = joint_cam * (tprime / z[..., 9])[:, None, None]

    lab = labelled[:, None, None]
    joint_cam_normalized = jnp.where(lab, gt_norm, mean_pred)
    keep = labelled | (variance < variance_threshold)
    variance = jnp.where(labelled, 0.0, variance)
    return FilteredLabels(
        joint_cam_normalized=joint_cam_normalized,
        tprime=tprime,
        variance=variance,
        keep=keep,
        per_rotation=cam,
    )


def quantized_teacher_apply(
    model,
    variables,
    images: jnp.ndarray,
    K: jnp.ndarray,
    bbox: jnp.ndarray,
    acfg: AugmentConfig,
    num_joints: int,
    depth_dim: int,
    num_rotations: int = 21,
    rotation_range: float = 0.52,
    patch_hw=(224, 224),
    rotation_mode: str = "factored",
    calib_rotations: int = 5,
    forward=None,
):
    """Int8 teacher forward for the variance filter (config #5's bound).

    The sweep is teacher-forward-bound (~19 of 29 ms/batch-8 at bf16,
    PERFORMANCE.md round 3-4); s8xs8->s32 MXU convs are the next rung
    below bf16. Calibration taps the teacher's conv inputs while tracing
    ONE fp sweep over `images` (a representative batch) — the calibration
    distribution is exactly the filter's own warped, normalised patches,
    on a theta subset spanning the rotation extremes (`calib_rotations`
    evenly spaced over the full sweep, endpoints included). The final
    heatmap projection stays fp (its logits feed the softmax decode).

    Returns `(teacher_apply, Quantized)`: a jit-friendly
    patches -> (N, J, 3) apply (interception activates at trace time
    inside whatever jit/shard_map consumes it — same contract as the
    serving pipeline's int8 path) and the bundle for persistence.

    Accuracy gate: the keep set vs the fp32 filter on the same weights
    (tests/test_distill.py::TestTeacherInt8) — the filter compares an
    absolute variance threshold, so a dtype/precision change must not
    flip keep decisions (same contract as --teacher-dtype bfloat16).

    `forward` overrides the fp teacher body (patches -> (N, J, 3)); the
    default is `model.apply` + `softmax_integral`. bench.py passes its
    fused-projection-head teacher — the fused head consumes the final
    conv's params directly (never a flax call), so it stays fp there by
    construction, matching the explicit skip here.
    """
    import numpy as np

    from hand_integral_pose_estimation_tpu.ops.integral import (
        softmax_integral,
    )
    from hand_integral_pose_estimation_tpu.quantize import (
        calibrate, quantize_params, quantized_calls,
    )
    import dataclasses

    if forward is None:
        def forward(patches):
            hm = model.apply(variables, patches, train=False)
            return softmax_integral(hm, num_joints, depth_dim)

    full = np.linspace(-rotation_range, rotation_range, num_rotations)
    idx = np.unique(np.round(
        np.linspace(0, num_rotations - 1,
                    min(calib_rotations, num_rotations))).astype(int))
    thetas_sub = jnp.asarray(full[idx])

    def calib_fn(im):
        return rotation_sweep_camera(
            forward, im, K, bbox, acfg, thetas_sub, rotation_range,
            patch_hw, rotation_mode)[0]

    amax = calibrate(calib_fn, images, root_type=type(model))
    q = dataclasses.replace(
        quantize_params(variables["params"], amax, skip=("head/final",)),
        root_type=type(model))

    def teacher_apply(patches):
        with quantized_calls(q):
            return forward(patches)

    return teacher_apply, q


def camera_project(joint_cam, K):
    from hand_integral_pose_estimation_tpu.geometry import camera
    return camera.project_points(joint_cam, jnp.eye(3, dtype=K.dtype), K)


def teacher_error_vs_variance(per_rotation: jnp.ndarray,
                              joint_cam_normalized_gt: jnp.ndarray):
    """Per-sample (variance, MPJPE-vs-GT) pairs — the statistic behind the
    reference's variance-threshold precision study
    (generate_filtered_teacher_labels.py:193-401 `get_variance_measure`).
    """
    mean_pred = per_rotation.mean(axis=1)
    variance = jnp.var(per_rotation, axis=1).sum(axis=(-2, -1))
    mpjpe = jnp.linalg.norm(mean_pred - joint_cam_normalized_gt,
                            axis=-1).mean(-1)
    return variance, mpjpe


def filter_precision_curve(variance: jnp.ndarray, mpjpe: jnp.ndarray,
                           thresholds: jnp.ndarray,
                           mpjpe_threshold: float = 0.005):
    """%-of-kept-samples-with-MPJPE<thr per variance threshold — the curves
    plotted by `_plot` (:145-191). Returns (kept_frac, precision)."""
    kept = variance[None, :] < thresholds[:, None]          # (T, B)
    good = kept & (mpjpe[None, :] < mpjpe_threshold)
    kept_n = jnp.maximum(kept.sum(-1), 1)
    return (kept.mean(-1) * 100.0,
            100.0 * good.sum(-1) / kept_n)
