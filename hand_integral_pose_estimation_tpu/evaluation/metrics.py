"""Metric pipeline: patch -> image -> camera back-projection, reference-bone
rescale, Procrustes alignment, PA-MPJPE / MPJPE, PCK / AUC.

The vmapped-device equivalent of the reference's all-NumPy per-sample eval
loop (data/FreiHand/FreiHand.py:670-835) and the FreiHAND-official EvalUtil
(main/eval.py:15-106). The whole test split evaluates as a handful of fused
batched ops instead of a Python loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hand_integral_pose_estimation_tpu.geometry import (
    camera,
    labels as lbl,
    procrustes,
)
from hand_integral_pose_estimation_tpu.config import FreiHandJoints


def backproject_to_camera(coords_label: jnp.ndarray, trans_inv: jnp.ndarray,
                          tprime: jnp.ndarray, K: jnp.ndarray,
                          R: jnp.ndarray,
                          patch_width: int = 224,
                          patch_height: int = 224) -> jnp.ndarray:
    """Integral output (label space) -> tprime-normalised camera frame,
    de-rotated (FreiHand.py:686-725): decode, patch->image (+tprime on z),
    pixel2cam, then R^T."""
    return lbl.patch_label_to_camera(coords_label, trans_inv, tprime, K, R,
                                     patch_width, patch_height,
                                     derotate=True)


def scale_by_ref_bone(kpt: jnp.ndarray, ref_bone_len: jnp.ndarray,
                      bone=FreiHandJoints.ref_bone) -> jnp.ndarray:
    """Rescale so that |kpt[9] - kpt[10]| == ref_bone_len
    (FreiHand.py:632-668 `scale_result`, method='scale')."""
    a, b = bone
    pred_len = jnp.linalg.norm(kpt[..., a, :] - kpt[..., b, :], axis=-1)
    alpha = ref_bone_len / pred_len
    return kpt * alpha[..., None, None]


def scale_by_root_depth(kpt: jnp.ndarray, root_depth: jnp.ndarray,
                        tprime: jnp.ndarray) -> jnp.ndarray:
    """The reference's scale_result(method='normalize')
    (FreiHand.py:661-666): undo the tprime normalisation with the true root
    depth, kpt * root_depth / tprime."""
    return kpt * (root_depth / tprime)[..., None, None]


class EvalResult(NamedTuple):
    pa_mpjpe: jnp.ndarray         # scalar, protocol #1 (FreiHand.py:806)
    mpjpe: jnp.ndarray            # scalar, protocol #2 (FreiHand.py:807)
    per_sample_pa: jnp.ndarray    # (B,) mean joint error after alignment
    per_sample_raw: jnp.ndarray   # (B,)
    pred_cam: jnp.ndarray         # (B, J, 3) bone-rescaled predictions
    pred_cam_aligned: jnp.ndarray  # (B, J, 3) Procrustes-aligned


def evaluate_coords(coords_label: jnp.ndarray, gt_joint_cam: jnp.ndarray,
                    trans_inv: jnp.ndarray, tprime: jnp.ndarray,
                    K: jnp.ndarray, R: jnp.ndarray,
                    ref_bone_len: jnp.ndarray,
                    patch_width: int = 224,
                    patch_height: int = 224) -> EvalResult:
    """Full test-split metric pipeline (FreiHand.py:670-810):

    back-project -> bone-(9,10) rescale to `ref_bone_len` -> protocol #2
    (MPJPE) on the raw and protocol #1 (PA-MPJPE) on the Procrustes-aligned
    (optimal scale) predictions. Errors follow the reference exactly:
    mean over samples and joints of the per-joint euclidean distance.
    """
    pred_cam = backproject_to_camera(coords_label, trans_inv, tprime, K, R,
                                     patch_width, patch_height)
    pred_cam = scale_by_ref_bone(pred_cam, ref_bone_len)
    aligned = procrustes.compute_similarity_transform(
        gt_joint_cam, pred_cam, compute_optimal_scale=True).Z

    e_pa = jnp.linalg.norm(aligned - gt_joint_cam, axis=-1)   # (B, J)
    e_raw = jnp.linalg.norm(pred_cam - gt_joint_cam, axis=-1)
    return EvalResult(
        pa_mpjpe=e_pa.mean(),
        mpjpe=e_raw.mean(),
        per_sample_pa=e_pa.mean(-1),
        per_sample_raw=e_raw.mean(-1),
        pred_cam=pred_cam,
        pred_cam_aligned=aligned,
    )


class PCKResult(NamedTuple):
    epe_mean: jnp.ndarray       # scalar: mean over joints of per-joint mean
    epe_median: jnp.ndarray     # scalar: mean over joints of per-joint median
    auc: jnp.ndarray            # scalar
    pck_curve: jnp.ndarray      # (steps,) mean over joints
    thresholds: jnp.ndarray     # (steps,)


def pck_auc(pred: jnp.ndarray, gt: jnp.ndarray,
            val_min: float = 0.0, val_max: float = 0.05,
            steps: int = 100,
            vis: jnp.ndarray | None = None) -> PCKResult:
    """FreiHAND-official EvalUtil measures (main/eval.py:15-106): per-joint
    euclidean distances, PCK over `steps` thresholds, trapezoid AUC
    normalised by the range, all vectorised.

    Args:
        pred, gt: (B, J, 3).
        vis: optional (B, J) visibility; invisible joints are excluded from
            every statistic (EvalUtil.feed semantics).
    """
    d = jnp.linalg.norm(gt - pred, axis=-1)                    # (B, J)
    if vis is None:
        vis = jnp.ones_like(d)
    vis = vis.astype(d.dtype)
    count = vis.sum(0)                                         # (J,)
    has_data = count > 0   # joints with no visible entries are skipped
    safe_count = jnp.maximum(count, 1.0)

    epe_mean_j = (d * vis).sum(0) / safe_count
    # median over visible entries: mask invisible with +inf then median over
    # the padded column — implemented via sort + index
    d_sorted = jnp.sort(jnp.where(vis > 0, d, jnp.inf), axis=0)
    med_idx_lo = jnp.maximum(0, (safe_count - 1) // 2).astype(jnp.int32)
    med_idx_hi = (safe_count // 2).astype(jnp.int32)
    take = jax.vmap(lambda col, i: col[i], in_axes=(1, 0))
    epe_median_j = 0.5 * (take(d_sorted, med_idx_lo)
                          + take(d_sorted, med_idx_hi))

    thresholds = jnp.linspace(val_min, val_max, steps)
    # pck[t, j] = mean over visible of (d <= t)
    ok = (d[None] <= thresholds[:, None, None]).astype(d.dtype)
    pck_tj = (ok * vis[None]).sum(1) / safe_count[None]        # (steps, J)
    norm = jnp.trapezoid(jnp.ones_like(thresholds), thresholds)
    auc_j = jnp.trapezoid(pck_tj, thresholds, axis=0) / norm    # (J,)

    # EvalUtil skips keypoints that never appeared (eval.py:81-85)
    w = has_data.astype(d.dtype)
    n_joints = jnp.maximum(w.sum(), 1.0)

    def jmean(x):
        return (x * w).sum() / n_joints

    return PCKResult(
        epe_mean=jmean(epe_mean_j),
        epe_median=jmean(jnp.where(has_data, epe_median_j, 0.0)),
        auc=jmean(auc_j),
        pck_curve=(pck_tj * w[None]).sum(-1) / n_joints,
        thresholds=thresholds,
    )


def aligned_pck_auc(pred: jnp.ndarray, gt: jnp.ndarray, **kw) -> PCKResult:
    """Scores after align_w_scale, the official scorer's ALIGNED track
    (main/eval.py:184-206)."""
    aligned = procrustes.align_w_scale(gt, pred)
    return pck_auc(aligned, gt, **kw)


def estimate_absolute_depth(bone_length: jnp.ndarray, K: jnp.ndarray,
                            pre_2d_kpt: jnp.ndarray,
                            bone=FreiHandJoints.ref_bone):
    """Absolute root depth from a known bone length (FreiHand.py:86-139
    `estimate_depth`): with joints n=9, m=10 at pixel coords (U, V) and
    root-relative depths Z, the unknown global depth offset t solves the
    quadratic  r_A t^2 + r_B t + r_C = 0  derived from
    |X_n - X_m|^2 = bone_length^2. Returns (depth, was_complex): the larger
    root, or the magnitude of the complex pair when the discriminant is
    negative (the reference's np.roots branch).
    """
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    U0, V0 = K[..., 0, 2], K[..., 1, 2]
    n, m = bone
    Un, Vn, Zn = (pre_2d_kpt[..., n, i] for i in range(3))
    Um, Vm, Zm = (pre_2d_kpt[..., m, i] for i in range(3))

    Unm = (Un - Um) / fx
    Un0 = (Un - U0) / fx
    Um0 = (Um - U0) / fx
    Vnm = (Vn - Vm) / fy
    Vn0 = (Vn - V0) / fy
    Vm0 = (Vm - V0) / fy

    r_A = Unm ** 2 + Vnm ** 2
    r_B = 2.0 * (Unm * (Un0 * Zn - Um0 * Zm) + Vnm * (Vn0 * Zn - Vm0 * Zm))
    r_C = ((Un0 * Zn - Um0 * Zm) ** 2 + (Vn0 * Zn - Vm0 * Zm) ** 2
           + (Zn - Zm) ** 2 - bone_length ** 2)

    disc = r_B ** 2 - 4.0 * r_A * r_C
    was_complex = disc < 0
    sqrt_disc = jnp.sqrt(jnp.abs(disc))
    root_hi = (-r_B + sqrt_disc) / (2.0 * r_A)
    root_lo = (-r_B - sqrt_disc) / (2.0 * r_A)
    real_depth = jnp.maximum(root_hi, root_lo)
    # complex pair: |root| = sqrt(C/A) (product of conjugate roots)
    complex_mag = jnp.sqrt(jnp.abs(r_C / r_A))
    return jnp.where(was_complex, complex_mag, real_depth), was_complex
