"""Training losses: integral L1, semi-supervised combined loss, MPJPE.

Behavioural equivalents of common/nets/loss.py:69-203, re-designed for XLA:
the reference's boolean indexing of labelled/unlabelled sub-batches
(loss.py:123-124, `coord_out[~labelled]`) becomes fixed-shape masked
arithmetic, and `prepare_panet_input`'s per-sample torch loop
(augment.py:556-574) becomes one vmapped transform. Everything here is a pure
function of (B, J, 3) arrays — no modules, no device logic; data-parallel
reduction happens in the train step via `lax.pmean`.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from hand_integral_pose_estimation_tpu.geometry import camera, labels as lbl
from hand_integral_pose_estimation_tpu.ops.integral import softmax_integral


def compute_mpjpe(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Mean per-joint position error in label space (loss.py:93-96)."""
    return jnp.linalg.norm(pred - gt, axis=-1).mean()


def joint_location_loss(coord_out: jnp.ndarray, gt_coord: jnp.ndarray,
                        gt_vis: jnp.ndarray) -> jnp.ndarray:
    """Visibility-masked L1 in normalised label space, summed over joints and
    averaged over the batch (loss.py:69-91 `JointLocationLoss`).

    Args:
        coord_out: (B, J, 3) decoded integral coords.
        gt_coord: (B, J, 3) encoded labels.
        gt_vis: (B, J, 3) per-coordinate visibility weights.
    """
    err = jnp.abs(coord_out - gt_coord) * gt_vis
    return err.sum() / coord_out.shape[0]


def heatmap_joint_loss(heatmap_nhwc: jnp.ndarray, gt_coord: jnp.ndarray,
                       gt_vis: jnp.ndarray, num_joints: int, depth: int,
                       impl: str = "auto") -> jnp.ndarray:
    """JointLocationLoss straight from heatmap logits (fused decode)."""
    coords = softmax_integral(heatmap_nhwc, num_joints, depth, impl=impl)
    return joint_location_loss(coords, gt_coord, gt_vis)


def prepare_panet_input(coord_label: jnp.ndarray, trans_inv: jnp.ndarray,
                        tprime: jnp.ndarray, K: jnp.ndarray,
                        patch_width: int = 224,
                        patch_height: int = 224) -> jnp.ndarray:
    """Label-space coords -> mean-centred camera-frame points for PANet.

    Vmapped equivalent of augment.py:556-574: decode the label, apply the
    inverse patch transform, back-project with K. The reference then
    subtracts tprime from z — a per-sample constant across joints, which the
    final mean-centring removes anyway, so it is omitted here (same output).
    No derotation, matching the reference (augment.py:568 is commented out).

    Args:
        coord_label: (B, J, 3) integral outputs in normalised label space.
        trans_inv: (B, 3, 3) patch->image transforms.
        tprime: (B,) canonical depths.
        K: (B, 3, 3) intrinsics.
    """
    coords = lbl.decode_labels(coord_label, patch_width, patch_height)
    img = lbl.patch_to_image_3d(coords, trans_inv, tprime)
    cam = camera.pixel2cam(img, K)
    return cam - cam.mean(axis=-2, keepdims=True)


class CombinedLossOutput(NamedTuple):
    loss: jnp.ndarray
    student_mpjpe: jnp.ndarray
    teacher_mpjpe: jnp.ndarray
    loss_supervised: jnp.ndarray
    loss_unsupervised: jnp.ndarray


def combined_loss(coord_out: jnp.ndarray, coord_teacher: jnp.ndarray,
                  gt_coord: jnp.ndarray, gt_vis: jnp.ndarray,
                  labelled: jnp.ndarray, trans_inv: jnp.ndarray,
                  tprime: jnp.ndarray, K: jnp.ndarray,
                  panet_apply: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
                  lam: float = 0.0,
                  patch_width: int = 224,
                  patch_height: int = 224) -> CombinedLossOutput:
    """Semi-supervised loss (loss.py:99-203 `CombinedLoss`):

      * labelled samples: L1(student, GT label) * vis;
      * unlabelled samples: L1(student, teacher label) * vis
        + lam * L1(camera-frame student, PANet(camera-frame student)) * vis;
      * total = sum / batch.

    The labelled/unlabelled split is a per-sample mask (fixed shapes); PANet
    runs on the whole batch and its term is masked out for labelled rows.

    Args:
        coord_out: (B, J, 3) student integral output.
        coord_teacher: (B, J, 3) teacher/pseudo-label coords (label space).
        gt_coord: (B, J, 3) GT labels (valid on labelled rows).
        gt_vis: (B, J, 3).
        labelled: (B,) bool.
        trans_inv / tprime / K: per-sample crop geometry for the PANet path.
        panet_apply: (B, J, 3) centred camera points -> (B, J, 3)
            reconstruction (the NRSfM forward, PANet_reconstruction.py:58-62).
        lam: cfg._lambda (0 by default, config.py:50).
    """
    B = coord_out.shape[0]
    lab = labelled.astype(coord_out.dtype)[:, None, None]

    # diagnostics only (reference computes them under no_grad, loss.py:134-136)
    student_mpjpe = jax.lax.stop_gradient(compute_mpjpe(coord_out, gt_coord))
    teacher_mpjpe = jax.lax.stop_gradient(
        compute_mpjpe(coord_teacher, gt_coord))

    loss_sup = (jnp.abs(coord_out - gt_coord) * gt_vis * lab).sum()

    l_teacher = (jnp.abs(coord_out - coord_teacher) * gt_vis * (1 - lab)).sum()
    if panet_apply is not None and lam != 0.0:
        pin = prepare_panet_input(coord_out, trans_inv, tprime, K,
                                  patch_width, patch_height)
        recon = panet_apply(pin)
        l_panet = (lam * jnp.abs(pin - recon) * gt_vis * (1 - lab)).sum()
    else:
        l_panet = jnp.zeros((), coord_out.dtype)

    loss_unsup = l_teacher + l_panet
    loss = (loss_sup + loss_unsup) / B
    return CombinedLossOutput(
        loss=loss,
        student_mpjpe=student_mpjpe,
        teacher_mpjpe=teacher_mpjpe,
        loss_supervised=loss_sup,
        loss_unsupervised=loss_unsup,
    )


def camera_space_diagnostic(coord_out: jnp.ndarray, gt_label: jnp.ndarray,
                            joint_cam_normalized: jnp.ndarray,
                            trans_inv: jnp.ndarray, tprime: jnp.ndarray,
                            K: jnp.ndarray, R: jnp.ndarray,
                            patch_width: int = 224,
                            patch_height: int = 224):
    """Camera-space error diagnostic (loss.py:207-277 `JointLocationLoss2`):
    round-trips both the prediction and the GT label through
    patch->image->camera and measures the squared error in the normalised
    camera frame. Returns (loss_sum, label_consistency) where
    `label_consistency` is the max |GT-label round trip - joint_cam_normalized|
    (the quantity the reference asserts to 1e-6 at loss.py:259-262).
    Pure device math — no host round trip, not part of the gradient."""
    pred_cam = lbl.patch_label_to_camera(coord_out, trans_inv, tprime, K, R,
                                         patch_width, patch_height)
    gt_cam = lbl.patch_label_to_camera(gt_label, trans_inv, tprime, K, R,
                                       patch_width, patch_height)
    consistency = jnp.abs(gt_cam - joint_cam_normalized).max()
    sq = jnp.sum((joint_cam_normalized - pred_cam) ** 2, axis=-1)
    return jax.lax.stop_gradient(sq.sum()), jax.lax.stop_gradient(consistency)
