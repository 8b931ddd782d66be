"""Batched on-device preprocessing: crop, augment, normalise, label.

The TPU-native replacement for the reference's per-sample NumPy/cv2
`DatasetLoader.__getitem__` (data/dataset.py:83-245) + `generate_patch_image`
(common/augment.py:358-413): everything after JPEG decode is one jitted,
vmapped transform chain. One composed homography (crop ∘ rotation) resamples
each image exactly once instead of the reference's two cv2 warps.

Normalisation quirk preserved for parity: the reference applies torchvision
ToTensor to a float32 0..255 array (which does NOT rescale), subtracts
pixel_mean (~0.51) — effectively a no-op at 0..255 scale — then multiplies by
the per-channel colour jitter and clips to [0, 255] (dataset.py:153-154,
base.py:137). The network therefore consumes ~[0, 255]-scale inputs, and so
does ours.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from hand_integral_pose_estimation_tpu.config import AugmentConfig
from hand_integral_pose_estimation_tpu.geometry import (
    bbox as bbox_mod,
    camera,
    labels as lbl,
    rotation,
    transforms,
)
from hand_integral_pose_estimation_tpu.ops.warp import warp_perspective_batch


class Batch(NamedTuple):
    """Everything the train/eval steps need (the reference's `params` dict,
    dataset.py:177-240, as fixed-shape arrays)."""

    image: jnp.ndarray                 # (B, 224, 224, 3) normalised patch
    label: jnp.ndarray                 # (B, J, 3) encoded GT label
    label_weight: jnp.ndarray          # (B, J, 3)
    label_teacher: jnp.ndarray         # (B, J, 3) pseudo-label (or zeros)
    labelled: jnp.ndarray              # (B,) bool
    R: jnp.ndarray                     # (B, 3, 3) augmentation rotation
    K: jnp.ndarray                     # (B, 3, 3)
    joint_cam: jnp.ndarray             # (B, J, 3)
    joint_cam_normalized: jnp.ndarray  # (B, J, 3)
    tprime: jnp.ndarray                # (B,)
    trans: jnp.ndarray                 # (B, 3, 3) image->patch
    trans_inv: jnp.ndarray             # (B, 3, 3) patch->image
    bbox: jnp.ndarray                  # (B, 4)
    ref_bone_len: jnp.ndarray          # (B,)


def _normalise(patch: jnp.ndarray, color_scale: jnp.ndarray,
               acfg: AugmentConfig) -> jnp.ndarray:
    mean = jnp.asarray(acfg.pixel_mean, patch.dtype)
    std = jnp.asarray(acfg.pixel_std, patch.dtype)
    out = (patch - mean) / std
    return jnp.clip(out * color_scale, 0.0, 255.0)


def _resolve_bbox(joint_cam, R, K, bbox_detector, pad_factor):
    """Detector box if given, else bbox of the projected (rotated) joints
    (augment.py:376-382)."""
    if bbox_detector is not None:
        return bbox_detector
    uv, _, _ = camera.project_points(joint_cam, R, K)
    return bbox_mod.bbox_from_keypoints(uv, jnp.ones(uv.shape[-2]),
                                        pad_factor=pad_factor)


def _labels_one(jc, Ki, bb_det, teacher_jcn, R,
                acfg: AugmentConfig, patch_hw):
    """Per-sample label/geometry pass (vmapped); the image warp itself runs
    batched outside (warp_perspective_batch picks matmul-based resampling on
    TPU, where XLA gathers are slow)."""
    ph, pw = patch_hw
    bb = _resolve_bbox(jc, R, Ki, bb_det, acfg.pad_factor)
    out = lbl.compute_patch_labels(
        jc, R, Ki, bb, patch_width=pw, patch_height=ph,
        scale=acfg.scale, scaling_constant=acfg.scaling_constant,
    )
    # one composed homography: image -> rotated image -> patch
    H_total = out.trans @ transforms.rotation_homography(Ki, R)

    if teacher_jcn is None:
        label_teacher = jnp.zeros_like(out.label)
    else:
        # regenerate the pseudo-label under the same augmentation
        # (dataset.py:127-133 via augment.py:415-446); cached teacher joints
        # have root depth == tprime of the same (detector) bbox
        label_teacher = lbl.compute_patch_labels_from_normalized(
            teacher_jcn, out.tprime, R, Ki, bb,
            patch_width=pw, patch_height=ph, scale=acfg.scale)
    return out, label_teacher, bb, H_total


def make_train_batch(rng: jax.Array, images: jnp.ndarray,
                     joint_cam: jnp.ndarray, K: jnp.ndarray,
                     bbox_detector: Optional[jnp.ndarray],
                     labelled: jnp.ndarray,
                     teacher_cam_normalized: Optional[jnp.ndarray],
                     ref_bone_len: jnp.ndarray,
                     acfg: AugmentConfig = AugmentConfig(),
                     patch_hw=(224, 224)) -> Batch:
    """Full augmented training batch on device.

    Equivalent to DatasetLoader.__getitem__ in filtered-teacher mode
    (dataset.py:117-175): GT label and teacher label are generated under the
    SAME augmentation (R, bbox, colour jitter).

    Args:
        rng: key; split per sample.
        images: (B, H, W, 3) uint8/float RGB.
        joint_cam: (B, J, 3) camera-frame GT (zeros if unknown).
        K: (B, 3, 3).
        bbox_detector: (B, 4) (cx, cy, w, h) detector boxes already
            squared+padded (augment.py:317-342), or None to derive boxes from
            projected keypoints.
        labelled: (B,) bool.
        teacher_cam_normalized: (B, J, 3) cached pseudo-GT in the normalised
            camera frame (the filtered db's `joint_cam_normalized`), or None.
        ref_bone_len: (B,).
    """
    B = images.shape[0]
    keys = jax.random.split(rng, 2 * B).reshape(B, 2, 2)

    def per_sample(jc, Ki, bb_det, teacher_jcn, ks):
        R = rotation.sample_rotation_matrix(
            ks[0], acfg.rot_prob, acfg.z_rot_range,
            acfg.arbitrary_rot_range).astype(Ki.dtype)
        color = rotation.sample_color_scale(ks[1], acfg.color_factor)
        out, label_teacher, bb, H_total = _labels_one(
            jc, Ki, bb_det, teacher_jcn, R, acfg, patch_hw)
        return out, label_teacher, R, bb, H_total, color

    in_axes = (0, 0,
               None if bbox_detector is None else 0,
               None if teacher_cam_normalized is None else 0,
               0)
    out, label_teacher, R, bb, H_total, color = jax.vmap(
        per_sample, in_axes=in_axes)(
        joint_cam, K, bbox_detector, teacher_cam_normalized, keys)

    patch = warp_perspective_batch(images.astype(jnp.float32),
                                   H_total, patch_hw)
    patch = _normalise(patch, color[:, None, None, :], acfg)

    J = joint_cam.shape[1]
    return Batch(
        image=patch,
        label=out.label,
        label_weight=jnp.ones((B, J, 3), patch.dtype),
        label_teacher=label_teacher,
        labelled=labelled,
        R=R,
        K=K,
        joint_cam=joint_cam,
        joint_cam_normalized=out.joint_cam_normalized,
        tprime=out.tprime,
        trans=out.trans,
        trans_inv=out.trans_inv,
        bbox=bb,
        ref_bone_len=ref_bone_len,
    )


def make_eval_batch(images: jnp.ndarray, joint_cam: jnp.ndarray,
                    K: jnp.ndarray, bbox_detector: Optional[jnp.ndarray],
                    ref_bone_len: jnp.ndarray,
                    acfg: AugmentConfig = AugmentConfig(),
                    patch_hw=(224, 224)) -> Batch:
    """Deterministic test/eval batch: R = I, no jitter (dataset.py:115)."""
    B, J = joint_cam.shape[0], joint_cam.shape[1]

    def per_sample(jc, Ki, bb_det):
        R = jnp.eye(3, dtype=Ki.dtype)
        out, _, bb, _ = _labels_one(jc, Ki, bb_det, None, R,
                                    acfg, patch_hw)
        return out, bb

    in_axes = (0, 0, None if bbox_detector is None else 0)
    out, bb = jax.vmap(per_sample, in_axes=in_axes)(
        joint_cam, K, bbox_detector)

    # R == I makes the rotation homography identity, so the total map is the
    # axis-aligned crop affine `trans` — take the specialised warp (the
    # generic path spends ~25x the time building row-dependent weights)
    patch = warp_perspective_batch(images.astype(jnp.float32),
                                   out.trans, patch_hw, method="affine")
    patch = _normalise(patch, jnp.ones(3, patch.dtype), acfg)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=K.dtype), (B, 3, 3))
    return Batch(
        image=patch,
        label=out.label,
        label_weight=jnp.ones((B, J, 3), patch.dtype),
        label_teacher=jnp.zeros((B, J, 3), patch.dtype),
        labelled=jnp.ones((B,), bool),
        R=eye,
        K=K,
        joint_cam=joint_cam,
        joint_cam_normalized=out.joint_cam_normalized,
        tprime=out.tprime,
        trans=out.trans,
        trans_inv=out.trans_inv,
        bbox=bb,
        ref_bone_len=ref_bone_len,
    )
