"""Label-space geometry: tprime normalisation, patch labels, encode/decode.

One shared vmappable module replaces the reference's three divergent copies of
this pipeline (common/augment.py, common/normalization.py,
procrustes_encoding/processing/norm_lite.py).

Unit quirks preserved for parity:
  * the label z divisor is patch *width*, not a depth extent (augment.py:154);
  * depth rides in millimetres through pixel space (x1000 at projection,
    /1000 at back-projection — augment.py:87,100);
  * z in the patch is root-relative: z_patch = z_mm - tprime (augment.py:402),
    undone at decode by z_img = z_patch + tprime (augment.py:216).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from hand_integral_pose_estimation_tpu.geometry import camera, transforms
from hand_integral_pose_estimation_tpu.config import FreiHandJoints


def encode_labels(joints_patch: jnp.ndarray, patch_width: float,
                  patch_height: float) -> jnp.ndarray:
    """Patch-space joints -> network label (augment.py:148-158
    `generate_joint_location_label`): x/W - 0.5, y/H - 0.5, z/W."""
    x = joints_patch[..., 0] / patch_width - 0.5
    y = joints_patch[..., 1] / patch_height - 0.5
    z = joints_patch[..., 2] / patch_width
    return jnp.stack([x, y, z], axis=-1)


def decode_labels(label: jnp.ndarray, patch_width: float,
                  patch_height: float) -> jnp.ndarray:
    """Inverse of :func:`encode_labels` (augment.py:186-194
    `test_get_joint_loc_res`)."""
    x = (label[..., 0] + 0.5) * patch_width
    y = (label[..., 1] + 0.5) * patch_height
    z = label[..., 2] * patch_width
    return jnp.stack([x, y, z], axis=-1)


def patch_to_image_3d(coords_patch: jnp.ndarray, trans_inv: jnp.ndarray,
                      tprime: jnp.ndarray) -> jnp.ndarray:
    """Patch-space (x, y, z_rel) -> image-space (u, v, z_mm)
    (augment.py:196-217 `trans_coords_from_patch_to_org_3d`): apply the
    inverse patch transform to (x, y) and add tprime back to z.

    Args:
        coords_patch: (..., N, 3).
        trans_inv: (..., 3, 3) patch->image transform.
        tprime: (...,) canonical-depth offset.
    """
    uv = transforms.transform_points_2d(coords_patch[..., :2], trans_inv)
    z = coords_patch[..., 2] + tprime[..., None]
    return jnp.concatenate([uv, z[..., None]], axis=-1)


class PatchLabels(NamedTuple):
    """Everything `generate_patch_image` computes besides the pixels
    (augment.py:358-413)."""

    joint_img: jnp.ndarray             # (N, 3) patch-frame pre-crop: (u, v, z_mm - tprime)
    joint_img_orig: jnp.ndarray        # (N, 3) unrotated image coords, root-relative z
    joint_cam_normalized: jnp.ndarray  # (N, 3) tprime-normalised camera GT
    joint_patch: jnp.ndarray           # (N, 3) after the crop transform — label source
    label: jnp.ndarray                 # (N, 3) encoded label
    tprime: jnp.ndarray                # () canonical depth
    trans: jnp.ndarray                 # (3, 3) image->patch transform
    trans_inv: jnp.ndarray             # (3, 3) patch->image transform
    bbox: jnp.ndarray                  # (4,) (cx, cy, w, h) used for the crop


def compute_patch_labels(joint_cam: jnp.ndarray, R: jnp.ndarray,
                         K: jnp.ndarray, bbox: jnp.ndarray,
                         patch_width: int = 224, patch_height: int = 224,
                         scale: float = 1.0,
                         scaling_constant: float = 100.0,
                         root_idx: int = FreiHandJoints.root_idx
                         ) -> PatchLabels:
    """The label half of reference augment.py:358-413 `generate_patch_image`.

    Given camera-frame GT joints, the augmentation rotation R, intrinsics K
    and a crop bbox, computes tprime, the tprime-normalised camera GT, the
    patch-frame joints and the encoded label. Fully vmappable: stack inputs
    on a leading batch axis and `jax.vmap` this function.
    """
    from hand_integral_pose_estimation_tpu.geometry import bbox as bbox_mod

    # unrotated projection for joint_img_orig (augment.py:363-368)
    uv_orig, z_orig, _ = camera.project_points(joint_cam, jnp.eye(3, dtype=K.dtype), K)
    z_rel = z_orig - z_orig[..., root_idx][..., None]
    joint_img_orig = jnp.concatenate([uv_orig, z_rel[..., None]], axis=-1)

    # rotated projection drives the bbox + normalisation (augment.py:374)
    uv, z, xyz_rot = camera.project_points(joint_cam, R, K)

    tprime = bbox_mod.tprime_from_bbox(bbox, K, scaling_constant)
    # canonical hand scale: z[root] -> tprime (augment.py:395)
    joint_cam_normalized = joint_cam * (tprime / z[..., root_idx])[..., None, None]

    uv_s, z_s, _ = camera.project_points(joint_cam_normalized, R, K)
    joint_img = jnp.concatenate(
        [uv_s, (z_s - tprime[..., None])[..., None]], axis=-1
    )

    trans = transforms.trans_from_patch(
        bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3],
        patch_width, patch_height, scale=scale, inv=False,
    )
    trans_inv = transforms.trans_from_patch(
        bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3],
        patch_width, patch_height, scale=scale, inv=True,
    )
    uv_patch = transforms.transform_points_2d(joint_img[..., :2], trans)
    joint_patch = jnp.concatenate([uv_patch, joint_img[..., 2:3]], axis=-1)
    label = encode_labels(joint_patch, patch_width, patch_height)
    return PatchLabels(
        joint_img=joint_img,
        joint_img_orig=joint_img_orig,
        joint_cam_normalized=joint_cam_normalized,
        joint_patch=joint_patch,
        label=label,
        tprime=tprime,
        trans=trans,
        trans_inv=trans_inv,
        bbox=bbox,
    )


def compute_patch_labels_from_normalized(joint_cam_normalized: jnp.ndarray,
                                         tprime: jnp.ndarray, R: jnp.ndarray,
                                         K: jnp.ndarray, bbox: jnp.ndarray,
                                         patch_width: int = 224,
                                         patch_height: int = 224,
                                         scale: float = 1.0) -> jnp.ndarray:
    """Label for cached normalised-camera joints (teacher pseudo-GT) under a
    new augmentation, matching `generate_patch_image_from_normalized`
    (augment.py:415-446): project under (R, K), z = z_mm - tprime, apply the
    crop transform, encode. Returns the encoded (N, 3) label."""
    uv_s, z_s, _ = camera.project_points(joint_cam_normalized, R, K)
    trans = transforms.trans_from_patch(
        bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3],
        patch_width, patch_height, scale=scale, inv=False,
    )
    uv_patch = transforms.transform_points_2d(uv_s, trans)
    joint_patch = jnp.concatenate(
        [uv_patch, (z_s - tprime[..., None])[..., None]], axis=-1
    )
    return encode_labels(joint_patch, patch_width, patch_height)


def patch_label_to_camera(label: jnp.ndarray, trans_inv: jnp.ndarray,
                          tprime: jnp.ndarray, K: jnp.ndarray,
                          R: jnp.ndarray | None = None,
                          patch_width: int = 224, patch_height: int = 224,
                          derotate: bool = True) -> jnp.ndarray:
    """Full decode: network label -> normalised camera-frame joints.

    The back-projection used in eval (FreiHand.py:686-725): decode the label,
    map patch->image, pixel2cam with K, and (optionally) undo the
    augmentation rotation with R^T. The result is in tprime-normalised
    camera space; multiply by z_root*1000/tprime to recover metric joints
    (FreiHand.py:615).
    """
    coords = decode_labels(label, patch_width, patch_height)
    img_coords = patch_to_image_3d(coords, trans_inv, tprime)
    cam = camera.pixel2cam(img_coords, K)
    if derotate and R is not None:
        cam = jnp.einsum("...ji,...nj->...ni", R, cam)  # R^T @ cam
    return cam
