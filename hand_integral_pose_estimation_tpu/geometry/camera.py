"""Pinhole-camera projection math as pure, vmappable JAX functions.

Behavioural equivalents of the reference's NumPy/torch routines
(common/augment.py:80-121). Unlike the reference, these never mutate their
inputs and work for any batch shape via `jax.vmap`.

Unit convention carried over from the reference: 3D points are in metres,
but the *depth channel* of pixel-space coordinates is millimetres
(augment.py:87 multiplies by 1000; augment.py:100 divides it back).
"""

from __future__ import annotations

import jax.numpy as jnp


def project_points(xyz: jnp.ndarray, R: jnp.ndarray, K: jnp.ndarray):
    """Project camera-frame 3D points into the image plane.

    Equivalent of reference augment.py:80-87 `projectPoints`.

    Args:
        xyz: (..., N, 3) points in camera coordinates (metres).
        R: (..., 3, 3) rotation applied before projection (augmentation rot).
        K: (..., 3, 3) intrinsics.

    Returns:
        uv: (..., N, 2) pixel coordinates.
        z_mm: (..., N) rotated depth in millimetres (z * 1000).
        xyz_rot: (..., N, 3) rotated points.
    """
    xyz_rot = jnp.einsum("...ij,...nj->...ni", R, xyz)
    uvw = jnp.einsum("...ij,...nj->...ni", K, xyz_rot)
    uv = uvw[..., :2] / uvw[..., 2:3]
    z_mm = xyz_rot[..., 2] * 1000.0
    return uv, z_mm, xyz_rot


def pixel2cam(pixel_coord: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Back-project pixel coordinates (u, v, z_mm) into camera space.

    Equivalent of reference augment.py:89-103 `pixel2cam` (without its
    argument mutation): xyz = K^-1 [u, v, 1]^T * (z_mm / 1000).

    Args:
        pixel_coord: (..., N, 3) of (u, v, depth-in-mm).
        K: (..., 3, 3) intrinsics.

    Returns:
        (..., N, 3) camera-frame points in metres.
    """
    uv1 = jnp.concatenate(
        [pixel_coord[..., :2], jnp.ones_like(pixel_coord[..., 2:3])], axis=-1
    )
    K_inv = jnp.linalg.inv(K)
    rays = jnp.einsum("...ij,...nj->...ni", K_inv, uv1)
    z = pixel_coord[..., 2:3] / 1000.0
    return rays * z


def cam2pixel(xyz: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Forward projection returning the (u, v, z_mm) triplet used throughout
    the patch pipeline (inverse of :func:`pixel2cam`)."""
    uvw = jnp.einsum("...ij,...nj->...ni", K, xyz)
    uv = uvw[..., :2] / uvw[..., 2:3]
    return jnp.concatenate([uv, xyz[..., 2:3] * 1000.0], axis=-1)
