"""2D projective transforms: homographies, patch-crop transforms, point maps.

TPU-first rethink of the reference's cv2-based transform plumbing
(common/augment.py:448-517). The reference warps every image twice — once by
the rotation homography K R K^-1 (augment.py:370-371) and once by the 4-point
bbox crop (augment.py:408-409). Here both are plain 3x3 matrices that compose
into a single homography, so the image is resampled exactly once (see
ops/warp.py) and labels transform with the same matrices.
"""

from __future__ import annotations

import jax.numpy as jnp


def get_perspective_transform(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Homography mapping 4 src points to 4 dst points.

    Drop-in equivalent of cv2.getPerspectiveTransform (used at reference
    augment.py:502-504): solves the standard 8x8 linear system for the 8
    homography DoF with h33 = 1.

    Args:
        src: (..., 4, 2) source points.
        dst: (..., 4, 2) destination points.

    Returns:
        (..., 3, 3) homography H with dst ~ H @ src.
    """
    x, y = src[..., 0], src[..., 1]
    X, Y = dst[..., 0], dst[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    # rows for X: [x y 1 0 0 0 -Xx -Xy] ; rows for Y: [0 0 0 x y 1 -Yx -Yy]
    ax = jnp.stack([x, y, ones, zeros, zeros, zeros, -X * x, -X * y], axis=-1)
    ay = jnp.stack([zeros, zeros, zeros, x, y, ones, -Y * x, -Y * y], axis=-1)
    A = jnp.concatenate([ax, ay], axis=-2)          # (..., 8, 8)
    b = jnp.concatenate([X, Y], axis=-1)            # (..., 8)
    h = jnp.linalg.solve(A, b[..., None])[..., 0]   # (..., 8)
    ones_h = jnp.ones(h.shape[:-1] + (1,), h.dtype)
    return jnp.concatenate([h, ones_h], axis=-1).reshape(h.shape[:-1] + (3, 3))


def patch_corner_points(c_x, c_y, src_w, src_h, dst_w, dst_h, scale=1.0):
    """The 4 src/dst correspondences defining the bbox->patch crop.

    Corner ordering follows reference augment.py:476-499 exactly:
    (left-top, left-bottom, right-top, right-bottom) of the scaled bbox map to
    ((0,0), (0,H), (W,0), (W,H)).
    """
    w = src_w * scale
    h = src_h * scale
    src = jnp.stack(
        [
            jnp.stack([c_x - w * 0.5, c_y - h * 0.5], axis=-1),
            jnp.stack([c_x - w * 0.5, c_y + h * 0.5], axis=-1),
            jnp.stack([c_x + w * 0.5, c_y - h * 0.5], axis=-1),
            jnp.stack([c_x + w * 0.5, c_y + h * 0.5], axis=-1),
        ],
        axis=-2,
    )
    zero = jnp.zeros_like(jnp.asarray(dst_w, src.dtype))
    W = jnp.asarray(dst_w, src.dtype)
    H = jnp.asarray(dst_h, src.dtype)
    dst = jnp.stack(
        [
            jnp.stack([zero, zero], axis=-1),
            jnp.stack([zero, H], axis=-1),
            jnp.stack([W, zero], axis=-1),
            jnp.stack([W, H], axis=-1),
        ],
        axis=-2,
    )
    dst = jnp.broadcast_to(dst, src.shape)
    return src, dst


def trans_from_patch(c_x, c_y, src_w, src_h, dst_w, dst_h, scale=1.0, inv=False):
    """bbox -> patch transform (equivalent of augment.py:457-506
    `gen_trans_from_patch_cv`).

    Because the 4 correspondences are corresponding corners of two axis-aligned
    rectangles, the exact solution is affine (scale + translate); we build it
    in closed form rather than solving the 8x8 system. `tests/test_transforms.py`
    asserts closed form == general solver.

    Returns a (..., 3, 3) matrix (last row [0, 0, 1]).
    """
    c_x = jnp.asarray(c_x)
    dt = jnp.result_type(c_x.dtype, jnp.asarray(c_y).dtype,
                         jnp.asarray(src_w).dtype, jnp.float32)
    c_x = c_x.astype(dt)
    c_y = jnp.asarray(c_y, dt)
    w = jnp.asarray(src_w, dt) * jnp.asarray(scale, dt)
    h = jnp.asarray(src_h, dt) * jnp.asarray(scale, dt)
    sx = jnp.asarray(dst_w, dt) / w
    sy = jnp.asarray(dst_h, dt) / h
    tx = -sx * (c_x - w * 0.5)
    ty = -sy * (c_y - h * 0.5)
    if inv:
        sx, sy = 1.0 / sx, 1.0 / sy
        tx = c_x - jnp.asarray(dst_w, dt) * 0.5 * sx
        ty = c_y - jnp.asarray(dst_h, dt) * 0.5 * sy
    zero = jnp.zeros_like(sx)
    one = jnp.ones_like(sx)
    row0 = jnp.stack([sx, zero, tx], axis=-1)
    row1 = jnp.stack([zero, sy, ty], axis=-1)
    row2 = jnp.stack([zero, zero, one], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotation_homography(K: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """Camera-rotation-as-image-warp homography K R K^-1 (augment.py:370)."""
    return K @ R @ jnp.linalg.inv(K)


def transform_points_2d(points: jnp.ndarray, H: jnp.ndarray) -> jnp.ndarray:
    """Apply a homography to 2D points (projective divide).

    Generalises reference augment.py:508-511 `trans_point2d` to batches. For
    the affine patch transforms the divide is a no-op (w == 1).

    Args:
        points: (..., N, 2).
        H: (..., 3, 3).
    """
    ones = jnp.ones_like(points[..., :1])
    pts_h = jnp.concatenate([points, ones], axis=-1)
    out = jnp.einsum("...ij,...nj->...ni", H, pts_h)
    return out[..., :2] / out[..., 2:3]
