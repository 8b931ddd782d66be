"""Rotation sampling and axis-angle math with threaded jax.random keys.

Replaces the reference's unseeded `random`/`np.random` + cv2.Rodrigues
augmentation RNG (common/augment.py:252-280) with reproducible, vmappable
`jax.random` sampling of the same distributions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle vector -> rotation matrix (cv2.Rodrigues equivalent).

    Uses the closed-form Rodrigues formula with a Taylor-safe branch at
    theta -> 0 so it is differentiable and jit-safe everywhere.

    Args:
        rvec: (..., 3) axis-angle vectors (norm = angle in radians).
    """
    theta = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    small = theta < 1e-8
    axis = rvec / jnp.where(small, 1.0, theta)
    theta = theta[..., 0]
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    s = jnp.sin(theta)[..., None, None]
    c = jnp.cos(theta)[..., None, None]
    R = eye + s * K + (1.0 - c) * (K @ K)
    return jnp.where(small[..., None], eye, R)


def rotation_z(theta: jnp.ndarray) -> jnp.ndarray:
    """Pure z-axis rotation matrix for a (batch of) angle(s)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero], axis=-1),
            jnp.stack([s, c, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


def sample_rotation_matrix(key: jax.Array, rot_prob: float = 0.4,
                           z_range: float = 0.52,
                           arbitrary_range: float = 0.05) -> jnp.ndarray:
    """Sample the augmentation rotation R = R1 @ R2.

    Distributionally equivalent to reference augment.py:252-280
    `sample_rotation_matrix`:
      * with prob (1 - rot_prob) return identity;
      * otherwise R1 = z-rotation by theta1 ~ U(-z_range, z_range), sign of
        the z axis randomised (the reference draws the z component from a
        standard normal, so the axis is +-z uniformly);
      * R2 = rotation by theta2 ~ U(-arbitrary_range, arbitrary_range) about a
        uniformly random 3D axis (isotropic Gaussian direction).

    Vmappable over keys for per-sample batched augmentation.
    """
    k_gate, k_t1, k_sgn, k_t2, k_axis = jax.random.split(key, 5)
    apply = jax.random.uniform(k_gate) > (1.0 - rot_prob)

    theta1 = jax.random.uniform(k_t1, minval=-z_range, maxval=z_range)
    # the z-axis sign follows the sign of a standard normal (augment.py:265-267)
    sgn = jnp.sign(jax.random.normal(k_sgn))
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    R1 = rodrigues(jnp.array([0.0, 0.0, 1.0]) * (sgn * theta1))

    theta2 = jax.random.uniform(k_t2, minval=-arbitrary_range,
                                maxval=arbitrary_range)
    axis = jax.random.normal(k_axis, (3,))
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-12)
    R2 = rodrigues(axis * theta2)

    R = R1 @ R2
    return jnp.where(apply, R, jnp.eye(3, dtype=R.dtype))


def sample_color_scale(key: jax.Array, color_factor: float = 0.2) -> jnp.ndarray:
    """Per-channel colour jitter in [1-f, 1+f] (augment.py:246-248)."""
    return jax.random.uniform(
        key, (3,), minval=1.0 - color_factor, maxval=1.0 + color_factor
    )
