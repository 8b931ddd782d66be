"""Fused projection+integral: equality with the unfused composition, both
values and gradients, XLA and interpreted-Pallas paths."""

import jax
import jax.numpy as jnp
import numpy as np

from hand_integral_pose_estimation_tpu.ops.fused_head import (
    head_projection_integral,
)
from hand_integral_pose_estimation_tpu.ops.integral import softmax_integral


def _setup(rng, B=2, H=8, W=8, F=32, J=3, D=4):
    feats = jnp.asarray(rng.randn(B, H, W, F).astype(np.float32) * 0.5)
    Wm = jnp.asarray(rng.randn(F, J * D).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(J * D).astype(np.float32) * 0.1)
    return feats, Wm, b, J, D


def _unfused(feats, Wm, b, J, D):
    hm = jnp.einsum("bhwf,fc->bhwc", feats, Wm) + b
    return softmax_integral(hm, J, D, impl="xla")


class TestForward:
    def test_xla_path_matches_unfused(self, rng):
        feats, Wm, b, J, D = _setup(rng)
        got = head_projection_integral(feats, Wm, b, J, D, impl="xla")
        want = _unfused(feats, Wm, b, J, D)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_pallas_path_matches_unfused(self, rng):
        feats, Wm, b, J, D = _setup(rng)
        got = head_projection_integral(feats, Wm, b, J, D, impl="pallas",
                                       interpret=True)
        want = _unfused(feats, Wm, b, J, D)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_production_shape_interpret(self, rng):
        feats, Wm, b, J, D = _setup(rng, B=1, H=56, W=56, F=64, J=21, D=56)
        got = head_projection_integral(feats, Wm, b, J, D, impl="pallas",
                                       interpret=True)
        want = _unfused(feats, Wm, b, J, D)
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestGradients:
    def _loss(self, impl, interpret):
        def fn(feats, Wm, b, J, D, target):
            c = head_projection_integral(feats, Wm, b, J, D, impl=impl,
                                         interpret=interpret)
            return jnp.sum((c - target) ** 2)
        return fn

    def _loss_unfused(self, feats, Wm, b, J, D, target):
        c = _unfused(feats, Wm, b, J, D)
        return jnp.sum((c - target) ** 2)

    def test_xla_grads_match_autodiff(self, rng):
        feats, Wm, b, J, D = _setup(rng)
        target = jnp.asarray(rng.randn(2, J, 3).astype(np.float32) * 0.1)
        g1 = jax.grad(self._loss("xla", False), argnums=(0, 1, 2))(
            feats, Wm, b, J, D, target)
        g2 = jax.grad(self._loss_unfused, argnums=(0, 1, 2))(
            feats, Wm, b, J, D, target)
        for a, c in zip(g1, g2):
            np.testing.assert_allclose(a, c, atol=2e-5)

    def test_pallas_grads_match_autodiff(self, rng):
        feats, Wm, b, J, D = _setup(rng)
        target = jnp.asarray(rng.randn(2, J, 3).astype(np.float32) * 0.1)
        g1 = jax.grad(self._loss("pallas", True), argnums=(0, 1, 2))(
            feats, Wm, b, J, D, target)
        g2 = jax.grad(self._loss_unfused, argnums=(0, 1, 2))(
            feats, Wm, b, J, D, target)
        for a, c in zip(g1, g2):
            np.testing.assert_allclose(a, c, atol=2e-5)

    def test_bf16_features(self, rng):
        feats, Wm, b, J, D = _setup(rng)
        got = head_projection_integral(feats.astype(jnp.bfloat16),
                                       Wm.astype(jnp.bfloat16), b, J, D,
                                       impl="pallas", interpret=True)
        want = _unfused(feats, Wm, b, J, D)
        np.testing.assert_allclose(got, want, atol=3e-2)
