"""Fused softmax-integral op: parity with the reference formulation,
Pallas-vs-XLA agreement, and gradient correctness."""

import numpy as np
import jax
import jax.numpy as jnp

from hand_integral_pose_estimation_tpu.ops import integral


def _reference_numpy(hm_nhwc, J, D):
    """Straight NumPy transcription of the math at loss.py:23-59: global
    softmax per joint over the volume, then per-axis expectations."""
    B, H, W, C = hm_nhwc.shape
    h = hm_nhwc.reshape(B, H, W, J, D).astype(np.float64)
    # volume per (b, j): (H, W, D)
    h = np.moveaxis(h, 3, 1)                      # (B, J, H, W, D)
    flat = h.reshape(B, J, -1)
    flat = flat - flat.max(axis=-1, keepdims=True)
    p = np.exp(flat) / np.exp(flat).sum(axis=-1, keepdims=True)
    p = p.reshape(B, J, H, W, D)
    ax = np.arange(W)
    ay = np.arange(H)
    az = np.arange(D)
    ex = (p.sum(axis=(2, 4)) * ax).sum(-1)
    ey = (p.sum(axis=(3, 4)) * ay).sum(-1)
    ez = (p.sum(axis=(2, 3)) * az).sum(-1)
    return np.stack([ex / W - 0.5, ey / H - 0.5, ez / D - 0.5], axis=-1)


class TestXlaImpl:
    def test_matches_numpy_reference(self, rng):
        B, H, W, J, D = 2, 8, 8, 5, 4
        hm = rng.randn(B, H, W, J * D).astype(np.float32) * 3
        got = integral.softmax_integral(jnp.asarray(hm), J, D, impl="xla")
        want = _reference_numpy(hm, J, D)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_peaked_heatmap_decodes_argmax(self):
        B, H, W, J, D = 1, 16, 16, 2, 8
        hm = np.zeros((B, H, W, J * D), np.float32)
        # joint 0 peak at (y=3, x=10, d=5); joint 1 at (y=12, x=1, d=2)
        hm[0, 3, 10, 0 * D + 5] = 60.0
        hm[0, 12, 1, 1 * D + 2] = 60.0
        c = np.asarray(integral.softmax_integral(jnp.asarray(hm), J, D,
                                                 impl="xla"))
        np.testing.assert_allclose(c[0, 0], [10 / W - 0.5, 3 / H - 0.5,
                                             5 / D - 0.5], atol=1e-4)
        np.testing.assert_allclose(c[0, 1], [1 / W - 0.5, 12 / H - 0.5,
                                             2 / D - 0.5], atol=1e-4)

    def test_uniform_heatmap_gives_center(self):
        B, H, W, J, D = 1, 8, 8, 3, 8
        hm = jnp.zeros((B, H, W, J * D))
        c = integral.softmax_integral(hm, J, D, impl="xla")
        # E[idx]/dim - 0.5 of a uniform = (dim-1)/(2 dim) - 0.5
        want = (np.array([W, H, D]) - 1) / (2 * np.array([W, H, D])) - 0.5
        np.testing.assert_allclose(np.broadcast_to(want, (1, J, 3)), c,
                                   atol=1e-6)

    def test_large_logits_stable(self, rng):
        hm = rng.randn(1, 8, 8, 3 * 4).astype(np.float32) * 1000
        c = integral.softmax_integral(jnp.asarray(hm), 3, 4, impl="xla")
        assert bool(jnp.isfinite(c).all())


class TestPallasImpl:
    def test_matches_xla(self, rng):
        B, H, W, J, D = 2, 8, 8, 5, 4
        hm = jnp.asarray(rng.randn(B, H, W, J * D).astype(np.float32) * 5)
        want = integral.softmax_integral(hm, J, D, impl="xla")
        got = integral.softmax_integral(hm, J, D, impl="pallas",
                                        interpret=True)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_matches_xla_full_size(self, rng):
        # production shape: 56x56x(21*56) — run a small batch through the
        # interpreter to validate the tiled online-softmax path
        B, H, W, J, D = 1, 56, 56, 21, 56
        hm = jnp.asarray(rng.randn(B, H, W, J * D).astype(np.float32) * 4)
        want = integral.softmax_integral(hm, J, D, impl="xla")
        got = integral.softmax_integral(hm, J, D, impl="pallas",
                                        interpret=True)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_multi_tile_online_accumulation(self, rng):
        # H*W = 64 with tile 32 forces >1 grid step per batch row; put the
        # max in the *second* tile to exercise the rescaling path
        B, H, W, J, D = 1, 8, 8, 2, 4
        hm = rng.randn(B, H, W, J * D).astype(np.float32)
        hm[0, 6, 3, 1] = 40.0
        hm = jnp.asarray(hm)
        want = integral.softmax_integral(hm, J, D, impl="xla")
        got = integral.softmax_integral(hm, J, D, impl="pallas",
                                        interpret=True)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_bfloat16_input(self, rng):
        B, H, W, J, D = 2, 8, 8, 3, 4
        hm = jnp.asarray(rng.randn(B, H, W, J * D).astype(np.float32))
        got32 = integral.softmax_integral(hm, J, D, impl="pallas",
                                          interpret=True)
        got16 = integral.softmax_integral(hm.astype(jnp.bfloat16), J, D,
                                          impl="pallas", interpret=True)
        np.testing.assert_allclose(got16, got32, atol=2e-2)


class TestGradient:
    def test_custom_vjp_matches_autodiff(self, rng):
        B, H, W, J, D = 1, 6, 6, 2, 4
        hm = jnp.asarray(rng.randn(B, H, W, J * D).astype(np.float32))
        target = jnp.asarray(rng.randn(B, J, 3).astype(np.float32) * 0.1)

        def loss_custom(h):
            c = integral.softmax_integral(h, J, D, impl="xla")
            return jnp.sum(jnp.abs(c - target))

        def loss_native(h):
            # same math without the custom VJP
            coords, _, _ = integral._softmax_integral_xla(h, J, D)
            return jnp.sum(jnp.abs(coords - target))

        g_custom = jax.grad(loss_custom)(hm)
        g_native = jax.grad(loss_native)(hm)
        np.testing.assert_allclose(g_custom, g_native, atol=1e-5)

    def test_grad_through_pallas(self, rng):
        B, H, W, J, D = 1, 6, 6, 2, 4
        hm = jnp.asarray(rng.randn(B, H, W, J * D).astype(np.float32))

        def loss(h, impl):
            c = integral.softmax_integral(h, J, D, impl=impl, interpret=True)
            return jnp.sum(c ** 2)

        g_p = jax.grad(lambda h: loss(h, "pallas"))(hm)
        g_x = jax.grad(lambda h: loss(h, "xla"))(hm)
        np.testing.assert_allclose(g_p, g_x, atol=1e-5)

    def test_finite_difference(self, rng):
        B, H, W, J, D = 1, 4, 4, 1, 2
        hm = rng.randn(B, H, W, J * D).astype(np.float64)

        def loss(h):
            c = integral.softmax_integral(h, J, D, impl="xla")
            return jnp.sum(jnp.sin(c))

        g = np.asarray(jax.grad(loss)(jnp.asarray(hm)))
        eps = 1e-6
        for idx in [(0, 0, 0, 0), (0, 2, 3, 1), (0, 3, 1, 0)]:
            hp = hm.copy(); hp[idx] += eps
            hn = hm.copy(); hn[idx] -= eps
            fd = (float(loss(jnp.asarray(hp))) - float(loss(jnp.asarray(hn)))) / (2 * eps)
            np.testing.assert_allclose(g[idx], fd, rtol=1e-4, atol=1e-8)


class TestAuxOutputs:
    def test_softmax_probs_normalised(self, rng):
        hm = jnp.asarray(rng.randn(2, 8, 8, 3 * 4).astype(np.float32))
        p = integral.softmax_probs(hm, 3, 4)
        assert p.shape == (2, 3, 8 * 8 * 4)
        np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)

    def test_entropy_bounds(self, rng):
        J, D, H, W = 3, 4, 8, 8
        hm_flat = jnp.zeros((1, H, W, J * D))
        ent_uniform = integral.heatmap_entropy(hm_flat, J, D)
        np.testing.assert_allclose(ent_uniform, np.log(H * W * D), atol=1e-5)
        # a peaked heatmap (one voxel per joint) has near-zero entropy
        hm = np.zeros((1, H, W, J * D), np.float32)
        for j in range(J):
            hm[0, 2, 2, j * D + 1] = 100.0
        ent_peak = integral.heatmap_entropy(jnp.asarray(hm), J, D)
        assert float(ent_peak.max()) < 1e-3


class TestTorchOracleParity:
    def test_matches_torch_reference_formulation(self, rng):
        """Direct parity with the reference op: torch softmax over the
        flattened (D, H, W) volume + per-axis marginal expectations
        (loss.py:23-59), on the same logical heatmap (NCHW channel j*D+d ==
        our NHWC channel j*D+d)."""
        import torch

        B, J, D, H, W = 2, 4, 6, 8, 8
        hm_nchw = rng.randn(B, J * D, H, W).astype(np.float32) * 3

        # torch reference math
        t = torch.from_numpy(hm_nchw)
        p = torch.softmax(t.reshape(B, J, D * H * W), dim=2)
        p = p.reshape(B, J, D, H, W)
        ax = torch.arange(W, dtype=torch.float32)
        ay = torch.arange(H, dtype=torch.float32)
        az = torch.arange(D, dtype=torch.float32)
        x = (p.sum(dim=(2, 3)) * ax).sum(-1) / W - 0.5
        y = (p.sum(dim=(2, 4)) * ay).sum(-1) / H - 0.5
        z = (p.sum(dim=(3, 4)) * az).sum(-1) / D - 0.5
        want = torch.stack([x, y, z], dim=-1).numpy()

        # ours: NHWC with the same channel semantics
        nhwc = np.transpose(hm_nchw, (0, 2, 3, 1))
        got = integral.softmax_integral(jnp.asarray(nhwc), J, D, impl="xla")
        np.testing.assert_allclose(got, want, atol=1e-5)
        got_p = integral.softmax_integral(jnp.asarray(nhwc), J, D,
                                          impl="pallas", interpret=True)
        np.testing.assert_allclose(got_p, want, atol=1e-5)
