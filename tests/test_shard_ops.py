"""Under-mesh Pallas kernel coverage (VERDICT r2 #3).

Mesh-compatibility statement (asserted below, interpret mode on the
virtual 8-device (data=4, model=2) CPU mesh):

  * `softmax_integral` (Pallas online-softmax): data-parallel via
    shard_map — per-shard outputs and gradients equal the unsharded path.
  * fused `head_projection_integral`: data x model partitioned when
    J % model_size == 0 (the model-sharded final projection is consumed
    IN PLACE, out_specs (data, model, -)); falls back to data-parallel
    with a replicated weight view otherwise (J=21 on model=2 splits a
    joint's softmax segment, which the kernel cannot do) — both paths
    match the unsharded forward AND grads (dW gets the automatic psum
    over `data`).
  * Pallas `warp_perspective_batch`: data-parallel via shard_map.
  * Plain-jit feeding of sharded operands into a pallas_call remains
    CORRECT but replicates (the partitioner all-gathers around the opaque
    custom call) — that is why the wrappers exist.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from hand_integral_pose_estimation_tpu.ops.fused_head import (
    head_projection_integral,
)
from hand_integral_pose_estimation_tpu.ops.integral import softmax_integral
from hand_integral_pose_estimation_tpu.ops.warp import warp_perspective_batch
from hand_integral_pose_estimation_tpu.parallel import (
    make_mesh,
    sharded_head_projection_integral,
    sharded_softmax_integral,
    sharded_warp_perspective_batch,
)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() == 8
    return make_mesh(model_parallelism=2)


def _put(mesh, x, *names):
    return jax.device_put(x, NamedSharding(mesh, P(*names)))


class TestShardedIntegral:
    def test_matches_unsharded(self, mesh):
        J, D = 6, 8
        hm = np.random.default_rng(0).normal(
            size=(8, 16, 16, J * D)).astype(np.float32) * 3
        ref = softmax_integral(jnp.asarray(hm), J, D, impl="pallas",
                               interpret=True)
        with jax.set_mesh(mesh):
            out = jax.jit(lambda x: sharded_softmax_integral(
                x, J, D, mesh=mesh, impl="pallas", interpret=True))(
                _put(mesh, hm, "data"))
        assert out.sharding.spec == P("data")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=1e-6)

    def test_grad_matches(self, mesh):
        J, D = 6, 8
        hm = np.random.default_rng(1).normal(
            size=(8, 8, 8, J * D)).astype(np.float32)

        def loss(x, shard):
            c = (sharded_softmax_integral(x, J, D, mesh=mesh,
                                          impl="pallas", interpret=True)
                 if shard else softmax_integral(x, J, D, impl="pallas",
                                                interpret=True))
            return jnp.sum(jnp.sin(c))

        g_ref = jax.grad(lambda x: loss(x, False))(jnp.asarray(hm))
        with jax.set_mesh(mesh):
            g = jax.jit(jax.grad(lambda x: loss(x, True)))(
                _put(mesh, hm, "data"))
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-6)


class TestShardedFusedHead:
    def _data(self, J, D, seed=2):
        rng = np.random.default_rng(seed)
        feats = rng.normal(size=(8, 8, 8, 32)).astype(np.float32)
        W = rng.normal(size=(32, J * D)).astype(np.float32) * 0.3
        b = rng.normal(size=(J * D,)).astype(np.float32) * 0.1
        return feats, W, b

    @pytest.mark.parametrize("J", [6, 7])   # 6: model split; 7: fallback
    def test_matches_unsharded(self, mesh, J):
        D = 8
        feats, W, b = self._data(J, D)
        ref = head_projection_integral(jnp.asarray(feats), jnp.asarray(W),
                                       jnp.asarray(b), J, D, "pallas",
                                       interpret=True)
        with jax.set_mesh(mesh):
            # the model-sharded final projection is consumed in place
            out = jax.jit(lambda f, w, bb: sharded_head_projection_integral(
                f, w, bb, J, D, mesh=mesh, impl="pallas",
                interpret=True))(
                _put(mesh, feats, "data"),
                _put(mesh, W, None, "model"),
                _put(mesh, b, "model"))
        if J % 2 == 0:
            assert out.sharding.spec == P("data", "model")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=1e-6)

    @pytest.mark.parametrize("J", [6, 7])
    def test_grads_match(self, mesh, J):
        """dW/db get the automatic psum over `data`; dfeats stays
        data-sharded. Both model-split and fallback paths."""
        D = 8
        feats, W, b = self._data(J, D, seed=3)

        def loss(f, w, bb, shard):
            c = (sharded_head_projection_integral(
                    f, w, bb, J, D, mesh=mesh, impl="pallas",
                    interpret=True) if shard
                 else head_projection_integral(f, w, bb, J, D, "pallas",
                                               interpret=True))
            return jnp.sum(jnp.sin(c))

        refs = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2))(
            jnp.asarray(feats), jnp.asarray(W), jnp.asarray(b))
        with jax.set_mesh(mesh):
            grads = jax.jit(jax.grad(
                lambda *a: loss(*a, True), argnums=(0, 1, 2)))(
                _put(mesh, feats, "data"),
                _put(mesh, W, None, "model"),
                _put(mesh, b, "model"))
        for g, r in zip(grads, refs):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-4, atol=1e-6)


class TestShardedWarp:
    def test_pallas_warp_matches(self, mesh):
        rng = np.random.default_rng(4)
        imgs = rng.uniform(size=(8, 16, 16, 8)).astype(np.float32)
        theta = rng.uniform(-0.3, 0.3, size=(8,))
        H = np.tile(np.eye(3, dtype=np.float32), (8, 1, 1))
        H[:, 0, 0] = np.cos(theta)
        H[:, 0, 1] = -np.sin(theta)
        H[:, 1, 0] = np.sin(theta)
        H[:, 1, 1] = np.cos(theta)
        ref = warp_perspective_batch(jnp.asarray(imgs), jnp.asarray(H),
                                     (16, 16), method="pallas")
        with jax.set_mesh(mesh):
            out = jax.jit(lambda im, h: sharded_warp_perspective_batch(
                im, h, (16, 16), mesh=mesh, method="pallas"))(
                _put(mesh, imgs, "data"), _put(mesh, H, "data"))
        assert out.sharding.spec == P("data")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


class TestPlainJitReplicates:
    def test_pallas_under_plain_jit_is_correct_but_replicated(self, mesh):
        """The motivating observation: without shard_map the kernel still
        computes the right thing, but the output loses its sharding."""
        J, D = 6, 8
        hm = np.random.default_rng(5).normal(
            size=(8, 8, 8, J * D)).astype(np.float32)
        ref = softmax_integral(jnp.asarray(hm), J, D, impl="pallas",
                               interpret=True)
        with jax.set_mesh(mesh):
            out = jax.jit(lambda x: softmax_integral(
                x, J, D, impl="pallas", interpret=True))(
                _put(mesh, hm, "data"))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=1e-6)
        assert out.sharding.spec == P()   # replicated — the gather fallback
