"""Pose network + losses: shapes, init stats, gradients, loss semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hand_integral_pose_estimation_tpu import losses
from hand_integral_pose_estimation_tpu.config import ModelConfig
from hand_integral_pose_estimation_tpu.models import (
    DeconvHead,
    ResNetBackbone,
    get_pose_net,
)


def tiny_cfg():
    # small input for CPU tests; architecture identical
    return ModelConfig(resnet_type=18, input_shape=(64, 64),
                       output_shape=(16, 16), depth_dim=8, num_joints=21,
                       compute_dtype="float32")


class TestBackbone:
    @pytest.mark.parametrize("rt,cout", [(18, 512), (50, 2048)])
    def test_stride32_output(self, rt, cout):
        m = ResNetBackbone(resnet_type=rt)
        x = jnp.zeros((1, 64, 64, 3))
        vars_ = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(vars_, x)
        assert y.shape == (1, 2, 2, cout)

    def test_c4_split_matches_full(self):
        # num_stages=3 -> stride 16, 1024 ch for R50 (detector base contract)
        m = ResNetBackbone(resnet_type=50, num_stages=3)
        x = jnp.zeros((1, 64, 64, 3))
        vars_ = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(vars_, x)
        assert y.shape == (1, 4, 4, 1024)

    def test_batch_stats_updated_in_train(self):
        m = ResNetBackbone(resnet_type=18)
        x = jnp.ones((2, 32, 32, 3))
        vars_ = m.init(jax.random.PRNGKey(0), x)
        _, new_state = m.apply(vars_, x, train=True,
                               mutable=["batch_stats"])
        old = jax.tree_util.tree_leaves(vars_["batch_stats"])
        new = jax.tree_util.tree_leaves(new_state["batch_stats"])
        assert any(not np.allclose(a, b) for a, b in zip(old, new))


class TestPoseNet:
    def test_heatmap_shape(self):
        cfg = tiny_cfg()
        net = get_pose_net(cfg)
        x = jnp.zeros((2, 64, 64, 3))
        vars_ = net.init(jax.random.PRNGKey(0), x)
        hm = net.apply(vars_, x)
        # input/4 spatial, J*depth channels (model.py:16, config.py:24-25)
        assert hm.shape == (2, 16, 16, 21 * 8)

    def test_decode_integration(self):
        cfg = tiny_cfg()
        net = get_pose_net(cfg)
        x = jnp.zeros((1, 64, 64, 3))
        vars_ = net.init(jax.random.PRNGKey(0), x)
        hm = net.apply(vars_, x)
        coords = net.decode(hm, impl="xla")
        assert coords.shape == (1, 21, 3)
        assert bool(jnp.isfinite(coords).all())
        assert float(jnp.abs(coords).max()) <= 0.5

    def test_init_statistics(self):
        # conv init ~ N(0, 0.001) (resnet.py:35, model.py:49,55)
        cfg = tiny_cfg()
        net = get_pose_net(cfg)
        vars_ = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        k = vars_["params"]["head"]["final"]["kernel"]
        assert float(jnp.std(k)) < 0.01
        b = vars_["params"]["head"]["final"]["bias"]
        np.testing.assert_allclose(b, 0.0)

    @pytest.mark.slow
    def test_gradients_flow_end_to_end(self):
        cfg = tiny_cfg()
        net = get_pose_net(cfg)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3),
                        jnp.float32)
        vars_ = net.init(jax.random.PRNGKey(0), x)
        target = jnp.zeros((1, 21, 3))

        def loss_fn(params):
            hm = net.apply({"params": params,
                            "batch_stats": vars_["batch_stats"]}, x)
            c = net.decode(hm, impl="xla")
            return jnp.sum(jnp.abs(c - target))

        grads = jax.grad(loss_fn)(vars_["params"])
        gnorm = sum(float(jnp.abs(g).sum())
                    for g in jax.tree_util.tree_leaves(grads))
        assert np.isfinite(gnorm) and gnorm > 0

    def test_deconv_head_upsamples_8x(self):
        head = DeconvHead(num_joints=4, depth_dim=4, channels=32)
        x = jnp.zeros((1, 4, 4, 64))
        vars_ = head.init(jax.random.PRNGKey(0), x)
        y = head.apply(vars_, x)
        assert y.shape == (1, 32, 32, 16)

    @pytest.mark.slow
    def test_phase_deconv_matches_conv_transpose(self, rng):
        """The TPU-fast dense phase-conv lowering is numerically identical
        to nn.ConvTranspose from the SAME parameters (checkpoints are
        interchangeable)."""
        x = jnp.asarray(rng.randn(2, 5, 7, 6).astype(np.float32))
        ht = DeconvHead(num_joints=2, depth_dim=2, channels=8,
                        num_layers=2, deconv_impl="transpose")
        hp = DeconvHead(num_joints=2, depth_dim=2, channels=8,
                        num_layers=2, deconv_impl="phase")
        vars_ = ht.init(jax.random.PRNGKey(1), x)
        yt = ht.apply(vars_, x)
        yp = hp.apply(vars_, x)
        assert yt.shape == yp.shape == (2, 20, 28, 4)
        np.testing.assert_allclose(np.asarray(yp), np.asarray(yt),
                                   rtol=1e-6, atol=1e-6)


class TestLosses:
    def test_joint_location_loss_masking(self, rng):
        pred = jnp.asarray(rng.randn(4, 21, 3))
        gt = jnp.asarray(rng.randn(4, 21, 3))
        full = losses.joint_location_loss(pred, gt, jnp.ones((4, 21, 3)))
        none = losses.joint_location_loss(pred, gt, jnp.zeros((4, 21, 3)))
        assert float(none) == 0.0
        assert float(full) > 0

    def test_combined_loss_supervised_only(self, rng):
        pred = jnp.asarray(rng.randn(4, 21, 3) * 0.1)
        gt = jnp.asarray(rng.randn(4, 21, 3) * 0.1)
        teacher = jnp.asarray(rng.randn(4, 21, 3) * 0.1)
        vis = jnp.ones((4, 21, 3))
        eye = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
        out = losses.combined_loss(
            pred, teacher, gt, vis,
            labelled=jnp.array([True] * 4),
            trans_inv=eye, tprime=jnp.ones(4), K=eye,
        )
        expected = float(jnp.abs(pred - gt).sum() / 4)
        np.testing.assert_allclose(float(out.loss), expected, rtol=1e-6)

    def test_combined_loss_unsupervised_teacher_term(self, rng):
        pred = jnp.asarray(rng.randn(4, 21, 3) * 0.1)
        gt = jnp.asarray(rng.randn(4, 21, 3) * 0.1)
        teacher = jnp.asarray(rng.randn(4, 21, 3) * 0.1)
        vis = jnp.ones((4, 21, 3))
        eye = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
        out = losses.combined_loss(
            pred, teacher, gt, vis,
            labelled=jnp.array([False] * 4),
            trans_inv=eye, tprime=jnp.ones(4), K=eye,
        )
        expected = float(jnp.abs(pred - teacher).sum() / 4)
        np.testing.assert_allclose(float(out.loss), expected, rtol=1e-6)

    def test_combined_loss_mixed_batch(self, rng):
        pred = jnp.asarray(rng.randn(4, 21, 3) * 0.1)
        gt = jnp.asarray(rng.randn(4, 21, 3) * 0.1)
        teacher = jnp.asarray(rng.randn(4, 21, 3) * 0.1)
        vis = jnp.ones((4, 21, 3))
        eye = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
        labelled = jnp.array([True, False, True, False])
        out = losses.combined_loss(pred, teacher, gt, vis, labelled,
                                   eye, jnp.ones(4), eye)
        sup = jnp.abs(pred - gt)[jnp.array([0, 2])].sum()
        unsup = jnp.abs(pred - teacher)[jnp.array([1, 3])].sum()
        np.testing.assert_allclose(float(out.loss),
                                   float((sup + unsup) / 4), rtol=1e-6)

    def test_panet_term_masked_and_weighted(self, rng):
        pred = jnp.asarray(rng.randn(2, 21, 3) * 0.05)
        gt = teacher = pred  # zero teacher/sup terms
        vis = jnp.ones((2, 21, 3))
        K = jnp.broadcast_to(
            jnp.array([[530.0, 0, 112], [0, 530.0, 112], [0, 0, 1.0]]),
            (2, 3, 3))
        trans_inv = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
        tprime = jnp.full((2,), 300.0)

        def panet_stub(x):
            return x + 1.0  # constant residual -> loss = lam * |1| * count

        out = losses.combined_loss(
            pred, teacher, gt, vis, jnp.array([False, True]),
            trans_inv, tprime, K, panet_apply=panet_stub, lam=0.5)
        # only the unlabelled row contributes: 0.5 * 1 * 21*3 / B
        np.testing.assert_allclose(float(out.loss), 0.5 * 63 / 2, rtol=1e-6)

    def test_prepare_panet_input_centred(self, rng):
        coords = jnp.asarray(rng.uniform(-0.4, 0.4, (3, 21, 3)))
        K = jnp.broadcast_to(
            jnp.array([[530.0, 0, 112], [0, 530.0, 112], [0, 0, 1.0]]),
            (3, 3, 3))
        out = losses.prepare_panet_input(
            coords, jnp.broadcast_to(jnp.eye(3), (3, 3, 3)),
            jnp.full((3,), 300.0), K)
        np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-12)

    def test_mpjpe(self):
        a = jnp.zeros((2, 21, 3))
        b = jnp.ones((2, 21, 3))
        np.testing.assert_allclose(losses.compute_mpjpe(a, b), np.sqrt(3.0),
                                   rtol=1e-6)


class TestFusedHeadPath:
    def test_eval_step_fused_matches_unfused(self, rng):
        """model(return_features) + fused projection == full forward +
        integral, through the real eval step."""
        from hand_integral_pose_estimation_tpu.config import Config
        from hand_integral_pose_estimation_tpu.data import pipeline
        from hand_integral_pose_estimation_tpu.training import (
            create_train_state,
        )
        from hand_integral_pose_estimation_tpu.training.train_step import (
            make_eval_step,
        )
        cfg = Config(model=tiny_cfg())
        net = get_pose_net(cfg.model)
        state, _ = create_train_state(
            net, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            cfg.train)

        imgs = jnp.asarray(np.random.RandomState(0).randint(
            0, 255, (2, 64, 64, 3)), jnp.uint8)
        joints = jnp.asarray(np.array([0.0, 0.0, 0.45])
                             + np.random.RandomState(1).uniform(
                                 -0.03, 0.03, (2, 21, 3)))
        K = jnp.broadcast_to(jnp.asarray(
            [[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1.0]]), (2, 3, 3))
        batch = pipeline.make_eval_batch(imgs, joints, K, None,
                                         jnp.ones(2), cfg.augment, (64, 64))

        fused = make_eval_step(net, cfg, integral_impl="xla",
                               fuse_head=True)
        unfused = make_eval_step(net, cfg, integral_impl="xla",
                                 fuse_head=False)
        c1, l1 = fused(state, batch)
        c2, l2 = unfused(state, batch)
        np.testing.assert_allclose(c1, c2, atol=1e-5)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
