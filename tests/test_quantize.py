"""Int8 PTQ: layer-level exactness vs fake-quant, calibration coverage,
end-to-end accuracy gate on a short-trained pose net, detector smoke.

The quantized path must (a) compute exactly the int8 arithmetic its scales
describe (layer oracles), and (b) keep the decoded joint coordinates of a
*trained* net within a tight budget of the fp forward (the serving-accuracy
gate for `bench.py --int8`)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hand_integral_pose_estimation_tpu.config import (
    Config,
    DetectorConfig,
    ModelConfig,
    TrainConfig,
)
from hand_integral_pose_estimation_tpu.detect.faster_rcnn import FasterRCNN
from hand_integral_pose_estimation_tpu.models import get_pose_net
from hand_integral_pose_estimation_tpu.quantize import (
    calibrate,
    quantize_model,
    quantize_params,
    quantized_apply,
    quantized_calls,
)


def _fq(w, per_channel_axis=None):
    """Fake-quantize to int8 symmetric; returns dequantized fp32."""
    w = np.asarray(w, np.float32)
    if per_channel_axis is None:
        s = np.abs(w).max() / 127.0
    else:
        red = tuple(i for i in range(w.ndim) if i != w.ndim - 1)
        s = np.abs(w).max(axis=red, keepdims=True) / 127.0
    s = np.maximum(s, 1e-12)
    return np.clip(np.round(w / s), -127, 127) * s


class TestLayerOracles:
    """Each quantized layer == the fp op on fake-quantized weights/inputs."""

    def _check(self, module, x, atol=2e-5):
        variables = module.init(jax.random.PRNGKey(0), x)
        amax = calibrate(lambda b: module.apply(variables, b), x)
        q = quantize_params(variables["params"], amax)
        assert q.paths, "nothing was quantized"
        got = np.asarray(quantized_apply(module, variables, q, x), np.float32)

        # oracle: fp op on dequantized weights and inputs
        fq_params = jax.tree_util.tree_map(lambda w: w, variables["params"])
        kern = np.asarray(variables["params"]["kernel"], np.float32) \
            if "kernel" in variables["params"] else None
        assert kern is not None
        fq_params = dict(variables["params"])
        fq_params["kernel"] = jnp.asarray(_fq(kern, per_channel_axis=-1))
        sx = amax[q.paths[0]] / 127.0
        x_dq = jnp.asarray(
            np.clip(np.round(np.asarray(x, np.float32) / sx), -127, 127) * sx)
        want = np.asarray(
            module.apply({"params": fq_params}, x_dq), np.float32)
        np.testing.assert_allclose(got, want, atol=atol, rtol=1e-5)

    def test_conv(self, rng):
        m = nn.Conv(8, (3, 3), strides=(2, 2), padding=1, use_bias=True,
                    dtype=jnp.float32)
        self._check(m, jnp.asarray(rng.randn(2, 16, 16, 4), jnp.float32))

    def test_conv_transpose(self, rng):
        m = nn.ConvTranspose(6, (4, 4), strides=(2, 2), padding="SAME",
                             use_bias=False, dtype=jnp.float32)
        self._check(m, jnp.asarray(rng.randn(2, 8, 8, 4), jnp.float32))

    def test_dense(self, rng):
        m = nn.Dense(16, dtype=jnp.float32)
        self._check(m, jnp.asarray(rng.randn(4, 32), jnp.float32))

    def test_int_inputs_exact(self, rng):
        """Integer-valued inputs and power-of-two scales: bit-exact."""
        m = nn.Conv(4, (3, 3), padding=1, use_bias=False, dtype=jnp.float32)
        x = jnp.asarray(rng.randint(-8, 8, (1, 8, 8, 3)), jnp.float32)
        # kernel on the exact int8 grid with per-channel max 127, so the
        # per-channel scale is exactly 1/127 and round(w/s) round-trips
        kint = rng.randint(-127, 128, (3, 3, 3, 4)).astype(np.float32)
        kint[0, 0, 0, :] = 127.0
        k = jnp.asarray(kint / 127.0)
        variables = {"params": {"kernel": k}}
        amax = calibrate(lambda b: m.apply(variables, b), x)
        q = quantize_params(variables["params"], amax)
        got = np.asarray(quantized_apply(m, variables, q, x), np.float64)
        sx = q.ascales[q.paths[0]]
        xq = np.round(np.asarray(x) / sx)
        want = np.asarray(
            jax.lax.conv_general_dilated(
                jnp.asarray(xq * sx, jnp.float64),
                jnp.asarray(k, jnp.float64), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        # integer accumulation is exact; the only error left is the f32
        # rounding of the scale product (~1e-7 relative of |y| ~ 16)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _small_cfg():
    return Config(
        model=ModelConfig(resnet_type=18, input_shape=(64, 64),
                          output_shape=(16, 16), depth_dim=8,
                          compute_dtype="float32"),
        train=TrainConfig(batch_size=4, lr=1e-3))


@pytest.fixture(scope="module")
def trained_small_posenet():
    """A pose net sharpened by a few Adam steps on a fixed synthetic batch —
    gives non-degenerate heatmaps so the int8-vs-fp coordinate gate is
    meaningful (an untrained net decodes everything to the patch centre)."""
    cfg = _small_cfg()
    net = get_pose_net(cfg.model)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32) * 255)
    target = jnp.asarray(
        rng.uniform(0.25, 0.75, (4, 21, 3)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), imgs)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt):
        def loss_fn(p):
            hm, upd = net.apply(
                {"params": p, "batch_stats": batch_stats}, imgs,
                train=True, mutable=["batch_stats"])
            coords = net.decode(hm)
            return jnp.mean(jnp.abs(coords - target)), upd["batch_stats"]
        (loss, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, updates), bs, opt, loss

    losses = []
    for _ in range(25):
        params, batch_stats, opt, loss = step(params, batch_stats, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    return cfg, net, {"params": params, "batch_stats": batch_stats}, imgs


@pytest.fixture(scope="module")
def posenet_ptq(trained_small_posenet):
    """Quantize once and run both forwards once — the pose PTQ tests all
    assert on this shared bundle (each re-quantization costs ~20 s of
    eager conv dispatch on CPU)."""
    cfg, net, variables, imgs = trained_small_posenet
    q = quantize_model(net, variables, [imgs], skip=("head/final",),
                       apply_kwargs={"train": False})
    hm_fp = net.apply(variables, imgs, train=False)
    hm_q = quantized_apply(net, variables, q, imgs, train=False)
    return cfg, net, variables, imgs, q, hm_fp, hm_q


@pytest.mark.slow
class TestPoseNetPTQ:
    def test_calibration_covers_every_conv(self, posenet_ptq):
        cfg, net, variables, imgs, q, _, _ = posenet_ptq
        # every conv/deconv kernel in the tree is calibrated (quantized or
        # deliberately skipped)
        import flax.traverse_util
        flat = flax.traverse_util.flatten_dict(variables["params"])
        conv_paths = {"/".join(k[:-1]) for k in flat if k[-1] == "kernel"}
        assert set(q.paths) | set(q.skipped) == conv_paths

    def test_skip_prefix_respected(self, posenet_ptq):
        cfg, net, variables, imgs, q, _, _ = posenet_ptq
        assert "head/final" not in q.kernels
        assert "head/final" in q.skipped
        assert any(p.startswith("backbone/") for p in q.paths)
        assert any(p.startswith("head/deconv") for p in q.paths)

    def test_coords_within_budget(self, posenet_ptq):
        """Serving-accuracy gate: int8 coords within 2 % of the patch of the
        fp forward on a trained net (normalised coords in [0, 1])."""
        cfg, net, variables, imgs, q, hm_fp, hm_q = posenet_ptq
        c_fp = np.asarray(net.decode(hm_fp), np.float32)
        c_q = np.asarray(net.decode(hm_q), np.float32)
        diff = np.abs(c_fp - c_q)
        assert diff.max() > 0.0          # the int8 path actually engaged
        assert diff.max() < 0.02, diff.max()
        assert diff.mean() < 0.005, diff.mean()

    def test_jit_trace_matches_eager(self, posenet_ptq):
        cfg, net, variables, imgs, q, _, hm_q = posenet_ptq

        @jax.jit
        def fwd(variables, imgs):
            with quantized_calls(q):
                return net.apply(variables, imgs, train=False)

        np.testing.assert_allclose(np.asarray(fwd(variables, imgs)),
                                   np.asarray(hm_q), atol=1e-5)


class TestRootFilter:
    def test_two_models_same_paths_no_collision(self, rng):
        """Two roots with IDENTICAL module paths and shapes in one traced
        region (the serving-monolith situation: pose net + detector both
        own a 'backbone/...' subtree) must each get their own int8
        weights."""

        class ModelA(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.Conv(4, (3, 3), padding=1, use_bias=False,
                               name="c", dtype=jnp.float32)(x)

        class ModelB(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.Conv(4, (3, 3), padding=1, use_bias=False,
                               name="c", dtype=jnp.float32)(x)

        x = jnp.asarray(rng.randn(2, 8, 8, 3), jnp.float32)
        a, b = ModelA(), ModelB()
        va = a.init(jax.random.PRNGKey(1), x)
        vb = b.init(jax.random.PRNGKey(2), x)
        qa = quantize_model(a, va, [x])
        qb = quantize_model(b, vb, [x])
        assert qa.paths == qb.paths == ("c",)

        solo_a = np.asarray(quantized_apply(a, va, qa, x))
        solo_b = np.asarray(quantized_apply(b, vb, qb, x))
        with quantized_calls(qa), quantized_calls(qb):
            both_a = np.asarray(a.apply(va, x))
            both_b = np.asarray(b.apply(vb, x))
        np.testing.assert_array_equal(both_a, solo_a)
        np.testing.assert_array_equal(both_b, solo_b)
        # and the two answers genuinely differ (different weights)
        assert np.abs(solo_a - solo_b).max() > 1e-3


@pytest.mark.slow
class TestDetectorPTQ:
    def test_detector_int8_forward(self, rng):
        cfg = DetectorConfig(
            resnet_type=18, test_scale=64, test_max_size=64,
            rpn_pre_nms_top_n_test=64, rpn_post_nms_top_n_test=16,
            rpn_pre_nms_top_n_train=64, rpn_post_nms_top_n_train=16,
            roi_batch_size=8, max_detections=5, rpn_min_size=2)
        model = FasterRCNN(cfg=cfg)
        img = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "sampling": jax.random.PRNGKey(1)}, jnp.zeros((1, 64, 64, 3)))
        q = quantize_model(model, variables, [img],
                           apply_kwargs={"train": False})
        assert len(q.paths) > 10         # backbone + RPN + head all engaged
        out_fp = model.apply(variables, img, train=False)
        out_q = quantized_apply(model, variables, q, img, train=False)
        assert out_q.rois.shape == out_fp.rois.shape
        assert np.isfinite(np.asarray(out_q.cls_scores)).all()
        np.testing.assert_allclose(
            np.asarray(out_q.cls_scores.sum(-1)), 1.0, atol=1e-5)


@pytest.mark.slow
class TestPipelineInt8:
    """First-class int8 serving: `TwoStagePipeline(int8_calib=...)`.

    Construction must calibrate BOTH nets through the pipeline program
    (per-model Quantized bundles — the nets share relative 'backbone/...'
    paths), the int8 program must actually engage, and the path must
    compose with `mesh=` (shard_map traces the quantized body; the meshed
    int8 program must match the single-device int8 program)."""

    @pytest.fixture(scope="class")
    def bits(self):
        from hand_integral_pose_estimation_tpu.inference import (
            TwoStagePipeline,
        )
        det_cfg = DetectorConfig(
            resnet_type=18, test_scale=64, test_max_size=64,
            rpn_pre_nms_top_n_test=64, rpn_post_nms_top_n_test=16,
            rpn_pre_nms_top_n_train=64, rpn_post_nms_top_n_train=16,
            roi_batch_size=8, max_detections=5, rpn_min_size=2)
        det = FasterRCNN(cfg=det_cfg)
        det_vars = det.init(
            {"params": jax.random.PRNGKey(0),
             "sampling": jax.random.PRNGKey(1)}, jnp.zeros((1, 64, 64, 3)))
        cfg = Config(
            model=ModelConfig(resnet_type=18, input_shape=(64, 64),
                              output_shape=(16, 16), depth_dim=8,
                              compute_dtype="float32"),
            detector=det_cfg)
        pose = get_pose_net(cfg.model)
        pose_vars = pose.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 64, 64, 3)))
        r = np.random.RandomState(7)
        imgs = jnp.asarray(r.randint(0, 255, (8, 64, 64, 3)), jnp.uint8)
        K = jnp.broadcast_to(
            jnp.asarray([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1.0]]),
            (8, 3, 3))
        ref_len = jnp.ones(8)
        q_pipe = TwoStagePipeline(cfg, pose, pose_vars, det, det_vars,
                                  int8_calib=(imgs, K, ref_len))
        return (cfg, pose, pose_vars, det, det_vars, imgs, K, ref_len,
                TwoStagePipeline, q_pipe)

    def test_engages_both_models(self, bits):
        (cfg, pose, pose_vars, det, det_vars, imgs, K, ref_len,
         TwoStagePipeline, q_pipe) = bits
        q_pose, q_det = q_pipe.quantized
        assert len(q_pose.paths) > 10, q_pose.skipped   # backbone + deconvs
        assert len(q_det.paths) > 10, q_det.skipped     # backbone + RPN + head
        # fused projection head stays fp by contract
        assert not any(p.startswith("head/final") for p in q_pose.paths)

        # (int8 *engagement* under interception is proven bit-exactly by
        # the layer oracles and TestRootFilter; here the whole quantized
        # two-stage program must run and decode sanely — an fp pipeline
        # for a diff would cost a second 2-stage CPU compile for no new
        # information)
        out_q = q_pipe(imgs, K, ref_len)
        assert bool(jnp.isfinite(out_q.joints_cam).all())
        assert bool((out_q.crop_bbox[:, 2:] > 0).all())
        # decodes to coordinates in the patch-space range
        # (half-pixel slack: the integral decode centers on pixel centers)
        hw = cfg.model.input_shape
        xy = np.asarray(out_q.coords_label)[..., :2]
        assert xy.min() >= -1.0 and xy.max() <= max(hw) + 1.0

    def test_mesh_matches_single_device(self, bits):
        from hand_integral_pose_estimation_tpu.parallel import make_mesh
        (cfg, pose, pose_vars, det, det_vars, imgs, K, ref_len,
         TwoStagePipeline, q_pipe) = bits
        assert jax.device_count() == 8
        mesh = make_mesh(model_parallelism=2)
        meshed = TwoStagePipeline(cfg, pose, pose_vars, det, det_vars,
                                  mesh=mesh, int8_calib=(imgs, K, ref_len))
        # identical calibration (same inputs, same program, un-meshed)
        for a, b in zip(meshed.quantized, q_pipe.quantized):
            assert a.ascales == b.ascales
        ref = q_pipe(imgs, K, ref_len)
        out = meshed(imgs, K, ref_len)
        np.testing.assert_allclose(out.joints_cam, ref.joints_cam, atol=1e-4)
        np.testing.assert_allclose(out.crop_bbox, ref.crop_bbox, atol=1e-4)
        # outputs really shard over the mesh
        shardings = {str(x.sharding.spec) for x in out}
        assert any("data" in s for s in shardings), shardings

    def test_persisted_bundles_reproduce(self, bits, tmp_path):
        """TwoStagePipeline(int8_calib=(q_pose, q_det)) skips calibration
        and reproduces the self-calibrated pipeline bit-exactly; swapped
        bundle order fails loudly (root-type guard)."""
        from hand_integral_pose_estimation_tpu.quantize import (
            load_quantized, save_quantized,
        )
        (cfg, pose, pose_vars, det, det_vars, imgs, K, ref_len,
         TwoStagePipeline, q_pipe) = bits
        q_pose, q_det = q_pipe.quantized
        fp, fd = str(tmp_path / "qp.npz"), str(tmp_path / "qd.npz")
        save_quantized(fp, q_pose)
        save_quantized(fd, q_det)
        loaded = (load_quantized(fp, root_type=type(pose)),
                  load_quantized(fd, root_type=type(det)))
        shipped = TwoStagePipeline(cfg, pose, pose_vars, det, det_vars,
                                   int8_calib=loaded)
        ref_out = q_pipe(imgs, K, ref_len)
        out = shipped(imgs, K, ref_len)
        np.testing.assert_array_equal(np.asarray(out.joints_cam),
                                      np.asarray(ref_out.joints_cam))
        np.testing.assert_array_equal(np.asarray(out.crop_bbox),
                                      np.asarray(ref_out.crop_bbox))
        # wrong order caught before any tracing
        with pytest.raises(ValueError, match="q_pose, q_det"):
            TwoStagePipeline(cfg, pose, pose_vars, det, det_vars,
                             int8_calib=(loaded[1], loaded[0]))
        # a root_type-less bundle is rejected outright in the pre-built
        # path: both nets share relative 'backbone/...' paths, so an
        # unlabelled bundle in the wrong slot would replay silently
        # (ADVICE r4, inference.py order guard)
        import dataclasses
        unlabelled = dataclasses.replace(loaded[0], root_type=None)
        with pytest.raises(ValueError, match="root_type"):
            TwoStagePipeline(cfg, pose, pose_vars, det, det_vars,
                             int8_calib=(unlabelled, loaded[1]))
        # a stale bundle (built from different weights) is rejected by the
        # source-params digest before any tracing
        stale_vars = pose.init(jax.random.PRNGKey(99),
                               jnp.zeros((1, 64, 64, 3)))
        with pytest.raises(ValueError, match="different checkpoint"):
            TwoStagePipeline(cfg, pose, stale_vars, det, det_vars,
                             int8_calib=loaded)


class TestPersistence:
    """save_quantized/load_quantized: calibrate once, ship the bundle."""

    def test_roundtrip_exact(self, rng, tmp_path):
        class Net(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Conv(8, (3, 3), padding=1, dtype=jnp.float32)(x)
                x = nn.relu(x)
                x = nn.ConvTranspose(4, (2, 2), strides=(2, 2),
                                     dtype=jnp.float32)(x)
                return nn.Dense(5, dtype=jnp.float32)(x)

        net = Net()
        x = jnp.asarray(rng.randn(2, 8, 8, 3), jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), x)
        q = quantize_model(net, variables, [x])
        from hand_integral_pose_estimation_tpu.quantize import (
            load_quantized, save_quantized,
        )
        f = str(tmp_path / "q.npz")
        save_quantized(f, q)
        q2 = load_quantized(f, root_type=Net)
        assert q2.paths == q.paths
        assert q2.skipped == q.skipped
        assert q2.ascales == q.ascales
        for p in q.paths:
            np.testing.assert_array_equal(np.asarray(q2.kernels[p]),
                                          np.asarray(q.kernels[p]))
            assert q2.kernels[p].dtype == jnp.int8
            np.testing.assert_array_equal(np.asarray(q2.kscales[p]),
                                          np.asarray(q.kscales[p]))
        # bit-identical replay
        np.testing.assert_array_equal(
            np.asarray(quantized_apply(net, variables, q, x)),
            np.asarray(quantized_apply(net, variables, q2, x)))
        # wrong root type is rejected
        class Other(nn.Module):
            @nn.compact
            def __call__(self, x):
                return x
        with pytest.raises(ValueError, match="root type"):
            load_quantized(f, root_type=Other)

        # the source-params fingerprint round-trips and arms the
        # stale-bundle guard (ADVICE r4: a persisted bundle silently
        # pairing with a different checkpoint must fail loudly)
        from hand_integral_pose_estimation_tpu.quantize import (
            verify_source_params,
        )
        assert q2.params_digest == q.params_digest is not None
        verify_source_params(q2, variables["params"])     # matching: no-op
        other_vars = net.init(jax.random.PRNGKey(1), x)
        with pytest.raises(ValueError, match="different checkpoint"):
            verify_source_params(q2, other_vars["params"])
        # legacy bundles (no digest) stay loadable and unverified
        import dataclasses
        legacy = dataclasses.replace(q, params_digest=None)
        verify_source_params(legacy, other_vars["params"])
