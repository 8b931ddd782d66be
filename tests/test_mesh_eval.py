"""Mesh-sharded evaluation and serving (VERDICT r3 missing #1).

The reference's multi-GPU story covers test time too: Tester/Evaluator
models are wrapped in DataParallel (common/base.py:179-284) and per-GPU
heatmaps are gathered (main/test.py:92). Here the equivalents are
`Tester(mesh=...)` (whole preprocess+forward+decode program in one
shard_map region over `data`), `detect(..., mesh=...)` and
`TwoStagePipeline(..., mesh=...)`. Each must match its single-device
output exactly — same program, partitioned batch.
"""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hand_integral_pose_estimation_tpu.config import (
    Config,
    DetectorConfig,
    ModelConfig,
    TrainConfig,
)
from hand_integral_pose_estimation_tpu.data.freihand import SyntheticFreiHand
from hand_integral_pose_estimation_tpu.parallel import make_mesh
from hand_integral_pose_estimation_tpu.training import (
    Tester as HipeTester,   # alias: pytest collects module-level Test* names
    Trainer,
)

pytestmark = pytest.mark.slow  # fast tier: HIPE_RUN_SLOW=1 runs these


def small_config():
    return Config(
        model=ModelConfig(resnet_type=18, input_shape=(64, 64),
                          output_shape=(16, 16), depth_dim=8,
                          compute_dtype="float32"),
        train=TrainConfig(batch_size=4, lr=1e-3),
    )


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() == 8
    return make_mesh(model_parallelism=2)


@pytest.fixture(scope="module")
def trained_bits():
    cfg = small_config()
    ds = SyntheticFreiHand(n=10, image_hw=(64, 64), seed=3)
    t = Trainer(cfg=cfg, dataset=ds, model_dir=tempfile.mkdtemp(),
                integral_impl="xla")
    return cfg, ds, t.state


class TestMeshTester:
    def test_matches_single_device(self, mesh, trained_bits):
        cfg, ds, state = trained_bits
        ref_coords, ref_merged = HipeTester(cfg, ds, state,
                                        integral_impl="xla").run(
                                            batch_size=8)
        tester = HipeTester(cfg, ds, state, integral_impl="xla", mesh=mesh)
        coords, merged = tester.run(batch_size=8)
        np.testing.assert_allclose(coords, ref_coords, atol=1e-5)
        assert merged.image is None
        np.testing.assert_allclose(merged.label, ref_merged.label,
                                   atol=1e-5)
        np.testing.assert_allclose(merged.tprime, ref_merged.tprime,
                                   rtol=1e-6)
        np.testing.assert_allclose(merged.trans_inv, ref_merged.trans_inv,
                                   rtol=1e-6)
        # the whole-split metric agrees too
        np.testing.assert_allclose(tester.mean_loss(batch_size=8),
                                   HipeTester(cfg, ds, state,
                                          integral_impl="xla").mean_loss(
                                              batch_size=8),
                                   rtol=1e-5)

    def test_indivisible_batch_raises_attributably(self, mesh,
                                                   trained_bits):
        cfg, ds, state = trained_bits
        tester = HipeTester(cfg, ds, state, integral_impl="xla", mesh=mesh)
        with pytest.raises(ValueError, match="data-axis"):
            tester.run(batch_size=6)   # 6 % 4 != 0

    def test_mesh_without_data_axis_rejected(self, trained_bits):
        from jax.sharding import Mesh
        cfg, ds, state = trained_bits
        bad = Mesh(np.array(jax.devices()).reshape(8), ("x",))
        with pytest.raises(ValueError, match="data"):
            HipeTester(cfg, ds, state, integral_impl="xla", mesh=bad)

    def test_fit_epoch_end_sweep_rides_mesh(self, mesh):
        """Trainer.fit with a mesh + test_dataset runs the epoch-end sweep
        through the mesh-sharded Tester (test_batch_size divides data)."""
        cfg = Config(
            model=ModelConfig(resnet_type=18, input_shape=(32, 32),
                              output_shape=(8, 8), depth_dim=8,
                              compute_dtype="float32"),
            train=TrainConfig(batch_size=8, lr=1e-3, test_batch_size=8),
        )
        ds = SyntheticFreiHand(n=8, image_hw=(32, 32), seed=5)
        t = Trainer(cfg=cfg, dataset=ds, model_dir=tempfile.mkdtemp(),
                    integral_impl="xla", mesh=mesh, test_dataset=ds)
        t.fit(end_epoch=1, steps_per_epoch=1)


class TestMeshDetect:
    def test_detect_matches_single_device(self, mesh, rng):
        from hand_integral_pose_estimation_tpu.detect.faster_rcnn import (
            FasterRCNN,
        )
        from hand_integral_pose_estimation_tpu.detect.hand_detector import (
            detect,
            detect_hand_crop_bbox,
        )
        cfg = DetectorConfig(
            resnet_type=18, test_scale=64, test_max_size=64,
            rpn_pre_nms_top_n_test=64, rpn_post_nms_top_n_test=16,
            rpn_pre_nms_top_n_train=64, rpn_post_nms_top_n_train=16,
            roi_batch_size=8, max_detections=5, rpn_min_size=2)
        model = FasterRCNN(cfg=cfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "sampling": jax.random.PRNGKey(1)}, jnp.zeros((1, 64, 64, 3)))
        imgs = jnp.asarray(rng.randint(0, 255, (8, 64, 64, 3)), jnp.uint8)

        ref = detect(model, variables, imgs, cfg)
        out = detect(model, variables, imgs, cfg, mesh=mesh)
        np.testing.assert_allclose(out.boxes, ref.boxes, atol=1e-4)
        np.testing.assert_allclose(out.scores, ref.scores, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(out.valid),
                                      np.asarray(ref.valid))

        ref_crop = detect_hand_crop_bbox(model, variables, imgs, cfg)
        crop = detect_hand_crop_bbox(model, variables, imgs, cfg, mesh=mesh)
        np.testing.assert_allclose(crop, ref_crop, atol=1e-4)


class TestMeshTwoStagePipeline:
    def test_matches_single_device(self, mesh, rng):
        from hand_integral_pose_estimation_tpu.detect.faster_rcnn import (
            FasterRCNN,
        )
        from hand_integral_pose_estimation_tpu.inference import (
            TwoStagePipeline,
        )
        from hand_integral_pose_estimation_tpu.models import get_pose_net

        det_cfg = DetectorConfig(
            resnet_type=18, test_scale=64, test_max_size=64,
            rpn_pre_nms_top_n_test=64, rpn_post_nms_top_n_test=16,
            rpn_pre_nms_top_n_train=64, rpn_post_nms_top_n_train=16,
            roi_batch_size=8, max_detections=5, rpn_min_size=2)
        det_model = FasterRCNN(cfg=det_cfg)
        det_vars = det_model.init(
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

        imgs = jnp.asarray(rng.randint(0, 255, (8, 64, 64, 3)), jnp.uint8)
        K = jnp.broadcast_to(
            jnp.asarray([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1.0]]),
            (8, 3, 3))
        ref = TwoStagePipeline(cfg, pose, pose_vars, det_model,
                               det_vars)(imgs, K, jnp.ones(8))
        out = TwoStagePipeline(cfg, pose, pose_vars, det_model, det_vars,
                               mesh=mesh)(imgs, K, jnp.ones(8))
        np.testing.assert_allclose(out.joints_cam, ref.joints_cam,
                                   atol=1e-4)
        np.testing.assert_allclose(out.coords_label, ref.coords_label,
                                   atol=1e-5)
        np.testing.assert_allclose(out.crop_bbox, ref.crop_bbox, atol=1e-4)
        # outputs really are sharded over the mesh (the point of the path)
        shardings = {str(x.sharding.spec) for x in out}
        assert any("data" in s for s in shardings), shardings
