"""train_detector CLI config plumbing + generic pytree checkpointing."""

import os

import numpy as np
import pytest

from hand_integral_pose_estimation_tpu.cli.train_detector import (
    detector_cfg_from_args,
    main as train_detector_main,
)
from hand_integral_pose_estimation_tpu.training.checkpoint import (
    load_pytree,
    save_pytree,
)

run_slow = pytest.mark.skipif(
    os.environ.get("HIPE_RUN_SLOW", "") != "1",
    reason="set HIPE_RUN_SLOW=1 to run the mini detector-CLI train")


class _Args:
    resnet = 18
    norm = "group"
    no_freeze_bn = False
    scale = 224
    max_size = 336
    rpn_pre_nms = 512
    rpn_post_nms = 128
    roi_batch = 64
    from_scratch = True


def test_detector_cfg_from_args_recipe():
    cfg = detector_cfg_from_args(_Args())
    assert cfg.norm == "group"
    assert cfg.roi_bg_thresh_lo == 0.0
    assert cfg.rpn_post_nms_top_n_test == 32
    a = _Args()
    a.from_scratch = False
    a.norm = "batch"
    cfg2 = detector_cfg_from_args(a)
    # reference parity: frozen BN + bg_thresh_lo 0.1
    assert cfg2.freeze_bn and cfg2.roi_bg_thresh_lo == 0.1


def test_save_load_pytree_roundtrip(tmp_path):
    tree = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "batch_stats": {"m": np.zeros(3, np.float32)}}
    p = str(tmp_path / "det_ckpt")
    save_pytree(p, tree)
    template = {"params": {"w": np.zeros((2, 3), np.float32)},
                "batch_stats": {"m": np.ones(3, np.float32)}}
    back = load_pytree(p, template)
    np.testing.assert_array_equal(back["params"]["w"], tree["params"]["w"])
    np.testing.assert_array_equal(back["batch_stats"]["m"],
                                  tree["batch_stats"]["m"])


@run_slow
def test_train_detector_cli_smoke(tmp_path, capsys):
    train_detector_main([
        "--synthetic", "--n", "16", "--steps", "2", "--batch", "2",
        "--eval-every", "2", "--resnet", "18", "--scale", "112",
        "--max-size", "112", "--rpn-pre-nms", "128", "--rpn-post-nms", "32",
        "--roi-batch", "16", "--model-dir", str(tmp_path)])
    assert (tmp_path / "detector_final").exists()


def test_build_detector_restores_train_detector_checkpoint(tmp_path):
    """build_detector must restore exactly what cli/train_detector.py saves
    ({"params", "batch_stats"} via save_pytree) — params AND batch_stats
    (regression: the old inline restore double-nested the tree and dropped
    the trained BN statistics)."""
    import jax
    import jax.numpy as jnp

    from hand_integral_pose_estimation_tpu.config import DetectorConfig
    from hand_integral_pose_estimation_tpu.detect.load import build_detector

    cfg = DetectorConfig(resnet_type=18, norm="group", test_scale=64,
                         test_max_size=64, rpn_pre_nms_top_n_test=64,
                         rpn_post_nms_top_n_test=16, max_detections=8)
    model, det_vars = build_detector(cfg, None, log=lambda *a: None)
    # perturb as if trained, save in the train_detector layout
    trained = jax.tree_util.tree_map(lambda x: x + 1.0, det_vars)
    save_pytree(str(tmp_path / "detector_final"), trained)
    _, restored = build_detector(cfg, str(tmp_path / "detector_final"),
                                 log=lambda *a: None)
    a = jax.tree_util.tree_leaves(restored)
    b = jax.tree_util.tree_leaves(trained)
    assert len(a) == len(b) > 0
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "freihand_mini")


@run_slow
@pytest.mark.skipif(
    not os.path.exists(os.path.join(FIXTURE, "training_K.json")),
    reason="freihand_mini fixture absent")
def test_train_detector_cli_real_data_path(tmp_path):
    """The --data-dir branch constructs FreiHandDataset correctly and runs
    (regression: the dataset kwarg is `data_split`, not `split`)."""
    train_detector_main([
        "--data-dir", FIXTURE, "--training-size", "6", "--steps", "1",
        "--batch", "2", "--eval-every", "1", "--resnet", "18",
        "--scale", "112", "--max-size", "112", "--rpn-pre-nms", "128",
        "--rpn-post-nms", "32", "--roi-batch", "16"])
