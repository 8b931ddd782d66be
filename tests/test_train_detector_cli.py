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
