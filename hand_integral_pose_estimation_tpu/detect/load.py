"""Build + restore the Faster R-CNN hand detector.

The single place that knows the checkpoint layout written by
cli/train_detector.py (training/checkpoint.py:save_pytree of
{"params", "batch_stats"}) — the runner-side analogue of the reference's
`load_faster_rcnn_detector` (common/hand_detector.py:111-158), which loads
externally-trained `faster_rcnn_*.pth` files.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from hand_integral_pose_estimation_tpu.config import DetectorConfig
from hand_integral_pose_estimation_tpu.detect.faster_rcnn import FasterRCNN


def default_resnet_style(ckpt_path: Optional[str],
                         fallback: str = "torchvision") -> str:
    """Default ResNet block variant for a detector checkpoint path: a torch
    `.pth`/`.pt` implies the reference's jwyang layout whose weights require
    "caffe" blocks (stride on the first 1x1 conv + ceil-mode stem pool,
    faster_rcnn/resnet.py:67-80); orbax dirs keep `fallback`. The single
    source of the heuristic for every CLI (`--detector-style` overrides)."""
    return ("caffe" if (ckpt_path or "").endswith((".pth", ".pt"))
            else fallback)


def build_detector(det_cfg: DetectorConfig,
                   ckpt_path: Optional[str] = None,
                   seed: int = 0,
                   log=print) -> tuple[FasterRCNN, dict]:
    """FasterRCNN module + variables, optionally restored from an orbax
    checkpoint. Returns (model, {"params": ..., "batch_stats": ...}).

    Restoring uses the freshly-initialised tree as the template, so both
    params and batch_stats come from the checkpoint (a detector trained with
    live BatchNorm needs its running statistics at eval time).

    An explicitly-given `ckpt_path` that does not exist RAISES: a typo'd
    path silently falling through to fresh weights produced near-zero-AP
    evaluations with nothing but a log line to explain them.
    """
    if ckpt_path and not os.path.exists(ckpt_path):
        raise FileNotFoundError(
            f"detector checkpoint {ckpt_path!r} does not exist "
            "(omit --detector-ckpt to run with fresh weights)")
    model = FasterRCNN(cfg=det_cfg)
    s = det_cfg.test_scale
    det_vars = model.init(
        {"params": jax.random.PRNGKey(seed),
         "sampling": jax.random.PRNGKey(seed + 1)},
        jnp.zeros((1, s, s, 3)))
    det_vars = {"params": det_vars["params"],
                "batch_stats": det_vars.get("batch_stats", {})}
    if ckpt_path:
        if ckpt_path.endswith((".pth", ".pt")):
            # reference torch checkpoint (faster_rcnn_*.pth,
            # hand_detector.py:111-158): convert the jwyang-layout state
            # dict; requires det_cfg.resnet_style == "caffe" (the converter
            # enforces it attributably)
            from hand_integral_pose_estimation_tpu.interop import (
                convert_faster_rcnn_state_dict,
                load_torch_state_dict,
            )
            det_vars = convert_faster_rcnn_state_dict(
                load_torch_state_dict(ckpt_path), det_cfg)
            det_vars = jax.tree_util.tree_map(jnp.asarray, det_vars)
            log(f"converted torch detector checkpoint from {ckpt_path}")
        else:
            from hand_integral_pose_estimation_tpu.training.checkpoint import (
                load_pytree,
            )
            det_vars = load_pytree(ckpt_path, det_vars)
            log(f"loaded detector checkpoint from {ckpt_path}")
    return model, det_vars
