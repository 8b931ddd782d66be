"""Frozen-teacher loading (reference: `load_regressor_teacher`,
common/base.py:117-128 + cfg.teacher_checkpoint config.py:79).

The teacher is a pose-net snapshot run in eval mode; its label-space
predictions feed CombinedLoss's Lteacher term when the batch carries no
cached pseudo-labels (main/train.py:83-99).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from hand_integral_pose_estimation_tpu.config import Config
from hand_integral_pose_estimation_tpu.models.pose_net import get_pose_net
from hand_integral_pose_estimation_tpu.ops.fused_head import (
    head_projection_integral,
)
from hand_integral_pose_estimation_tpu.training import checkpoint as ckpt
from hand_integral_pose_estimation_tpu.training.state import (
    create_train_state,
)


def make_frozen_teacher(cfg: Config, model_dir: str,
                        epoch: Optional[int] = None
                        ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """(B, H, W, 3) normalised patches -> (B, J, 3) label-space coords.

    Loads the highest-epoch (or `epoch`) snapshot from `model_dir` and
    returns a closure over the frozen params — usable as the Trainer's
    `teacher_apply` and as the sweep teacher in
    distill.generate_filtered_labels.
    """
    model = get_pose_net(cfg.model)
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, *cfg.model.input_shape, 3)), cfg.train)
    state, ep = ckpt.load_checkpoint(model_dir, state, epoch)
    params, stats = state.params, state.batch_stats
    J, D = cfg.model.num_joints, cfg.model.depth_dim

    def teacher_apply(patches):
        feats = model.apply({"params": params, "batch_stats": stats},
                            patches, train=False, return_features=True)
        Wp, bp = model.final_projection(params)
        return head_projection_integral(feats, Wp, bp, J, D)

    return teacher_apply
