"""Jitted, mesh-sharded train/eval steps.

The equivalent of the reference hot loop (main/train.py:50-130) as one XLA
program: fused preprocessing happens upstream (data/pipeline.py), here the
step = forward -> fused integral decode -> combined loss -> grads -> Adam
update, with the batch sharded over the `data` mesh axis and params
replicated; XLA inserts the gradient all-reduces over ICI (replacing
balanced_parallel.py's threaded replicas + torch.cuda.comm reductions).

BatchNorm note: with a sharded batch the statistics are computed over the
global batch (sync-BN semantics); the reference used per-replica stats. The
difference is a regularisation detail, not an API one.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax

from hand_integral_pose_estimation_tpu import losses
from hand_integral_pose_estimation_tpu.config import Config
from hand_integral_pose_estimation_tpu.data.pipeline import Batch
from hand_integral_pose_estimation_tpu.ops.fused_head import (
    head_projection_integral,
)
from hand_integral_pose_estimation_tpu.ops.integral import softmax_integral
from hand_integral_pose_estimation_tpu.training.state import TrainState


def make_train_step(model, tx, cfg: Config,
                    teacher_apply: Optional[Callable] = None,
                    panet_apply: Optional[Callable] = None,
                    integral_impl: str = "auto",
                    fuse_head: bool = True,
                    mesh=None):
    """Build the jittable train step.

    Args:
        model: ResPoseNet (flax module).
        tx: optax transformation.
        teacher_apply: optional frozen-teacher forward `(images) -> (B, J, 3)`
            label-space coords (used when the batch carries no cached
            pseudo-labels, train.py:83-99).
        panet_apply: optional NRSfM forward for the PANet loss term.
        mesh: when set, the Pallas decode runs PARTITIONED over the mesh
            via the shard_map wrappers (parallel/shard_ops.py) instead of
            the partitioner's replicated fallback around the opaque
            pallas_call.
    """
    J = cfg.model.num_joints
    D = cfg.model.depth_dim

    def _decode_fused(feats, Wp, bp):
        if mesh is not None:
            from hand_integral_pose_estimation_tpu.parallel import (
                sharded_head_projection_integral,
            )
            return sharded_head_projection_integral(
                feats, Wp, bp, J, D, mesh=mesh, impl=integral_impl)
        return head_projection_integral(feats, Wp, bp, J, D, integral_impl)

    def _decode_hm(hm):
        if mesh is not None:
            from hand_integral_pose_estimation_tpu.parallel import (
                sharded_softmax_integral,
            )
            return sharded_softmax_integral(hm, J, D, mesh=mesh,
                                            impl=integral_impl)
        return softmax_integral(hm, J, D, impl=integral_impl)

    def loss_fn(params, batch_stats, batch: Batch):
        if fuse_head:
            # fused projection+integral: the heatmap never leaves VMEM
            feats, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch.image, train=True, return_features=True,
                mutable=["batch_stats"],
            )
            Wp, bp = model.final_projection(params)
            coord_out = _decode_fused(feats, Wp, bp)
        else:
            hm, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch.image, train=True, mutable=["batch_stats"],
            )
            coord_out = _decode_hm(hm)

        if teacher_apply is not None:
            coord_teacher = jax.lax.stop_gradient(
                teacher_apply(batch.image))
        else:
            coord_teacher = batch.label_teacher

        out = losses.combined_loss(
            coord_out, coord_teacher, batch.label, batch.label_weight,
            batch.labelled, batch.trans_inv, batch.tprime, batch.K,
            panet_apply=panet_apply, lam=cfg.train.lam,
            patch_width=cfg.model.input_shape[1],
            patch_height=cfg.model.input_shape[0],
        )
        return out.loss, (mutated["batch_stats"], out)

    @jax.jit
    def train_step(state: TrainState, batch: Batch):
        (loss, (new_stats, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt)
        metrics = {
            "loss": loss,
            "loss_supervised": out.loss_supervised,
            "loss_unsupervised": out.loss_unsupervised,
            "student_mpjpe": out.student_mpjpe,
            "teacher_mpjpe": out.teacher_mpjpe,
        }
        return new_state, metrics

    return train_step


def make_eval_fn(model, cfg: Config, integral_impl: str = "auto",
                 fuse_head: bool = True):
    """UNJITTED no-grad forward + decode, the body of main/test.py:68-143.

    Kept jit-free so the mesh-sharded Tester can run it inside a
    `shard_map` region (each device evaluates its `data` shard with the
    Pallas kernels partitioned); `make_eval_step` is the single-device
    jitted wrapper."""
    J = cfg.model.num_joints
    D = cfg.model.depth_dim

    def eval_step(state: TrainState, batch: Batch):
        if fuse_head:
            feats = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch.image, train=False, return_features=True,
            )
            Wp, bp = model.final_projection(state.params)
            coords = head_projection_integral(feats, Wp, bp, J, D,
                                              integral_impl)
        else:
            hm = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch.image, train=False,
            )
            coords = softmax_integral(hm, J, D, impl=integral_impl)
        loss = losses.joint_location_loss(coords, batch.label,
                                          batch.label_weight)
        return coords, loss

    return eval_step


def make_eval_step(model, cfg: Config, integral_impl: str = "auto",
                   fuse_head: bool = True):
    """Jitted no-grad forward + decode (single-device Tester path)."""
    return jax.jit(make_eval_fn(model, cfg, integral_impl, fuse_head))
