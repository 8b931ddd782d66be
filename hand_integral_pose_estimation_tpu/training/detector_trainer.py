"""Detector training: SGD+momentum step over the four Faster R-CNN losses.

The reference trains its detector in the upstream faster-rcnn codebase and
only runs inference here (SURVEY §2.3); this module completes the training
side natively: RPN CE + smooth-L1 and detection-head CE + smooth-L1
(faster_rcnn.py:96-104, rpn.py:84-108) under one jitted step with the
config_rcnn.py TRAIN defaults (SGD, momentum 0.9, weight decay 5e-4,
step-decay lr).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from hand_integral_pose_estimation_tpu.detect.faster_rcnn import FasterRCNN


class DetectorTrainState(NamedTuple):
    step: jnp.ndarray
    params: dict
    batch_stats: dict
    opt_state: optax.OptState


def make_detector_optimizer(lr: float = 1e-3, momentum: float = 0.9,
                            weight_decay: float = 5e-4,
                            decay_step: int = 50000,
                            decay_factor: float = 0.1,
                            clip_norm: float = 10.0):
    """SGD + momentum + weight decay + global-norm gradient clipping (the
    reference clips via net_utils.clip_gradient)."""
    sched = optax.exponential_decay(lr, decay_step, decay_factor,
                                    staircase=True)
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.add_decayed_weights(weight_decay),
        optax.sgd(sched, momentum=momentum),
    )


def create_detector_train_state(model: FasterRCNN, rng, sample_hw=(224, 224),
                                tx=None):
    tx = tx or make_detector_optimizer()
    variables = model.init(
        {"params": rng, "sampling": jax.random.fold_in(rng, 1)},
        jnp.zeros((1, *sample_hw, 3)))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return DetectorTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    ), tx


def make_detector_train_step(model: FasterRCNN, tx,
                             loss_weights=(1.0, 1.0, 1.0, 1.0)):
    """loss = w0*rpn_cls + w1*rpn_reg + w2*det_cls + w3*det_reg
    (faster_rcnn.py:106 sums all four)."""

    def loss_fn(params, batch_stats, images, gt_boxes, gt_classes, gt_valid,
                rng):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, gt_boxes=gt_boxes, gt_classes=gt_classes,
            gt_valid=gt_valid, rngs={"sampling": rng},
            mutable=["batch_stats"])
        l = out.losses
        total = (loss_weights[0] * l["rpn_cls"]
                 + loss_weights[1] * l["rpn_reg"]
                 + loss_weights[2] * l["det_cls"]
                 + loss_weights[3] * l["det_reg"])
        # batch_stats only actually changes with cfg.freeze_bn=False
        # (from-scratch mode); frozen BN returns them untouched
        return total, (l, mutated.get("batch_stats", batch_stats))

    @jax.jit
    def train_step(state: DetectorTrainState, images, gt_boxes, gt_classes,
                   gt_valid, rng):
        (loss, (parts, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
            state.params, state.batch_stats, images, gt_boxes, gt_classes,
            gt_valid, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(parts)
        metrics["loss"] = loss
        return DetectorTrainState(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt), metrics

    return train_step
