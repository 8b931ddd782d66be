"""Train state + optimiser schedule.

Mirrors the reference's optimisation recipe (common/base.py:98-109,
main/config.py:29-42): Adam, lr 1e-4, L2 weight decay 1e-5 applied to the
gradients before the Adam moments (torch.optim.Adam semantics, not AdamW),
and a MultiStepLR-equivalent piecewise-constant schedule x0.1 at epochs
[30, 60].
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax
import jax
import jax.numpy as jnp
import optax

from hand_integral_pose_estimation_tpu.config import TrainConfig


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def multistep_schedule(base_lr: float, steps_per_epoch: int,
                       dec_epochs: Sequence[int],
                       dec_factor: float) -> optax.Schedule:
    """torch MultiStepLR equivalent (base.py:104-107). Boundaries clamp to
    int32 range (an effectively-disabled decay like lr_dec_epoch=(10**9,)
    would otherwise overflow the jitted step counter)."""
    boundaries = {min(int(e * steps_per_epoch), 2**31 - 2): dec_factor
                  for e in dec_epochs}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(tcfg: TrainConfig, steps_per_epoch: int
                   ) -> optax.GradientTransformation:
    sched = multistep_schedule(tcfg.lr, steps_per_epoch, tcfg.lr_dec_epoch,
                               tcfg.lr_dec_factor)
    return optax.chain(
        # torch Adam's weight_decay: L2 term added to the raw gradient
        optax.add_decayed_weights(tcfg.weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(sched),
    )


def create_train_state(model, rng: jax.Array, sample_input: jnp.ndarray,
                       tcfg: TrainConfig, steps_per_epoch: int = 1,
                       tx: Optional[optax.GradientTransformation] = None
                       ) -> tuple[TrainState, optax.GradientTransformation]:
    variables = model.init(rng, sample_input)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = tx or make_optimizer(tcfg, steps_per_epoch)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    ), tx


def compare_param_trees(a, b) -> float:
    """Max absolute parameter difference between two pytrees — the
    teacher-vs-student weight check (common/base.py:73-86 `compare_models`).
    Returns +inf on structure mismatch."""
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    if len(la) != len(lb):
        return float("inf")
    diffs = []
    for x, y in zip(la, lb):
        if x.shape != y.shape:
            return float("inf")
        diffs.append(float(jnp.abs(x - y).max()))
    return max(diffs) if diffs else 0.0
