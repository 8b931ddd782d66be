"""PANet (NRSfM) trainer: device-resident data, scanned minibatch steps.

Capability equivalent of procrustes_encoding/train_pytorch/train_kernel.py:
whole dataset resident on device, random minibatch indexing, optional
axis-angle rotation augmentation, Adam + step-decay schedule,
best-by-validation checkpointing and a NaN guard. Differences by design:

  * the training loop is a `lax.scan` over steps — the entire epoch is ONE
    XLA program, no per-step host round trips;
  * the NaN guard checks BEFORE applying the update (the reference calls
    backward() before its check, train_kernel.py:304-308 — a latent bug
    SURVEY.md §5 flags not to replicate): a non-finite loss freezes the
    parameters for that step instead of corrupting them.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from hand_integral_pose_estimation_tpu.geometry import rotation
from hand_integral_pose_estimation_tpu.models.panet import PANet, panet_loss


class PANetTrainResult(NamedTuple):
    params: dict
    best_params: dict
    best_val_loss: jnp.ndarray
    train_losses: jnp.ndarray   # (chunks,)
    val_losses: jnp.ndarray     # (chunks,)


def _augment_rotation(key, pts, max_angle: float = 3.14159):
    """Random axis-angle rotation of the whole cloud (train_kernel.py:58-128
    MatAngleAxisToR path, closed-form Rodrigues here)."""
    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, (3,))
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-12)
    angle = jax.random.uniform(k2, minval=-max_angle, maxval=max_angle)
    R = rotation.rodrigues(axis * angle).astype(pts.dtype)
    return pts @ R.T


def train_panet(model: PANet, train_pts: jnp.ndarray, val_pts: jnp.ndarray,
                num_steps: int = 2000, batch_size: int = 500,
                lr: float = 1e-3, lr_decay_every: int = 100000,
                lr_decay: float = 0.5, sparsity_weight: float = 1e-4,
                augment_rotation: bool = False, seed: int = 0,
                eval_every: int = 200,
                init_params: Optional[dict] = None) -> PANetTrainResult:
    """Train the NRSfM prior on device-resident point clouds.

    Args:
        train_pts / val_pts: (N, P, 3), already mean-centred
            (train.py:121 `pts3d - pts3d.mean(1)`).
    """
    train_pts = jnp.asarray(train_pts, jnp.float32)
    val_pts = jnp.asarray(val_pts, jnp.float32)

    key = jax.random.PRNGKey(seed)
    if init_params is None:
        params = model.init(jax.random.PRNGKey(seed + 1),
                            train_pts[:2])["params"]
    else:
        params = init_params

    sched = optax.exponential_decay(lr, lr_decay_every, lr_decay,
                                    staircase=True)
    tx = optax.adam(sched)
    opt_state = tx.init(params)

    def step(carry, key):
        params, opt_state = carry
        k_idx, k_rot = jax.random.split(key)
        idx = jax.random.randint(k_idx, (batch_size,), 0,
                                 train_pts.shape[0])
        batch = train_pts[idx]
        if augment_rotation:
            batch = _augment_rotation(k_rot, batch)

        (loss, _), grads = jax.value_and_grad(
            lambda p: panet_loss(model, p, batch, sparsity_weight),
            has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # NaN guard BEFORE the update takes effect
        ok = jnp.isfinite(loss)
        params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_params, params)
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_opt, opt_state)
        return (params, opt_state), loss

    @jax.jit
    def run_chunk(params, opt_state, keys):
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), keys)
        val_loss, _ = panet_loss(model, params, val_pts, sparsity_weight)
        return params, opt_state, losses.mean(), val_loss

    best_params = params
    best_val = jnp.inf
    train_hist, val_hist = [], []
    done = 0
    while done < num_steps:
        chunk = min(eval_every, num_steps - done)
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, chunk)
        params, opt_state, tr_loss, val_loss = run_chunk(params, opt_state,
                                                         keys)
        train_hist.append(tr_loss)
        val_hist.append(val_loss)
        if float(val_loss) < float(best_val):
            best_val = val_loss
            best_params = params
        done += chunk

    return PANetTrainResult(
        params=params,
        best_params=best_params,
        best_val_loss=jnp.asarray(best_val),
        train_losses=jnp.stack(train_hist),
        val_losses=jnp.stack(val_hist),
    )
