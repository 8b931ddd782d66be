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
from hand_integral_pose_estimation_tpu.models.panet import (
    PANet,
    panet_loss,
    panet_loss_per_sample,
)


class PANetTrainResult(NamedTuple):
    params: dict
    best_params: dict
    best_val_loss: jnp.ndarray
    train_losses: jnp.ndarray   # (chunks,)
    val_losses: jnp.ndarray     # (chunks,)


def _augment_rotation(key, pts, aug_rotate_val: float = 0.15):
    """PER-SAMPLE axis-angle rotation (train_kernel.py:406-414): each sample
    draws its own (3,) axis-angle vector with components
    ~ Normal(mean=val, std=2*val) — the reference's exact distribution —
    then pts <- pts @ Rodrigues(angles) (MatAngleAxisToR path,
    train_kernel.py:58-128; our closed-form rodrigues has the same
    Taylor-safe small-angle branch)."""
    B = pts.shape[0]
    angles = (jax.random.normal(key, (B, 3), pts.dtype)
              * (aug_rotate_val + aug_rotate_val) + aug_rotate_val)
    R = rotation.rodrigues(angles).astype(pts.dtype)   # (B, 3, 3)
    return jnp.einsum("bpj,bjk->bpk", pts, R)


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

    def step(carry, xs):
        params, opt_state = carry
        key, active = xs
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
        # NaN guard BEFORE the update takes effect; `active` masks the padded
        # tail of the final chunk (kept at full length so every chunk hits the
        # same compiled program)
        ok = jnp.isfinite(loss) & active
        params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_params, params)
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_opt, opt_state)
        return (params, opt_state), jnp.where(active, loss, 0.0)

    chunk_len = min(eval_every, num_steps)

    @jax.jit
    def run_chunk(params, opt_state, keys, active):
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), (keys, active))
        val_loss, _ = panet_loss(model, params, val_pts, sparsity_weight)
        tr_loss = losses.sum() / jnp.maximum(active.sum(), 1)
        return params, opt_state, tr_loss, val_loss

    best_params = params
    best_val = jnp.inf
    train_hist, val_hist = [], []
    done = 0
    while done < num_steps:
        n_active = min(chunk_len, num_steps - done)
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, chunk_len)
        active = jnp.arange(chunk_len) < n_active
        params, opt_state, tr_loss, val_loss = run_chunk(params, opt_state,
                                                         keys, active)
        train_hist.append(tr_loss)
        val_hist.append(val_loss)
        if float(val_loss) < float(best_val):
            best_val = val_loss
            best_params = params
        done += n_active

    return PANetTrainResult(
        params=params,
        best_params=best_params,
        best_val_loss=jnp.asarray(best_val),
        train_losses=jnp.stack(train_hist),
        val_losses=jnp.stack(val_hist),
    )


class CompositePANetResult(NamedTuple):
    #: per-component param trees; component 0 is the pretrained base
    components: list
    #: (N,) per-sample composite loss before/after boosting
    loss_before: jnp.ndarray
    loss_after: jnp.ndarray


def composite_loss_per_sample(model: PANet, components,
                              pts: jnp.ndarray) -> jnp.ndarray:
    """Per-sample loss of a composite (union-of-priors) model: each sample is
    scored by its best-fitting component (the mixture semantics implied by
    train_composite_model's constructor contract, train_kernel.py:440-488 —
    the constructor itself lives outside the reference tree)."""
    losses = jnp.stack([panet_loss_per_sample(model, p, pts)
                        for p in components])     # (C, N)
    return losses.min(axis=0)


def train_composite_panet(model: PANet, base_params,
                          train_pts: jnp.ndarray,
                          comp_num: int = 3,
                          hard_fraction: float = 0.1,
                          num_steps: int = 2000,
                          batch_size: int = 500,
                          lr: float = 1e-3,
                          sparsity_weight: float = 1e-4,
                          augment_rotation: bool = False,
                          seed: int = 0,
                          eval_every: int = 200) -> CompositePANetResult:
    """Hard-example boosting (train_kernel.py:440-488): starting from a
    pretrained component #0, iteratively (1) score every training sample with
    the current composite, (2) take the worst `hard_fraction` (reference:
    last 10%, `train_sample_num // 10`), (3) train a new component on those
    hard samples (initialised from the previous component, used as both train
    and validation data exactly as the reference does at :488), (4) append
    its best-by-validation weights to the composite."""
    train_pts = jnp.asarray(train_pts, jnp.float32)
    n = train_pts.shape[0]
    hard_num = max(1, int(n * hard_fraction))

    components = [base_params]
    loss_before = composite_loss_per_sample(model, components, train_pts)
    for comp_id in range(1, comp_num):
        loss_ps = composite_loss_per_sample(model, components, train_pts)
        hard_idx = jnp.argsort(-loss_ps)[:hard_num]
        hard = train_pts[hard_idx]
        result = train_panet(
            model, hard, hard, num_steps=num_steps,
            batch_size=min(batch_size, hard_num), lr=lr,
            sparsity_weight=sparsity_weight,
            augment_rotation=augment_rotation,
            seed=seed + comp_id, eval_every=eval_every,
            init_params=components[-1])
        components.append(result.best_params)
    loss_after = composite_loss_per_sample(model, components, train_pts)
    return CompositePANetResult(components=components,
                                loss_before=loss_before,
                                loss_after=loss_after)
