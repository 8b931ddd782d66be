"""Phase breakdown of the headline e2e inference path on the live TPU.

Times three device-side loops with the same differenced method bench.py uses:
preprocess-only (crop/normalise chain), network-only (backbone + deconv head +
fused projection-integral on premade patches), and the full e2e chain. The
difference between (full) and (pre + net) is dispatch/fusion interaction.

    python scripts/profile_breakdown.py [--batch 32]
"""

import argparse
import functools
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import _diff_timed, _pose_inputs  # noqa: E402


def train_breakdown(batch):
    """Phase split of the train step: preprocess / fwd+loss / grad / full."""
    import jax
    import jax.numpy as jnp
    import optax
    from hand_integral_pose_estimation_tpu.config import Config
    from hand_integral_pose_estimation_tpu.data import pipeline
    from hand_integral_pose_estimation_tpu.models import get_pose_net
    from hand_integral_pose_estimation_tpu.training.state import TrainState
    from hand_integral_pose_estimation_tpu.training.train_step import (
        make_train_step,
    )

    cfg = Config()
    net = get_pose_net(cfg.model)
    B = batch
    images, joints, K, ref_len = _pose_inputs(B)
    labelled = jnp.arange(B) % 2 == 0
    teacher = joints * 1.001
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    tx = optax.adam(1e-3)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    train_step = make_train_step(net, tx, cfg)

    def make_batch(imgs, i):
        return pipeline.make_train_batch(
            jax.random.fold_in(jax.random.PRNGKey(0), i), imgs, joints, K,
            None, labelled, teacher, ref_len, cfg.augment,
            cfg.model.input_shape)

    batch0 = jax.jit(lambda im: make_batch(im, 0))(images)

    from hand_integral_pose_estimation_tpu import losses
    from hand_integral_pose_estimation_tpu.ops.fused_head import (
        head_projection_integral,
    )

    def fwd_loss(params, batch_stats, b):
        feats, _ = net.apply(
            {"params": params, "batch_stats": batch_stats}, b.image,
            train=True, return_features=True, mutable=["batch_stats"])
        Wp, bp = net.final_projection(params)
        coords = head_projection_integral(
            feats, Wp, bp, cfg.model.num_joints, cfg.model.depth_dim)
        out = losses.combined_loss(
            coords, b.label_teacher, b.label, b.label_weight, b.labelled,
            b.trans_inv, b.tprime, b.K, panet_apply=None, lam=cfg.train.lam,
            patch_width=cfg.model.input_shape[1],
            patch_height=cfg.model.input_shape[0])
        return out.loss

    @functools.partial(jax.jit, static_argnums=(1,))
    def pre_loop(images, n):
        def body(i, imgs):
            b = make_batch(imgs, i)
            return imgs + 1e-9 * jnp.sum(b.image)
        return jax.lax.fori_loop(0, n, body, images)

    # chain each iteration through the batch image (CLAUDE.md: the body must
    # depend on the carry or XLA hoists the loop-invariant forward/backward
    # out of the fori_loop entirely) and tap with FULL reductions
    @functools.partial(jax.jit, static_argnums=(1,))
    def fwd_loop(images, n):
        def body(i, s):
            b = batch0._replace(image=batch0.image + s)
            loss = fwd_loss(state.params, state.batch_stats, b)
            return 1e-9 * loss
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @functools.partial(jax.jit, static_argnums=(1,))
    def grad_loop(images, n):
        def body(i, s):
            b = batch0._replace(image=batch0.image + s)
            g = jax.grad(fwd_loss)(state.params, state.batch_stats, b)
            tot = sum(jnp.sum(le) for le in jax.tree_util.tree_leaves(g))
            return 1e-9 * tot
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @functools.partial(jax.jit, static_argnums=(2,))
    def step_loop(state, images, n):
        def body(i, carry):
            st, imgs = carry
            b = make_batch(imgs, i)
            st, metrics = train_step(st, b)
            return st, imgs + 1e-9 * metrics["loss"]
        return jax.lax.fori_loop(0, n, body, (state, images))

    for name, run in [
        ("train preprocess", lambda n: np.asarray(
            pre_loop(images, n)[0, 0, 0])),
        ("fwd+loss only", lambda n: np.asarray(fwd_loop(images, n))),
        ("fwd+bwd (grad)", lambda n: np.asarray(grad_loop(images, n))),
        ("full step (pre+grad+adam)", lambda n: np.asarray(
            step_loop(state, images, n)[1][0, 0, 0])),
    ]:
        t = _diff_timed(run, n_steps=10)
        print(f"{name:28s} {t * 1e3:7.3f} ms/batch{B}"
              f"  {B / t:9.1f} img/s")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--train", action="store_true",
                   help="break down the train step instead of inference")
    args = p.parse_args()
    if args.train:
        train_breakdown(args.batch)
        return

    import jax
    import jax.numpy as jnp
    from hand_integral_pose_estimation_tpu.config import Config
    from hand_integral_pose_estimation_tpu.data import pipeline
    from hand_integral_pose_estimation_tpu.models import get_pose_net
    from hand_integral_pose_estimation_tpu.ops.fused_head import (
        head_projection_integral,
    )

    cfg = Config()
    net = get_pose_net(cfg.model)
    B = args.batch
    images, joints, K, ref_len = _pose_inputs(B)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    params, batch_stats = variables["params"], variables["batch_stats"]

    @functools.partial(jax.jit, static_argnums=(1,))
    def pre_loop(images, n):
        def body(i, imgs):
            b = pipeline.make_eval_batch(imgs, joints, K, None, ref_len,
                                         cfg.augment, cfg.model.input_shape)
            return imgs + 1e-9 * jnp.sum(b.image)
        return jax.lax.fori_loop(0, n, body, images)

    patches = pipeline.make_eval_batch(images, joints, K, None, ref_len,
                                       cfg.augment,
                                       cfg.model.input_shape).image

    @functools.partial(jax.jit, static_argnums=(1,))
    def net_loop(patches, n):
        def body(i, x):
            feats = net.apply({"params": params, "batch_stats": batch_stats},
                              x, train=False, return_features=True)
            Wp, bp = net.final_projection(params)
            coords = head_projection_integral(
                feats, Wp, bp, cfg.model.num_joints, cfg.model.depth_dim)
            return x + 1e-9 * jnp.sum(coords)
        return jax.lax.fori_loop(0, n, body, patches)

    @functools.partial(jax.jit, static_argnums=(1,))
    def backbone_loop(patches, n):
        def body(i, x):
            feats = net.apply({"params": params, "batch_stats": batch_stats},
                              x, train=False, return_features=True)
            return x + 1e-9 * jnp.sum(feats)
        return jax.lax.fori_loop(0, n, body, patches)

    @functools.partial(jax.jit, static_argnums=(1,))
    def e2e_loop(images, n):
        def body(i, imgs):
            b = pipeline.make_eval_batch(imgs, joints, K, None, ref_len,
                                         cfg.augment, cfg.model.input_shape)
            feats = net.apply({"params": params, "batch_stats": batch_stats},
                              b.image, train=False, return_features=True)
            Wp, bp = net.final_projection(params)
            coords = head_projection_integral(
                feats, Wp, bp, cfg.model.num_joints, cfg.model.depth_dim)
            return imgs + 1e-9 * jnp.sum(coords)
        return jax.lax.fori_loop(0, n, body, images)

    for name, fn, arg in [("preprocess", pre_loop, images),
                          ("backbone+head(feats)", backbone_loop, patches),
                          ("net(feats+fused decode)", net_loop, patches),
                          ("e2e", e2e_loop, images)]:
        t = _diff_timed(lambda n: np.asarray(fn(arg, n)[0, 0, 0]))
        print(f"{name:28s} {t * 1e3:7.3f} ms/batch{B}"
              f"  {B / t:9.1f} img/s")


if __name__ == "__main__":
    main()
