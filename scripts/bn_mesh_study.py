"""Sync-BN vs per-shard BN under the data mesh (SURVEY §7 open item,
VERDICT r4 #7).

The mesh train step computes BatchNorm statistics over the GLOBAL batch
(jit + sharding annotations: XLA all-reduces the batch mean/var — sync-BN
semantics). The reference's DataParallel computes PER-REPLICA statistics
(common/nets/balanced_parallel.py replicates the module; each replica
normalises its own sub-batch). This study measures whether that semantic
difference matters for the flagship recipe, and what sync-BN's collectives
cost per step:

  arm A (default): the production sharded train step at data=8 — sync-BN.
  arm B: the same program inside one shard_map region over `data` with
         params replicated and gradients psummed manually — BN sees only
         the local B/8 rows (per-shard stats, the reference semantics);
         running stats are psum-averaged so eval is well-defined.

Both arms run the same synthetic convergence (same sampling stream, same
init) on the virtual 8-device CPU mesh; reported: end-of-run student MPJPE
trajectory + per-step wall time. Run:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bn_mesh_study.py [--steps 60] [--batch 32]

(The real machine has one TPU chip, so the convergence comparison runs on
the virtual CPU mesh; step time is relative — sync-BN's extra collectives
are two (C,)-sized psums per BN layer, negligible against the MB-scale
gradient psums on real ICI.)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--input", type=int, default=64)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from hand_integral_pose_estimation_tpu import losses
    from hand_integral_pose_estimation_tpu.config import (
        Config, ModelConfig, TrainConfig,
    )
    from hand_integral_pose_estimation_tpu.data import pipeline
    from hand_integral_pose_estimation_tpu.data.freihand import (
        SyntheticFreiHand,
    )
    from hand_integral_pose_estimation_tpu.models import get_pose_net
    from hand_integral_pose_estimation_tpu.ops.fused_head import (
        head_projection_integral,
    )
    from hand_integral_pose_estimation_tpu.parallel import (
        make_mesh, shard_batch,
    )
    from hand_integral_pose_estimation_tpu.training import (
        create_train_state, make_optimizer,
    )
    from hand_integral_pose_estimation_tpu.training.state import TrainState
    from hand_integral_pose_estimation_tpu.training.train_step import (
        make_train_step,
    )

    hw = (args.input, args.input)
    cfg = Config(
        model=ModelConfig(resnet_type=18, input_shape=hw,
                          output_shape=(hw[0] // 4, hw[1] // 4),
                          depth_dim=hw[0] // 4, compute_dtype="float32"),
        train=TrainConfig(batch_size=args.batch, lr=1e-3),
    )
    J, D = cfg.model.num_joints, cfg.model.depth_dim
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    ds = SyntheticFreiHand(n=256, image_hw=hw, seed=5)
    model = get_pose_net(cfg.model)
    tx = make_optimizer(cfg.train, 1)

    def fresh_state():
        state, _ = create_train_state(
            model, jax.random.PRNGKey(0), jnp.zeros((1,) + hw + (3,)),
            cfg.train, tx=tx)
        return state

    def batches():
        rng = np.random.RandomState(7)
        key = jax.random.PRNGKey(3)
        for i in range(args.steps):
            idx = ds.sample_indices(rng, args.batch)
            host = ds.host_batch(idx)
            key, sub = jax.random.split(key)
            batch = pipeline.make_train_batch(
                sub, jnp.asarray(host["image"]),
                jnp.asarray(host["joint_cam"]), jnp.asarray(host["K"]),
                None, jnp.asarray(host["labelled"]), None,
                jnp.asarray(host["ref_bone_len"]), cfg.augment, hw)
            yield batch

    # ---- arm A: the production sharded step (sync-BN: global batch stats)
    step_sync = make_train_step(model, tx, cfg, integral_impl="xla")

    # ---- arm B: per-shard BN via shard_map (the reference's DataParallel
    # semantics: each replica normalises its own sub-batch); grads psummed,
    # running stats psum-averaged so the two arms stay comparable at eval
    def loss_fn(params, batch_stats, batch):
        feats, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch.image,
            train=True, return_features=True, mutable=["batch_stats"])
        Wp, bp = model.final_projection(params)
        coord_out = head_projection_integral(feats, Wp, bp, J, D, "xla")
        out = losses.combined_loss(
            coord_out, batch.label_teacher, batch.label, batch.label_weight,
            batch.labelled, batch.trans_inv, batch.tprime, batch.K,
            lam=cfg.train.lam, patch_width=hw[1], patch_height=hw[0])
        return out.loss, (mutated["batch_stats"], out)

    def shard_body(state, batch):
        (loss, (new_stats, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        grads = jax.lax.pmean(grads, "data")          # DP gradient reduce
        loss = jax.lax.pmean(loss, "data")
        mpjpe = jax.lax.pmean(out.student_mpjpe, "data")
        # per-shard BN stats drive the NORMALISATION; the stored running
        # stats are the shard average (well-defined eval either way)
        new_stats = jax.lax.pmean(new_stats, "data")
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt)
        return new_state, {"loss": loss, "student_mpjpe": mpjpe}

    data = P("data")
    batch_specs = jax.tree_util.tree_map(lambda _: data, pipeline.Batch(
        *[0] * len(pipeline.Batch._fields)))
    step_local = jax.jit(jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(), batch_specs), out_specs=(P(), P()),
        check_vma=False))

    def run(step, label):
        state = fresh_state()
        times, mpjpes, losses_ = [], [], []
        with jax.set_mesh(mesh):
            for i, batch in enumerate(batches()):
                sb = shard_batch(mesh, batch)
                t0 = time.perf_counter()
                state, m = step(state, sb)
                jax.block_until_ready(m["loss"])
                dt = time.perf_counter() - t0
                if i >= 2:                      # skip compile steps
                    times.append(dt)
                mpjpes.append(float(m["student_mpjpe"]))
                losses_.append(float(m["loss"]))
        print(f"{label}: end mpjpe {np.mean(mpjpes[-5:]):.4f} "
              f"(first-5 {np.mean(mpjpes[:5]):.4f}), "
              f"end loss {np.mean(losses_[-5:]):.4f}, "
              f"step {np.median(times) * 1e3:.1f} ms "
              f"(virtual CPU mesh, relative only)")
        return np.mean(mpjpes[-5:]), np.median(times)

    m_sync, t_sync = run(step_sync, "sync-BN   (global stats, default)")
    m_loc, t_loc = run(step_local, "local-BN  (per-shard stats, reference)")
    print(f"\nmpjpe delta (local - sync): {m_loc - m_sync:+.5f}  "
          f"step-time ratio local/sync: {t_loc / t_sync:.3f}")


if __name__ == "__main__":
    main()
