"""Cascade-filter study: measure the REAL pass-1 survival rate — and the
realized end-to-end speedup — of the exact early-reject cascade
(distill/cascade.py) with a genuinely TRAINED teacher, not a synthetic one.

The bench (`bench.py --teacher-cascade`) measures the two passes' device
cost and reports effective throughput as a function of the pass-1 survival
rate f; this study supplies the missing number: what f actually is when a
real teacher filters a real unlabelled pool at the reference's protocol
(21 rotations, variance threshold 1e-4 —
main/generate_filtered_teacher_labels.py:467-495).

Protocol (same synthetic rendered-joint world as
cli/semi_supervised_study, where pose is learnable from pixels):

  1. Train a teacher on `--n` labelled images (or reuse `--model-dir`).
  2. Filter an unseen pool of `--pool` unlabelled images twice:
     a. single-pass (all 21 rotations for every sample) and
     b. cascade (`--cascade-pass1` rotations, early-reject bound, exact);
     each sweep runs twice and the SECOND (warm, compile-free) sweep is
     wall-timed. Keep sets must agree exactly.
  3. Report keep rate, pass-1 survival f, warm wall times, and a
     threshold sweep (keep rate + survival vs variance threshold) from
     the single-pass variances and the pass-1 lower bounds.

Wall-clock caveat: through the axon tunnel every device call pays ~35 ms
RPC (CLAUDE.md), which inflates both arms and UNDERSTATES the cascade's
device-side win (it replaces one big call with up to two smaller ones);
the device-side effective throughput at the measured f comes from the
loop-differenced bench numbers (PERFORMANCE.md round-4 cascade table).

Run (TPU): python -m hand_integral_pose_estimation_tpu.cli.\
filter_cascade_study --teacher-steps 1500 --n 256 --pool 512
Prints one JSON line per phase and a final summary line.
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=256,
                   help="labelled images the teacher trains on")
    p.add_argument("--pool", type=int, default=512,
                   help="unlabelled images to filter")
    p.add_argument("--teacher-steps", type=int, default=1500)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--cascade-pass1", type=int, default=5)
    p.add_argument("--variance-threshold", type=float, default=1e-4)
    p.add_argument("--rotation-mode", choices=("factored", "composed"),
                   default="factored")
    p.add_argument("--pose-resnet", type=int, default=50)
    p.add_argument("--pose-input", type=int, default=224)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--model-dir", default=None,
                   help="reuse an existing teacher snapshot dir instead of "
                        "training one")
    return p


def _pool_batches(ds, cfg, batch_size):
    """Fixed-shape (images, K, bbox, labelled, joint_cam, rows) batches of
    the whole pool (tail padded; rows<0 mark padding), bbox derived from
    projected GT keypoints like cli/generate_teacher_labels."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hand_integral_pose_estimation_tpu.data.freihand import (
        padded_batches,
    )
    from hand_integral_pose_estimation_tpu.geometry import (
        bbox as bbox_mod,
        camera,
    )

    n, bs = len(ds), batch_size
    out = []
    for idx in padded_batches(n, bs):
        start = int(idx[0])
        host = ds.host_batch(idx)
        K = jnp.asarray(host["K"])
        joint_cam = jnp.asarray(host["joint_cam"])
        if host["bbox_detector"] is not None:
            bbox = jnp.asarray(host["bbox_detector"])
        else:
            uv, _, _ = jax.vmap(lambda j, k: camera.project_points(
                j, jnp.eye(3, dtype=k.dtype), k))(joint_cam, K)
            bbox = jax.vmap(lambda u: bbox_mod.bbox_from_keypoints(
                u, jnp.ones(u.shape[0]),
                pad_factor=cfg.augment.pad_factor))(uv)
        rows = np.where(idx == start + np.arange(bs), idx, -1)
        out.append((jnp.asarray(host["image"]), K, bbox,
                    jnp.zeros(bs, bool), joint_cam, rows))
    return out


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import dataclasses

    import jax
    import numpy as np

    from hand_integral_pose_estimation_tpu.config import Config
    from hand_integral_pose_estimation_tpu.data.freihand import (
        SyntheticFreiHand,
    )
    from hand_integral_pose_estimation_tpu.distill import (
        CascadeRunner,
        generate_filtered_labels,
    )
    from hand_integral_pose_estimation_tpu.training import Trainer
    from hand_integral_pose_estimation_tpu.training.teacher import (
        make_frozen_teacher,
    )

    cfg = Config()
    hw = (args.pose_input, args.pose_input)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, resnet_type=args.pose_resnet, input_shape=hw,
            output_shape=(hw[0] // 4, hw[1] // 4), depth_dim=hw[0] // 4),
        train=dataclasses.replace(cfg.train, lr=args.lr, lr_dec_epoch=()),
    )

    # 1. teacher
    if args.model_dir is not None:
        model_dir = args.model_dir
    else:
        t0 = time.time()
        train_ds = SyntheticFreiHand(n=args.n, image_hw=hw, seed=args.seed,
                                     render_joints=True)
        trainer = Trainer(cfg=cfg, dataset=train_ds,
                          model_dir=tempfile.mkdtemp(), seed=args.seed)
        trainer.fit(end_epoch=1, steps_per_epoch=args.teacher_steps)
        model_dir = trainer.model_dir
        print(json.dumps({"phase": "teacher", "steps": args.teacher_steps,
                          "images": args.n,
                          "wall_s": round(time.time() - t0, 1)}),
              flush=True)
    teacher_apply = make_frozen_teacher(cfg, model_dir)

    # 2. the unlabelled pool (unseen seed)
    pool = SyntheticFreiHand(n=args.pool, image_hw=hw,
                             seed=args.seed + 104729, render_joints=True)
    batches = _pool_batches(pool, cfg, args.batch_size)
    T = cfg.train.teacher_num_rotations

    run_single = jax.jit(lambda im, K, bb, lab, jc: generate_filtered_labels(
        teacher_apply, im, K, bb, lab, jc, cfg.augment, T,
        cfg.train.teacher_rotation_range, args.variance_threshold,
        cfg.model.input_shape, rotation_mode=args.rotation_mode))

    def sweep_single():
        keep, var = [], []
        for im, K, bb, lab, jc, rows in batches:
            out = run_single(im, K, bb, lab, jc)
            m = rows >= 0
            keep.append(np.asarray(out.keep)[m])
            var.append(np.asarray(out.variance)[m])
        return np.concatenate(keep), np.concatenate(var)

    runner = CascadeRunner(
        teacher_apply, cfg.augment, num_rotations=T,
        rotation_range=cfg.train.teacher_rotation_range,
        variance_threshold=args.variance_threshold,
        patch_hw=cfg.model.input_shape, rotation_mode=args.rotation_mode,
        pass1_rotations=args.cascade_pass1, pass2_batch=args.batch_size)

    def sweep_cascade():
        runner.reset()
        for im, K, bb, lab, jc, rows in batches:
            runner.add_batch(im, K, bb, lab, jc, rows)
        return runner.finalize(args.pool)

    # warm both (compile), then time the second sweep of each
    sweep_single()
    t0 = time.time()
    keep1, var1 = sweep_single()
    wall_single = time.time() - t0
    sweep_cascade()
    t0 = time.time()
    merged = sweep_cascade()
    wall_cascade = time.time() - t0

    if not np.array_equal(merged["keep"], keep1):
        raise AssertionError(
            f"cascade keep set diverged from single-pass: "
            f"{int((merged['keep'] != keep1).sum())} rows differ")

    f = float(1.0 - merged["early_rejected"].mean())
    rec = {
        "phase": "filter",
        "pool": args.pool,
        "rotations": T,
        "pass1_rotations": args.cascade_pass1,
        "variance_threshold": args.variance_threshold,
        "keep_rate": round(float(keep1.mean()), 4),
        "pass1_survival": round(f, 4),
        "keep_sets_equal": True,
        "wall_single_s": round(wall_single, 2),
        "wall_cascade_s": round(wall_cascade, 2),
        "wall_speedup": round(wall_single / wall_cascade, 2),
    }
    print(json.dumps(rec), flush=True)

    # threshold sweep from stored per-sample quantities (no extra device
    # work): keep rate from the single-pass exact variance, pass-1
    # survival from the cascade's stored lower bound (a row survives
    # pass 1 at threshold t iff bound <= t*(1+safety))
    bound = merged["pass1_bound"]
    grid = sorted({args.variance_threshold * s
                   for s in (0.1, 0.3, 1.0, 3.0, 10.0)})
    sweep = [{"threshold": float(f"{t:.2g}"),
              "keep_rate": round(float((var1 < t).mean()), 4),
              "pass1_survival": round(
                  float((bound <= t * (1 + runner.safety)).mean()), 4)}
             for t in grid]
    print(json.dumps({"phase": "threshold_sweep", "grid": sweep}),
          flush=True)

    print(json.dumps({
        "summary": "filter_cascade_study",
        "keep_rate": rec["keep_rate"],
        "pass1_survival": rec["pass1_survival"],
        "wall_speedup": rec["wall_speedup"],
        "note": "device-side effective img/s at this f: see "
                "PERFORMANCE.md round-4 cascade table (t = pass1 + "
                "f*pass2)"}), flush=True)
    return rec


if __name__ == "__main__":
    main()
