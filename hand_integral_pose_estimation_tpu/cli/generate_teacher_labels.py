"""Filtered teacher-label generation (reference:
main/generate_filtered_teacher_labels.py).

Runs the frozen teacher under 21 z-rotations per unlabelled image (one
batched forward per batch instead of 21 sequential forwards per sample),
keeps samples whose prediction variance is below the threshold, and writes
the filtered pseudo-label db (npz with joint_cam_normalized / tprime /
variance / keep, the pickle-equivalent of
FreiHand_keypoint_bbox_db_training_filtered.pkl).
"""

from __future__ import annotations

import argparse


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--model-dir", default="output/teacher_model",
                   help="teacher snapshot dir (config.py:79)")
    p.add_argument("--out", default="output/filtered_teacher_labels.npz")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--variance-threshold", type=float, default=1e-4)
    p.add_argument("--synthetic-size", type=int, default=32)
    p.add_argument("--training-size", type=int, default=None,
                   help="override cfg.train.training_size (partial "
                        "downloads / mini fixtures)")
    p.add_argument("--rotation-mode", choices=("factored", "composed"),
                   default="factored",
                   help="warp structure of the rotation sweep (factored = "
                        "shared crop + patch-space rotations, the fast "
                        "path; composed = one full-source warp per "
                        "rotation)")
    p.add_argument("--teacher-dtype",
                   choices=("float32", "bfloat16", "int8"),
                   default=None,
                   help="teacher compute dtype (default = config default, "
                        "bfloat16 on the MXU; the integral decode and the "
                        "variance filter accumulate in float32 either way "
                        "— keep-set equality vs float32 is tested, "
                        "tests/test_distill.py). 'int8' runs the teacher "
                        "convs as s8xs8->s32 MXU ops, calibrated on the "
                        "first batch's own sweep patches "
                        "(distill.quantized_teacher_apply)")
    p.add_argument("--cascade", action="store_true",
                   help="two-pass early-reject filter: a provable subset "
                        "variance bound rejects most non-keepable samples "
                        "after --cascade-pass1 rotations, survivors get the "
                        "full sweep — same keep set, fraction of the "
                        "compute (distill/cascade.py)")
    p.add_argument("--cascade-pass1", type=int, default=5,
                   help="rotations in the early-reject pass (endpoints "
                        "included)")
    p.add_argument("--mesh", default="none",
                   help="'auto' | 'none' | 'data=N[,model=M]': shard each "
                        "generation batch over the mesh's data axis (the "
                        "sweep runs in one shard_map region per batch; the "
                        "reference's DataParallel teacher filter loop, "
                        "generate_filtered_teacher_labels.py:403-509). "
                        "--batch-size must divide by the data-axis size")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hand_integral_pose_estimation_tpu.config import Config
    from hand_integral_pose_estimation_tpu.data.freihand import (
        FreiHandDataset,
        SyntheticFreiHand,
    )
    from hand_integral_pose_estimation_tpu.distill import (
        generate_filtered_labels,
    )
    from hand_integral_pose_estimation_tpu.geometry import (
        bbox as bbox_mod,
        camera,
    )
    from hand_integral_pose_estimation_tpu.models import get_pose_net
    from hand_integral_pose_estimation_tpu.ops.integral import (
        softmax_integral,
    )
    from hand_integral_pose_estimation_tpu.training import (
        create_train_state,
        load_checkpoint,
    )

    import dataclasses

    cfg = Config()
    if args.training_size:
        cfg = cfg.with_training_size(args.training_size)
    if args.teacher_dtype in ("float32", "bfloat16"):
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, compute_dtype=args.teacher_dtype))
    # int8 keeps the config compute dtype for the non-conv ops; the convs
    # are replaced at trace time (quantized_teacher_apply below)
    if args.synthetic or not args.data_dir:
        dataset = SyntheticFreiHand(n=args.synthetic_size)
    else:
        dataset = FreiHandDataset(args.data_dir, "training", cfg)

    model = get_pose_net(cfg.model)
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, *cfg.model.input_shape, 3)), cfg.train)
    try:
        state, epoch = load_checkpoint(args.model_dir, state)
        print(f"teacher = snapshot_{epoch}")
    except FileNotFoundError:
        print("no teacher snapshot — using a fresh model (smoke mode)")

    J, D = cfg.model.num_joints, cfg.model.depth_dim

    def _device_batch(host):
        """Host record dict -> (images, K, joint_cam, labelled, bbox);
        detector boxes when cached, keypoint-derived otherwise."""
        images = jnp.asarray(host["image"])
        K = jnp.asarray(host["K"])
        joint_cam = jnp.asarray(host["joint_cam"])
        labelled = jnp.asarray(host["labelled"])
        if host["bbox_detector"] is not None:
            bbox = jnp.asarray(host["bbox_detector"])
        else:
            uv, _, _ = jax.vmap(lambda j, k: camera.project_points(
                j, jnp.eye(3, dtype=k.dtype), k))(joint_cam, K)
            bbox = jax.vmap(lambda u: bbox_mod.bbox_from_keypoints(
                u, jnp.ones(u.shape[0]),
                pad_factor=cfg.augment.pad_factor))(uv)
        return images, K, joint_cam, labelled, bbox

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if args.teacher_dtype == "int8":
        from hand_integral_pose_estimation_tpu.data.freihand import (
            padded_batches as _pb,
        )
        from hand_integral_pose_estimation_tpu.distill import (
            quantized_teacher_apply,
        )
        c_imgs, c_K, _, _, c_bbox = _device_batch(
            dataset.host_batch(next(iter(_pb(len(dataset),
                                             args.batch_size)))))
        teacher_fwd, q8 = quantized_teacher_apply(
            model, variables, c_imgs, c_K, c_bbox, cfg.augment, J, D,
            num_rotations=cfg.train.teacher_num_rotations,
            rotation_range=cfg.train.teacher_rotation_range,
            patch_hw=cfg.model.input_shape,
            rotation_mode=args.rotation_mode)
        print(f"int8 teacher: {len(q8.paths)} modules quantized "
              f"(calibrated on the first batch's sweep patches)")
        teacher_apply = jax.jit(teacher_fwd)
    else:
        @jax.jit
        def teacher_apply(patches):
            hm = model.apply(variables, patches, train=False)
            return softmax_integral(hm, J, D)

    from hand_integral_pose_estimation_tpu.cli.mesh_arg import (
        resolve_eval_mesh,
    )
    mesh = resolve_eval_mesh(args.mesh, args.batch_size)

    @jax.jit
    def run_batch(images, K, bbox, labelled, joint_cam):
        return generate_filtered_labels(
            teacher_apply, images, K, bbox, labelled, joint_cam,
            cfg.augment, cfg.train.teacher_num_rotations,
            cfg.train.teacher_rotation_range, args.variance_threshold,
            cfg.model.input_shape, rotation_mode=args.rotation_mode,
            mesh=mesh)

    runner = None
    if args.cascade:
        from hand_integral_pose_estimation_tpu.distill import CascadeRunner
        runner = CascadeRunner(
            teacher_apply, cfg.augment,
            num_rotations=cfg.train.teacher_num_rotations,
            rotation_range=cfg.train.teacher_rotation_range,
            variance_threshold=args.variance_threshold,
            patch_hw=cfg.model.input_shape,
            rotation_mode=args.rotation_mode,
            pass1_rotations=args.cascade_pass1,
            pass2_batch=args.batch_size,
            mesh=mesh)

    results = {"joint_cam_normalized": [], "tprime": [], "variance": [],
               "keep": [], "labelled": []}
    from hand_integral_pose_estimation_tpu.data.freihand import (
        padded_batches,
    )
    n = len(dataset)
    bs = args.batch_size
    for idx in padded_batches(n, bs):
        # tail batch padded (fixed device shapes), trimmed below — every
        # record gets a db row; apply_filtered_labels aligns by index
        start = int(idx[0])
        images, K, joint_cam, labelled, bbox = _device_batch(
            dataset.host_batch(idx))
        if runner is not None:
            rows = np.where(idx == start + np.arange(bs), idx, -1)
            runner.add_batch(images, K, bbox, labelled, joint_cam, rows)
        else:
            out = run_batch(images, K, bbox, labelled, joint_cam)
            for k in ("joint_cam_normalized", "tprime", "variance", "keep"):
                results[k].append(np.asarray(getattr(out, k)))
            results["labelled"].append(np.asarray(labelled))
        if start % (20 * bs) == 0:
            print(f"{min(start + bs, n)}/{n} processed")

    if runner is not None:
        merged = runner.finalize(n)
        s = runner.stats
        print(f"cascade: {s['early_rejected']}/{s['total']} early-rejected "
              f"after {args.cascade_pass1} rotations, {s['pass2']} took the "
              f"full sweep, {s['labelled']} labelled")
    else:
        merged = {k: np.concatenate(v)[:n] for k, v in results.items()}
    # record identities for the load-time alignment check (rows are
    # positional; a sizing mismatch must fail loudly, not mislabel)
    from hand_integral_pose_estimation_tpu.data.detector_db import (
        _record_names,
    )
    merged["name"] = _record_names(dataset)
    np.savez(args.out, **merged)
    kept = merged["keep"].sum()
    print(f"kept {kept}/{len(merged['keep'])} samples -> {args.out}")


if __name__ == "__main__":
    main()
