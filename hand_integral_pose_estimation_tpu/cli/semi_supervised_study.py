"""Semi-supervised improvement study: does teacher distillation beat
label-starved supervised training? (The reference's core recipe,
main/train.py:83-99 + generate_filtered_teacher_labels.py, proven here
END-TO-END on TPU rather than at loss level.)

Protocol, on the synthetic rendered-joint set (SyntheticFreiHand
render_joints=True — joints painted as depth-coded blobs, so pose IS
learnable from pixels):

  1. TEACHER  — train on all n labelled images.
  2. BASELINE — train a fresh student on only the K labelled images
     (the label-starved supervised arm).
  3. DISTILLED — train a fresh student on the same K labelled images
     PLUS the remaining n-K images as unlabelled rows whose loss is
     L1 against the frozen teacher (live-teacher mode — the
     reference's `load_regressor_teacher` arm, main/train.py:83-99;
     the variance-filtered pseudo-label-db arm needs record-backed
     datasets and is exercised by the fixture-gated CLI tests).

  Both students run the SAME number of optimiser steps (equal
  compute); held-out MPJPE (full protocol evaluation through
  Tester.run -> evaluate_test_split) decides.

Run (TPU, ~15-30 min wall, compile-dominated):
    python -m hand_integral_pose_estimation_tpu.cli.semi_supervised_study \
        --teacher-steps 3000 --student-steps 1500 --labelled 24
Prints one JSON line per arm and a final summary line.
"""

from __future__ import annotations

import argparse
import copy
import json
import tempfile
import time


def subset_view(ds, indices, labelled_mask=None):
    """A shallow per-sample-array subset of a SyntheticFreiHand-contract
    dataset, optionally overriding the labelled mask."""
    import numpy as np

    sub = copy.copy(ds)
    idx = np.asarray(indices)
    sub.images = ds.images[idx]
    sub.joint_cam = ds.joint_cam[idx]
    sub.K = ds.K[idx]
    sub.ref_bone_len = ds.ref_bone_len[idx]
    sub.labelled = (np.asarray(labelled_mask)
                    if labelled_mask is not None else ds.labelled[idx])
    sub.n = len(idx)
    sub.num_labelled = int(sub.labelled.sum())
    sub.num_unlabelled = sub.n - sub.num_labelled
    sub.detector_bbox = (None if ds.detector_bbox is None
                         else ds.detector_bbox[idx])
    return sub


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=512,
                   help="total images (labelled pool for the teacher)")
    p.add_argument("--labelled", type=int, default=24,
                   help="labels available to the students (K)")
    p.add_argument("--test-n", type=int, default=128)
    p.add_argument("--teacher-steps", type=int, default=3000)
    p.add_argument("--student-steps", type=int, default=1500)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--pose-resnet", type=int, default=50)
    p.add_argument("--pose-input", type=int, default=224)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import dataclasses

    import numpy as np

    from hand_integral_pose_estimation_tpu.config import Config
    from hand_integral_pose_estimation_tpu.data.freihand import (
        SyntheticFreiHand,
    )
    from hand_integral_pose_estimation_tpu.evaluation import (
        evaluate_test_split,
    )
    from hand_integral_pose_estimation_tpu.training import Tester, Trainer
    from hand_integral_pose_estimation_tpu.training.teacher import (
        make_frozen_teacher,
    )

    cfg = Config()
    hw = (args.pose_input, args.pose_input)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, resnet_type=args.pose_resnet, input_shape=hw,
            output_shape=(hw[0] // 4, hw[1] // 4),
            depth_dim=hw[0] // 4),
        train=dataclasses.replace(
            cfg.train, batch_size=args.batch_size, lr=args.lr,
            lr_dec_epoch=()),
    )

    pool = SyntheticFreiHand(n=args.n, image_hw=hw, seed=args.seed,
                             render_joints=True)
    test_ds = SyntheticFreiHand(n=args.test_n, image_hw=hw,
                                seed=args.seed + 7919, render_joints=True)
    K = args.labelled
    results = {}

    def mpjpe_of(state):
        tester = Tester(cfg=cfg, dataset=test_ds, state=state)
        coords, merged = tester.run(batch_size=args.batch_size)
        s = evaluate_test_split(coords, merged)
        return s["mpjpe"], s["pa_mpjpe"]

    def train_arm(name, ds, steps, teacher_apply=None):
        t0 = time.time()
        trainer = Trainer(cfg=cfg, dataset=ds,
                          model_dir=tempfile.mkdtemp(),
                          seed=args.seed, teacher_apply=teacher_apply)
        trainer.fit(end_epoch=1, steps_per_epoch=steps)
        mp, pa = mpjpe_of(trainer.state)
        rec = {"arm": name, "steps": steps, "train_images": ds.n,
               "labelled": int(ds.num_labelled), "mpjpe": round(mp, 5),
               "pa_mpjpe": round(pa, 6),
               "wall_s": round(time.time() - t0, 1)}
        print(json.dumps(rec), flush=True)
        results[name] = rec
        return trainer

    # 1. teacher: every image labelled
    teacher_ds = subset_view(pool, np.arange(args.n),
                             np.ones(args.n, bool))
    teacher = train_arm("teacher", teacher_ds, args.teacher_steps)

    # 2. baseline: the K labelled images only
    base_ds = subset_view(pool, np.arange(K), np.ones(K, bool))
    train_arm("baseline", base_ds, args.student_steps)

    # 3. distilled: K labelled + n-K unlabelled with the frozen teacher
    semi_labelled = np.zeros(args.n, bool)
    semi_labelled[:K] = True
    semi_ds = subset_view(pool, np.arange(args.n), semi_labelled)
    teacher_apply = make_frozen_teacher(cfg, teacher.model_dir)
    train_arm("distilled", semi_ds, args.student_steps,
              teacher_apply=teacher_apply)

    ok = results["distilled"]["mpjpe"] < results["baseline"]["mpjpe"]
    print(json.dumps({
        "summary": "semi_supervised_study",
        "teacher_mpjpe": results["teacher"]["mpjpe"],
        "baseline_mpjpe": results["baseline"]["mpjpe"],
        "distilled_mpjpe": results["distilled"]["mpjpe"],
        "improvement_pct": round(100 * (1 - results["distilled"]["mpjpe"]
                                        / results["baseline"]["mpjpe"]), 1),
        "distillation_helps": bool(ok)}))
    return results


if __name__ == "__main__":
    main()
