"""Train the Faster R-CNN hand detector on FreiHAND-contract datasets.

The reference trains its detector out-of-tree (the upstream faster-rcnn
codebase reads `freihand_bbox_gt_{split}.npy`, lib/datasets/freihand.py:53-64,
and common/hand_detector.py:117-118 only loads the result); this CLI is the
native in-tree equivalent: GT boxes are projected from the pose annotations
(detect/data.py:gt_bbox_from_keypoints), training runs the jitted 4-loss step
(training/detector_trainer.py), held-out VOC AP is tracked, and the final
state is checkpointed.

Works without the FreiHAND download via the synthetic stand-in:
    python -m hand_integral_pose_estimation_tpu.cli.train_detector \
        --synthetic --steps 500 --eval-every 100
With the dataset:
    ... cli.train_detector --data-dir /data/FreiHAND --steps 50000
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from hand_integral_pose_estimation_tpu.config import DetectorConfig


def detector_cfg_from_args(args) -> DetectorConfig:
    return DetectorConfig(
        resnet_type=args.resnet,
        norm=args.norm,
        freeze_bn=not args.no_freeze_bn if args.norm == "batch" else True,
        test_scale=args.scale, test_max_size=args.max_size,
        rpn_pre_nms_top_n_train=args.rpn_pre_nms,
        rpn_post_nms_top_n_train=args.rpn_post_nms,
        rpn_pre_nms_top_n_test=args.rpn_pre_nms,
        rpn_post_nms_top_n_test=max(args.rpn_post_nms // 4, 16),
        roi_batch_size=args.roi_batch,
        max_detections=16,
        roi_bg_thresh_lo=0.0 if args.from_scratch else 0.1,
    )


def train_detector(dataset, cfg: DetectorConfig, steps: int = 1000,
                   batch: int = 4, lr: float = 1e-3, seed: int = 0,
                   eval_every: int = 200, eval_n: int = 32,
                   flip: bool = True, model_dir: str | None = None,
                   log=print) -> dict:
    """Train on `dataset` (FreiHandDataset / SyntheticFreiHand host-batch
    contract); the last `eval_n` samples are held out for AP."""
    import jax
    import jax.numpy as jnp

    from hand_integral_pose_estimation_tpu.detect.data import (
        build_detector_batch,
        evaluate_detections,
        gt_bbox_from_keypoints,
    )
    from hand_integral_pose_estimation_tpu.detect.faster_rcnn import (
        FasterRCNN,
    )
    from hand_integral_pose_estimation_tpu.detect.hand_detector import (
        _blob_scale,
        detect,
    )
    from hand_integral_pose_estimation_tpu.training.detector_trainer import (
        create_detector_train_state,
        make_detector_optimizer,
        make_detector_train_step,
    )

    n = len(dataset)
    eval_n = min(eval_n, max(n // 4, 1))
    train_idx = np.arange(0, n - eval_n)
    val_idx = np.arange(n - eval_n, n)

    model = FasterRCNN(cfg=cfg)
    sample = dataset.host_batch(np.array([0]))
    H, W = sample["image"].shape[1:3]
    scale = _blob_scale((H, W), cfg.test_scale, cfg.test_max_size)
    bh, bw = int(round(H * scale)), int(round(W * scale))

    tx = make_detector_optimizer(lr=lr, decay_step=max(steps // 2, 1),
                                 decay_factor=0.3)
    state, tx = create_detector_train_state(
        model, jax.random.PRNGKey(seed), sample_hw=(bh, bw), tx=tx)
    train_step = make_detector_train_step(model, tx)

    pixel_means = np.asarray(cfg.pixel_means, np.float32)

    import jax.image as jimage

    @jax.jit
    def to_blob(images_rgb):
        # BGR + mean-sub + single-scale resize (utils/blob.py:20-49)
        bgr = images_rgb[..., ::-1].astype(jnp.float32) - pixel_means
        if (bh, bw) != (H, W):
            bgr = jimage.resize(bgr, (bgr.shape[0], bh, bw, 3), "bilinear")
        return bgr

    # held-out eval: GT boxes from projected keypoints
    vh = dataset.host_batch(val_idx)
    val_images = jnp.asarray(vh["image"].astype(np.float32))
    uv = np.einsum("bij,bnj->bni", vh["K"], vh["joint_cam"])
    uv = uv[..., :2] / uv[..., 2:3]
    val_gt = [b[None, :] for b in gt_bbox_from_keypoints(uv)]
    detect_fn = jax.jit(lambda v, imgs: detect(model, v, imgs, cfg))

    def eval_ap(state):
        dets = detect_fn({"params": state.params,
                          "batch_stats": state.batch_stats}, val_images)
        boxes, scores = np.asarray(dets.boxes), np.asarray(dets.scores)
        valid = np.asarray(dets.valid)
        return evaluate_detections(
            [boxes[i][valid[i]] for i in range(len(val_idx))],
            [scores[i][valid[i]] for i in range(len(val_idx))],
            val_gt)["ap"]

    rng = np.random.RandomState(seed + 1)
    history = []
    for step in range(1, steps + 1):
        idx = train_idx[rng.randint(0, len(train_idx), batch)]
        db = build_detector_batch(dataset, idx,
                                  flip_rng=rng if flip else None)
        state, metrics = train_step(
            state, to_blob(jnp.asarray(db.images.astype(np.float32))),
            jnp.asarray(db.gt_boxes * scale),
            jnp.asarray(db.gt_classes), jnp.asarray(db.gt_valid),
            jax.random.PRNGKey(seed * 100_003 + step))
        if step % eval_every == 0 or step == steps:
            rec = {"step": step, "ap": round(float(eval_ap(state)), 4),
                   "loss": round(float(metrics["loss"]), 4)}
            history.append(rec)
            log(json.dumps(rec))

    if model_dir:
        from hand_integral_pose_estimation_tpu.training.checkpoint import (
            save_pytree,
        )
        import os
        save_pytree(os.path.join(model_dir, "detector_final"),
                    {"params": state.params,
                     "batch_stats": state.batch_stats})
        log(f"saved {model_dir}/detector_final")
    return {"history": history, "final_ap": history[-1]["ap"],
            "state": state}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default=None,
                   help="FreiHAND root; omit for --synthetic")
    p.add_argument("--training-size", type=int, default=None,
                   help="override cfg.train.training_size (partial "
                        "downloads / mini fixtures)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--n", type=int, default=256,
                   help="synthetic dataset size")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--eval-every", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-flip", action="store_true")
    p.add_argument("--model-dir", default=None)
    # architecture / recipe
    p.add_argument("--resnet", type=int, default=101)
    p.add_argument("--norm", choices=("batch", "group"), default="group")
    p.add_argument("--no-freeze-bn", action="store_true",
                   help="with --norm batch: run BN live (from-scratch)")
    p.add_argument("--reference-sampling", dest="from_scratch",
                   action="store_false", default=True,
                   help="keep the reference's roi_bg_thresh_lo=0.1 instead "
                        "of the from-scratch recipe's 0.0")
    p.add_argument("--scale", type=int, default=600)
    p.add_argument("--max-size", type=int, default=1000)
    p.add_argument("--rpn-pre-nms", type=int, default=6000)
    p.add_argument("--rpn-post-nms", type=int, default=512)
    p.add_argument("--roi-batch", type=int, default=128)
    from hand_integral_pose_estimation_tpu.detect.config_compat import (
        add_override_flags,
    )
    add_override_flags(p)
    args = p.parse_args(argv)

    if args.data_dir:
        from hand_integral_pose_estimation_tpu.config import Config
        from hand_integral_pose_estimation_tpu.data.freihand import (
            FreiHandDataset,
        )
        dcfg = Config()
        if args.training_size:
            dcfg = dcfg.with_training_size(args.training_size)
        dataset = FreiHandDataset(args.data_dir, data_split="training",
                                  cfg=dcfg)
    else:
        from hand_integral_pose_estimation_tpu.data.freihand import (
            SyntheticFreiHand,
        )
        dataset = SyntheticFreiHand(n=args.n, render_joints=True,
                                    seed=args.seed)

    from hand_integral_pose_estimation_tpu.detect.config_compat import (
        overrides_from_args,
    )
    cfg = overrides_from_args(detector_cfg_from_args(args), args)
    result = train_detector(
        dataset, cfg, steps=args.steps, batch=args.batch, lr=args.lr,
        seed=args.seed, eval_every=args.eval_every,
        flip=not args.no_flip, model_dir=args.model_dir)
    print(json.dumps({"final_ap": result["final_ap"]}))


if __name__ == "__main__":
    main()
