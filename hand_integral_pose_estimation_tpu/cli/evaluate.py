"""FreiHAND-challenge prediction dump (reference: main/evaluate.py).

Sweeps the (label-free) evaluation split and dumps pred.json
([xyz_list, verts_list]) for the challenge server, plus
evaluation_predictions.npy.

Crop boxes come from the hand detector, exactly as the reference's
`load_evaluation_data` (FreiHand.py:286-341): by default the sweep runs the
jitted two-stage detect -> crop -> pose program (inference.TwoStagePipeline)
so both networks execute in one XLA program per batch. A cached bbox db
(--bbox-db) short-circuits the detector stage, mirroring the reference's
pickle cache (FreiHand.py:286-293).
"""

from __future__ import annotations

import argparse


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--model-dir", default="output/model_dump")
    p.add_argument("--result-dir", default="output/result/evaluation")
    p.add_argument("--evaluate-epoch", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--synthetic-size", type=int, default=64)
    p.add_argument("--use-detector", action="store_true",
                   help="two-stage detect->crop->pose even in synthetic mode "
                        "(always on for the real label-free split)")
    p.add_argument("--detector-ckpt", default=None,
                   help="orbax detector params dir or a reference "
                        "faster_rcnn_*.pth (converted on load; fresh "
                        "weights if absent)")
    p.add_argument("--detector-style", choices=("torchvision", "caffe"),
                   default=None,
                   help="ResNet block variant; default: caffe for .pth "
                        "checkpoints (the reference's weights require it), "
                        "else torchvision")
    p.add_argument("--bbox-db", default=None,
                   help="npz cache of detector crop boxes; reused when it "
                        "matches the dataset, written after a detector sweep "
                        "otherwise")
    # detector sizing knobs (defaults = reference R101@600 configuration;
    # with --detector-native they default to the native preset instead and
    # explicit flags still override)
    p.add_argument("--detector-native", action="store_true",
                   help="DetectorConfig.native serving preset: detect at "
                        "native resolution (224) instead of the reference's "
                        "short-side-600 blob upscale — R18/GroupNorm/64 "
                        "proposals, 1.4 vs 13.6 ms/batch-4 on v5e. Needs "
                        "in-tree-trained weights (cli/train_detector); the "
                        "reference's .pth is bound to 600-scale statistics")
    p.add_argument("--detector-resnet", type=int, default=None)
    p.add_argument("--detector-scale", type=int, default=None)
    p.add_argument("--detector-proposals", type=int, default=None)
    p.add_argument("--int8", action="store_true",
                   help="int8 post-training quantization of BOTH nets in "
                        "the two-stage sweep (quantize/ptq.py: per-channel "
                        "weights, activation scales calibrated on the first "
                        "batch, s8xs8->s32 MXU execution). Requires the "
                        "detector path (not the cached-bbox Tester path)")
    p.add_argument("--int8-db", default=None,
                   help="path PREFIX for persisted int8 bundles "
                        "('<prefix>.pose.npz' + '<prefix>.det.npz'): "
                        "reused when both exist (calibrate once, ship "
                        "everywhere), written after calibration otherwise")
    p.add_argument("--split-detector", action="store_true",
                   help="dispatch the detector as two XLA programs "
                        "(detect_split) and the pose stage as a third — "
                        "recovers the ~29%% one-program composition loss "
                        "at parity scale (PERFORMANCE.md round-5 detector "
                        "section). Single-chip latency knob: incompatible "
                        "with --mesh and --int8")
    p.add_argument("--detector-norm", choices=("batch", "group"),
                   default=None,
                   help="must match the checkpoint's architecture: 'batch' "
                        "(reference parity) or 'group' (cli/train_detector's "
                        "from-scratch default)")
    # pose-net sizing knobs (defaults = reference R50@224, 56^3 heatmap)
    p.add_argument("--mesh", default="auto",
                   help="device mesh for the sharded sweep (both the "
                        "two-stage serving pipeline and the Tester path): "
                        "'auto', 'none', or 'data=N[,model=M]'")
    p.add_argument("--pose-resnet", type=int, default=50)
    p.add_argument("--pose-input", type=int, default=224)
    p.add_argument("--pose-depth", type=int, default=None,
                   help="heatmap depth bins (default: pose-input // 4)")
    from hand_integral_pose_estimation_tpu.detect.config_compat import (
        add_override_flags,
    )
    add_override_flags(p)
    return p


def resolve_detector_cfg(args, base):
    """Detector config from CLI knobs: `--detector-native` starts from the
    `DetectorConfig.native` serving preset (native-resolution detection,
    from-scratch recipe) instead of the reference-parity defaults in
    `base`; explicit per-field flags override either way."""
    import dataclasses

    from hand_integral_pose_estimation_tpu.config import DetectorConfig
    from hand_integral_pose_estimation_tpu.detect.load import (
        default_resnet_style,
    )

    if args.detector_native:
        det_cfg = DetectorConfig.native(args.detector_scale or 224,
                                        args.detector_resnet or 18)
    else:
        det_cfg = base
    scale = args.detector_scale or det_cfg.test_scale
    norm = args.detector_norm or det_cfg.norm
    det_cfg = dataclasses.replace(
        det_cfg, resnet_type=args.detector_resnet or det_cfg.resnet_type,
        norm=norm,
        resnet_style=args.detector_style or default_resnet_style(
            args.detector_ckpt),
        freeze_bn=norm == "batch",
        test_scale=scale,
        test_max_size=(det_cfg.test_max_size
                       if scale == det_cfg.test_scale
                       else scale),
        rpn_post_nms_top_n_test=(args.detector_proposals
                                 or det_cfg.rpn_post_nms_top_n_test))
    # reference-format overrides apply last (--cfg-file then --set), so an
    # operator's carried-over RCNN yaml / KEY VALUE pairs win over the
    # per-field convenience flags — the order trainval_net.py used
    from hand_integral_pose_estimation_tpu.detect.config_compat import (
        overrides_from_args,
    )
    return overrides_from_args(det_cfg, args)


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import dataclasses
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hand_integral_pose_estimation_tpu.config import Config
    from hand_integral_pose_estimation_tpu.data import detector_db
    from hand_integral_pose_estimation_tpu.data.freihand import (
        FreiHandDataset,
        SyntheticFreiHand,
    )
    from hand_integral_pose_estimation_tpu.evaluation import (
        evaluate_challenge,
    )
    from hand_integral_pose_estimation_tpu.models import get_pose_net
    from hand_integral_pose_estimation_tpu.training import (
        Tester,
        create_train_state,
        load_checkpoint,
    )

    cfg = Config()
    hw = args.pose_input
    depth = args.pose_depth or hw // 4
    cfg = cfg.replace(
        detector=resolve_detector_cfg(args, cfg.detector),
        model=dataclasses.replace(
            cfg.model, resnet_type=args.pose_resnet,
            input_shape=(hw, hw), output_shape=(hw // 4, hw // 4),
            depth_dim=depth))

    if args.synthetic or not args.data_dir:
        dataset = SyntheticFreiHand(n=args.synthetic_size)
        use_detector = args.use_detector
    else:
        # label-free challenge split (FreiHand.py:286-341): GT joints are
        # zeros, so crop boxes MUST come from the detector (or a cached db)
        dataset = FreiHandDataset(args.data_dir, "evaluation", cfg)
        use_detector = True

    model = get_pose_net(cfg.model)
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, *cfg.model.input_shape, 3)), cfg.train)
    try:
        state, epoch = load_checkpoint(args.model_dir, state,
                                       args.evaluate_epoch)
        print(f"loaded snapshot_{epoch}")
    except FileNotFoundError:
        print("no snapshot found — evaluating a fresh model")

    if use_detector and args.bbox_db and os.path.exists(args.bbox_db):
        # cached boxes: skip the detector stage entirely
        names, bboxes = detector_db.load_bbox_db(args.bbox_db)
        detector_db.attach_detector_bboxes(dataset, bboxes, names)
        print(f"attached {len(bboxes)} cached crop boxes from {args.bbox_db}")
        use_detector = False

    if args.int8 and not use_detector:
        raise SystemExit("--int8 runs through the two-stage detector "
                         "pipeline; pass --use-detector (and no matching "
                         "--bbox-db cache)")

    if use_detector:
        from hand_integral_pose_estimation_tpu.detect.load import (
            build_detector,
        )
        from hand_integral_pose_estimation_tpu.inference import (
            TwoStagePipeline,
        )

        detector, det_vars = build_detector(cfg.detector,
                                            args.detector_ckpt)

        from hand_integral_pose_estimation_tpu.cli.mesh_arg import (
            resolve_eval_mesh,
        )
        from hand_integral_pose_estimation_tpu.data.freihand import (
            padded_batches,
        )

        n, bs = len(dataset), args.batch_size
        pose_vars = {"params": state.params,
                     "batch_stats": state.batch_stats}
        int8_calib, int8_loaded = None, False
        pose_f = det_f = None
        if args.int8:
            if args.int8_db:
                pose_f = args.int8_db + ".pose.npz"
                det_f = args.int8_db + ".det.npz"
            if pose_f and os.path.exists(pose_f) and os.path.exists(det_f):
                from hand_integral_pose_estimation_tpu.quantize import (
                    load_quantized,
                )
                int8_calib = (load_quantized(pose_f, type(model)),
                              load_quantized(det_f, type(detector)))
                int8_loaded = True
                print(f"int8: loaded persisted bundles {args.int8_db}.*")
            else:
                # calibrate activation scales on the first padded batch
                host = dataset.host_batch(next(iter(padded_batches(n, bs))))
                int8_calib = (jnp.asarray(host["image"]),
                              jnp.asarray(host["K"]),
                              jnp.asarray(host["ref_bone_len"]))
        if args.split_detector:
            if args.mesh not in ("auto", "none"):
                raise SystemExit("--split-detector is a single-chip "
                                 "latency knob; it does not compose with "
                                 "an explicit --mesh")
            if args.int8:
                raise SystemExit("--split-detector does not compose with "
                                 "--int8 (trace-time interception cannot "
                                 "reach the cached split programs)")
        pipe = TwoStagePipeline(cfg, model, pose_vars, detector, det_vars,
                                mesh=(None if args.split_detector else
                                      resolve_eval_mesh(args.mesh,
                                                        args.batch_size)),
                                int8_calib=int8_calib,
                                split_detector=args.split_detector)
        if args.int8:
            qp, qd = pipe.quantized
            print(f"int8: quantized {len(qp.paths)} pose + "
                  f"{len(qd.paths)} detector modules")
            if pose_f and not int8_loaded:
                from hand_integral_pose_estimation_tpu.quantize import (
                    save_quantized,
                )
                save_quantized(pose_f, qp)
                save_quantized(det_f, qd)
                print(f"int8: persisted bundles -> {args.int8_db}.*")
        coords_all, bbox_all = [], []
        K_all, ref_all = [], []
        for idx in padded_batches(n, bs):   # fixed shapes: pad, drop below
            host = dataset.host_batch(idx)
            out = pipe(jnp.asarray(host["image"]),
                       jnp.asarray(host["K"]),
                       jnp.asarray(host["ref_bone_len"]))
            coords_all.append(np.asarray(out.coords_label))
            bbox_all.append(np.asarray(out.crop_bbox))
            K_all.append(host["K"])
            ref_all.append(host["ref_bone_len"])
        coords = np.concatenate(coords_all)[:n]
        bbox = np.concatenate(bbox_all)[:n]
        K = np.concatenate(K_all)[:n]
        ref = np.concatenate(ref_all)[:n]
        if args.bbox_db:
            detector_db.save_bbox_db(args.bbox_db, dataset, bbox)
            print(f"cached crop boxes -> {args.bbox_db}")
    else:
        from hand_integral_pose_estimation_tpu.cli.mesh_arg import (
            resolve_eval_mesh,
        )
        tester = Tester(cfg=cfg, dataset=dataset, state=state,
                        mesh=resolve_eval_mesh(args.mesh, args.batch_size))
        coords, batch = tester.run(batch_size=args.batch_size)
        bbox = np.asarray(batch.bbox)
        K = np.asarray(batch.K)
        ref = np.asarray(batch.ref_bone_len)

    preds = evaluate_challenge(coords, bbox, K, ref,
                               result_dir=args.result_dir)
    print(f"dumped {preds.shape[0]} predictions to "
          f"{args.result_dir}/pred.json")


if __name__ == "__main__":
    main()
