"""Training entry point (reference: main/train.py).

    python -m hand_integral_pose_estimation_tpu.cli.train \
        --data-dir /path/to/FreiHAND --epochs 400
    python -m hand_integral_pose_estimation_tpu.cli.train --synthetic \
        --epochs 2 --steps-per-epoch 10      # smoke run, no dataset needed

GPU-range selection (`--gpu 0-2`, main/train.py:16-31) has no equivalent:
JAX owns all local devices and the data-parallel layout comes from the mesh.
"""

from __future__ import annotations

import argparse


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default=None,
                   help="FreiHAND root (training_K.json etc.)")
    p.add_argument("--synthetic", action="store_true",
                   help="train on the synthetic smoke dataset")
    p.add_argument("--model-dir", default="output/model_dump")
    p.add_argument("--log-dir", default="output/log")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--continue", dest="continue_train", action="store_true",
                   help="resume from the latest snapshot (base.py:62-71)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic-size", type=int, default=256)
    p.add_argument("--use-hand-detector", action="store_true",
                   help="crop training patches from detector boxes instead "
                        "of GT-projected ones (use_hand_detector mode, "
                        "FreiHand.py:468-470); boxes come from --bbox-db, "
                        "generated with --detector-ckpt when missing")
    p.add_argument("--bbox-db", default=None,
                   help="npz cache of per-image detector crop boxes "
                        "(the reference's keypoint_bbox_db pickle, "
                        "FreiHand.py:382-409)")
    p.add_argument("--detector-ckpt", default=None,
                   help="orbax dir or a reference faster_rcnn_*.pth "
                        "(torch checkpoints are converted on load)")
    p.add_argument("--detector-style", choices=("torchvision", "caffe"),
                   default=None,
                   help="ResNet block variant; default: caffe when "
                        "--detector-ckpt is a .pth (the reference's "
                        "weights require it), else torchvision")
    p.add_argument("--imagenet-init", default=None,
                   help="torchvision ImageNet ResNet .pth to initialise "
                        "the pose backbone from (common/nets/"
                        "resnet.py:70-76 model-zoo init)")
    p.add_argument("--mesh", default="auto",
                   help="device mesh for sharded training: 'auto' "
                        "(data-parallel over all devices when >1 is "
                        "visible — the reference's default DataParallel "
                        "scope, base.py:141-145), 'none' (single device), "
                        "or 'data=N,model=M'. batch-size must divide by "
                        "the data-axis size")
    p.add_argument("--detector-norm", choices=("batch", "group"),
                   default="batch",
                   help="must match the checkpoint's architecture: 'batch' "
                        "(reference parity) or 'group' (cli/train_detector's "
                        "from-scratch default)")
    p.add_argument("--detector-resnet", type=int, default=None)
    p.add_argument("--test-sweep", action="store_true",
                   help="epoch-end average-loss sweep over the test split "
                        "(main/train.py:140-163)")
    # semi-supervised recipe (the reference Trainer always loads these,
    # base.py:111-128; here they are opt-in flags)
    p.add_argument("--filtered-db", default=None,
                   help="npz pseudo-label db from cli/generate_teacher_labels"
                        " — trains in use_filtered_data mode "
                        "(FreiHand.load_filtered_data, FreiHand.py:343-371)")
    p.add_argument("--teacher-ckpt", default=None,
                   help="model_dir of a pose snapshot to use as the frozen "
                        "live teacher (load_regressor_teacher, "
                        "base.py:117-128)")
    p.add_argument("--teacher-epoch", type=int, default=None)
    p.add_argument("--panet-ckpt", default=None,
                   help="PANet weights (.pth torch or orbax dir) for the "
                        "NRSfM prior term (load_nrsfm_tester, base.py:111)")
    p.add_argument("--lam", type=float, default=None,
                   help="PANet loss weight (cfg._lambda, config.py:50)")
    # pose sizing (smoke runs; defaults = reference R50 @224)
    p.add_argument("--pose-resnet", type=int, default=None)
    p.add_argument("--pose-input", type=int, default=None)
    p.add_argument("--training-size", type=int, default=None,
                   help="override cfg.train.training_size (partial "
                        "downloads / mini fixtures)")
    p.add_argument("--yuv-transport", action="store_true",
                   help="ship batches to the device as the JPEG's own "
                        "subsampled 4:2:0 planes (half the H2D bytes) and "
                        "finish the decode inside the jitted step — "
                        "bitwise-identical pixels (ops/yuv.py); requires "
                        "file-backed 4:2:0 JPEGs at the model input size")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import dataclasses

    from hand_integral_pose_estimation_tpu.config import Config
    from hand_integral_pose_estimation_tpu.data.freihand import (
        FreiHandDataset,
        SyntheticFreiHand,
    )
    from hand_integral_pose_estimation_tpu.detect.load import (
        default_resnet_style,
    )
    from hand_integral_pose_estimation_tpu.training import Trainer

    cfg = Config()
    if args.batch_size:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           batch_size=args.batch_size))
    if args.lam is not None:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, lam=args.lam))
    if args.training_size:
        cfg = cfg.with_training_size(args.training_size)
    det_style = args.detector_style or default_resnet_style(
        args.detector_ckpt, fallback=cfg.detector.resnet_style)
    if (args.detector_norm != "batch" or args.detector_resnet
            or det_style != cfg.detector.resnet_style):
        cfg = dataclasses.replace(cfg, detector=dataclasses.replace(
            cfg.detector, norm=args.detector_norm,
            freeze_bn=args.detector_norm == "batch",
            resnet_type=args.detector_resnet or cfg.detector.resnet_type,
            resnet_style=det_style))
    if args.pose_resnet or args.pose_input:
        hw = args.pose_input or cfg.model.input_shape[0]
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, resnet_type=args.pose_resnet or cfg.model.resnet_type,
            input_shape=(hw, hw), output_shape=(hw // 4, hw // 4),
            depth_dim=hw // 4))

    if args.synthetic or not args.data_dir:
        dataset = SyntheticFreiHand(n=args.synthetic_size)
        test_dataset = (SyntheticFreiHand(n=32, seed=1)
                        if args.test_sweep else None)
    else:
        dataset = FreiHandDataset(args.data_dir, "training", cfg)
        test_dataset = (FreiHandDataset(args.data_dir, "testing", cfg)
                        if args.test_sweep else None)

    if args.use_hand_detector:
        # training-db detector boxes (FreiHand.py:382-409,468-470): reuse the
        # cache when valid, otherwise run the detector once and cache
        import os

        from hand_integral_pose_estimation_tpu.data import detector_db
        from hand_integral_pose_estimation_tpu.detect.load import (
            build_detector,
        )

        detector, det_vars = None, None
        if not (args.bbox_db and os.path.exists(args.bbox_db)):
            detector, det_vars = build_detector(cfg.detector,
                                                args.detector_ckpt)
        detector_db.ensure_detector_bboxes(
            dataset, detector, det_vars, cache_path=args.bbox_db,
            det_cfg=cfg.detector, pad_factor=cfg.augment.pad_factor)

    if args.filtered_db:
        # use_filtered_data mode: pseudo-labels ride the batch, no live
        # teacher forward needed (dataset.py:117-175)
        if not hasattr(dataset, "records"):
            raise SystemExit("--filtered-db needs a record-backed dataset "
                             "(--data-dir), not --synthetic")
        from hand_integral_pose_estimation_tpu.data.freihand import (
            apply_filtered_labels,
        )
        apply_filtered_labels(dataset, args.filtered_db)
        print(f"filtered db: {len(dataset)} kept samples "
              f"({dataset.num_labelled} labelled)")

    teacher_apply = None
    if args.teacher_ckpt and args.filtered_db:
        # reference semantics (main/train.py:83-99): cached filtered
        # pseudo-labels win over the live teacher forward
        print("--filtered-db provides cached pseudo-labels; "
              "ignoring --teacher-ckpt for the teacher loss term")
    elif args.teacher_ckpt:
        from hand_integral_pose_estimation_tpu.training.teacher import (
            make_frozen_teacher,
        )
        teacher_apply = make_frozen_teacher(cfg, args.teacher_ckpt,
                                            args.teacher_epoch)
        print(f"frozen teacher loaded from {args.teacher_ckpt}")

    panet_apply = None
    if args.panet_ckpt:
        from hand_integral_pose_estimation_tpu.models.panet import (
            PANet,
            load_panet_params,
            panet_reconstruction_fn,
        )
        panet_params = load_panet_params(args.panet_ckpt)
        panet_apply = panet_reconstruction_fn(
            PANet(pts_num=cfg.model.num_joints), panet_params)
        print(f"PANet prior loaded from {args.panet_ckpt} "
              f"(lambda = {cfg.train.lam})")

    mesh, model_par, auto_mesh = None, 1, False
    if args.mesh == "auto":
        auto_mesh = True
    elif args.mesh not in ("none", "1"):
        # explicit layout: 'data=N,model=M', either axis alone (the other
        # is inferred from the visible device count), over a PREFIX of the
        # devices when N*M is smaller than the host
        from hand_integral_pose_estimation_tpu.cli.mesh_arg import (
            parse_explicit_mesh,
        )
        mesh, model_par = parse_explicit_mesh(args.mesh)

    trainer = Trainer(cfg=cfg, dataset=dataset, model_dir=args.model_dir,
                      log_dir=args.log_dir,
                      continue_train=args.continue_train, seed=args.seed,
                      teacher_apply=teacher_apply, panet_apply=panet_apply,
                      test_dataset=test_dataset,
                      imagenet_init=args.imagenet_init,
                      mesh=mesh, model_parallelism=model_par,
                      auto_mesh=auto_mesh,
                      yuv_transport=args.yuv_transport)
    trainer.fit(end_epoch=args.epochs,
                steps_per_epoch=args.steps_per_epoch)


if __name__ == "__main__":
    main()
