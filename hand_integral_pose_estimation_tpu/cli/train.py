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
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import dataclasses

    from hand_integral_pose_estimation_tpu.config import Config
    from hand_integral_pose_estimation_tpu.data.freihand import (
        FreiHandDataset,
        SyntheticFreiHand,
    )
    from hand_integral_pose_estimation_tpu.training import Trainer

    cfg = Config()
    if args.batch_size:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           batch_size=args.batch_size))

    if args.synthetic or not args.data_dir:
        dataset = SyntheticFreiHand(n=args.synthetic_size)
    else:
        dataset = FreiHandDataset(args.data_dir, "training", cfg)

    trainer = Trainer(cfg=cfg, dataset=dataset, model_dir=args.model_dir,
                      log_dir=args.log_dir,
                      continue_train=args.continue_train, seed=args.seed)
    trainer.fit(end_epoch=args.epochs,
                steps_per_epoch=args.steps_per_epoch)


if __name__ == "__main__":
    main()
