"""Dataset pixel-statistics pass (reference: main/find_mean_std.py:29-40) —
computes the per-channel mean/std that feed cfg.pixel_mean/pixel_std."""

from __future__ import annotations

import argparse


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--max-samples", type=int, default=5000)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import numpy as np

    from hand_integral_pose_estimation_tpu.config import Config
    from hand_integral_pose_estimation_tpu.data.freihand import (
        FreiHandDataset,
        SyntheticFreiHand,
    )

    cfg = Config()
    if args.synthetic or not args.data_dir:
        dataset = SyntheticFreiHand(n=min(args.max_samples, 256))
    else:
        dataset = FreiHandDataset(args.data_dir, "training", cfg)

    n = min(len(dataset), args.max_samples)
    s = np.zeros(3)
    s2 = np.zeros(3)
    count = 0
    for start in range(0, n, args.batch_size):
        idx = np.arange(start, min(start + args.batch_size, n))
        imgs = dataset.host_batch(idx)["image"].astype(np.float64) / 255.0
        s += imgs.sum(axis=(0, 1, 2))
        s2 += (imgs ** 2).sum(axis=(0, 1, 2))
        count += imgs.shape[0] * imgs.shape[1] * imgs.shape[2]
    mean = s / count
    std = np.sqrt(s2 / count - mean ** 2)
    print(f"pixel_mean = ({mean[0]:.4f}, {mean[1]:.4f}, {mean[2]:.4f})")
    print(f"pixel_std  = ({std[0]:.4f}, {std[1]:.4f}, {std[2]:.4f})")
    return mean, std


if __name__ == "__main__":
    main()
