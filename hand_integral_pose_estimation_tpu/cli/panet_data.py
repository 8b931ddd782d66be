"""PANet training-data generation + splitting (reference:
procrustes_encoding/processing/PANet_data_generation.py:89-120,
processing/norm_lite.py, data_splitting.py:19-27).

Builds hand_train.npy / hand_test.npy of tprime-normalised camera-frame GT
joints (the same normalisation the crop pipeline applies, with theta = 0
keypoint-derived boxes), optionally splitting off the last fraction as test.
"""

from __future__ import annotations

import argparse


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--out-dir", default="output/panet_data")
    p.add_argument("--test-fraction", type=float, default=0.1,
                   help="fixed last-fraction test split (data_splitting.py)")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--max-samples", type=int, default=0,
                   help="0 = all")
    p.add_argument("--synthetic-size", type=int, default=512)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hand_integral_pose_estimation_tpu.config import Config
    from hand_integral_pose_estimation_tpu.data.freihand import (
        FreiHandDataset,
        SyntheticFreiHand,
    )
    from hand_integral_pose_estimation_tpu.geometry import (
        bbox as bbox_mod,
        camera,
    )

    cfg = Config()
    if args.synthetic or not args.data_dir:
        dataset = SyntheticFreiHand(n=args.synthetic_size)
    else:
        dataset = FreiHandDataset(args.data_dir, "training", cfg)

    @jax.jit
    def normalize(joint_cam, K, bbox_detector=None):
        """GT joints -> tprime-normalised camera frame (norm_lite.py:54-59 +
        generate_joint_cam_normalized: joint_cam * tprime / z_root)."""
        def one(jc, Ki):
            uv, z, _ = camera.project_points(jc, jnp.eye(3, dtype=Ki.dtype), Ki)
            bb = bbox_mod.bbox_from_keypoints(
                uv, jnp.ones(uv.shape[0]), pad_factor=cfg.augment.pad_factor)
            tprime = bbox_mod.tprime_from_bbox(
                bb, Ki, cfg.augment.scaling_constant)
            return jc * tprime / z[9]
        return jax.vmap(one)(joint_cam, K)

    n = len(dataset)
    if args.max_samples:
        n = min(n, args.max_samples)
    outs = []
    bs = args.batch_size
    for start in range(0, n, bs):
        idx = np.arange(start, min(start + bs, n))
        host = dataset.host_batch(idx)
        outs.append(np.asarray(normalize(jnp.asarray(host["joint_cam"]),
                                         jnp.asarray(host["K"]))))
    pts = np.concatenate(outs)

    os.makedirs(args.out_dir, exist_ok=True)
    n_test = int(len(pts) * args.test_fraction)
    train, test = pts[:len(pts) - n_test], pts[len(pts) - n_test:]
    np.save(os.path.join(args.out_dir, "hand_train.npy"), train)
    np.save(os.path.join(args.out_dir, "hand_test.npy"), test)
    print(f"wrote {len(train)} train / {len(test)} test -> {args.out_dir}")


if __name__ == "__main__":
    main()
