"""PANet reconstruction test (reference: procrustes_encoding
test_scripts/PANet_test.sh + PANet_reconstruction.py:101-113): load trained
weights, reconstruct a point-cloud file, print MPJPE.

Accepts either an orbax checkpoint dir (from cli/train_panet.py) or the
reference's torch `model_best.pth` (converted on the fly).
"""

from __future__ import annotations

import argparse


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True,
                   help="orbax params dir or torch .pth checkpoint")
    p.add_argument("--pts-npy", required=True,
                   help="(N, 21, 3) point file, e.g. hand_test.npy")
    p.add_argument("--batch-size", type=int, default=500)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from hand_integral_pose_estimation_tpu.models.panet import (
        PANet,
        load_panet_params,
        panet_reconstruction_fn,
    )

    params = load_panet_params(args.ckpt)

    pts = np.load(args.pts_npy).astype(np.float32)
    pts = pts - pts.mean(1, keepdims=True)   # train.py:121 centring

    model = PANet(pts_num=pts.shape[1])
    fn = panet_reconstruction_fn(model, params)
    errs = []
    for start in range(0, len(pts), args.batch_size):
        chunk = jnp.asarray(pts[start:start + args.batch_size])
        recon = fn(chunk)
        errs.append(np.asarray(
            jnp.linalg.norm(recon - chunk, axis=-1).mean(-1)))
    mpjpe = float(np.concatenate(errs).mean())
    print(f"PANet reconstruction MPJPE over {len(pts)} samples: {mpjpe:.6f}")
    return mpjpe


if __name__ == "__main__":
    main()
