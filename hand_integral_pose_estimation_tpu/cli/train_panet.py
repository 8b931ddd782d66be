"""PANet (NRSfM) training entry point (reference: procrustes_encoding/
train.py + test_scripts/train.sh hyperparameters).

    python -m hand_integral_pose_estimation_tpu.cli.train_panet \
        --train-npy hand_train.npy --test-npy hand_test.npy
"""

from __future__ import annotations

import argparse


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train-npy", default=None)
    p.add_argument("--test-npy", default=None)
    p.add_argument("--steps", type=int, default=500000)
    p.add_argument("--batch-size", type=int, default=500)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--sparsity-weight", type=float, default=1e-4)
    p.add_argument("--augment-rotation", action="store_true")
    p.add_argument("--encode-with-relu", type=int, default=1,
                   help="1 = relu threshold, 0 = block soft threshold "
                        "(nrsfm_modules.py:92-95)")
    p.add_argument("--composite", type=int, default=0, metavar="COMP_NUM",
                   help="after the base run, boost COMP_NUM-1 extra "
                        "components on worst-decile samples "
                        "(train_kernel.py:440-488)")
    p.add_argument("--out", default="output/panet")
    p.add_argument("--synthetic", action="store_true")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import os

    import numpy as np
    import orbax.checkpoint as ocp

    from hand_integral_pose_estimation_tpu.config import PANetConfig
    from hand_integral_pose_estimation_tpu.models.panet import PANet
    from hand_integral_pose_estimation_tpu.training.panet_trainer import (
        train_composite_panet,
        train_panet,
    )

    pcfg = PANetConfig(encode_with_relu=bool(args.encode_with_relu))
    if args.synthetic or not args.train_npy:
        rng = np.random.RandomState(0)
        pts = rng.randn(512, pcfg.pts_num, 3).astype(np.float32) * 0.05
        train_pts, test_pts = pts[:448], pts[448:]
    else:
        train_pts = np.load(args.train_npy)
        test_pts = np.load(args.test_npy)
    # centring as in train.py:121
    train_pts = train_pts - train_pts.mean(1, keepdims=True)
    test_pts = test_pts - test_pts.mean(1, keepdims=True)

    model = PANet(pts_num=pcfg.pts_num, dict_sizes=pcfg.dict_sizes,
                  encode_with_relu=pcfg.encode_with_relu)
    res = train_panet(model, train_pts, test_pts, num_steps=args.steps,
                      batch_size=args.batch_size, lr=args.lr,
                      sparsity_weight=args.sparsity_weight,
                      augment_rotation=args.augment_rotation)
    out = os.path.abspath(args.out)
    ocp.PyTreeCheckpointer().save(os.path.join(out, "model_best"),
                                  res.best_params, force=True)
    ocp.PyTreeCheckpointer().save(os.path.join(out, "model_cur"),
                                  res.params, force=True)
    print(f"best val loss {float(res.best_val_loss):.6f} -> {out}")

    if args.composite > 1:
        comp = train_composite_panet(
            model, res.best_params, train_pts, comp_num=args.composite,
            num_steps=args.steps, batch_size=args.batch_size, lr=args.lr,
            sparsity_weight=args.sparsity_weight,
            augment_rotation=args.augment_rotation)
        for i, p_i in enumerate(comp.components):
            ocp.PyTreeCheckpointer().save(
                os.path.join(out, f"model_comp_{i:02d}"), p_i, force=True)
        print(f"composite: mean per-sample loss "
              f"{float(comp.loss_before.mean()):.6f} -> "
              f"{float(comp.loss_after.mean()):.6f}")


if __name__ == "__main__":
    main()
