"""Teacher-error / PANet-error / heatmap-entropy correlation analysis
(reference: main/generate_correlation_graph.py:96-160) — the statistical
justification for the variance/entropy pseudo-label filters.

Produces a per-sample CSV (teacher MPJPE, PANet reconstruction error, mean
heatmap entropy) and prints Pearson correlations; plots are optional
(matplotlib, if available).
"""

from __future__ import annotations

import argparse
import csv


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--model-dir", default="output/teacher_model")
    p.add_argument("--panet-ckpt", default=None,
                   help="torch PANet checkpoint to convert (optional)")
    p.add_argument("--out", default="output/correlation.csv")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--max-samples", type=int, default=256)
    p.add_argument("--plot", action="store_true")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hand_integral_pose_estimation_tpu import losses
    from hand_integral_pose_estimation_tpu.config import Config
    from hand_integral_pose_estimation_tpu.data import pipeline
    from hand_integral_pose_estimation_tpu.data.freihand import (
        FreiHandDataset,
        SyntheticFreiHand,
    )
    from hand_integral_pose_estimation_tpu.models import get_pose_net
    from hand_integral_pose_estimation_tpu.models.panet import (
        PANet,
        convert_torch_state_dict,
    )
    from hand_integral_pose_estimation_tpu.ops.integral import (
        heatmap_entropy,
        softmax_integral,
    )
    from hand_integral_pose_estimation_tpu.training import (
        create_train_state,
        load_checkpoint,
    )

    cfg = Config()
    if args.synthetic or not args.data_dir:
        dataset = SyntheticFreiHand(n=args.max_samples)
    else:
        dataset = FreiHandDataset(args.data_dir, "training", cfg)

    model = get_pose_net(cfg.model)
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, *cfg.model.input_shape, 3)), cfg.train)
    try:
        state, _ = load_checkpoint(args.model_dir, state)
    except FileNotFoundError:
        print("no teacher snapshot — fresh model (smoke mode)")

    panet = PANet(pts_num=cfg.panet.pts_num,
                  dict_sizes=cfg.panet.dict_sizes,
                  encode_with_relu=cfg.panet.encode_with_relu)
    if args.panet_ckpt and os.path.exists(args.panet_ckpt):
        import torch
        panet_params = convert_torch_state_dict(
            torch.load(args.panet_ckpt, map_location="cpu",
                       weights_only=True))
    else:
        panet_params = panet.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 21, 3)))["params"]

    J, D = cfg.model.num_joints, cfg.model.depth_dim

    @jax.jit
    def analyze(images, joint_cam, K, ref_len):
        batch = pipeline.make_eval_batch(images, joint_cam, K, None,
                                         ref_len, cfg.augment,
                                         cfg.model.input_shape)
        hm = model.apply({"params": state.params,
                          "batch_stats": state.batch_stats},
                         batch.image, train=False)
        coords = softmax_integral(hm, J, D)
        teacher_err = jnp.linalg.norm(coords - batch.label, axis=-1).mean(-1)
        entropy = heatmap_entropy(hm, J, D).mean(-1)
        pin = losses.prepare_panet_input(coords, batch.trans_inv,
                                         batch.tprime, batch.K)
        recon, _, _, _ = panet.apply({"params": panet_params}, pin)
        panet_err = jnp.linalg.norm(recon - pin, axis=-1).mean(-1)
        return teacher_err, panet_err, entropy

    rows = []
    n = min(len(dataset), args.max_samples)
    bs = args.batch_size
    for start in range(0, n - bs + 1, bs):
        host = dataset.host_batch(np.arange(start, start + bs))
        t, p, e = analyze(jnp.asarray(host["image"]),
                          jnp.asarray(host["joint_cam"]),
                          jnp.asarray(host["K"]),
                          jnp.asarray(host["ref_bone_len"]))
        rows.extend(zip(np.asarray(t), np.asarray(p), np.asarray(e)))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["teacher_mpjpe", "panet_error", "heatmap_entropy"])
        w.writerows(rows)

    arr = np.asarray(rows)
    if len(arr) > 2:
        c_tp = np.corrcoef(arr[:, 0], arr[:, 1])[0, 1]
        c_te = np.corrcoef(arr[:, 0], arr[:, 2])[0, 1]
        print(f"corr(teacher_err, panet_err) = {c_tp:.4f}")
        print(f"corr(teacher_err, entropy)   = {c_te:.4f}")
    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        axes[0].scatter(arr[:, 1], arr[:, 0], s=2)
        axes[0].set_xlabel("panet error"); axes[0].set_ylabel("teacher mpjpe")
        axes[1].scatter(arr[:, 2], arr[:, 0], s=2)
        axes[1].set_xlabel("entropy"); axes[1].set_ylabel("teacher mpjpe")
        fig.savefig(args.out.replace(".csv", ".png"), dpi=120)
    print(f"wrote {len(rows)} rows -> {args.out}")


if __name__ == "__main__":
    main()
