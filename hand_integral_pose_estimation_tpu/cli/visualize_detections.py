"""Detector visual smoke test (reference: main/eval_eval.py:232-257) —
renders detected hand boxes (and the padded crop box) over images.
"""

from __future__ import annotations

import argparse


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--out-dir", default="output/vis")
    p.add_argument("--num-images", type=int, default=4)
    p.add_argument("--detector-ckpt", default=None,
                   help="orbax detector params dir (fresh weights if absent)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import os

    import jax
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.patches as patches
    import matplotlib.pyplot as plt
    import numpy as np

    from hand_integral_pose_estimation_tpu.config import DetectorConfig
    from hand_integral_pose_estimation_tpu.data.freihand import (
        SyntheticFreiHand,
    )
    from hand_integral_pose_estimation_tpu.detect import (
        FasterRCNN,
        detect,
        detect_hand_crop_bbox,
    )

    cfg = DetectorConfig()
    model = FasterRCNN(cfg=cfg)
    ds = SyntheticFreiHand(n=args.num_images)
    host = ds.host_batch(np.arange(args.num_images))
    imgs = jnp.asarray(host["image"])

    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "sampling": jax.random.PRNGKey(1)},
        jnp.zeros((1, 600, 600, 3)))
    if args.detector_ckpt and os.path.exists(args.detector_ckpt):
        import orbax.checkpoint as ocp
        params = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(args.detector_ckpt))
        variables = {"params": params,
                     "batch_stats": variables.get("batch_stats", {})}

    det = detect(model, variables, imgs, cfg)
    crop = detect_hand_crop_bbox(model, variables, imgs, cfg)

    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(args.num_images):
        fig, ax = plt.subplots()
        ax.imshow(np.asarray(imgs[i]))
        for b, s, v in zip(np.asarray(det.boxes[i]),
                           np.asarray(det.scores[i]),
                           np.asarray(det.valid[i])):
            if not v:
                continue
            ax.add_patch(patches.Rectangle(
                (b[0], b[1]), b[2] - b[0], b[3] - b[1],
                fill=False, edgecolor="lime"))
            ax.text(b[0], b[1] - 2, f"{s:.2f}", color="lime", fontsize=7)
        cb = np.asarray(crop[i])
        ax.add_patch(patches.Rectangle(
            (cb[0] - cb[2] / 2, cb[1] - cb[3] / 2), cb[2], cb[3],
            fill=False, edgecolor="red", linestyle="--"))
        ax.axis("off")
        fig.savefig(os.path.join(args.out_dir, f"det_{i}.jpg"),
                    bbox_inches="tight", dpi=110)
        plt.close(fig)
    print(f"wrote {args.num_images} visualisations -> {args.out_dir}")


if __name__ == "__main__":
    main()
