"""FreiHAND-challenge prediction dump (reference: main/evaluate.py).

Sweeps the (label-free) evaluation split using detector crop boxes and dumps
pred.json ([xyz_list, verts_list]) for the challenge server, plus
evaluation_predictions.npy.
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
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hand_integral_pose_estimation_tpu.config import Config
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
    if args.synthetic or not args.data_dir:
        # synthetic stand-in (reuses its GT only to derive crop boxes)
        dataset = SyntheticFreiHand(n=args.synthetic_size)
    else:
        # label-free challenge split (FreiHand.py:286-341)
        dataset = FreiHandDataset(args.data_dir, "evaluation", cfg)

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

    tester = Tester(cfg=cfg, dataset=dataset, state=state)
    coords, batch = tester.run(batch_size=args.batch_size)
    preds = evaluate_challenge(
        coords, np.asarray(batch.bbox), np.asarray(batch.K),
        np.asarray(batch.ref_bone_len), result_dir=args.result_dir)
    print(f"dumped {preds.shape[0]} predictions to "
          f"{args.result_dir}/pred.json")


if __name__ == "__main__":
    main()
