"""Test-split metric evaluation (reference: main/test.py).

Sweeps the test split with a trained snapshot, collects integral coords, and
runs the full protocol #1/#2 pipeline (PA-MPJPE / MPJPE) + artifact dumps.
"""

from __future__ import annotations

import argparse


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--model-dir", default="output/model_dump")
    p.add_argument("--result-dir", default="output/result")
    p.add_argument("--test-epoch", type=int, default=None,
                   help="snapshot epoch (default: latest)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--synthetic-size", type=int, default=64)
    p.add_argument("--torch-snapshot", default=None,
                   help="a trained reference ResPoseNet snapshot .pth "
                        "(main/model.py state_dict, DataParallel prefix "
                        "ok): converted via interop.convert_pose_snapshot "
                        "and evaluated directly — takes precedence over "
                        "--model-dir snapshots")
    p.add_argument("--mesh", default="auto",
                   help="device mesh for the sharded test sweep: 'auto' "
                        "(data-parallel over all usable devices — the "
                        "reference's test-time DataParallel + gather, "
                        "main/test.py:92), 'none', or 'data=N[,model=M]'")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from hand_integral_pose_estimation_tpu.config import Config
    from hand_integral_pose_estimation_tpu.data.freihand import (
        FreiHandDataset,
        SyntheticFreiHand,
    )
    from hand_integral_pose_estimation_tpu.evaluation import (
        evaluate_test_split,
    )
    from hand_integral_pose_estimation_tpu.models import get_pose_net
    from hand_integral_pose_estimation_tpu.training import (
        Tester,
        create_train_state,
        load_checkpoint,
    )

    cfg = Config()
    if args.synthetic or not args.data_dir:
        dataset = SyntheticFreiHand(n=args.synthetic_size)
    else:
        dataset = FreiHandDataset(args.data_dir, "testing", cfg)

    model = get_pose_net(cfg.model)
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, *cfg.model.input_shape, 3)), cfg.train)
    if args.torch_snapshot:
        import dataclasses

        from hand_integral_pose_estimation_tpu.interop import (
            convert_pose_snapshot,
            load_torch_state_dict,
        )
        variables = convert_pose_snapshot(
            load_torch_state_dict(args.torch_snapshot),
            cfg.model.resnet_type)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
        state = dataclasses.replace(state, params=variables["params"],
                                    batch_stats=variables["batch_stats"])
        print(f"converted reference snapshot {args.torch_snapshot}")
    else:
        try:
            state, epoch = load_checkpoint(args.model_dir, state,
                                           args.test_epoch)
            print(f"loaded snapshot_{epoch}")
        except FileNotFoundError:
            print("no snapshot found — evaluating a fresh model")

    from hand_integral_pose_estimation_tpu.cli.mesh_arg import (
        resolve_eval_mesh,
    )
    mesh = resolve_eval_mesh(args.mesh, args.batch_size)
    tester = Tester(cfg=cfg, dataset=dataset, state=state, mesh=mesh)
    coords, batch = tester.run(batch_size=args.batch_size)
    summary = evaluate_test_split(coords, batch, result_dir=args.result_dir)
    print(summary["p1_summary"])
    print(summary["p2_summary"])
    return summary


if __name__ == "__main__":
    main()
