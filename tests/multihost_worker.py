"""One OS process of a REAL 2-process `jax.distributed` training run.

tests/test_multihost.py launches two of these (CPU backend, 4 virtual
devices each -> an 8-device global mesh spanning 2 processes, Gloo
collectives) and asserts the multihost claims the in-process suite cannot:
per-process host sampling streams feed DISTINCT local slices, and the
global sharded program's updates equal a single-process run over the same
union batch. This is the capability that exceeds the reference's
single-process DataParallel ceiling (common/nets/balanced_parallel.py:58-183
tops out at one host's GPUs).

Run:  python tests/multihost_worker.py <port> <process_id> <out_dir>
Writes <out_dir>/proc<pid>.npz with the sampled record indices, per-step
losses, and the final (replicated) params flattened by path.
"""

import json
import os
import re
import sys

# the repo root (pytest puts it on sys.path for in-process tests; this
# worker is a bare subprocess)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    port, pid, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    # REPLACE any inherited virtual-device count (the pytest parent runs 8):
    # each worker owns 4, so the 2-process global mesh is the same 8 devices
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   os.environ.get("XLA_FLAGS", ""))
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)

    import numpy as np

    from hand_integral_pose_estimation_tpu.config import (
        Config, ModelConfig, TrainConfig,
    )
    from hand_integral_pose_estimation_tpu.data.freihand import (
        SyntheticFreiHand,
    )
    from hand_integral_pose_estimation_tpu.training import Trainer

    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 8, jax.device_count()

    cfg = Config(
        model=ModelConfig(resnet_type=18, input_shape=(32, 32),
                          output_shape=(8, 8), depth_dim=8,
                          compute_dtype="float32"),
        train=TrainConfig(batch_size=8, lr=1e-3),
    )
    ds = SyntheticFreiHand(n=16, image_hw=(32, 32), seed=3)
    t = Trainer(cfg=cfg, dataset=ds,
                model_dir=os.path.join(out_dir, f"model_{pid}"),
                integral_impl="xla", auto_mesh=True, seed=0)
    assert t.mesh is not None, "auto mesh must engage across processes"
    assert t.mesh.shape["data"] == 8, dict(
        zip(t.mesh.axis_names, t.mesh.devices.shape))
    # each host feeds only its local slice of the global batch
    assert t._local_batch == 4, t._local_batch
    # mesh rows are process-major (model groups intra-process): this makes
    # the single-process comparison's union batch [proc0 slice; proc1 slice]
    row_procs = [d.process_index for d in t.mesh.devices.reshape(-1)]
    assert row_procs == sorted(row_procs), row_procs

    # replay epoch 0's host sampling stream to record which records this
    # process draws (run_epoch folds process_index into the seed)
    rng = np.random.RandomState(
        t.seed * 100003 + 0 + 1000003 * jax.process_index())
    sampled = [np.asarray(ds.sample_indices(rng, t._local_batch))
               for _ in range(2)]

    losses = []
    m = t.run_epoch(0, num_steps=2, log_every=100)
    losses.append(m["loss"])

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            t.state.params)[0]:
        key = "/".join(getattr(k, "key", str(k)) for k in path)
        flat["p//" + key] = np.asarray(jax.device_get(leaf))
    np.savez(os.path.join(out_dir, f"proc{pid}.npz"),
             sampled=np.stack(sampled),
             losses=np.asarray(losses, np.float64), **flat)
    with open(os.path.join(out_dir, f"proc{pid}.ok"), "w") as f:
        json.dump({"pid": pid, "loss": losses[-1]}, f)
    print(f"MULTIHOST_WORKER_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
