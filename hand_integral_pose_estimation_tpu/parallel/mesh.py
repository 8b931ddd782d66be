"""Device mesh + sharding helpers.

The reference's only parallelism is single-process multi-GPU data parallelism
via threaded module replication and torch.cuda.comm collectives
(common/nets/balanced_parallel.py:16-183). On TPU that entire machinery is a
sharding annotation: batches are sharded over a `data` mesh axis, params are
replicated (or sharded over `model` for the wide heatmap projection), and XLA
inserts the gradient psums over ICI. The custom autograd AllReduce/Reduce
Functions (balanced_parallel.py:16-55) have no equivalent here because JAX
collectives differentiate.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data_axis: str = "data", model_axis: str = "model",
              model_parallelism: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """(data, model) mesh over all (or the given) devices.

    `model_parallelism=1` reproduces the reference's pure-DP layout; larger
    values shard the head's 1176-channel heatmap projection.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_parallelism == 0, (n, model_parallelism)
    arr = np.array(devices).reshape(n // model_parallelism,
                                    model_parallelism)
    return Mesh(arr, (data_axis, model_axis))


def make_multihost_mesh(data_axis: str = "data", model_axis: str = "model",
                        model_parallelism: int = 1) -> Mesh:
    """Process-count-aware (data, model) mesh for multi-host (DCN) runs.

    Layout rule (scaling-book recipe): the `model` axis must ride ICI, so
    model groups are confined to one process's local devices; the `data`
    axis spans processes, so gradient psums cross DCN only on the data axis
    — exactly the layout pure-DP wants. Replaces the reference's
    single-process balanced_parallel.py scope with a layout that scales to
    multi-host without code changes.

    With one process this reduces to `make_mesh` over all devices.
    """
    n_proc = jax.process_count()
    local = jax.local_device_count()
    assert local % model_parallelism == 0, (local, model_parallelism)
    # order global devices process-major so each mesh row's model group is
    # intra-process (jax.devices() interleaving is not guaranteed)
    by_proc = [[] for _ in range(n_proc)]
    for d in jax.devices():
        by_proc[d.process_index].append(d)
    rows = []
    for devs in by_proc:
        assert len(devs) == local, (len(devs), local)
        rows.append(np.array(devs).reshape(local // model_parallelism,
                                           model_parallelism))
    arr = np.concatenate(rows, axis=0)     # (n_proc*local/mp, mp)
    return Mesh(arr, (data_axis, model_axis))


def process_batch_size(global_batch: int) -> int:
    """Per-host slice of a global batch (each host feeds only its shard)."""
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n


def shard_host_batch(mesh: Mesh, local_batch, data_axis: str = "data",
                     batch_axis: int = 0):
    """Per-host local batch pytree -> globally-sharded jax.Arrays.

    Each process passes ONLY its local shard (size
    `process_batch_size(global)`); `make_array_from_process_local_data`
    assembles the global array without any cross-host copies. On one process
    this equals `shard_batch`.

    `batch_axis=1` shards the SECOND axis — the Trainer's scan-chunked
    feed, where leaves are stacked (scan_steps, B, ...).
    """
    spec = P(*([None] * batch_axis), data_axis)
    s = NamedSharding(mesh, spec)

    def put(x):
        return jax.make_array_from_process_local_data(s, np.asarray(x))
    return jax.tree_util.tree_map(put, local_batch)


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Leading-axis batch sharding (leaves of a Batch pytree)."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, data_axis: str = "data"):
    """Device-put every leaf of a batch pytree with its batch dim sharded."""
    s = batch_sharding(mesh, data_axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def _leaf_spec(path, leaf, model_size: int, model_axis: str) -> P:
    """THE sharding policy, in one place: everything replicated except the
    final heatmap projection's tensors — kernel (1, 1, C_in, C_out) / bias
    (C_out,) — whose output channels (num_joints * depth = 1176) shard over
    `model`. Matching is by tree path ("final" module scope), so it applies
    equally to params and to optimizer moments (optax state mirrors the
    param tree)."""
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    if (model_size > 1 and "final" in names
            and getattr(leaf, "ndim", 0) >= 1
            and leaf.shape[-1] % model_size == 0):
        return P(*([None] * (leaf.ndim - 1) + [model_axis]))
    return P()


def place_state(mesh: Mesh, state, model_axis: str = "model"):
    """Device-put a whole TrainState onto the mesh per `_leaf_spec`.

    One explicit placement at init keeps every subsequent step resharding-
    free; without it each step would re-shard the moments from the default
    single-device placement.
    """
    model_size = mesh.shape[model_axis]

    def put(path, leaf):
        spec = _leaf_spec(path, leaf, model_size, model_axis)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, state)


def param_sharding_rules(mesh: Mesh, params,
                         model_axis: str = "model"):
    """Pytree of NamedShardings matching `params`, per `_leaf_spec`."""
    model_size = mesh.shape[model_axis]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _leaf_spec(path, leaf, model_size, model_axis)),
        params)
