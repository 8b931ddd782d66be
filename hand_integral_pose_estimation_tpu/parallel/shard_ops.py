"""shard_map wrappers that keep the Pallas kernels PARTITIONED on a mesh.

A `pallas_call` is an opaque custom call to the SPMD partitioner: fed
mesh-sharded operands inside plain `jit`, XLA falls back to all-gathering
the inputs and running the kernel replicated on every device — correct,
but it wastes the whole mesh (verified on the virtual 8-device mesh: the
output comes back with a replicated sharding).  These wrappers restore the
per-shard execution the kernels deserve:

  * batch-parallel kernels (softmax integral, perspective warp) run on
    each device's `data` shard — embarrassingly parallel, no collectives;
  * the fused projection+integral head ALSO splits its J*D output
    channels over `model` when the joint count divides the model-axis
    size, so a model-sharded final projection (parallel/mesh.py:
    place_state) is consumed in place, with no weight gather.  The
    kernel's online softmax runs over one joint's (H, W, D) segment
    (ops/fused_head.py), so shards must not split a joint: when
    `J % model_size != 0` (e.g. J=21 on a model=2 axis) the weight is
    gathered once and the head runs data-parallel — documented fallback,
    not an error, because the XLA (unfused) path has no such constraint.

Autodiff: shard_map differentiates through; cotangents of weights that
are unmapped along `data` get the automatic psum over that axis, which is
exactly the DP gradient all-reduce (asserted against the unsharded grads
in tests/test_shard_ops.py).

Each wrapper is a no-op passthrough without a mesh, so call sites can be
unconditional.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

from hand_integral_pose_estimation_tpu.ops.fused_head import (
    head_projection_integral,
)
from hand_integral_pose_estimation_tpu.ops.integral import softmax_integral
from hand_integral_pose_estimation_tpu.ops.warp import warp_perspective_batch


def sharded_softmax_integral(heatmap_nhwc, num_joints: int, depth: int,
                             mesh: Optional[Mesh] = None,
                             impl: str = "auto", interpret: bool = False,
                             data_axis: str = "data"):
    """`softmax_integral` with the batch partitioned over `data`."""
    if mesh is None:
        return softmax_integral(heatmap_nhwc, num_joints, depth, impl=impl,
                                interpret=interpret)
    fn = partial(softmax_integral, num_joints=num_joints, depth=depth,
                 impl=impl, interpret=interpret)
    return jax.shard_map(fn, mesh=mesh, in_specs=P(data_axis),
                         out_specs=P(data_axis),
                         check_vma=False)(heatmap_nhwc)


def head_model_split(mesh: Optional[Mesh], num_joints: int,
                     model_axis: str = "model") -> bool:
    """True when the fused head will consume a model-sharded final
    projection IN PLACE (J divides the model-axis size); False means the
    data-parallel replicated-weight fallback runs. Exposed so runners
    (e.g. __graft_entry__.dryrun_multichip) can log which path executed."""
    return (mesh is not None and model_axis in mesh.axis_names
            and mesh.shape[model_axis] > 1
            and num_joints % mesh.shape[model_axis] == 0)


def sharded_head_projection_integral(feats, W, b, num_joints: int,
                                     depth: int,
                                     mesh: Optional[Mesh] = None,
                                     impl: str = "auto",
                                     interpret: bool = False,
                                     data_axis: str = "data",
                                     model_axis: str = "model"):
    """Fused projection+integral head partitioned over (data, model).

    feats (B, H, W, F) shard over `data`; W (F, J*D) / b (J*D,) shard
    their output channels over `model` when `J % model_size == 0` (each
    device decodes J/model joints for B/data images — no collectives in
    the forward); otherwise W/b are treated as replicated (one gather if
    they arrive sharded) and only the batch is partitioned.
    """
    if mesh is None:
        return head_projection_integral(feats, W, b, num_joints, depth,
                                        impl, interpret)
    msize = mesh.shape[model_axis]
    split_model = head_model_split(mesh, num_joints, model_axis)

    if split_model:
        def fn(f, w, bb):
            return head_projection_integral(
                f, w, bb, num_joints // msize, depth, impl, interpret)
        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(data_axis), P(None, model_axis), P(model_axis)),
            out_specs=P(data_axis, model_axis, None),
            check_vma=False)(feats, W, b)

    def fn(f, w, bb):
        return head_projection_integral(f, w, bb, num_joints, depth,
                                        impl, interpret)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(P(data_axis), P(), P()),
        out_specs=P(data_axis), check_vma=False)(feats, W, b)


def sharded_warp_perspective_batch(images, H_mats,
                                   out_hw: Tuple[int, int],
                                   mesh: Optional[Mesh] = None,
                                   inverse: bool = False,
                                   method: str = "auto",
                                   precision=None,
                                   data_axis: str = "data"):
    """`warp_perspective_batch` with images + homographies partitioned
    over `data` (the eval/serving crop path, data/pipeline.py:76)."""
    if mesh is None:
        return warp_perspective_batch(images, H_mats, out_hw,
                                      inverse=inverse, method=method,
                                      precision=precision)
    fn = partial(warp_perspective_batch, out_hw=out_hw, inverse=inverse,
                 method=method, precision=precision)
    return jax.shard_map(fn, mesh=mesh,
                         in_specs=(P(data_axis), P(data_axis)),
                         out_specs=P(data_axis),
                         check_vma=False)(images, H_mats)
