"""Mesh/sharding layer (replaces balanced_parallel.py's DP machinery)."""

from hand_integral_pose_estimation_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    make_multihost_mesh,
    param_sharding_rules,
    place_state,
    process_batch_size,
    replicated,
    shard_batch,
    shard_host_batch,
)
from hand_integral_pose_estimation_tpu.parallel.shard_ops import (  # noqa: F401
    head_model_split,
    sharded_head_projection_integral,
    sharded_softmax_integral,
    sharded_warp_perspective_batch,
)
