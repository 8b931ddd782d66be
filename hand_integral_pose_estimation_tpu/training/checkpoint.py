"""Checkpoint / resume.

Same artifact contract as the reference (common/base.py:57-71): one snapshot
per epoch holding {epoch, network, optimizer (schedule state rides in the
step count)}, resume from the highest-numbered snapshot. Storage is orbax
(TPU-native, async-capable) instead of torch pickles.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import orbax.checkpoint as ocp

from hand_integral_pose_estimation_tpu.training.state import TrainState

_SNAP_RE = re.compile(r"snapshot_(\d+)$")


def save_checkpoint(ckpt_dir: str, state: TrainState, epoch: int) -> str:
    """Write `snapshot_{epoch}` (base.py:57-60 contract)."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"snapshot_{epoch}")
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, {"epoch": epoch, "state": state}, force=True)
    return path


def latest_epoch(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    epochs = [int(m.group(1)) for name in os.listdir(ckpt_dir)
              if (m := _SNAP_RE.match(name))]
    return max(epochs) if epochs else None


def save_pytree(path: str, tree) -> str:
    """Checkpoint an arbitrary pytree (e.g. DetectorTrainState / PANet
    params) at `path`."""
    ocp.PyTreeCheckpointer().save(os.path.abspath(path), tree, force=True)
    return path


def load_pytree(path: str, template):
    """Restore a pytree saved by `save_pytree`; `template` fixes the
    structure/dtypes."""
    return ocp.PyTreeCheckpointer().restore(os.path.abspath(path),
                                            item=template)


def load_checkpoint(ckpt_dir: str, state_like: TrainState,
                    epoch: Optional[int] = None
                    ) -> tuple[TrainState, int]:
    """Restore; `epoch=None` resumes from the highest snapshot
    (base.py:62-71)."""
    if epoch is None:
        epoch = latest_epoch(ckpt_dir)
        if epoch is None:
            raise FileNotFoundError(f"no snapshots under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"snapshot_{epoch}")
    ckptr = ocp.PyTreeCheckpointer()
    template = {"epoch": 0, "state": state_like}
    # restore onto the TEMPLATE's shardings, not the shardings recorded in
    # the snapshot: a snapshot written under one mesh shape must restore
    # onto any other (single device, pure-DP, model-sharded — tested in
    # tests/test_training.py::TestCheckpointCrossTopology); orbax's
    # sharding-from-file fallback is documented unsafe cross-topology
    restore_args = ocp.checkpoint_utils.construct_restore_args(template)
    restored = ckptr.restore(path, item=template, restore_args=restore_args)
    state = restored["state"]
    if not isinstance(state, TrainState):
        state = TrainState(**state)
    return state, int(restored["epoch"])
