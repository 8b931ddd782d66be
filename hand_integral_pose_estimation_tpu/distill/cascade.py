"""Exact early-reject cascade for the rotation-variance teacher filter.

The reference filter (main/generate_filtered_teacher_labels.py:467-495) runs
the frozen teacher under all T=21 rotations for EVERY unlabelled sample and
keeps the sample iff the total prediction variance over rotations is below
the threshold. Most of that compute is wasted on samples the filter
rejects: a small rotation subset already proves their variance is too high.

The cascade exploits a subset variance bound that makes the early reject
EXACT (no approximation of the keep set):

    For any subset S (|S| = n) of the T per-rotation predictions x_t,
        T * Var_T  =  sum_T ||x_t - mu_T||^2
                   >= sum_S ||x_t - mu_T||^2          (dropping terms)
                   >= sum_S ||x_t - mu_S||^2          (mu_S minimises SS_S)
                   =  n * Var_S
    so  Var_T >= (n/T) * Var_S.

    The bound holds per (joint, dim) and therefore for the summed total
    variance (sums of squares are additive across terms).

Pass 1 runs `pass1_rotations` evenly spaced angles (endpoints included —
the extreme rotations carry the most inconsistency signal). Any unlabelled
sample whose lower bound (n/T)*Var_S already exceeds the threshold CANNOT
pass the full filter and is rejected without computing the other T-n
rotations. Survivors get the remaining rotations in pass 2; their exact
T-rotation variance and pseudo-label mean are computed in float64 on host
from the union of both passes (every per-rotation prediction is produced by
the same jitted sweep the single-pass filter uses, with the factored base
crop sized for the FULL sweep in both passes, so per-rotation values match
the single-pass values).

Cost per unlabelled sample: n/T + f * (T-n)/T of the single-pass sweep,
where f is the pass-1 survival rate — e.g. n=5, T=21: 0.24 + 0.76*f
(2.5x at f=0.25, 1.6x at f=0.5). Labelled rows cost n/T (the reference
skips their rotation sweep entirely, :455-465; the single-pass batched
filter spends the full T on them).

A `safety` margin keeps the reject test conservative against float noise:
reject only when the bound exceeds threshold * (1 + safety). Samples inside
the margin simply take the slow path and are decided exactly in pass 2.
Keep-set equality vs the single-pass filter is tested
(tests/test_distill.py::TestCascade).
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np

from hand_integral_pose_estimation_tpu.config import AugmentConfig
from hand_integral_pose_estimation_tpu.distill.teacher_labels import (
    camera_project,
    rotation_sweep_camera,
)


def pass1_rotation_indices(num_rotations: int, num_pass1: int) -> np.ndarray:
    """Evenly spaced rotation indices including both endpoints."""
    if not 1 <= num_pass1 <= num_rotations:
        raise ValueError(
            f"pass1_rotations must be in [1, {num_rotations}], "
            f"got {num_pass1}")
    idx = np.round(np.linspace(0, num_rotations - 1, num_pass1))
    return np.unique(idx.astype(np.int64))


class CascadeRunner:
    """Host orchestrator of the two-pass filter over a stream of batches.

    Feed fixed-shape host batches with `add_batch` (row indices say where
    each record lands in the output db); call `finalize(n)` for the
    assembled arrays. Pass-1 runs immediately per batch; pass-2 survivors
    are queued and flushed in fixed-size batches (fixed device shapes).

    With `mesh`, both passes' rotation sweeps run sharded over the mesh's
    `data` axis (rotation_sweep_camera's shard_map path); the host-side
    bound test, queueing and f64 combine are unchanged. Every add_batch
    batch and `pass2_batch` must divide by the data-axis size.
    """

    def __init__(
        self,
        teacher_apply: Callable,
        acfg: AugmentConfig = AugmentConfig(),
        *,
        num_rotations: int = 21,
        rotation_range: float = 0.52,
        variance_threshold: float = 1e-4,
        patch_hw=(224, 224),
        rotation_mode: str = "factored",
        pass1_rotations: int = 5,
        pass2_batch: int = 8,
        safety: float = 1e-3,
        mesh=None,
        data_axis: str = "data",
    ):
        self.num_rotations = num_rotations
        self.variance_threshold = variance_threshold
        self.safety = safety
        self.pass2_batch = pass2_batch
        if mesh is not None and pass2_batch % mesh.shape[data_axis]:
            raise ValueError(
                f"pass2_batch {pass2_batch} must divide by the mesh "
                f"{data_axis!r}-axis size {mesh.shape[data_axis]}")

        thetas = np.linspace(-rotation_range, rotation_range, num_rotations)
        self.idx1 = pass1_rotation_indices(num_rotations, pass1_rotations)
        self.idx2 = np.setdiff1d(np.arange(num_rotations), self.idx1)
        self.n1 = len(self.idx1)
        th1, th2 = thetas[self.idx1], thetas[self.idx2]

        def _pass1(images, K, bbox, joint_cam):
            cam1, tprime = rotation_sweep_camera(
                teacher_apply, images, K, bbox, acfg, th1, rotation_range,
                patch_hw, rotation_mode, mesh=mesh, data_axis=data_axis)
            # labelled rows: GT normalisation at theta = 0 (:455-465)
            _, z, _ = jax.vmap(camera_project)(joint_cam, K)
            gt_norm = joint_cam * (tprime / z[..., 9])[:, None, None]
            return cam1, tprime, gt_norm

        def _pass2(images, K, bbox):
            cam2, _ = rotation_sweep_camera(
                teacher_apply, images, K, bbox, acfg, th2, rotation_range,
                patch_hw, rotation_mode, mesh=mesh, data_axis=data_axis)
            return cam2

        self._pass1 = jax.jit(_pass1)
        self._pass2 = jax.jit(_pass2) if len(th2) else None

        self.reset()

    def reset(self) -> None:
        """Clear accumulated rows/queue/stats, keeping the compiled passes
        (a fresh CascadeRunner would retrace + recompile both sweeps —
        repeat sweeps, e.g. warm-timed studies, reuse one runner)."""
        self._rows: dict[int, dict] = {}
        self._queue: list[dict] = []
        self.stats = {"total": 0, "labelled": 0, "early_rejected": 0,
                      "pass2": 0, "kept": 0}

    # -- pass 1 -----------------------------------------------------------
    def add_batch(self, images, K, bbox, labelled, joint_cam, rows) -> None:
        """One fixed-shape host batch; `rows` gives each record's output
        index (negative = padding row, discarded)."""
        cam1, tprime, gt_norm = self._pass1(
            np.asarray(images), np.asarray(K), np.asarray(bbox),
            np.asarray(joint_cam))
        cam1 = np.asarray(cam1, np.float64)
        tprime = np.asarray(tprime, np.float64)
        gt_norm = np.asarray(gt_norm, np.float64)
        labelled = np.asarray(labelled, bool)

        # lower bound on the full-sweep variance (see module docstring)
        var1 = np.var(cam1, axis=1).sum(axis=(-2, -1))
        bound = var1 * (self.n1 / self.num_rotations)
        cutoff = self.variance_threshold * (1.0 + self.safety)

        for b, row in enumerate(np.asarray(rows, np.int64)):
            if row < 0:
                continue
            self.stats["total"] += 1
            if labelled[b]:
                self.stats["labelled"] += 1
                self.stats["kept"] += 1
                self._rows[int(row)] = dict(
                    joint_cam_normalized=gt_norm[b], tprime=tprime[b],
                    variance=0.0, keep=True, labelled=True,
                    early_rejected=False, pass1_bound=0.0)
            elif bound[b] > cutoff or self._pass2 is None:
                # pass2-less cascade (pass1_rotations == num_rotations):
                # bound == exact variance, so this branch decides exactly
                keep = (self._pass2 is None
                        and var1[b] < self.variance_threshold)
                self.stats["early_rejected"] += not keep
                self.stats["kept"] += keep
                self._rows[int(row)] = dict(
                    joint_cam_normalized=cam1[b].mean(axis=0),
                    tprime=tprime[b],
                    variance=var1[b] if self._pass2 is None else bound[b],
                    keep=keep, labelled=False,
                    early_rejected=self._pass2 is not None,
                    pass1_bound=bound[b])
            else:
                self._queue.append(dict(
                    row=int(row), image=np.asarray(images)[b],
                    K=np.asarray(K)[b], bbox=np.asarray(bbox)[b],
                    cam1=cam1[b], tprime=tprime[b], pass1_bound=bound[b]))
                while len(self._queue) >= self.pass2_batch:
                    self._flush(self.pass2_batch)

    # -- pass 2 -----------------------------------------------------------
    def _flush(self, n: int) -> None:
        batch, self._queue = self._queue[:n], self._queue[n:]
        pad = self.pass2_batch - len(batch)
        stacked = {k: np.stack([q[k] for q in batch] + [batch[-1][k]] * pad)
                   for k in ("image", "K", "bbox")}
        cam2 = np.asarray(self._pass2(
            stacked["image"], stacked["K"], stacked["bbox"]), np.float64)
        for b, q in enumerate(batch):
            cam = np.empty((self.num_rotations,) + q["cam1"].shape[1:])
            cam[self.idx1] = q["cam1"]
            cam[self.idx2] = cam2[b]
            variance = np.var(cam, axis=0).sum()
            keep = bool(variance < self.variance_threshold)
            self.stats["pass2"] += 1
            self.stats["kept"] += keep
            self._rows[q["row"]] = dict(
                joint_cam_normalized=cam.mean(axis=0), tprime=q["tprime"],
                variance=variance, keep=keep, labelled=False,
                early_rejected=False, pass1_bound=q["pass1_bound"])

    def finalize(self, n: int) -> dict:
        """Flush the queue and assemble length-`n` output arrays (the npz
        schema of cli/generate_teacher_labels plus `early_rejected`)."""
        while self._queue:
            self._flush(self.pass2_batch)
        missing = set(range(n)) - set(self._rows)
        if missing:
            raise ValueError(f"rows never fed to add_batch: {sorted(missing)[:8]}")
        rows = [self._rows[i] for i in range(n)]
        return {
            "joint_cam_normalized": np.stack(
                [r["joint_cam_normalized"] for r in rows]).astype(np.float32),
            "tprime": np.asarray([r["tprime"] for r in rows], np.float32),
            "variance": np.asarray([r["variance"] for r in rows], np.float32),
            "keep": np.asarray([r["keep"] for r in rows], bool),
            "labelled": np.asarray([r["labelled"] for r in rows], bool),
            "early_rejected": np.asarray(
                [r["early_rejected"] for r in rows], bool),
            # (n/T)-scaled pass-1 lower bound on the full variance (0 for
            # labelled rows) — lets studies read pass-1 survival at ANY
            # threshold t (bound <= t*(1+safety)) without a re-sweep
            "pass1_bound": np.asarray(
                [r["pass1_bound"] for r in rows], np.float32),
        }
