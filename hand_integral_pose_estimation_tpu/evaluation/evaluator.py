"""Evaluation runners: test-split metrics and FreiHAND-challenge dumping.

Covers the reference's `FreiHand.evaluate` orchestration + artifact dumps
(FreiHand.py:670-835), `evaluate_evaluations` -> pred.json
(FreiHand.py:853-917), and the offline scorer flow (main/eval.py:167-219).
Metric math lives in evaluation/metrics.py as jitted batched ops; this module
only orchestrates and writes artifacts.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hand_integral_pose_estimation_tpu.evaluation import metrics
from hand_integral_pose_estimation_tpu.geometry import camera, labels as lbl


def evaluate_test_split(coords_label: np.ndarray, batch,
                        result_dir: Optional[str] = None,
                        patch_hw=(224, 224)) -> dict:
    """Full protocol #1/#2 evaluation of collected test-split predictions.

    Args:
        coords_label: (N, J, 3) integral outputs in label space.
        batch: merged Batch pytree (from training.Trainer/Tester.run) with
            trans_inv/tprime/K/R/joint_cam/ref_bone_len.
        result_dir: when set, writes pred/gt artifacts like the reference
            (ground_truth_test.npy / pred.npy / pred_procr.npy,
            FreiHand.py:800-803, and eval_result.txt, FreiHand.py:831-835).
    """
    res = jax.jit(metrics.evaluate_coords, static_argnums=(7, 8))(
        jnp.asarray(coords_label), jnp.asarray(batch.joint_cam),
        jnp.asarray(batch.trans_inv), jnp.asarray(batch.tprime),
        jnp.asarray(batch.K), jnp.asarray(batch.R),
        jnp.asarray(batch.ref_bone_len), patch_hw[1], patch_hw[0])

    p1 = float(res.pa_mpjpe)
    p2 = float(res.mpjpe)
    summary = {
        "pa_mpjpe": p1,
        "mpjpe": p2,
        "p1_summary": f"Protocol #1 error (PA MPJPE) >> {p1:.8f}",
        "p2_summary": f"Protocol #2 error (MPJPE) >> {p2:.8f}",
    }
    if result_dir:
        os.makedirs(result_dir, exist_ok=True)
        np.save(os.path.join(result_dir, "ground_truth_test.npy"),
                np.asarray(batch.joint_cam))
        np.save(os.path.join(result_dir, "pred.npy"),
                np.asarray(res.pred_cam))
        np.save(os.path.join(result_dir, "pred_procr.npy"),
                np.asarray(res.pred_cam_aligned))
        with open(os.path.join(result_dir, "eval_result.txt"), "w") as f:
            f.write(summary["p1_summary"] + "\n")
            f.write(summary["p2_summary"] + "\n")
    return summary


def evaluate_challenge(coords_label: np.ndarray, bbox: np.ndarray,
                       K: np.ndarray, ref_bone_len: np.ndarray,
                       result_dir: str = ".",
                       pred_name: str = "pred.json",
                       scaling_constant: float = 100.0,
                       patch_hw=(224, 224),
                       num_verts: int = 778) -> np.ndarray:
    """Challenge prediction dump (FreiHand.py:853-917 `evaluate_evaluations`):
    patch -> image -> camera back-projection using the bbox-derived tprime
    (no rotation at eval time), bone-(9,10) rescale to the provided scale,
    and a [xyz_list, verts_list] pred.json with zero vertices.
    """
    from hand_integral_pose_estimation_tpu.geometry import (
        bbox as bbox_mod, transforms,
    )

    coords_label = jnp.asarray(coords_label)
    bbox = jnp.asarray(bbox)
    K = jnp.asarray(K)

    trans_inv = transforms.trans_from_patch(
        bbox[:, 0], bbox[:, 1], bbox[:, 2], bbox[:, 3],
        patch_hw[1], patch_hw[0], scale=1.0, inv=True)
    tprime = bbox_mod.tprime_from_bbox(bbox, K, scaling_constant)
    cam = lbl.patch_label_to_camera(coords_label, trans_inv, tprime, K,
                                    R=None, patch_width=patch_hw[1],
                                    patch_height=patch_hw[0], derotate=False)
    cam = metrics.scale_by_ref_bone(cam, jnp.asarray(ref_bone_len))
    preds = np.asarray(cam)

    os.makedirs(result_dir, exist_ok=True)
    np.save(os.path.join(result_dir, "evaluation_predictions.npy"), preds)
    verts = [np.zeros((num_verts, 3)).tolist()] * preds.shape[0]
    with open(os.path.join(result_dir, pred_name), "w") as f:
        json.dump([[p.tolist() for p in preds], verts], f)
    return preds


def score_predictions(pred: np.ndarray, gt: np.ndarray,
                      output_dir: Optional[str] = None) -> dict:
    """Offline scorer (main/eval.py:167-219): unaligned + aligned EvalUtil
    measures over metric 3D keypoints; writes scores.txt when requested."""
    raw = jax.jit(metrics.pck_auc)(jnp.asarray(pred), jnp.asarray(gt))
    al = jax.jit(metrics.aligned_pck_auc)(jnp.asarray(pred), jnp.asarray(gt))
    out = {
        "xyz_mean3d_cm": float(raw.epe_mean) * 100.0,
        "xyz_auc3d": float(raw.auc),
        "xyz_al_mean3d_cm": float(al.epe_mean) * 100.0,
        "xyz_al_auc3d": float(al.auc),
    }
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "scores.txt"), "w") as f:
            f.write(f"xyz_mean3d: {out['xyz_mean3d_cm']:f}\n")
            f.write(f"xyz_auc3d: {out['xyz_auc3d']:f}\n")
            f.write(f"xyz_al_mean3d: {out['xyz_al_mean3d_cm']:f}\n")
            f.write(f"xyz_al_auc3d: {out['xyz_al_auc3d']:f}\n")
    return out
