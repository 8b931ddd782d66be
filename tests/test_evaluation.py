"""Evaluation stack: the key property is that a PERFECT prediction (the GT
label itself) scores ~0 on both protocols — this closes the loop through
back-projection, bone rescale and Procrustes exactly as the reference's
round-trip assertions do at eval time (FreiHand.py:716)."""

import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hand_integral_pose_estimation_tpu.data import pipeline
from hand_integral_pose_estimation_tpu.evaluation import (
    evaluate_challenge,
    evaluate_coords,
    evaluate_test_split,
    pck_auc,
    aligned_pck_auc,
    score_predictions,
)


def _make_batch(rng, B=4):
    K = np.array([[531.9, 0.0, 112.0], [0.0, 532.2, 112.0], [0.0, 0.0, 1.0]])
    joints = (np.array([0.0, 0.0, 0.45])
              + rng.uniform(-0.035, 0.035, (B, 21, 3)))
    ref_len = np.linalg.norm(joints[:, 9] - joints[:, 10], axis=-1)
    imgs = rng.randint(0, 255, (B, 224, 224, 3)).astype(np.uint8)
    return pipeline.make_eval_batch(
        jnp.asarray(imgs), jnp.asarray(joints),
        jnp.broadcast_to(jnp.asarray(K), (B, 3, 3)), None,
        jnp.asarray(ref_len))


class TestEvaluateCoords:
    def test_perfect_prediction_scores_zero(self, rng):
        batch = _make_batch(rng)
        res = evaluate_coords(batch.label, batch.joint_cam, batch.trans_inv,
                              batch.tprime, batch.K, batch.R,
                              batch.ref_bone_len)
        assert float(res.pa_mpjpe) < 1e-8
        assert float(res.mpjpe) < 1e-8

    def test_noisy_prediction_ordering(self, rng):
        batch = _make_batch(rng)
        noise = jnp.asarray(rng.randn(*batch.label.shape) * 0.01)
        res = evaluate_coords(batch.label + noise, batch.joint_cam,
                              batch.trans_inv, batch.tprime, batch.K,
                              batch.R, batch.ref_bone_len)
        # alignment can only reduce the error
        assert float(res.pa_mpjpe) <= float(res.mpjpe) + 1e-12
        assert float(res.mpjpe) > 0

    def test_global_rotation_removed_by_alignment(self, rng):
        """A rigidly rotated prediction has large MPJPE but ~zero PA-MPJPE."""
        from hand_integral_pose_estimation_tpu import geometry as geo
        batch = _make_batch(rng, B=2)
        res0 = evaluate_coords(batch.label, batch.joint_cam, batch.trans_inv,
                               batch.tprime, batch.K, batch.R,
                               batch.ref_bone_len)
        # rotate the GT joints fed to the metric (prediction stays put)
        Rz = np.asarray(geo.rotation_z(jnp.asarray(0.4)))
        gt_rot = batch.joint_cam @ Rz.T
        res = evaluate_coords(batch.label, jnp.asarray(gt_rot),
                              batch.trans_inv, batch.tprime, batch.K,
                              batch.R, batch.ref_bone_len)
        assert float(res.pa_mpjpe) < 1e-6
        assert float(res.mpjpe) > float(res0.mpjpe) + 1e-3

    def test_evaluate_test_split_writes_artifacts(self, rng):
        batch = _make_batch(rng)
        d = tempfile.mkdtemp()
        out = evaluate_test_split(np.asarray(batch.label), batch,
                                  result_dir=d)
        assert out["pa_mpjpe"] < 1e-6
        for name in ("ground_truth_test.npy", "pred.npy", "pred_procr.npy",
                     "eval_result.txt"):
            assert os.path.exists(os.path.join(d, name)), name


class TestPckAuc:
    def test_perfect_gives_full_auc(self, rng):
        gt = jnp.asarray(rng.randn(8, 21, 3) * 0.01)
        res = pck_auc(gt, gt)
        np.testing.assert_allclose(res.auc, 1.0, atol=1e-6)
        np.testing.assert_allclose(res.epe_mean, 0.0, atol=1e-9)

    def test_known_error_pck(self):
        gt = jnp.zeros((4, 21, 3))
        pred = gt.at[..., 0].add(0.02)  # 2cm error everywhere
        res = pck_auc(pred, gt, val_min=0.0, val_max=0.05, steps=100)
        np.testing.assert_allclose(res.epe_mean, 0.02, atol=1e-9)
        np.testing.assert_allclose(res.epe_median, 0.02, atol=1e-9)
        # pck = 0 below 2cm, 1 above -> auc = fraction of range above 0.02
        np.testing.assert_allclose(res.auc, 1 - 0.02 / 0.05, atol=0.02)

    def test_visibility_mask_excludes_joints(self):
        gt = jnp.zeros((4, 3, 3))
        pred = gt.at[:, 0, 0].add(10.0)  # huge error on joint 0 only
        vis = jnp.asarray(np.array([[0.0, 1.0, 1.0]] * 4))
        res = pck_auc(pred, gt, vis=vis)
        np.testing.assert_allclose(res.epe_mean, 0.0, atol=1e-9)

    def test_median_against_numpy(self, rng):
        d_gt = rng.randn(7, 5, 3)
        d_pred = d_gt + rng.randn(7, 5, 3) * 0.1
        res = pck_auc(jnp.asarray(d_pred), jnp.asarray(d_gt))
        d = np.linalg.norm(d_gt - d_pred, axis=-1)
        want = np.median(d, axis=0).mean()
        np.testing.assert_allclose(res.epe_median, want, atol=1e-9)

    def test_aligned_track_beats_raw(self, rng):
        from hand_integral_pose_estimation_tpu import geometry as geo
        gt = jnp.asarray(rng.randn(6, 21, 3) * 0.02)
        Rz = geo.rotation_z(jnp.asarray(0.3))
        pred = gt @ Rz.T * 1.2 + 0.01
        raw = pck_auc(pred, gt)
        al = aligned_pck_auc(pred, gt)
        assert float(al.epe_mean) < float(raw.epe_mean)
        np.testing.assert_allclose(al.epe_mean, 0.0, atol=1e-6)


class TestChallengeDump:
    def test_pred_json_structure(self, rng):
        batch = _make_batch(rng, B=3)
        d = tempfile.mkdtemp()
        preds = evaluate_challenge(np.asarray(batch.label),
                                   np.asarray(batch.bbox),
                                   np.asarray(batch.K),
                                   np.asarray(batch.ref_bone_len),
                                   result_dir=d)
        with open(os.path.join(d, "pred.json")) as f:
            xyz_list, verts_list = json.load(f)
        assert len(xyz_list) == 3 and len(verts_list) == 3
        assert np.asarray(xyz_list[0]).shape == (21, 3)
        assert np.asarray(verts_list[0]).shape == (778, 3)
        # eval batch uses R = I, so the challenge back-projection (no
        # derotation) must recover the GT joints after bone rescale
        np.testing.assert_allclose(preds, np.asarray(batch.joint_cam),
                                   rtol=1e-5, atol=1e-7)

    def test_score_predictions(self, rng):
        gt = rng.randn(5, 21, 3) * 0.02
        out = score_predictions(gt, gt, output_dir=tempfile.mkdtemp())
        np.testing.assert_allclose(out["xyz_auc3d"], 1.0, atol=1e-6)
        # SVD alignment leaves ~1e-9 residuals, emptying the threshold-0 PCK
        # bin: auc = 1 - 1/(2*(steps-1))
        np.testing.assert_allclose(out["xyz_al_auc3d"], 1.0, atol=0.011)
        assert out["xyz_al_mean3d_cm"] < 1e-5


class TestAbsoluteDepth:
    def test_recovers_true_depth(self, rng):
        """Forward-project joints with known root depth, strip the absolute
        depth, and solve it back (FreiHand.py:86-139 contract)."""
        from hand_integral_pose_estimation_tpu.evaluation.metrics import (
            estimate_absolute_depth,
        )
        from hand_integral_pose_estimation_tpu import geometry as geo
        K = jnp.asarray([[531.9, 0, 112.], [0, 532.2, 112.], [0, 0, 1.]])
        joints = jnp.asarray(np.array([0., 0., 0.45])
                             + rng.uniform(-0.03, 0.03, (21, 3)))
        uv, z_mm, _ = geo.project_points(joints, jnp.eye(3), K)
        z_root = z_mm[9]
        rel = jnp.stack([uv[:, 0], uv[:, 1], z_mm - z_root], -1)
        bone = float(jnp.linalg.norm((joints[9] - joints[10])) * 1000)
        depth, was_complex = estimate_absolute_depth(bone, K, rel)
        assert not bool(was_complex)
        np.testing.assert_allclose(float(depth), float(z_root), rtol=1e-4)


REF_PREDS = "/root/reference/main/evaluation_predictions.npy"


@pytest.mark.skipif(not os.path.exists(REF_PREDS),
                    reason="reference artifacts not available")
class TestReferenceArtifactInterop:
    """Drop-in compatibility with the reference's own prediction dumps: a
    reference user can bring `main/evaluation_predictions.npy` straight to
    our scorer (main/eval.py contract)."""

    def test_score_reference_predictions(self):
        from hand_integral_pose_estimation_tpu.cli.score import (
            load_predictions,
        )
        from hand_integral_pose_estimation_tpu.evaluation import (
            score_predictions,
        )
        preds = load_predictions(REF_PREDS)
        assert preds.shape == (3960, 21, 3)
        # score against a 5 mm-perturbed copy: EPE must report the injected
        # noise level in the scorer's cm units on real-distribution data
        rng = np.random.RandomState(0)
        noise = rng.randn(*preds.shape)
        noise *= 0.005 / np.linalg.norm(noise, axis=-1, keepdims=True)
        out = score_predictions(preds + noise, preds)
        assert abs(out["xyz_mean3d_cm"] - 0.5) < 0.01
        assert out["xyz_auc3d"] > 0.9
        # self-score is exact
        perfect = score_predictions(preds, preds)
        assert perfect["xyz_mean3d_cm"] < 1e-6
        assert perfect["xyz_auc3d"] > 0.999


class TestCameraDiagnostic:
    def test_zero_for_perfect_prediction(self, rng):
        from hand_integral_pose_estimation_tpu import losses
        batch = _make_batch(rng, B=2)
        loss, consistency = losses.camera_space_diagnostic(
            batch.label, batch.label, batch.joint_cam_normalized,
            batch.trans_inv, batch.tprime, batch.K, batch.R)
        assert float(loss) < 1e-10
        assert float(consistency) < 1e-6  # the loss.py:259-262 assert
