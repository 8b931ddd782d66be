"""Geometry round-trip property tests.

These convert the reference's embedded runtime assertions
(data/FreiHand/FreiHand.py:544-619 `test_verify_identity`, run on every eval
sample) into a real test suite, at the same float64 tolerances.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hand_integral_pose_estimation_tpu import geometry as geo
from hand_integral_pose_estimation_tpu.config import FreiHandJoints


def _aug_rotation(seed=0):
    return np.asarray(
        geo.sample_rotation_matrix(jax.random.PRNGKey(seed), rot_prob=1.0)
    )


class TestCamera:
    def test_project_backproject_roundtrip(self, freihand_like_sample):
        K = jnp.asarray(freihand_like_sample["K"])
        xyz = jnp.asarray(freihand_like_sample["joint_cam"])
        uv, z_mm, xyz_rot = geo.project_points(xyz, jnp.eye(3), K)
        np.testing.assert_allclose(xyz_rot, xyz, atol=1e-12)
        pix = jnp.concatenate([uv, z_mm[:, None]], axis=-1)
        back = geo.pixel2cam(pix, K)
        np.testing.assert_allclose(back, xyz, atol=1e-10)

    def test_project_with_rotation(self, freihand_like_sample):
        K = jnp.asarray(freihand_like_sample["K"])
        xyz = jnp.asarray(freihand_like_sample["joint_cam"])
        R = jnp.asarray(_aug_rotation(1))
        uv, z_mm, xyz_rot = geo.project_points(xyz, R, K)
        np.testing.assert_allclose(xyz_rot, xyz @ R.T, atol=1e-12)
        # derotation recovers the original points (FreiHand.py:617)
        back = geo.pixel2cam(jnp.concatenate([uv, z_mm[:, None]], -1), K)
        np.testing.assert_allclose(back @ R, xyz, atol=1e-10)

    def test_cam2pixel_inverse_of_pixel2cam(self, freihand_like_sample):
        K = jnp.asarray(freihand_like_sample["K"])
        xyz = jnp.asarray(freihand_like_sample["joint_cam"])
        np.testing.assert_allclose(
            geo.pixel2cam(geo.cam2pixel(xyz, K), K), xyz, atol=1e-10
        )


class TestTransforms:
    def test_affine_matches_general_solver(self):
        # closed-form rect->rect transform == cv2-style 4-point solve
        src, dst = geo.patch_corner_points(112.3, 97.1, 150.0, 150.0, 224, 224)
        H_solver = geo.get_perspective_transform(src, dst)
        H_affine = geo.trans_from_patch(112.3, 97.1, 150.0, 150.0, 224, 224)
        np.testing.assert_allclose(H_solver, H_affine, atol=1e-9)

    def test_inverse_transform(self):
        H = geo.trans_from_patch(100.0, 120.0, 180.0, 140.0, 224, 224)
        H_inv = geo.trans_from_patch(100.0, 120.0, 180.0, 140.0, 224, 224,
                                     inv=True)
        np.testing.assert_allclose(H @ H_inv, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(H_inv, np.linalg.inv(H), atol=1e-12)

    def test_perspective_solver_against_reference_points(self, rng):
        # general (non-rectangular) quads: H maps src corners to dst corners
        src = jnp.asarray(rng.uniform(0, 224, size=(4, 2)))
        dst = jnp.asarray(rng.uniform(0, 224, size=(4, 2)))
        H = geo.get_perspective_transform(src, dst)
        mapped = geo.transform_points_2d(src, H)
        np.testing.assert_allclose(mapped, dst, atol=1e-8)

    def test_rotation_homography_maps_projections(self, freihand_like_sample):
        K = jnp.asarray(freihand_like_sample["K"])
        xyz = jnp.asarray(freihand_like_sample["joint_cam"])
        R = jnp.asarray(_aug_rotation(2))
        uv0, _, _ = geo.project_points(xyz, jnp.eye(3), K)
        uv1, _, _ = geo.project_points(xyz, R, K)
        H = geo.rotation_homography(K, R)
        np.testing.assert_allclose(
            geo.transform_points_2d(uv0, H), uv1, atol=1e-8
        )


class TestRotation:
    def test_rodrigues_identity(self):
        R = geo.rodrigues(jnp.zeros(3))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-12)

    def test_rodrigues_z_axis(self):
        theta = 0.37
        R = geo.rodrigues(jnp.array([0.0, 0.0, theta]))
        np.testing.assert_allclose(R, geo.rotation_z(jnp.asarray(theta)),
                                   atol=1e-12)

    def test_rodrigues_orthonormal(self, rng):
        rvecs = jnp.asarray(rng.randn(32, 3))
        Rs = geo.rodrigues(rvecs)
        eyes = np.broadcast_to(np.eye(3), (32, 3, 3))
        np.testing.assert_allclose(Rs @ np.swapaxes(Rs, -1, -2), eyes,
                                   atol=1e-10)
        np.testing.assert_allclose(np.linalg.det(Rs), np.ones(32), atol=1e-10)

    def test_sample_rotation_is_rotation(self):
        keys = jax.random.split(jax.random.PRNGKey(0), 64)
        Rs = jax.vmap(geo.sample_rotation_matrix)(keys)
        eyes = np.broadcast_to(np.eye(3), (64, 3, 3))
        np.testing.assert_allclose(Rs @ np.swapaxes(Rs, -1, -2), eyes,
                                   atol=1e-6)
        np.testing.assert_allclose(np.linalg.det(Rs), np.ones(64), atol=1e-6)

    def test_rotation_probability(self):
        # ~40% of samples should be non-identity (augment.py:257)
        keys = jax.random.split(jax.random.PRNGKey(42), 2000)
        Rs = np.asarray(jax.vmap(geo.sample_rotation_matrix)(keys))
        nonident = (np.abs(Rs - np.eye(3)).max(axis=(1, 2)) > 1e-9).mean()
        assert 0.33 < nonident < 0.47


class TestLabels:
    def test_encode_decode_roundtrip(self, rng):
        # mirrors the atol=1e-10 label round trip at FreiHand.py:588-597
        joints = jnp.asarray(rng.uniform(0, 224, size=(21, 3)))
        label = geo.encode_labels(joints, 224, 224)
        np.testing.assert_allclose(geo.decode_labels(label, 224, 224), joints,
                                   atol=1e-10)

    def test_full_identity_roundtrip(self, freihand_like_sample):
        """The reference's full `test_verify_identity` (FreiHand.py:544-619):
        GT joints -> patch label -> decode -> image -> camera ->
        un-normalise -> derotate must recover the GT at 1e-6."""
        K = jnp.asarray(freihand_like_sample["K"])
        joint_cam = jnp.asarray(freihand_like_sample["joint_cam"])
        for seed in range(5):
            R = jnp.asarray(_aug_rotation(seed))
            uv, z, xyz_rot = geo.project_points(joint_cam, R, K)
            bbox = geo.bbox_from_keypoints(uv, jnp.ones(21))
            out = geo.compute_patch_labels(joint_cam, R, K, bbox)

            # label decode recovers the normalised camera joints at 1e-6
            # (FreiHand.py:614)
            cam_norm = geo.patch_label_to_camera(
                out.label, out.trans_inv, out.tprime, K, R
            )
            np.testing.assert_allclose(cam_norm, out.joint_cam_normalized,
                                       rtol=1e-6, atol=1e-6)

            # un-normalising recovers the original joints at 1e-6
            # (FreiHand.py:615-619)
            z_root = xyz_rot[FreiHandJoints.root_idx, 2] * 1000.0
            recovered = cam_norm * z_root / out.tprime
            np.testing.assert_allclose(recovered, joint_cam, rtol=1e-6,
                                       atol=1e-6)

    def test_vmapped_batch(self, freihand_like_sample, rng):
        K = jnp.asarray(freihand_like_sample["K"])
        batch = jnp.asarray(
            freihand_like_sample["joint_cam"][None]
            + rng.uniform(-0.01, 0.01, size=(8, 21, 3))
        )
        keys = jax.random.split(jax.random.PRNGKey(7), 8)
        Rs = jax.vmap(geo.sample_rotation_matrix)(keys)
        Ks = jnp.broadcast_to(K, (8, 3, 3))

        def per_sample(jc, R, K):
            uv, _, _ = geo.project_points(jc, R, K)
            bbox = geo.bbox_from_keypoints(uv, jnp.ones(21))
            return geo.compute_patch_labels(jc, R, K, bbox)

        out = jax.vmap(per_sample)(batch, Rs, Ks)
        assert out.label.shape == (8, 21, 3)
        # each element matches the unbatched computation
        single = per_sample(batch[3], Rs[3], Ks[3])
        np.testing.assert_allclose(out.label[3], single.label, atol=1e-12)

    def test_tprime_side_selection(self, freihand_like_sample):
        K = jnp.asarray(freihand_like_sample["K"])
        # wider box -> fx; taller box -> fy (augment.py:387-394)
        wide = jnp.asarray([100.0, 100.0, 200.0, 150.0])
        tall = jnp.asarray([100.0, 100.0, 150.0, 200.0])
        np.testing.assert_allclose(
            geo.tprime_from_bbox(wide, K), 100.0 * K[0, 0] / 200.0
        )
        np.testing.assert_allclose(
            geo.tprime_from_bbox(tall, K), 100.0 * K[1, 1] / 200.0
        )


class TestBBox:
    def test_bbox_square_and_pad(self):
        uv = jnp.asarray([[10.0, 20.0], [110.0, 60.0], [50.0, 40.0]])
        vis = jnp.ones(3)
        bbox = geo.bbox_from_keypoints(uv, vis, pad_factor=1.75)
        np.testing.assert_allclose(bbox[0], 60.0)   # cx
        np.testing.assert_allclose(bbox[1], 40.0)   # cy
        np.testing.assert_allclose(bbox[2], 100.0 * 1.75)
        np.testing.assert_allclose(bbox[3], 100.0 * 1.75)  # squared to max side

    def test_invisible_joints_ignored(self):
        uv = jnp.asarray([[10.0, 20.0], [110.0, 60.0], [900.0, 900.0]])
        vis = jnp.asarray([1.0, 1.0, 0.0])
        bbox = geo.bbox_from_keypoints(uv, vis)
        assert bbox[0] == 60.0

    def test_bbox_from_detection_picks_best_score(self):
        boxes = jnp.asarray([
            [0.0, 0.0, 10.0, 10.0, 0.2],
            [20.0, 30.0, 120.0, 90.0, 0.9],
            [5.0, 5.0, 15.0, 15.0, 0.5],
        ])
        bbox = geo.bbox_from_detection(boxes, pad_factor=1.75)
        np.testing.assert_allclose(bbox[0], 70.0)
        np.testing.assert_allclose(bbox[1], 60.0)
        np.testing.assert_allclose(bbox[2], 100.0 * 1.75)


class TestProcrustes:
    def test_recovers_known_transform(self, rng):
        X = rng.randn(21, 3)
        R_true = np.asarray(_aug_rotation(3))
        Y = (X @ R_true.T) * 2.3 + np.array([0.1, -0.2, 0.3])
        res = geo.compute_similarity_transform(
            jnp.asarray(X), jnp.asarray(Y), compute_optimal_scale=True
        )
        np.testing.assert_allclose(res.Z, X, atol=1e-8)

    def test_reflection_fixed(self, rng):
        X = rng.randn(21, 3)
        Y = X * np.array([1.0, 1.0, -1.0])  # reflected
        res = geo.compute_similarity_transform(jnp.asarray(X), jnp.asarray(Y))
        np.testing.assert_allclose(np.linalg.det(res.T), 1.0, atol=1e-8)

    def test_matches_numpy_reference(self, rng):
        """Independent NumPy implementation of the MATLAB-procrustes math
        (augment.py:18-77) as an oracle."""
        def np_procrustes(X, Y):
            muX, muY = X.mean(0), Y.mean(0)
            X0, Y0 = X - muX, Y - muY
            normX = np.sqrt((X0 ** 2).sum())
            normY = np.sqrt((Y0 ** 2).sum())
            X0, Y0 = X0 / normX, Y0 / normY
            U, s, Vt = np.linalg.svd(X0.T @ Y0, full_matrices=False)
            V = Vt.T
            T = V @ U.T
            detT = np.linalg.det(T)
            V[:, -1] *= np.sign(detT)
            s[-1] *= np.sign(detT)
            T = V @ U.T
            traceTA = s.sum()
            Z = normX * traceTA * (Y0 @ T) + muX
            return Z

        for i in range(5):
            X = rng.randn(21, 3)
            Y = rng.randn(21, 3) * 0.5 + X
            res = geo.compute_similarity_transform(jnp.asarray(X),
                                                   jnp.asarray(Y))
            np.testing.assert_allclose(res.Z, np_procrustes(X, Y), atol=1e-8)

    def test_batched(self, rng):
        X = jnp.asarray(rng.randn(16, 21, 3))
        Y = jnp.asarray(rng.randn(16, 21, 3) * 0.3) + X
        res = geo.compute_similarity_transform(X, Y)
        assert res.Z.shape == (16, 21, 3)
        single = geo.compute_similarity_transform(X[5], Y[5])
        np.testing.assert_allclose(res.Z[5], single.Z, atol=1e-10)

    def test_align_w_scale_matches_scipy(self, rng):
        scipy_linalg = pytest.importorskip("scipy.linalg")
        X = rng.randn(21, 3)
        Y = rng.randn(21, 3) * 0.4 + X

        # reference main/eval.py:142-165
        t1, t2 = X.mean(0), Y.mean(0)
        m1, m2 = X - t1, Y - t2
        s1 = np.linalg.norm(m1) + 1e-8
        s2 = np.linalg.norm(m2) + 1e-8
        m1n, m2n = m1 / s1, m2 / s2
        R, s = scipy_linalg.orthogonal_procrustes(m1n, m2n)
        expected = (m2n @ R.T) * s * s1 + t1

        got = geo.align_w_scale(jnp.asarray(X), jnp.asarray(Y))
        np.testing.assert_allclose(got, expected, atol=1e-8)


class TestCv2TransformParity:
    def test_get_perspective_transform_matches_cv2(self, rng):
        import cv2
        for _ in range(4):
            src = rng.uniform(0, 224, (4, 2)).astype(np.float32)
            dst = rng.uniform(0, 224, (4, 2)).astype(np.float32)
            want = cv2.getPerspectiveTransform(src, dst)
            got = geo.get_perspective_transform(jnp.asarray(src, jnp.float64),
                                                jnp.asarray(dst, jnp.float64))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_patch_transform_matches_cv2_4point(self):
        """The bbox->patch transform equals cv2.getPerspectiveTransform on
        the reference's corner ordering (augment.py:476-504)."""
        import cv2
        cx, cy, w, h = 112.3, 97.1, 150.0, 163.0
        src, dst = geo.patch_corner_points(cx, cy, w, h, 224, 224)
        want = cv2.getPerspectiveTransform(np.asarray(src, np.float32),
                                           np.asarray(dst, np.float32))
        got = geo.trans_from_patch(cx, cy, w, h, 224, 224)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
