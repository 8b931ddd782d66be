"""On-device warp + preprocessing pipeline tests.

The key end-to-end property (replacing cv2 visual checks): a bright dot
painted at a joint's projected image location must land at that joint's
patch-label position after the composed warp.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hand_integral_pose_estimation_tpu import geometry as geo
from hand_integral_pose_estimation_tpu.config import AugmentConfig
from hand_integral_pose_estimation_tpu.data import pipeline
from hand_integral_pose_estimation_tpu.ops.warp import (
    warp_axis_aligned_batch,
    warp_perspective,
    warp_perspective_batch,
)


def _np_warp(img, H, out_hw):
    """Independent NumPy oracle: inverse-map bilinear, zero border."""
    Ho, Wo = out_hw
    Hi = np.linalg.inv(H)
    out = np.zeros((Ho, Wo, img.shape[2]))
    for y in range(Ho):
        for x in range(Wo):
            u, v, w = Hi @ np.array([x, y, 1.0])
            sx, sy = u / w, v / w
            x0, y0 = int(np.floor(sx)), int(np.floor(sy))
            fx, fy = sx - x0, sy - y0
            acc = np.zeros(img.shape[2])
            for dy, wy in ((0, 1 - fy), (1, fy)):
                for dx, wx in ((0, 1 - fx), (1, fx)):
                    yy, xx = y0 + dy, x0 + dx
                    if 0 <= yy < img.shape[0] and 0 <= xx < img.shape[1]:
                        acc += wy * wx * img[yy, xx]
            out[y, x] = acc
    return out


class TestWarp:
    def test_identity(self, rng):
        img = jnp.asarray(rng.rand(16, 16, 3))
        out = warp_perspective(img, jnp.eye(3), (16, 16))
        np.testing.assert_allclose(out, img, atol=1e-9)

    def test_integer_translation(self, rng):
        img = jnp.asarray(rng.rand(16, 16, 1))
        H = jnp.asarray(np.array([[1, 0, 3], [0, 1, 2], [0, 0, 1.0]]))
        out = warp_perspective(img, H, (16, 16))
        np.testing.assert_allclose(out[2:, 3:], img[:-2, :-3], atol=1e-9)
        np.testing.assert_allclose(out[:2], 0.0)  # zero border

    def test_matches_numpy_oracle(self, rng):
        img = rng.rand(20, 24, 3)
        # mild random homography around identity
        H = np.eye(3) + rng.randn(3, 3) * np.array(
            [[0.05, 0.05, 2.0], [0.05, 0.05, 2.0], [1e-4, 1e-4, 0.0]])
        out = warp_perspective(jnp.asarray(img), jnp.asarray(H), (12, 14))
        want = _np_warp(img, H, (12, 14))
        np.testing.assert_allclose(out, want, atol=1e-8)

    def test_batch_matches_single(self, rng):
        imgs = jnp.asarray(rng.rand(4, 16, 16, 3))
        Hs = jnp.asarray(
            np.stack([np.eye(3) + rng.randn(3, 3) * 0.02 for _ in range(4)]))
        outs = warp_perspective_batch(imgs, Hs, (8, 8))
        single = warp_perspective(imgs[2], Hs[2], (8, 8))
        np.testing.assert_allclose(outs[2], single, atol=1e-12)

    def test_jit_under_vmap(self, rng):
        imgs = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
        Hs = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (2, 3, 3))
        f = jax.jit(lambda i, h: warp_perspective_batch(i, h, (16, 16)))
        np.testing.assert_allclose(f(imgs, Hs), imgs, atol=1e-6)


class TestAffineWarp:
    """warp_axis_aligned_batch: the eval-path fast warp (R == I crops)."""

    def _random_affine(self, rng, B):
        Hs = np.zeros((B, 3, 3))
        Hs[:, 0, 0] = rng.uniform(0.4, 2.5, B)
        Hs[:, 1, 1] = rng.uniform(0.4, 2.5, B)
        Hs[:, 0, 2] = rng.uniform(-20, 20, B)
        Hs[:, 1, 2] = rng.uniform(-20, 20, B)
        Hs[:, 2, 2] = 1.0
        return jnp.asarray(Hs)

    def test_matches_gather_path(self, rng):
        imgs = jnp.asarray(rng.rand(4, 48, 40, 3))
        Hs = self._random_affine(rng, 4)
        fast = warp_axis_aligned_batch(imgs, Hs, (24, 32))
        want = warp_perspective_batch(imgs, Hs, (24, 32), method="gather")
        np.testing.assert_allclose(fast, want, rtol=1e-6, atol=1e-6)

    def test_matches_twopass(self, rng):
        imgs = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
        Hs = self._random_affine(rng, 2)
        fast = warp_perspective_batch(imgs, Hs, (32, 32), method="affine")
        two = warp_perspective_batch(imgs, Hs, (32, 32), method="twopass")
        np.testing.assert_allclose(fast, two, rtol=1e-5, atol=1e-5)

    def test_identity_and_zero_border(self, rng):
        img = jnp.asarray(rng.rand(1, 16, 16, 2))
        H = jnp.asarray(np.array(
            [[[1.0, 0, 5.0], [0, 1.0, -3.0], [0, 0, 1.0]]]))
        out = warp_axis_aligned_batch(img, H, (16, 16))
        # out[y, x] = img[y + 3, x - 5], zero outside
        np.testing.assert_allclose(out[0, :13, 5:], img[0, 3:, :-5],
                                   atol=1e-9)
        np.testing.assert_allclose(out[0, 13:], 0.0, atol=1e-9)
        np.testing.assert_allclose(out[0, :, :5], 0.0, atol=1e-9)


def _synthetic_sample(rng, B=3):
    K = np.array([[531.9, 0.0, 112.0], [0.0, 532.2, 112.0], [0.0, 0.0, 1.0]])
    joints = (np.array([0.0, 0.0, 0.45])
              + rng.uniform(-0.035, 0.035, (B, 21, 3)))
    imgs = rng.randint(0, 255, (B, 224, 224, 3)).astype(np.uint8)
    return (jnp.asarray(imgs), jnp.asarray(joints),
            jnp.broadcast_to(jnp.asarray(K), (B, 3, 3)))


class TestPipeline:
    def test_eval_batch_shapes_and_roundtrip(self, rng):
        imgs, joints, K = _synthetic_sample(rng)
        batch = pipeline.make_eval_batch(imgs, joints, K, None,
                                         jnp.ones(3))
        assert batch.image.shape == (3, 224, 224, 3)
        assert batch.label.shape == (3, 21, 3)
        # label decodes back to the normalised camera joints (R = I)
        cam = geo.patch_label_to_camera(batch.label, batch.trans_inv,
                                        batch.tprime, batch.K, batch.R)
        np.testing.assert_allclose(cam, batch.joint_cam_normalized,
                                   rtol=1e-6, atol=1e-6)

    def test_train_batch_label_roundtrip(self, rng):
        imgs, joints, K = _synthetic_sample(rng)
        batch = pipeline.make_train_batch(
            jax.random.PRNGKey(3), imgs, joints, K, None,
            jnp.array([True, False, True]), None, jnp.ones(3))
        cam = geo.patch_label_to_camera(batch.label, batch.trans_inv,
                                        batch.tprime, batch.K, batch.R)
        np.testing.assert_allclose(cam, batch.joint_cam_normalized,
                                   rtol=1e-5, atol=1e-6)
        # un-normalise recovers the GT joints
        z_root = jnp.einsum("bij,bj->bi", batch.R,
                            batch.joint_cam[:, 9])[:, 2] * 1000.0
        rec = cam * (z_root / batch.tprime)[:, None, None]
        np.testing.assert_allclose(rec, batch.joint_cam, rtol=1e-5,
                                   atol=1e-6)

    def test_teacher_label_matches_gt_when_teacher_is_gt(self, rng):
        imgs, joints, K = _synthetic_sample(rng)
        b0 = pipeline.make_train_batch(
            jax.random.PRNGKey(11), imgs, joints, K, None,
            jnp.array([False] * 3), None, jnp.ones(3))
        batch = pipeline.make_train_batch(
            jax.random.PRNGKey(11), imgs, joints, K, None,
            jnp.array([False] * 3),
            teacher_cam_normalized=b0.joint_cam_normalized,
            ref_bone_len=jnp.ones(3))
        # same key -> same augmentation; teacher == GT normalised joints
        # -> identical labels
        np.testing.assert_allclose(batch.label_teacher, batch.label,
                                   rtol=1e-6, atol=1e-8)

    def test_dot_lands_at_label_position(self, rng):
        """Paint a bright dot at joint 0's projected location; after the
        composed warp it must appear at the label's patch position."""
        K = jnp.asarray(
            [[531.9, 0.0, 112.0], [0.0, 532.2, 112.0], [0.0, 0.0, 1.0]])
        joints = jnp.asarray(np.array([0.0, 0.0, 0.45])
                             + rng.uniform(-0.03, 0.03, (1, 21, 3)))
        uv, _, _ = geo.project_points(joints[0], jnp.eye(3), K)
        img = np.zeros((1, 224, 224, 3), np.float32)
        ux, uy = int(round(float(uv[0, 0]))), int(round(float(uv[0, 1])))
        img[0, uy, ux] = 1000.0

        batch = pipeline.make_eval_batch(jnp.asarray(img), joints,
                                         K[None], None, jnp.ones(1))
        patch = np.asarray(batch.image[0].sum(-1))
        py, px = np.unravel_index(patch.argmax(), patch.shape)
        lab_xy = np.asarray(
            geo.decode_labels(batch.label[0], 224, 224))[0, :2]
        # dot was painted at integer pixel; allow the rounding + crop scale
        assert abs(px - lab_xy[0]) < 3.0
        assert abs(py - lab_xy[1]) < 3.0

    def test_color_jitter_and_clip(self, rng):
        imgs, joints, K = _synthetic_sample(rng)
        batch = pipeline.make_train_batch(
            jax.random.PRNGKey(0), imgs, joints, K, None,
            jnp.array([True] * 3), None, jnp.ones(3))
        img = np.asarray(batch.image)
        assert img.min() >= 0.0 and img.max() <= 255.0
        assert img.max() > 1.5  # 0..255 scale, not 0..1 (parity quirk)

    def test_eval_batch_deterministic(self, rng):
        imgs, joints, K = _synthetic_sample(rng)
        b1 = pipeline.make_eval_batch(imgs, joints, K, None, jnp.ones(3))
        b2 = pipeline.make_eval_batch(imgs, joints, K, None, jnp.ones(3))
        np.testing.assert_array_equal(b1.image, b2.image)

    def test_detector_bbox_path(self, rng):
        imgs, joints, K = _synthetic_sample(rng)
        bbox = jnp.asarray(np.tile([112.0, 112.0, 150.0, 150.0], (3, 1)))
        batch = pipeline.make_eval_batch(imgs, joints, K, bbox, jnp.ones(3))
        np.testing.assert_allclose(batch.bbox, bbox)
        np.testing.assert_allclose(
            batch.tprime, 100.0 * K[0, 0, 0] / 150.0, rtol=1e-6)


class TestTwoPassWarp:
    def test_exact_for_affine_axis_aligned(self, rng):
        """Crop-style warps (no cross terms): two-pass == single-pass."""
        from hand_integral_pose_estimation_tpu.ops.warp import (
            warp_perspective, warp_perspective_twopass)
        img = jnp.asarray(rng.rand(32, 40, 3))
        H = np.diag([1.4, 0.8, 1.0]); H[0, 2] = -3.2; H[1, 2] = 5.1
        got = warp_perspective_twopass(img, jnp.asarray(H), (24, 28))
        want = warp_perspective(img, jnp.asarray(H), (24, 28))
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_close_on_smooth_image_with_rotation(self, rng):
        """With cross-terms the two filters differ at O(grad * du/dv); on a
        smooth image both must track the analytic warp closely."""
        from hand_integral_pose_estimation_tpu.ops.warp import (
            warp_perspective, warp_perspective_twopass)
        H_img, W_img = 96, 96
        yy, xx = np.mgrid[0:H_img, 0:W_img]
        smooth = (np.sin(xx / 9.0) + np.cos(yy / 7.0)
                  + 0.01 * xx - 0.005 * yy)[..., None]
        K = np.asarray([[100.0, 0, 48.0], [0, 100.0, 48.0], [0, 0, 1.0]])
        R = np.asarray(geo.sample_rotation_matrix(jax.random.PRNGKey(1),
                                                  rot_prob=1.0))
        Hm = K @ R @ np.linalg.inv(K)
        a = np.asarray(warp_perspective_twopass(jnp.asarray(smooth),
                                                jnp.asarray(Hm), (96, 96)))
        b = np.asarray(warp_perspective(jnp.asarray(smooth),
                                        jnp.asarray(Hm), (96, 96)))
        # compare away from the border (the two filters handle the
        # zero-border differently in the last partial pixel)
        a_c, b_c = a[12:-12, 12:-12], b[12:-12, 12:-12]
        mask = (np.abs(a_c) > 1e-9) & (np.abs(b_c) > 1e-9)
        assert mask.mean() > 0.5
        assert np.abs((a_c - b_c)[mask]).max() < 5e-3

    def test_batch_twopass_method(self, rng):
        from hand_integral_pose_estimation_tpu.ops.warp import (
            warp_perspective_batch)
        imgs = jnp.asarray(rng.rand(3, 32, 32, 3))
        H = np.diag([1.2, 0.9, 1.0]); H[0, 2] = 2.0
        Hs = jnp.asarray(np.stack([H] * 3))
        a = warp_perspective_batch(imgs, Hs, (16, 16), method="gather")
        b = warp_perspective_batch(imgs, Hs, (16, 16), method="twopass")
        np.testing.assert_allclose(a, b, atol=1e-9)


class TestPallasWarp:
    def test_matches_twopass(self, rng):
        from hand_integral_pose_estimation_tpu.ops.warp import (
            warp_perspective_batch, warp_perspective_pallas)
        imgs = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 255)
        Hs = []
        for i in range(2):
            H = np.eye(3)
            H[:2, :2] *= 0.8 + 0.1 * rng.rand()
            H[0, 1] = 0.2 * rng.randn()
            H[:2, 2] = rng.randn(2) * 4
            H[2, :2] = rng.randn(2) * 1e-4
            Hs.append(H)
        Hs = jnp.asarray(np.stack(Hs), jnp.float32)
        want = warp_perspective_batch(imgs, Hs, (64, 64), method="twopass",
                                      precision=jax.lax.Precision.HIGHEST)
        got = warp_perspective_pallas(imgs, Hs, (64, 64), interpret=True)
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-5)

    def test_identity_exact(self, rng):
        from hand_integral_pose_estimation_tpu.ops.warp import (
            warp_perspective_pallas)
        imgs = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
        H = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (1, 3, 3))
        out = warp_perspective_pallas(imgs, H, (32, 32), interpret=True)
        np.testing.assert_allclose(out, imgs, atol=1e-5)

    def test_small_chunk_matches_default(self, rng):
        """chunk=8 is numerically identical to the default chunking (the
        knob is unwired in production — see warp_perspective_pallas — but
        must stay correct)."""
        from hand_integral_pose_estimation_tpu.ops.warp import (
            warp_perspective_pallas)
        imgs = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32) * 255)
        H = np.eye(3)
        H[:2, :2] = [[0.9, 0.15], [-0.1, 0.85]]
        H[:2, 2] = [3.0, -2.0]
        Hs = jnp.asarray(H[None], jnp.float32)
        a = warp_perspective_pallas(imgs, Hs, (32, 32), interpret=True)
        b = warp_perspective_pallas(imgs, Hs, (32, 32), interpret=True,
                                    chunk=8)
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_looped_variant_matches_twopass(self, rng):
        """Shapes whose Hs/chunk + Wo/chunk exceeds 14 select the
        fori_loop-ed body (`_warp_kernel_looped`, one live weight buffer —
        the unrolled variant's stacked blocks OOM there); must equal the
        XLA twopass exactly. 320 -> 224 at chunk=8 is the factored teacher
        sweep's shape class."""
        from hand_integral_pose_estimation_tpu.ops.warp import (
            warp_perspective_batch, warp_perspective_pallas)
        imgs = jnp.asarray(rng.rand(2, 320, 320, 3).astype(np.float32)
                           * 255)
        Hs = []
        for i in range(2):
            th = 0.3 * rng.randn()
            H = np.eye(3)
            H[:2, :2] = [[np.cos(th), -np.sin(th)],
                         [np.sin(th), np.cos(th)]]
            H[:2, 2] = rng.randn(2) * 5 + [48, 48]
            Hs.append(H)
        Hs = jnp.asarray(np.stack(Hs), jnp.float32)
        want = warp_perspective_batch(imgs, Hs, (224, 224),
                                      method="twopass",
                                      precision=jax.lax.Precision.HIGHEST)
        got = warp_perspective_pallas(imgs, Hs, (224, 224), interpret=True,
                                      chunk=8)
        # atol on the 0..255 scale: ~4e-5 px coordinate eps at 320-px
        # source coordinates -> sub-centigray value noise
        np.testing.assert_allclose(got, want, atol=2e-2, rtol=1e-5)


class TestCv2Parity:
    """Direct comparison against cv2.warpPerspective — the reference's actual
    resampler (augment.py:371,409). cv2 quantises source coords to 1/32 px
    (INTER_BITS), so tolerances are a few grey levels on smooth images."""

    def _smooth_image(self):
        yy, xx = np.mgrid[0:224, 0:224]
        img = np.stack([
            128 + 100 * np.sin(xx / 17.0),
            128 + 100 * np.cos(yy / 13.0),
            128 + 50 * np.sin((xx + yy) / 23.0),
        ], axis=-1).astype(np.float32)
        return img

    def test_single_warp_matches_cv2(self):
        import cv2
        img = self._smooth_image()
        H = np.array([[0.9, 0.1, 5.0], [-0.08, 1.05, -3.0],
                      [1e-4, -5e-5, 1.0]])
        want = cv2.warpPerspective(img, H, (224, 224),
                                   flags=cv2.INTER_LINEAR)
        got = np.asarray(warp_perspective(jnp.asarray(img),
                                          jnp.asarray(H), (224, 224)))
        # interior comparison (border pixels differ by partial coverage)
        d = np.abs(got[8:-8, 8:-8] - want[8:-8, 8:-8])
        assert d.max() < 4.0, d.max()       # grey levels out of 255
        assert d.mean() < 0.3

    def test_composed_crop_matches_cv2_double_warp(self):
        """The reference warps twice (rotation homography then 4-point crop);
        our pipeline composes both into one resample. On a smooth image both
        must agree to resampling tolerance."""
        import cv2
        img = self._smooth_image()
        K = np.array([[531.9, 0, 112.0], [0, 532.2, 112.0], [0, 0, 1.0]])
        R = np.asarray(geo.sample_rotation_matrix(jax.random.PRNGKey(3),
                                                  rot_prob=1.0))
        homo = K @ R @ np.linalg.inv(K)
        trans = np.asarray(geo.trans_from_patch(110.0, 118.0, 150.0, 150.0,
                                                224, 224))
        # reference: two cv2 resamples (augment.py:371 then 409)
        w1 = cv2.warpPerspective(img, homo, (224, 224))
        want = cv2.warpPerspective(w1, trans, (224, 224),
                                   flags=cv2.INTER_LINEAR)
        # ours: single composed resample
        got = np.asarray(warp_perspective(jnp.asarray(img),
                                          jnp.asarray(trans @ homo),
                                          (224, 224)))
        d = np.abs(got[16:-16, 16:-16] - want[16:-16, 16:-16])
        # double resampling adds its own blur: compare loosely
        assert d.mean() < 1.0, d.mean()
        assert np.percentile(d, 99) < 6.0
