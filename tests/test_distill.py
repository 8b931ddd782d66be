"""Distillation: the rotation-variance filter, tested with synthetic
teachers — a perfect teacher has ~zero variance and exact pseudo-labels; a
rotation-inconsistent teacher is rejected."""

import jax
import jax.numpy as jnp
import numpy as np

from hand_integral_pose_estimation_tpu import geometry as geo
from hand_integral_pose_estimation_tpu.distill import (
    filter_precision_curve,
    generate_filtered_labels,
    teacher_error_vs_variance,
)
from hand_integral_pose_estimation_tpu.geometry import (
    bbox as bbox_mod,
    labels as lbl,
    transforms,
)
from hand_integral_pose_estimation_tpu.training.panet_trainer import (
    train_panet,
)
from hand_integral_pose_estimation_tpu.models.panet import PANet
import pytest


def _setup(rng, B=2):
    K = jnp.asarray([[531.9, 0., 112.], [0., 532.2, 112.], [0., 0., 1.]])
    joints = jnp.asarray(np.array([0., 0., 0.45])
                         + rng.uniform(-0.03, 0.03, (B, 21, 3)))
    imgs = jnp.asarray(rng.randint(0, 255, (B, 224, 224, 3)), jnp.uint8)
    Ks = jnp.broadcast_to(K, (B, 3, 3))
    uv, _, _ = jax.vmap(lambda j, k: geo.project_points(
        j, jnp.eye(3, dtype=k.dtype), k))(joints, Ks)
    bbox = jax.vmap(lambda u: bbox_mod.bbox_from_keypoints(
        u, jnp.ones(21)))(uv)
    return imgs, joints, Ks, bbox


def _oracle_teacher(joints, Ks, bbox, num_rotations=21, rng_noise=None):
    """Teacher that answers with the TRUE label for whichever rotated crop it
    is shown (patches arrive ordered (b, t))."""
    B = joints.shape[0]
    thetas = jnp.linspace(-0.52, 0.52, num_rotations)
    Rz = geo.rotation_z(thetas)

    labels = []
    for b in range(B):
        for t in range(num_rotations):
            out = lbl.compute_patch_labels(joints[b], Rz[t], Ks[b], bbox[b])
            l = out.label
            if rng_noise is not None:
                l = l + rng_noise.randn(*l.shape) * 0.02 * (t + 1)
            labels.append(l)
    stacked = jnp.asarray(np.stack(labels))

    def apply(patches):
        assert patches.shape[0] == stacked.shape[0]
        return stacked
    return apply


class TestVarianceFilter:
    def test_perfect_teacher_kept_with_exact_labels(self, rng):
        imgs, joints, Ks, bbox = _setup(rng)
        teacher = _oracle_teacher(joints, Ks, bbox)
        out = generate_filtered_labels(
            teacher, imgs, Ks, bbox, jnp.array([False, False]), joints)
        assert bool(out.keep.all())
        assert float(out.variance.max()) < 1e-10
        # pseudo-labels equal the GT normalisation
        tprime = bbox_mod.tprime_from_bbox(bbox, Ks, 100.0)
        want = joints * (tprime / (joints[:, 9, 2] * 1000.0))[:, None, None]
        np.testing.assert_allclose(out.joint_cam_normalized, want,
                                   rtol=1e-5, atol=1e-7)

    def test_inconsistent_teacher_rejected(self, rng):
        imgs, joints, Ks, bbox = _setup(rng)
        teacher = _oracle_teacher(joints, Ks, bbox,
                                  rng_noise=np.random.RandomState(0))
        out = generate_filtered_labels(
            teacher, imgs, Ks, bbox, jnp.array([False, False]), joints)
        assert not bool(out.keep.any())
        assert float(out.variance.min()) > 1e-4

    def test_labelled_rows_always_kept_with_gt(self, rng):
        imgs, joints, Ks, bbox = _setup(rng)
        teacher = _oracle_teacher(joints, Ks, bbox,
                                  rng_noise=np.random.RandomState(0))
        out = generate_filtered_labels(
            teacher, imgs, Ks, bbox, jnp.array([True, True]), joints)
        assert bool(out.keep.all())
        np.testing.assert_allclose(out.variance, 0.0)

    def test_precision_curve_monotone_kept(self, rng):
        var = jnp.asarray(rng.rand(100) * 2e-4)
        mp = jnp.asarray(rng.rand(100) * 0.01)
        thr = jnp.linspace(1e-6, 2e-4, 10)
        kept, prec = filter_precision_curve(var, mp, thr)
        assert (np.diff(np.asarray(kept)) >= 0).all()

    def test_error_vs_variance_shapes(self, rng):
        per_rot = jnp.asarray(rng.randn(4, 21, 21, 3) * 0.01)
        gt = jnp.asarray(rng.randn(4, 21, 3) * 0.01)
        var, mp = teacher_error_vs_variance(per_rot, gt)
        assert var.shape == (4,) and mp.shape == (4,)


class TestRotationModes:
    """The factored teacher sweep (shared axis-aligned crop + per-rotation
    patch-space similarity warps) against the composed per-rotation
    full-source warp: same coordinate maps, different resample factoring."""

    def _patches(self, imgs, Ks, bbox, mode, num_rotations=5,
                 rotation_range=0.52):
        captured = {}

        def capture(patches):
            captured["p"] = patches
            return jnp.zeros((patches.shape[0], 21, 3))

        generate_filtered_labels(
            capture, imgs, Ks, bbox, jnp.zeros(imgs.shape[0], bool),
            jnp.full((imgs.shape[0], 21, 3), 0.4),
            num_rotations=num_rotations, rotation_range=rotation_range,
            rotation_mode=mode)
        return np.asarray(captured["p"])

    def _smooth_setup(self, rng, B=2, hw=256):
        """Low-frequency image content so filter differences stay small."""
        y, x = np.mgrid[0:hw, 0:hw] / hw
        base = np.stack([np.sin(2 * np.pi * x) * 80 + 120,
                         np.cos(2 * np.pi * y) * 80 + 120,
                         (x + y) * 90 + 30], axis=-1)
        imgs = jnp.asarray(np.stack(
            [base + rng.rand() * 10 for _ in range(B)]), jnp.float32)
        K = jnp.asarray([[531.9, 0., hw / 2], [0., 532.2, hw / 2],
                         [0., 0., 1.]])
        Ks = jnp.broadcast_to(K, (B, 3, 3))
        # small centered boxes: the enlarged factored crop stays in-source
        cxy = hw / 2 + rng.uniform(-8, 8, (B, 2))
        wh = rng.uniform(60, 80, (B, 2))
        bbox = jnp.asarray(np.concatenate([cxy, wh], 1), jnp.float32)
        return imgs, Ks, bbox

    def test_theta0_close(self, rng):
        """With only theta = 0 both modes compute the same crop; factored
        resamples twice (src -> finer base -> patch), so agreement is
        filter-level, not bitwise."""
        imgs, Ks, bbox = self._smooth_setup(rng)
        pc = self._patches(imgs, Ks, bbox, "composed", num_rotations=1,
                           rotation_range=0.0)
        pf = self._patches(imgs, Ks, bbox, "factored", num_rotations=1,
                           rotation_range=0.0)
        assert np.abs(pf - pc).mean() < 0.5
        assert np.abs(pf - pc).max() < 6.0

    def test_factored_matches_composed_on_smooth_content(self, rng):
        imgs, Ks, bbox = self._smooth_setup(rng)
        pc = self._patches(imgs, Ks, bbox, "composed")
        pf = self._patches(imgs, Ks, bbox, "factored")
        # same maps, double vs single resample: tight mean agreement and
        # bounded worst pixel on smooth content (0..255 scale)
        assert np.abs(pf - pc).mean() < 0.5
        assert np.abs(pf - pc).max() < 6.0

    def test_rotated_crops_fully_covered(self, rng):
        """The enlarged base must feed every rotated crop real content: a
        constant source yields constant rotated patches (no zero corners)."""
        B, hw = 1, 256
        imgs = jnp.full((B, hw, hw, 3), 200.0, jnp.float32)
        K = jnp.asarray([[531.9, 0., 128.], [0., 532.2, 128.],
                         [0., 0., 1.]])
        Ks = jnp.broadcast_to(K, (B, 3, 3))
        # OFF-CENTRE box: rotation about the principal point sweeps the
        # crop along an arc — the traced base box must cover it
        bbox = jnp.asarray([[168.0, 100.0, 70.0, 70.0]])
        pf = self._patches(imgs, Ks, bbox, "factored", num_rotations=3)
        assert pf.min() > 199.0, float(pf.min())

    def test_rotated_crops_covered_non_square_bbox(self, rng):
        """Tall/wide boxes need the CROSS term in the base cover (w·cosθ +
        h·sinθ per axis): with the square-only formula a 56x96 box read
        zeros at the patch corners under rotation."""
        B, hw = 2, 256
        imgs = jnp.full((B, hw, hw, 3), 200.0, jnp.float32)
        K = jnp.asarray([[531.9, 0., 128.], [0., 532.2, 128.],
                         [0., 0., 1.]])
        Ks = jnp.broadcast_to(K, (B, 3, 3))
        bbox = jnp.asarray([[150.0, 110.0, 56.0, 96.0],
                            [100.0, 150.0, 96.0, 56.0]])
        pf = self._patches(imgs, Ks, bbox, "factored", num_rotations=3)
        assert pf.min() > 199.0, float(pf.min())

    def test_rotated_crops_covered_extreme_aspect_ratio(self, rng):
        """Aspect ratios past 1/tan(rotation_range) (~1.74 at 0.52 rad):
        extent(θ) = w·cosθ + h·sinθ peaks INSIDE the range at θ* =
        atan(h/w), so the cover must clamp the effective angle per axis
        (cap at the diagonal) — evaluating at θ = range under-covers and
        rotated crop corners would sample zero padding (ADVICE r3 #1)."""
        B, hw = 2, 256
        imgs = jnp.full((B, hw, hw, 3), 200.0, jnp.float32)
        K = jnp.asarray([[531.9, 0., 128.], [0., 532.2, 128.],
                         [0., 0., 1.]])
        Ks = jnp.broadcast_to(K, (B, 3, 3))
        bbox = jnp.asarray([[128.0, 128.0, 16.0, 160.0],   # ratio 10 tall
                            [128.0, 128.0, 160.0, 16.0]])  # ratio 10 wide
        pf = self._patches(imgs, Ks, bbox, "factored", num_rotations=5,
                           rotation_range=0.52)
        assert pf.min() > 199.0, float(pf.min())

    def test_unknown_mode_raises(self, rng):
        imgs, Ks, bbox = self._smooth_setup(rng)
        try:
            self._patches(imgs, Ks, bbox, "nope")
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


@pytest.mark.slow
class TestTeacherDtype:
    """The teacher forward runs bfloat16 by default (ModelConfig.
    compute_dtype; --teacher-dtype overrides). The variance filter compares
    against an ABSOLUTE 1e-4 threshold, so the bf16 forward must not flip
    keep decisions vs a float32 teacher — the decode and the filter
    accumulate in float32 either way (ops/integral.py promotes, jnp.var is
    fp32).

    Measured regime (the reason one fixture suffices): the cross-rotation
    variance of a real net's predictions is dominated by the back-projection
    GEOMETRY (the same patch prediction re-projected through 5 different
    R_z lands on different camera points, ~1e-4 here — a mixed keep set),
    while swapping the forward to bf16 moves the fp32-accumulated variance
    by < 1e-7 — three orders below the threshold. Sharpening the final
    layer x400..x10000 changes neither (diagnostic swept in round 4)."""

    def _teacher(self, dtype):
        from hand_integral_pose_estimation_tpu.config import ModelConfig
        from hand_integral_pose_estimation_tpu.models import get_pose_net
        from hand_integral_pose_estimation_tpu.ops.integral import (
            softmax_integral,
        )
        cfg = ModelConfig(resnet_type=18, input_shape=(32, 32),
                          output_shape=(8, 8), depth_dim=8,
                          compute_dtype=dtype)
        net = get_pose_net(cfg)
        variables = net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 32, 32, 3)))

        def apply(patches):
            hm = net.apply(variables, patches, train=False)
            return softmax_integral(hm, 21, 8, impl="xla")
        return apply

    def test_bf16_keep_set_matches_fp32(self):
        rng = np.random.RandomState(7)
        imgs, joints, Ks, bbox = _setup(rng, B=4)
        # place the threshold between the middle two f32 variances so the
        # keep set is mixed BY CONSTRUCTION — the property under test is
        # that bf16 doesn't flip decisions near the operating threshold,
        # and the fixture's variance spread (~1e-4, backend-dependent in
        # the 4th digit) must not decide the test
        probe = generate_filtered_labels(
            self._teacher("float32"), imgs, Ks, bbox,
            jnp.zeros(4, bool), joints, num_rotations=5, patch_hw=(32, 32))
        vs = np.sort(np.asarray(probe.variance))
        threshold = float((vs[1] + vs[2]) / 2)
        # the margin assertion below (dv < 1e-6) only means something if
        # the threshold sits well clear of every variance
        assert np.abs(vs - threshold).min() > 5e-6, vs
        out = {}
        for dt in ("float32", "bfloat16"):
            out[dt] = generate_filtered_labels(
                self._teacher(dt), imgs, Ks, bbox,
                jnp.zeros(4, bool), joints, num_rotations=5,
                variance_threshold=threshold, patch_hw=(32, 32))
        f32, bf16 = out["float32"], out["bfloat16"]
        keep = np.asarray(f32.keep)
        assert keep.any() and not keep.all(), keep
        np.testing.assert_array_equal(keep, np.asarray(bf16.keep))
        # margin statement: the bf16-induced variance shift is orders of
        # magnitude below the 1e-4 threshold (observed ~2e-8)
        dv = np.abs(np.asarray(f32.variance) - np.asarray(bf16.variance))
        assert dv.max() < 1e-6, dv
        np.testing.assert_allclose(np.asarray(bf16.joint_cam_normalized),
                                   np.asarray(f32.joint_cam_normalized),
                                   atol=2e-3)


@pytest.mark.slow
class TestTeacherInt8:
    """--teacher-dtype int8 (distill.quantized_teacher_apply): the int8
    teacher must not flip keep decisions vs the fp32 filter on the same
    weights — same contract TestTeacherDtype gates for bfloat16, at the
    coarser precision rung. The threshold is derived from the measured
    f32 variances (largest-gap placement) so the keep set is mixed by
    construction and the margin assertion is meaningful."""

    def _net(self):
        from hand_integral_pose_estimation_tpu.config import ModelConfig
        from hand_integral_pose_estimation_tpu.models import get_pose_net
        cfg = ModelConfig(resnet_type=18, input_shape=(32, 32),
                          output_shape=(8, 8), depth_dim=8,
                          compute_dtype="float32")
        net = get_pose_net(cfg)
        variables = net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 32, 32, 3)))
        return net, variables

    def test_int8_keep_set_matches_fp32(self):
        from hand_integral_pose_estimation_tpu.config import AugmentConfig
        from hand_integral_pose_estimation_tpu.distill.teacher_labels import (
            quantized_teacher_apply,
        )
        from hand_integral_pose_estimation_tpu.ops.integral import (
            softmax_integral,
        )

        rng = np.random.RandomState(11)
        imgs, joints, Ks, bbox = _setup(rng, B=4)
        net, variables = self._net()

        def fp_forward(patches):
            hm = net.apply(variables, patches, train=False)
            return softmax_integral(hm, 21, 8, impl="xla")

        acfg = AugmentConfig()
        probe = generate_filtered_labels(
            fp_forward, imgs, Ks, bbox, jnp.zeros(4, bool), joints,
            num_rotations=5, patch_hw=(32, 32))
        vs = np.sort(np.asarray(probe.variance))
        # threshold in the LARGEST inter-variance gap: int8 shifts
        # predictions more than bf16, so give the keep set the widest
        # margin the fixture offers
        gaps = np.diff(vs)
        g = int(np.argmax(gaps))
        assert 0 < g + 1 < len(vs)       # mixed keep set by construction
        threshold = float((vs[g] + vs[g + 1]) / 2)
        margin = float(gaps[g] / 2)

        int8_forward, q8 = quantized_teacher_apply(
            net, variables, imgs, Ks, bbox, acfg, 21, 8,
            num_rotations=5, patch_hw=(32, 32), forward=fp_forward)
        assert len(q8.paths) > 5, q8.skipped     # really quantized

        out = {}
        for name, fwd in (("fp32", fp_forward), ("int8", int8_forward)):
            out[name] = generate_filtered_labels(
                fwd, imgs, Ks, bbox, jnp.zeros(4, bool), joints,
                num_rotations=5, variance_threshold=threshold,
                patch_hw=(32, 32))
        keep = np.asarray(out["fp32"].keep)
        assert keep.any() and not keep.all(), keep
        np.testing.assert_array_equal(keep, np.asarray(out["int8"].keep))
        # the int8-induced variance shift must sit inside the gap margin,
        # otherwise keep equality above was luck
        dv = np.abs(np.asarray(out["fp32"].variance)
                    - np.asarray(out["int8"].variance))
        assert dv.max() < margin, (dv, margin)


class TestCascade:
    """Early-reject cascade (distill/cascade.py): the subset variance bound
    Var_T >= (n/T)*Var_S makes the two-pass filter's keep set EXACTLY the
    single-pass keep set while skipping the full sweep for most rejected
    samples."""

    @staticmethod
    def _content_teacher(patches):
        """Deterministic function of patch CONTENT (the cascade shows the
        teacher each rotation in different passes, so positional oracles
        don't apply): a corner statistic that moves under rotation for
        structured content and stays put for constant content."""
        # channel 0 only: the fixture's x-ramp gives the corner statistic a
        # FIRST-order response to rotation (channel-averaged diagonal ramps
        # cancel at first order and barely move)
        corner = patches[:, :16, :16, 0].mean(axis=(1, 2)) / 255.0
        full = patches[..., 0].mean(axis=(1, 2)) / 255.0
        # a patch-space-constant prediction still picks up ~0.01 camera
        # variance from the back-projection geometry alone (each rotation
        # re-projects through a different R_z); the amplified corner-full
        # contrast on the x/y label dims pushes structured-content rows
        # decades above that so the fixture separates keeps from
        # (early-)rejects, while it is EXACTLY zero on constant content
        diff = 200.0 * (corner - full)
        base = jnp.stack([diff, -diff, corner], axis=-1)
        scale = jnp.linspace(0.2, 1.0, 21)[None, :, None]
        return base[:, None, :] * scale + 0.25

    def _mixed_setup(self, rng, B=6):
        """Half constant images (zero content variance -> kept), half ramp
        images whose corner statistic swings hard under rotation ->
        rejected, far past the early-reject cutoff."""
        hw = 96
        y, x = np.mgrid[0:hw, 0:hw].astype(np.float32) * (255.0 / hw)
        ramp = np.stack([x, y, (x + y) / 2], axis=-1)
        imgs = np.empty((B, hw, hw, 3), np.float32)
        for b in range(B):
            if b % 2 == 0:
                imgs[b] = 40.0 + 20.0 * b
            else:
                imgs[b] = ramp
        K = np.asarray([[200.0, 0., hw / 2], [0., 200.0, hw / 2],
                        [0., 0., 1.]], np.float32)
        Ks = np.broadcast_to(K, (B, 3, 3))
        cxy = hw / 2 + rng.uniform(-4, 4, (B, 2))
        wh = rng.uniform(28, 36, (B, 2))
        bbox = np.concatenate([cxy, wh], axis=1).astype(np.float32)
        joints = np.asarray(np.array([0., 0., 0.45])
                            + rng.uniform(-0.03, 0.03, (B, 21, 3)),
                            np.float32)
        return imgs, joints, Ks, bbox

    def test_variance_lower_bound_property(self, rng):
        x = rng.randn(50, 21, 21, 3)
        varT = x.var(axis=1).sum(axis=(-2, -1))
        for n in (1, 5, 13, 21):
            idx = np.sort(rng.choice(21, n, replace=False))
            varS = x[:, idx].var(axis=1).sum(axis=(-2, -1))
            assert np.all((n / 21) * varS <= varT + 1e-12)

    def test_pass1_indices(self):
        from hand_integral_pose_estimation_tpu.distill import (
            pass1_rotation_indices,
        )
        np.testing.assert_array_equal(pass1_rotation_indices(21, 5),
                                      [0, 5, 10, 15, 20])
        np.testing.assert_array_equal(pass1_rotation_indices(21, 2), [0, 20])
        np.testing.assert_array_equal(pass1_rotation_indices(9, 9),
                                      np.arange(9))
        for bad in (0, 22):
            try:
                pass1_rotation_indices(21, bad)
                raise AssertionError("expected ValueError")
            except ValueError:
                pass

    # between the ~0.009 geometric variance of constant rows and the ~0.3
    # content variance of noise rows (same role as the reference's 1e-4 on
    # real teachers — the groups sit decades apart either way)
    THRESHOLD = 0.02

    def _run_both(self, rng, labelled_mask, pass1_rotations, T=9):
        from hand_integral_pose_estimation_tpu.distill import CascadeRunner
        imgs, joints, Ks, bbox = self._mixed_setup(rng)
        B = imgs.shape[0]
        single = generate_filtered_labels(
            self._content_teacher, jnp.asarray(imgs), jnp.asarray(Ks),
            jnp.asarray(bbox), jnp.asarray(labelled_mask),
            jnp.asarray(joints), num_rotations=T,
            variance_threshold=self.THRESHOLD, patch_hw=(32, 32))
        runner = CascadeRunner(
            self._content_teacher, num_rotations=T,
            variance_threshold=self.THRESHOLD,
            pass1_rotations=pass1_rotations, pass2_batch=3,
            patch_hw=(32, 32))
        # two fixed-shape batches of 3, second one padded with a dup row
        runner.add_batch(imgs[:3], Ks[:3], bbox[:3], labelled_mask[:3],
                         joints[:3], rows=[0, 1, 2])
        pad = np.concatenate([imgs[3:], imgs[5:]])
        runner.add_batch(pad, np.concatenate([Ks[3:], Ks[5:]]),
                         np.concatenate([bbox[3:], bbox[5:]]),
                         np.concatenate([labelled_mask[3:],
                                         labelled_mask[5:]]),
                         np.concatenate([joints[3:], joints[5:]]),
                         rows=[3, 4, 5, -1])
        merged = runner.finalize(B)
        return single, merged, runner

    def test_keep_set_and_labels_match_single_pass(self, rng):
        labelled = np.zeros(6, bool)
        single, merged, runner = self._run_both(rng, labelled, 3)
        keep1 = np.asarray(single.keep)
        assert keep1.any() and not keep1.all(), keep1
        np.testing.assert_array_equal(merged["keep"], keep1)
        # the noisy rows must exercise the early-reject path
        assert runner.stats["early_rejected"] >= 1, runner.stats
        assert (runner.stats["early_rejected"] + runner.stats["pass2"]
                == runner.stats["total"])
        # kept rows: pseudo-labels and exact variance agree with the
        # single-pass filter (f64 host combine vs fp32 device var)
        full = ~merged["early_rejected"]
        np.testing.assert_allclose(
            merged["joint_cam_normalized"][keep1],
            np.asarray(single.joint_cam_normalized)[keep1],
            rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            merged["variance"][full], np.asarray(single.variance)[full],
            rtol=1e-3, atol=1e-9)
        # early-rejected rows store the LOWER BOUND, which must not exceed
        # the true variance
        lb = merged["variance"][merged["early_rejected"]]
        true = np.asarray(single.variance)[merged["early_rejected"]]
        assert np.all(lb <= true * (1 + 1e-5))

    def test_labelled_rows_finish_in_pass1(self, rng):
        labelled = np.asarray([True, False, True, False, False, False])
        single, merged, runner = self._run_both(rng, labelled, 3)
        np.testing.assert_array_equal(merged["keep"],
                                      np.asarray(single.keep))
        assert runner.stats["labelled"] == 2
        np.testing.assert_allclose(
            merged["joint_cam_normalized"][labelled],
            np.asarray(single.joint_cam_normalized)[labelled],
            rtol=1e-5, atol=1e-7)
        np.testing.assert_array_equal(merged["variance"][labelled], 0.0)

    def test_reset_reuse_and_pass1_bound(self, rng):
        """`reset()` lets one runner (compiled passes kept) run a second
        sweep with identical results; `pass1_bound` stores the (n/T)-scaled
        pass-1 lower bound (0 for labelled rows, never above the true
        variance, and consistent with the early-reject decision)."""
        labelled = np.asarray([True, False, False, False, False, False])
        single, merged, runner = self._run_both(rng, labelled, 3)

        # bound semantics
        np.testing.assert_array_equal(merged["pass1_bound"][labelled], 0.0)
        unlab = ~labelled
        true_var = np.asarray(single.variance)[unlab]
        assert np.all(merged["pass1_bound"][unlab]
                      <= true_var * (1 + 1e-5))
        cutoff = runner.variance_threshold * (1 + runner.safety)
        np.testing.assert_array_equal(
            merged["early_rejected"], merged["pass1_bound"] > cutoff)

        # reset + re-feed the SAME runner with the same rows: identical
        # output (the compiled _pass1/_pass2 survive the reset)
        imgs, joints, Ks, bbox = self._mixed_setup(
            np.random.RandomState(20260816))
        runner.reset()
        assert runner.stats["total"] == 0 and not runner._rows
        runner.add_batch(imgs[:3], Ks[:3], bbox[:3], labelled[:3],
                         joints[:3], rows=[0, 1, 2])
        # same padded second batch as the first sweep (identical shapes ->
        # identical compiled executables -> bitwise-identical rows)
        runner.add_batch(
            np.concatenate([imgs[3:], imgs[5:]]),
            np.concatenate([Ks[3:], Ks[5:]]),
            np.concatenate([bbox[3:], bbox[5:]]),
            np.concatenate([labelled[3:], labelled[5:]]),
            np.concatenate([joints[3:], joints[5:]]), rows=[3, 4, 5, -1])
        merged2 = runner.finalize(6)
        for k in merged:
            np.testing.assert_allclose(merged2[k], merged[k],
                                       rtol=0, atol=0, err_msg=k)

    def test_single_pass_degenerate_cascade(self, rng):
        """pass1_rotations == num_rotations: no pass 2, decisions exact."""
        labelled = np.zeros(6, bool)
        single, merged, runner = self._run_both(rng, labelled, 9, T=9)
        np.testing.assert_array_equal(merged["keep"],
                                      np.asarray(single.keep))
        assert runner.stats["pass2"] == 0
        np.testing.assert_allclose(merged["variance"],
                                   np.asarray(single.variance),
                                   rtol=1e-3, atol=1e-9)


@pytest.mark.slow
class TestMeshFilter:
    """`mesh=` on the teacher filter: the whole per-batch program (warps ->
    teacher -> back-projection -> variance) sharded over `data` must match
    the single-device filter — same program, partitioned batch (the
    reference's DataParallel teacher in its filter loop,
    generate_filtered_teacher_labels.py:403-509)."""

    def _fixture(self, rng, B):
        imgs, joints, Ks, bbox = TestCascade()._mixed_setup(rng, B=B)
        labelled = np.zeros(B, bool)
        labelled[0] = True
        return imgs, joints, Ks, bbox, labelled

    def test_single_pass_matches_single_device(self, rng):
        from hand_integral_pose_estimation_tpu.parallel import make_mesh
        imgs, joints, Ks, bbox, labelled = self._fixture(rng, 8)
        kw = dict(num_rotations=9, variance_threshold=TestCascade.THRESHOLD,
                  patch_hw=(32, 32))
        args = (TestCascade._content_teacher, jnp.asarray(imgs),
                jnp.asarray(Ks), jnp.asarray(bbox), jnp.asarray(labelled),
                jnp.asarray(joints))
        single = generate_filtered_labels(*args, **kw)
        mesh = make_mesh()          # data=8: one sample per device
        assert mesh.shape["data"] == 8
        sharded = generate_filtered_labels(*args, mesh=mesh, **kw)
        np.testing.assert_array_equal(np.asarray(sharded.keep),
                                      np.asarray(single.keep))
        for field in ("joint_cam_normalized", "tprime", "variance",
                      "per_rotation"):
            np.testing.assert_allclose(
                np.asarray(getattr(sharded, field)),
                np.asarray(getattr(single, field)),
                rtol=1e-6, atol=1e-9, err_msg=field)

    def test_cascade_matches_single_device(self, rng):
        import jax as _jax
        from hand_integral_pose_estimation_tpu.distill import CascadeRunner
        from hand_integral_pose_estimation_tpu.parallel import make_mesh
        imgs, joints, Ks, bbox, labelled = self._fixture(rng, 8)
        mesh = make_mesh(devices=_jax.devices()[:4])     # data=4
        outs = {}
        for m in (None, mesh):
            runner = CascadeRunner(
                TestCascade._content_teacher, num_rotations=9,
                variance_threshold=TestCascade.THRESHOLD,
                pass1_rotations=3, pass2_batch=4, patch_hw=(32, 32),
                mesh=m)
            for s in (0, 4):
                runner.add_batch(imgs[s:s+4], Ks[s:s+4], bbox[s:s+4],
                                 labelled[s:s+4], joints[s:s+4],
                                 rows=np.arange(s, s + 4))
            outs[m is None] = runner.finalize(8)
        single, sharded = outs[True], outs[False]
        np.testing.assert_array_equal(sharded["keep"], single["keep"])
        np.testing.assert_array_equal(sharded["early_rejected"],
                                      single["early_rejected"])
        for field in ("joint_cam_normalized", "tprime", "variance"):
            np.testing.assert_allclose(sharded[field], single[field],
                                       rtol=1e-6, atol=1e-9, err_msg=field)

    def test_indivisible_batch_raises(self, rng):
        import jax as _jax
        from hand_integral_pose_estimation_tpu.parallel import make_mesh
        imgs, joints, Ks, bbox, labelled = self._fixture(rng, 6)
        mesh = make_mesh(devices=_jax.devices()[:4])
        try:
            generate_filtered_labels(
                TestCascade._content_teacher, jnp.asarray(imgs),
                jnp.asarray(Ks), jnp.asarray(bbox), jnp.asarray(labelled),
                jnp.asarray(joints), num_rotations=9, patch_hw=(32, 32),
                mesh=mesh)
            raise AssertionError("expected ValueError")
        except ValueError as e:
            assert "divide" in str(e)


class TestPANetTrainer:
    def test_loss_decreases(self, rng):
        pts = rng.randn(64, 21, 3).astype(np.float32) * 0.05
        pts = pts - pts.mean(1, keepdims=True)
        model = PANet(pts_num=21, dict_sizes=(32, 16, 8))
        res = train_panet(model, pts[:48], pts[48:], num_steps=200,
                          batch_size=16, lr=1e-3, eval_every=100)
        assert float(res.train_losses[-1]) < float(res.train_losses[0])
        assert np.isfinite(float(res.best_val_loss))

    def test_best_checkpoint_tracked(self, rng):
        pts = rng.randn(32, 21, 3).astype(np.float32) * 0.05
        model = PANet(pts_num=21, dict_sizes=(16, 8))
        res = train_panet(model, pts[:24], pts[24:], num_steps=100,
                          batch_size=8, eval_every=50)
        assert float(res.best_val_loss) <= float(res.val_losses[-1]) + 1e-9
