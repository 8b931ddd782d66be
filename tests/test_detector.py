"""Detector stack: NMS/ROIAlign vs NumPy oracles, box-transform round trips,
anchor generation vs the reference enumeration, end-to-end forward + training
losses on a tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hand_integral_pose_estimation_tpu.config import DetectorConfig
from hand_integral_pose_estimation_tpu.detect import (
    FasterRCNN,
    anchor_target_layer,
    decode_boxes,
    detect,
    detect_hand_crop_bbox,
    detect_split,
    encode_boxes,
    generate_base_anchors,
    grid_anchors,
    proposal_layer,
    proposal_target_layer,
    rpn_losses,
    smooth_l1,
)
from hand_integral_pose_estimation_tpu.ops.nms import box_iou, nms
from hand_integral_pose_estimation_tpu.ops.roi_align import roi_align


def _np_greedy_nms(boxes, scores, thresh):
    """Sequential greedy NMS oracle (the csrc/cpu/nms_cpu.cpp contract)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            w = max(0.0, xx2 - xx1 + 1)
            h = max(0.0, yy2 - yy1 + 1)
            inter = w * h
            a_i = ((boxes[i, 2] - boxes[i, 0] + 1)
                   * (boxes[i, 3] - boxes[i, 1] + 1))
            a_j = ((boxes[j, 2] - boxes[j, 0] + 1)
                   * (boxes[j, 3] - boxes[j, 1] + 1))
            if inter / (a_i + a_j - inter) > thresh:
                suppressed[j] = True
    return keep


class TestNMSPallas:
    """The fused one-kernel NMS (ops/nms.py:_nms_kernel, the TPU redesign
    of nms.cu:23-131) in interpret mode: identical keep-sets to the oracle
    on the suppression chains, and to the XLA fixpoint on f32 inputs."""

    def _pallas(self, boxes, scores, thresh, top_k, **kw):
        return nms(jnp.asarray(boxes), jnp.asarray(scores), thresh, top_k,
                   impl="pallas", interpret=True, **kw)

    def test_alternating_chain_across_kernel_tiles(self):
        """The alternating chain spanning many 128-box kernel tiles — a
        box's fate depends on a suppressor finalized tiles earlier."""
        n = 1100
        boxes = np.stack([
            np.arange(n) * 4.0, np.zeros(n),
            np.arange(n) * 4.0 + 10.0, np.full(n, 10.0)], axis=1)
        scores = np.linspace(1.0, 0.5, n)
        keep = _np_greedy_nms(boxes, scores, 0.3)
        assert keep == list(range(0, n, 2))
        got_b, _, got_v = self._pallas(boxes, scores, 0.3, n)
        assert int(got_v.sum()) == len(keep)
        np.testing.assert_allclose(np.asarray(got_b)[:len(keep)],
                                   boxes[keep], atol=1e-9)

    def test_matches_xla_impl_random_and_clustered(self, rng):
        """f32 apples-to-apples vs the fixpoint impl: random boxes and the
        realistic clustered-proposal regime (many near-duplicates)."""
        for mode in ("random", "clustered"):
            n = 700
            if mode == "random":
                ctr = rng.rand(n, 2) * 300
                wh = rng.rand(n, 2) * 60 + 5
            else:
                ctr = (rng.rand(n, 2) * 40
                       + np.repeat(rng.rand(7, 2) * 200, 100, axis=0))
                wh = rng.rand(n, 2) * 30 + 20
            boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2],
                                   axis=1).astype(np.float32)
            scores = rng.rand(n).astype(np.float32)
            xb, xs, xv = nms(jnp.asarray(boxes), jnp.asarray(scores),
                             0.7, 300, impl="xla")
            pb, ps, pv = self._pallas(boxes, scores, 0.7, 300)
            np.testing.assert_array_equal(np.asarray(xv), np.asarray(pv))
            np.testing.assert_allclose(np.asarray(xb), np.asarray(pb))

    def test_score_threshold_and_padding(self):
        boxes = np.asarray([[0, 0, 10, 10], [100, 100, 110, 110.0]])
        scores = np.asarray([0.9, 0.0005])
        b, _, v = self._pallas(boxes, scores, 0.5, 5,
                               score_threshold=0.001)
        assert bool(v[0]) and not bool(v[1:].any())
        assert b.shape == (5, 4)

    def test_vmapped_as_in_proposal_layer(self, rng):
        """proposal_layer vmaps nms over the image batch; the custom_vmap
        rule must map onto the kernel's own leading grid dim, per-image
        results identical to the unbatched calls."""
        B, n = 3, 300
        ctr = rng.rand(B, n, 2) * 200
        wh = rng.rand(B, n, 2) * 50 + 5
        boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2],
                               axis=-1).astype(np.float32)
        scores = rng.rand(B, n).astype(np.float32)
        fn = lambda bx, sc: nms(bx, sc, 0.5, 100, impl="pallas",  # noqa: E731
                                interpret=True)
        vb, vs, vv = jax.vmap(fn)(jnp.asarray(boxes), jnp.asarray(scores))
        for i in range(B):
            sb, ss, sv = fn(jnp.asarray(boxes[i]), jnp.asarray(scores[i]))
            np.testing.assert_array_equal(np.asarray(vv[i]),
                                          np.asarray(sv))
            np.testing.assert_allclose(np.asarray(vb[i]), np.asarray(sb))


class TestNMS:
    def test_matches_numpy_oracle(self, rng):
        for trial in range(5):
            n = 60
            ctr = rng.rand(n, 2) * 100
            wh = rng.rand(n, 2) * 40 + 5
            boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2],
                                   axis=1)
            scores = rng.rand(n).astype(np.float64)
            keep = _np_greedy_nms(boxes, scores, 0.5)
            got_b, got_s, got_v = nms(jnp.asarray(boxes),
                                      jnp.asarray(scores), 0.5, n)
            nk = len(keep)
            assert int(got_v.sum()) == nk
            np.testing.assert_allclose(np.asarray(got_b)[:nk],
                                       boxes[keep], atol=1e-9)

    def test_matches_oracle_multi_tile(self, rng):
        # N > 512 exercises the tiled sweep across tile boundaries
        n = 1200
        ctr = rng.rand(n, 2) * 300
        wh = rng.rand(n, 2) * 60 + 5
        boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], axis=1)
        scores = rng.rand(n)
        keep = _np_greedy_nms(boxes, scores, 0.5)
        got_b, _, got_v = nms(jnp.asarray(boxes), jnp.asarray(scores),
                              0.5, 400)
        nk = min(len(keep), 400)
        assert int(got_v.sum()) == nk
        np.testing.assert_allclose(np.asarray(got_b)[:nk], boxes[keep][:nk],
                                   atol=1e-9)

    def test_early_exit_matches_full_sweep(self, rng):
        """early_exit short-circuits the tile sweep once top_k survivors
        are finalized (ops/nms.py:_alive_xla stop_after). Output must be
        bitwise identical to the full sweep: at top_k=8/64 the sweep stops
        after tile 1 of 3; top_k=2000 > N runs every tile AND exercises
        the _compact pad path under the while_loop variant."""
        n = 1400
        ctr = rng.rand(n, 2) * 560 + 40
        wh = rng.rand(n, 2) * 70 + 10
        boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], axis=1)
        scores = rng.rand(n).astype(np.float32)
        for top_k in (8, 64, 300, 2000):
            full = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                       top_k, early_exit=False)
            fast = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                       top_k, early_exit=True)
            for a, b in zip(full, fast):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_alternating_suppression_chain(self):
        """A line of boxes where each overlaps only its neighbours: greedy
        keeps alternating members — the case where the within-tile fixpoint
        needs its full iteration depth (naive one-shot masking would
        over-suppress: box 2 is saved because box 1 died to box 0)."""
        n = 40
        # spacing 4, width 11 (+1 convention): neighbour IoU 0.467 (> 0.3),
        # next-but-one IoU 0.158 (< 0.3)
        boxes = np.stack([
            np.arange(n) * 4.0, np.zeros(n),
            np.arange(n) * 4.0 + 10.0, np.full(n, 10.0)], axis=1)
        scores = np.linspace(1.0, 0.5, n)     # descending along the chain
        keep = _np_greedy_nms(boxes, scores, 0.3)
        assert keep == list(range(0, n, 2))   # alternating survivors
        got_b, _, got_v = nms(jnp.asarray(boxes), jnp.asarray(scores),
                              0.3, n)
        assert int(got_v.sum()) == len(keep)
        np.testing.assert_allclose(np.asarray(got_b)[:len(keep)],
                                   boxes[keep], atol=1e-9)

    def test_chain_across_tile_boundary(self):
        """The same alternating chain spanning several 512-box tiles: a
        box's fate can depend on a suppressor in the previous tile."""
        n = 1100
        boxes = np.stack([
            np.arange(n) * 4.0, np.zeros(n),
            np.arange(n) * 4.0 + 10.0, np.full(n, 10.0)], axis=1)
        scores = np.linspace(1.0, 0.5, n)
        keep = _np_greedy_nms(boxes, scores, 0.3)
        got_b, _, got_v = nms(jnp.asarray(boxes), jnp.asarray(scores),
                              0.3, n)
        assert int(got_v.sum()) == len(keep)
        np.testing.assert_allclose(np.asarray(got_b)[:len(keep)],
                                   boxes[keep], atol=1e-9)

    def test_fixed_output_padding(self, rng):
        boxes = jnp.asarray([[0, 0, 10, 10], [100, 100, 110, 110.0]])
        scores = jnp.asarray([0.9, 0.8])
        b, s, v = nms(boxes, scores, 0.5, top_k=5)
        assert b.shape == (5, 4)
        assert bool(v[0]) and bool(v[1]) and not bool(v[2:].any())
        np.testing.assert_allclose(np.asarray(b)[2:], 0.0)

    def test_score_threshold(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [100, 100, 110, 110.0]])
        scores = jnp.asarray([0.9, 0.0005])
        _, _, v = nms(boxes, scores, 0.5, 2, score_threshold=0.001)
        assert bool(v[0]) and not bool(v[1])

    def test_iou_values(self):
        a = jnp.asarray([[0.0, 0, 9, 9]])     # 10x10 with +1 convention
        b = jnp.asarray([[5.0, 0, 14, 9]])    # overlap 5x10 = 50
        iou = box_iou(a, b)
        np.testing.assert_allclose(iou, 50.0 / 150.0, atol=1e-9)


class TestRoiAlign:
    def _np_roi_align(self, feat, roi, pooled, ratio, scale):
        """Direct NumPy transcription of the CUDA sampling scheme."""
        H, W, C = feat.shape
        x1, y1, x2, y2 = roi * scale
        rw = max(x2 - x1, 1.0)
        rh = max(y2 - y1, 1.0)
        bw, bh = rw / pooled, rh / pooled
        out = np.zeros((pooled, pooled, C))
        for py in range(pooled):
            for px in range(pooled):
                acc = np.zeros(C)
                for iy in range(ratio):
                    for ix in range(ratio):
                        y = y1 + py * bh + (iy + 0.5) * bh / ratio
                        x = x1 + px * bw + (ix + 0.5) * bw / ratio
                        if y < -1.0 or y > H or x < -1.0 or x > W:
                            continue
                        y = min(max(y, 0.0), H - 1)
                        x = min(max(x, 0.0), W - 1)
                        y0, x0 = int(y), int(x)
                        y1c, x1c = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
                        ly, lx = y - y0, x - x0
                        acc += ((1 - ly) * (1 - lx) * feat[y0, x0]
                                + (1 - ly) * lx * feat[y0, x1c]
                                + ly * (1 - lx) * feat[y1c, x0]
                                + ly * lx * feat[y1c, x1c])
                out[py, px] = acc / (ratio * ratio)
        return out

    def test_matches_numpy_oracle(self, rng):
        feat = rng.rand(16, 20, 3)
        rois = np.array([[10.0, 8.0, 150.0, 120.0],
                         [0.0, 0.0, 320.0, 256.0],
                         [40.0, 40.0, 90.0, 100.0]])
        got = roi_align(jnp.asarray(feat), jnp.asarray(rois),
                        pooled_size=7, spatial_scale=1 / 16.0,
                        sampling_ratio=2)
        for r in range(3):
            want = self._np_roi_align(feat, rois[r], 7, 2, 1 / 16.0)
            np.testing.assert_allclose(got[r], want, atol=1e-8)

    def test_gradients_flow(self, rng):
        feat = jnp.asarray(rng.rand(8, 8, 2).astype(np.float32))
        rois = jnp.asarray([[0.0, 0.0, 64.0, 64.0]])
        g = jax.grad(lambda f: roi_align(f, rois, 4, 1 / 16.0, 2).sum())(feat)
        assert float(jnp.abs(g).sum()) > 0

    def test_pallas_grouped_kernel_matches_xla(self, rng):
        """The VMEM-resident combined-weight kernel (interpret mode here)
        equals the XLA vmap formulation — including tile-padding (H*W not
        8-aligned) and an roi count not divisible by the group size."""
        from hand_integral_pose_estimation_tpu.ops.roi_align import (
            roi_align_batched,
        )
        B, H, W, C, R = 2, 21, 19, 256, 13
        feats = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        rois = rng.uniform(0, 250, (B, R, 4)).astype(np.float32)
        rois = np.concatenate([rois[..., :2], rois[..., :2] + 40], axis=-1)
        rois = jnp.asarray(rois)
        want = roi_align_batched(feats, rois, 7, 1 / 16.0, 2, impl="xla")
        got = roi_align_batched(feats, rois, 7, 1 / 16.0, 2,
                                impl="pallas", interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


class TestBoxTransforms:
    def test_encode_decode_roundtrip(self, rng):
        anchors = jnp.asarray(rng.rand(20, 4) * 50)
        anchors = anchors.at[:, 2:].add(anchors[:, :2] + 10)
        gt = jnp.asarray(rng.rand(20, 4) * 50)
        gt = gt.at[:, 2:].add(gt[:, :2] + 10)
        rec = decode_boxes(anchors, encode_boxes(anchors, gt))
        np.testing.assert_allclose(rec, gt, atol=1e-6)

    def test_base_anchors_reference_values(self):
        """Spot-check against the well-known caffe anchor enumeration for
        base 16, ratios (0.5, 1, 2), scales (8, 16, 32)."""
        a = generate_base_anchors(16, (0.5, 1.0, 2.0), (8, 16, 32))
        np.testing.assert_allclose(a[0], [-84.0, -40.0, 99.0, 55.0])
        np.testing.assert_allclose(a[3], [-56.0, -56.0, 71.0, 71.0])
        np.testing.assert_allclose(a[8], [-168.0, -344.0, 183.0, 359.0])

    def test_grid_anchor_count_and_stride(self):
        g = grid_anchors((4, 5), 16)
        assert g.shape == (4 * 5 * 9, 4)
        # anchor at cell (0,1) = base anchor shifted by 16 in x
        np.testing.assert_allclose(g[9] - g[0], [16.0, 0, 16.0, 0])

    def test_smooth_l1(self):
        d = jnp.asarray([0.05, 2.0])
        out = smooth_l1(d, sigma=3.0)
        np.testing.assert_allclose(out[0], 0.5 * 9 * 0.05 ** 2, atol=1e-8)
        np.testing.assert_allclose(out[1], 2.0 - 0.5 / 9, atol=1e-8)


class TestTargetLayers:
    def test_anchor_targets_basic(self, rng):
        # small scales so anchors fit inside the 64px test image
        base = generate_base_anchors(16, (0.5, 1.0, 2.0), (1, 2))
        anchors = grid_anchors((4, 4), 16, base)
        gt = jnp.asarray([[10.0, 10.0, 40.0, 40.0], [0.0, 0, 0, 0]])
        gv = jnp.asarray([True, False])
        t = anchor_target_layer(jax.random.PRNGKey(0), anchors, gt, gv,
                                (64, 64), DetectorConfig())
        assert int(t.fg_mask.sum()) >= 1
        # all positives must overlap the gt box decently
        iou = np.asarray(box_iou(anchors, gt))[:, 0]
        assert (iou[np.asarray(t.fg_mask)] > 0).all()
        # fg regression targets decode back to the gt box
        dec = decode_boxes(anchors, t.bbox_targets)
        fg = np.asarray(t.fg_mask)
        np.testing.assert_allclose(np.asarray(dec)[fg],
                                   np.tile(gt[0], (fg.sum(), 1)), atol=1e-4)

    def test_proposal_targets_composition(self, rng):
        cfg = DetectorConfig(roi_batch_size=16, roi_fg_fraction=0.25)
        rois = jnp.asarray(rng.rand(30, 4) * 40)
        rois = rois.at[:, 2:].add(rois[:, :2] + 20)
        gt = jnp.asarray([[10.0, 10.0, 60.0, 60.0]])
        t = proposal_target_layer(
            jax.random.PRNGKey(1), rois, jnp.ones(30, bool), gt,
            jnp.asarray([1]), jnp.asarray([True]), cfg)
        assert t.rois.shape == (16, 4)
        # at most 4 fg (25% of 16); gt box itself guarantees >= 1
        assert 1 <= int(t.fg_mask.sum()) <= 4
        assert (np.asarray(t.labels)[np.asarray(t.fg_mask)] == 1).all()


@pytest.fixture(scope="module")
def tiny_detector():
    cfg = DetectorConfig(
        resnet_type=18, test_scale=64, test_max_size=64,
        rpn_pre_nms_top_n_test=64, rpn_post_nms_top_n_test=16,
        rpn_pre_nms_top_n_train=64, rpn_post_nms_top_n_train=16,
        roi_batch_size=8, max_detections=5, rpn_min_size=2)
    model = FasterRCNN(cfg=cfg)
    img = jnp.zeros((1, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        img)
    return model, variables, cfg


class TestFasterRCNN:
    def test_inference_shapes(self, tiny_detector, rng):
        model, variables, cfg = tiny_detector
        img = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255)
        out = model.apply(variables, img, train=False)
        assert out.rois.shape == (1, 16, 4)
        assert out.cls_scores.shape == (1, 16, 2)
        np.testing.assert_allclose(out.cls_scores.sum(-1), 1.0, atol=1e-5)

    def test_training_losses(self, tiny_detector, rng):
        model, variables, cfg = tiny_detector
        img = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255)
        gt = jnp.asarray([[[10.0, 10.0, 50.0, 50.0]]])
        out = model.apply(variables, img, train=True, gt_boxes=gt,
                          gt_classes=jnp.asarray([[1]]),
                          gt_valid=jnp.asarray([[True]]),
                          rngs={"sampling": jax.random.PRNGKey(2)})
        assert out.losses is not None
        for k, v in out.losses.items():
            assert np.isfinite(float(v)), k

    def test_serving_preset_shrinks_roi_tail(self, tiny_detector, rng):
        # DetectorConfig.serving(): identical params tree, only the
        # test-time post-NMS proposal count changes (PERFORMANCE.md
        # "Proposal-count serving knob")
        model, variables, cfg = tiny_detector
        scfg = cfg.serving(8)
        assert scfg.rpn_post_nms_top_n_test == 8
        assert scfg.rpn_post_nms_top_n_train == cfg.rpn_post_nms_top_n_train
        assert DetectorConfig().serving().rpn_post_nms_top_n_test == 64
        # dtype knob: default leaves the parity f32; "bfloat16" switches
        # only the conv-stack compute dtype (PERFORMANCE.md round 5)
        assert DetectorConfig().serving().compute_dtype == "float32"
        bcfg = cfg.serving(8, dtype="bfloat16")
        assert (bcfg.compute_dtype, bcfg.rpn_post_nms_top_n_test) == \
            ("bfloat16", 8)
        img = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255)
        out = FasterRCNN(cfg=scfg).apply(variables, img, train=False)
        assert out.rois.shape == (1, 8, 4)
        assert out.cls_scores.shape == (1, 8, 2)

    def test_detect_facade(self, tiny_detector, rng):
        model, variables, cfg = tiny_detector
        img = jnp.asarray(rng.randint(0, 255, (2, 64, 64, 3)), jnp.uint8)
        det = detect(model, variables, img, cfg)
        assert det.boxes.shape == (2, 5, 4)
        crop = detect_hand_crop_bbox(model, variables, img, cfg)
        assert crop.shape == (2, 4)
        assert bool(jnp.isfinite(crop).all())

    def test_split_programs_match_monolith(self, tiny_detector, rng):
        # detect_split dispatches upstream/downstream as two XLA programs
        # (the one-program compile loses ~29 % to layout/scheduling,
        # PERFORMANCE.md round-5 detector section); outputs must match the
        # monolith facade
        model, variables, cfg = tiny_detector
        img = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 255)
        mono = detect(model, variables, img, cfg)
        split = detect_split(model, variables, img, cfg)
        np.testing.assert_allclose(split.boxes, mono.boxes, atol=1e-4)
        np.testing.assert_allclose(split.scores, mono.scores, atol=1e-5)
        np.testing.assert_array_equal(split.valid, mono.valid)
        crop_m = detect_hand_crop_bbox(model, variables, img, cfg)
        crop_s = detect_hand_crop_bbox(model, variables, img, cfg,
                                       split=True)
        np.testing.assert_allclose(crop_s, crop_m, atol=1e-4)

    def test_upstream_downstream_compose_to_call(self, tiny_detector, rng):
        # the apply-method halves must be the SAME forward as __call__
        # (inference): feats/rois round-trip through the method boundary
        model, variables, cfg = tiny_detector
        img = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255)
        full = model.apply(variables, img, train=False)
        feats, rois, valid = model.apply(variables, img, method="upstream")
        half = model.apply(variables, feats, rois, valid,
                           method="downstream")
        np.testing.assert_array_equal(half.rois, full.rois)
        np.testing.assert_allclose(half.cls_scores, full.cls_scores,
                                   atol=1e-6)
        np.testing.assert_allclose(half.bbox_deltas, full.bbox_deltas,
                                   atol=1e-6)


class TestDetectorData:
    def test_gt_bbox_and_batch(self, rng):
        from hand_integral_pose_estimation_tpu.data.freihand import (
            SyntheticFreiHand,
        )
        from hand_integral_pose_estimation_tpu.detect.data import (
            build_detector_batch,
        )
        ds = SyntheticFreiHand(n=8)
        batch = build_detector_batch(ds, np.arange(4))
        assert batch.gt_boxes.shape == (4, 1, 4)
        assert (batch.gt_boxes[:, 0, 2] > batch.gt_boxes[:, 0, 0]).all()
        assert batch.gt_valid.all() and (batch.gt_classes[:, 0] == 1).all()

    def test_voc_ap_perfect_detections(self):
        from hand_integral_pose_estimation_tpu.detect.data import (
            evaluate_detections,
        )
        gt = [np.array([[10.0, 10, 50, 50]]), np.array([[20.0, 20, 80, 80]])]
        det = [g.copy() for g in gt]
        scores = [np.array([0.9]), np.array([0.8])]
        out = evaluate_detections(det, scores, gt)
        np.testing.assert_allclose(out["ap"], 1.0)

    def test_voc_ap_with_false_positives(self):
        from hand_integral_pose_estimation_tpu.detect.data import (
            evaluate_detections,
        )
        gt = [np.array([[10.0, 10, 50, 50]])]
        det = [np.array([[10.0, 10, 50, 50], [200.0, 200, 220, 220]])]
        scores = [np.array([0.9, 0.95])]  # FP outranks the TP
        out = evaluate_detections(det, scores, gt)
        assert 0.0 < out["ap"] < 1.0

    def test_voc_ap_missed_gt_lowers_recall(self):
        from hand_integral_pose_estimation_tpu.detect.data import (
            evaluate_detections,
        )
        gt = [np.array([[10.0, 10, 50, 50], [100.0, 100, 150, 150]])]
        det = [np.array([[10.0, 10, 50, 50]])]
        scores = [np.array([0.9])]
        out = evaluate_detections(det, scores, gt)
        np.testing.assert_allclose(out["recall"][-1], 0.5)
        np.testing.assert_allclose(out["ap"], 0.5)


class TestDetectorTrainer:
    def test_train_step_runs_and_updates(self, tiny_detector, rng):
        from hand_integral_pose_estimation_tpu.training.detector_trainer import (
            create_detector_train_state,
            make_detector_optimizer,
            make_detector_train_step,
        )
        model, _, cfg = tiny_detector
        tx = make_detector_optimizer(lr=1e-3)
        state, tx = create_detector_train_state(
            model, jax.random.PRNGKey(0), sample_hw=(64, 64), tx=tx)
        step = make_detector_train_step(model, tx)

        imgs = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255)
        gt = jnp.asarray([[[12.0, 12.0, 52.0, 52.0]]])
        losses = []
        for i in range(3):
            state, metrics = step(state, imgs, gt, jnp.asarray([[1]]),
                                  jnp.asarray([[True]]),
                                  jax.random.PRNGKey(i))
            assert np.isfinite(float(metrics["loss"]))
            losses.append(float(metrics["loss"]))
        assert int(state.step) == 3


class TestTwoStagePipeline:
    def test_end_to_end(self, tiny_detector, rng):
        """Raw image -> detect -> crop -> pose -> metric joints in ONE jitted
        program (BASELINE config #4 path)."""
        import dataclasses
        from hand_integral_pose_estimation_tpu.config import (
            Config, ModelConfig,
        )
        from hand_integral_pose_estimation_tpu.inference import (
            TwoStagePipeline,
        )
        from hand_integral_pose_estimation_tpu.models import get_pose_net

        det_model, det_vars, det_cfg = tiny_detector
        cfg = Config(
            model=ModelConfig(resnet_type=18, input_shape=(64, 64),
                              output_shape=(16, 16), depth_dim=8,
                              compute_dtype="float32"),
            detector=det_cfg)
        pose = get_pose_net(cfg.model)
        pose_vars = pose.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 64, 64, 3)))

        pipe = TwoStagePipeline(cfg, pose, pose_vars, det_model, det_vars)
        imgs = jnp.asarray(rng.randint(0, 255, (2, 64, 64, 3)), jnp.uint8)
        K = jnp.broadcast_to(
            jnp.asarray([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1.0]]),
            (2, 3, 3))
        out = pipe(imgs, K, jnp.ones(2))
        assert out.joints_cam.shape == (2, 21, 3)
        assert bool(jnp.isfinite(out.joints_cam).all())
        assert out.crop_bbox.shape == (2, 4)
        assert bool((out.crop_bbox[:, 2:] > 0).all())  # positive crop size
        assert bool(jnp.isfinite(out.tprime).all())
        # (the bone-rescale contract itself is covered by
        # TestChallengeDump.test_pred_json_structure with real geometry; an
        # untrained net decodes all joints to the same point, which makes an
        # exact bone assertion fp-degenerate here)

        # split_detector=True: same pipeline as 3 dispatches (det upstream,
        # det downstream + crop, pose program) — must match the monolith
        from hand_integral_pose_estimation_tpu.inference import (
            TwoStagePipeline as TSP,
        )
        split_pipe = TSP(cfg, pose, pose_vars, det_model, det_vars,
                         split_detector=True)
        out_s = split_pipe(imgs, K, jnp.ones(2))
        np.testing.assert_allclose(out_s.crop_bbox, out.crop_bbox,
                                   atol=1e-4)
        np.testing.assert_allclose(out_s.joints_cam, out.joints_cam,
                                   rtol=1e-4, atol=1e-5)
        # the knob refuses the combinations it can't honour
        import pytest as _pytest
        from jax.sharding import Mesh
        with _pytest.raises(ValueError, match="mesh"):
            TSP(cfg, pose, pose_vars, det_model, det_vars,
                split_detector=True,
                mesh=Mesh(np.array(jax.devices()[:1]), ("data",)))


class TestBuildDetector:
    def test_missing_explicit_ckpt_raises(self, tmp_path):
        """A typo'd --detector-ckpt must fail loudly, not silently evaluate
        fresh weights to near-zero AP (ADVICE r3 #3)."""
        from hand_integral_pose_estimation_tpu.detect.load import (
            build_detector,
        )
        cfg = DetectorConfig(resnet_type=18, test_scale=64,
                             test_max_size=64)
        for name in ("nope.pth", "nope_orbax_dir"):
            with pytest.raises(FileNotFoundError,
                               match="detector checkpoint"):
                build_detector(cfg, str(tmp_path / name),
                               log=lambda *a: None)


class TestDetectorBBoxDb:
    def test_generate_save_load_attach(self, tiny_detector, tmp_path, rng):
        """Detector crop-box db (FreiHand.py:286-341,382-409 equivalent):
        batched generation with tail padding, npz cache roundtrip, and
        host_batch emitting the attached boxes."""
        from hand_integral_pose_estimation_tpu.data import detector_db
        from hand_integral_pose_estimation_tpu.data.freihand import (
            SyntheticFreiHand,
        )
        model, variables, cfg = tiny_detector
        ds = SyntheticFreiHand(n=5, image_hw=(64, 64), seed=4)
        bbox = detector_db.generate_detector_bboxes(
            ds, model, variables, cfg, batch_size=2)
        assert bbox.shape == (5, 4)
        assert np.isfinite(bbox).all()
        assert (bbox[:, 2:] > 0).all()          # positive (w, h)
        # square + pad x1.75 crop-box contract (augment.py:326-342)
        np.testing.assert_allclose(bbox[:, 2], bbox[:, 3], rtol=1e-5)

        path = str(tmp_path / "bbox_db.npz")
        detector_db.save_bbox_db(path, ds, bbox)
        names, loaded = detector_db.load_bbox_db(path)
        np.testing.assert_allclose(loaded, bbox)
        detector_db.attach_detector_bboxes(ds, loaded, names)
        host = ds.host_batch(np.arange(3))
        np.testing.assert_allclose(host["bbox_detector"], bbox[:3])

    def test_stale_cache_detected(self, tiny_detector, tmp_path):
        from hand_integral_pose_estimation_tpu.data import detector_db
        from hand_integral_pose_estimation_tpu.data.freihand import (
            SyntheticFreiHand,
        )
        ds5 = SyntheticFreiHand(n=5, image_hw=(64, 64))
        ds3 = SyntheticFreiHand(n=3, image_hw=(64, 64))
        bbox = np.tile([32.0, 32.0, 20.0, 20.0], (5, 1)).astype(np.float32)
        path = str(tmp_path / "bbox_db.npz")
        detector_db.save_bbox_db(path, ds5, bbox)
        names, loaded = detector_db.load_bbox_db(path)
        with pytest.raises((ValueError, AssertionError)):
            detector_db.attach_detector_bboxes(ds3, loaded[:3], names)

    def test_ensure_uses_cache(self, tiny_detector, tmp_path):
        """ensure_detector_bboxes must not run the detector when a matching
        cache exists (the reference's pickle-cache fast path)."""
        from hand_integral_pose_estimation_tpu.data import detector_db
        from hand_integral_pose_estimation_tpu.data.freihand import (
            SyntheticFreiHand,
        )
        model, variables, cfg = tiny_detector
        ds = SyntheticFreiHand(n=4, image_hw=(64, 64))
        bbox = np.tile([30.0, 30.0, 22.0, 22.0], (4, 1)).astype(np.float32)
        path = str(tmp_path / "bbox_db.npz")
        detector_db.save_bbox_db(path, ds, bbox)
        # detector=None would crash if the cache were ignored
        detector_db.ensure_detector_bboxes(ds, None, None, cache_path=path)
        host = ds.host_batch(np.arange(4))
        np.testing.assert_allclose(host["bbox_detector"], bbox)


class TestNativeDetectorPreset:
    def test_native_preset_is_the_study_recipe(self):
        """DetectorConfig.native == the detector-convergence study config
        (its AP-0.98 quality evidence must stay attached to the same
        values)."""
        from hand_integral_pose_estimation_tpu.cli.detector_convergence import (
            study_config,
        )
        from hand_integral_pose_estimation_tpu.config import DetectorConfig

        assert DetectorConfig.native(224, 18) == study_config((224, 224), 18)
        assert DetectorConfig.native(128, 50, max_size=256) == study_config(
            (128, 256), 50)
        cfg = DetectorConfig.native()
        assert cfg.test_scale == 224 and cfg.test_max_size == 224
        assert cfg.norm == "group" and not cfg.freeze_bn
        assert cfg.rpn_post_nms_top_n_test == 64

    def test_evaluate_cli_resolution(self):
        """--detector-native starts from the preset; explicit flags
        override; without the flag the reference-parity defaults hold."""
        from hand_integral_pose_estimation_tpu.cli import evaluate as ecli
        from hand_integral_pose_estimation_tpu.config import DetectorConfig

        base = DetectorConfig()
        p = ecli.build_argparser()

        args = p.parse_args([])
        cfg = ecli.resolve_detector_cfg(args, base)
        assert cfg.test_scale == 600 and cfg.test_max_size == 1000
        assert cfg.resnet_type == 101 and cfg.norm == "batch"
        assert cfg.freeze_bn and cfg.rpn_post_nms_top_n_test == 300

        args = p.parse_args(["--detector-native"])
        cfg = ecli.resolve_detector_cfg(args, base)
        assert cfg.test_scale == 224 and cfg.test_max_size == 224
        assert cfg.resnet_type == 18 and cfg.norm == "group"
        assert not cfg.freeze_bn and cfg.rpn_post_nms_top_n_test == 64
        assert cfg.anchor_scales == (2, 4, 8, 12)

        args = p.parse_args(["--detector-native", "--detector-scale", "128",
                             "--detector-resnet", "50",
                             "--detector-proposals", "32"])
        cfg = ecli.resolve_detector_cfg(args, base)
        assert cfg.test_scale == 128 and cfg.test_max_size == 128
        assert cfg.resnet_type == 50
        assert cfg.rpn_post_nms_top_n_test == 32

        # old-style explicit knobs without the preset behave as before
        args = p.parse_args(["--detector-scale", "64",
                             "--detector-resnet", "18",
                             "--detector-proposals", "16"])
        cfg = ecli.resolve_detector_cfg(args, base)
        assert cfg.test_scale == 64 and cfg.test_max_size == 64
        assert cfg.resnet_type == 18 and cfg.norm == "batch"
        assert cfg.freeze_bn and cfg.anchor_scales == base.anchor_scales


class TestEvaluateCLI:
    def test_pred_json_from_images_alone(self, tmp_path):
        """Integration: the evaluate CLI runs the jitted two-stage
        detect->crop->pose program on images with NO GT joints and produces
        a valid challenge pred.json (+ bbox cache), then reuses the cache on
        a second run (VERDICT item 2)."""
        import json
        from hand_integral_pose_estimation_tpu.cli import evaluate as ecli

        res = tmp_path / "res"
        db = tmp_path / "bbox.npz"
        argv = [
            "--synthetic", "--synthetic-size", "5", "--batch-size", "2",
            "--use-detector",
            "--detector-resnet", "18", "--detector-scale", "64",
            "--detector-proposals", "16",
            "--pose-resnet", "18", "--pose-input", "64",
            "--model-dir", str(tmp_path / "no_ckpt"),
            "--result-dir", str(res), "--bbox-db", str(db),
        ]
        ecli.main(argv)
        assert db.exists()
        pred = json.load(open(res / "pred.json"))
        xyz, verts = pred
        assert len(xyz) == 5 and len(verts) == 5
        arr = np.asarray(xyz)
        assert arr.shape == (5, 21, 3)
        assert np.isfinite(arr).all()
        # second run consumes the cached db (no detector sweep)
        ecli.main(argv)
        assert np.isfinite(np.asarray(
            json.load(open(res / "pred.json"))[0])).all()

    @pytest.mark.slow
    def test_int8_two_stage(self, tmp_path):
        """--int8: both nets quantized through the pipeline (first-batch
        calibration) and the sweep still dumps a finite pred.json."""
        import json
        import pytest
        from hand_integral_pose_estimation_tpu.cli import evaluate as ecli

        res = tmp_path / "res_int8"
        db = str(tmp_path / "q8")
        argv = [
            "--synthetic", "--synthetic-size", "4", "--batch-size", "2",
            "--use-detector", "--int8", "--int8-db", db,
            "--detector-resnet", "18", "--detector-scale", "64",
            "--detector-proposals", "16",
            "--pose-resnet", "18", "--pose-input", "64",
            "--model-dir", str(tmp_path / "no_ckpt"),
            "--result-dir", str(res),
        ]
        ecli.main(argv)
        xyz = np.asarray(json.load(open(res / "pred.json"))[0])
        assert xyz.shape == (4, 21, 3)
        assert np.isfinite(xyz).all()
        # calibration persisted the bundles; a second run reuses them
        # (calibrate once, ship everywhere) and reproduces the dump exactly
        assert (tmp_path / "q8.pose.npz").exists()
        assert (tmp_path / "q8.det.npz").exists()
        ecli.main(argv)
        xyz2 = np.asarray(json.load(open(res / "pred.json"))[0])
        np.testing.assert_array_equal(xyz2, xyz)

        # --int8 without the detector path must fail loudly, not silently
        # run the fp Tester sweep
        with pytest.raises(SystemExit, match="two-stage"):
            ecli.main(["--synthetic", "--synthetic-size", "4", "--int8",
                       "--pose-resnet", "18", "--pose-input", "64",
                       "--model-dir", str(tmp_path / "no_ckpt"),
                       "--result-dir", str(res)])


class TestVGGBackbone:
    def test_vgg_base_stride16(self, rng):
        from hand_integral_pose_estimation_tpu.detect.vgg import (
            VGG16Base, VGG16Tail,
        )
        m = VGG16Base()
        x = jnp.zeros((1, 64, 64, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        assert y.shape == (1, 4, 4, 512)
        tail = VGG16Tail()
        vt = tail.init(jax.random.PRNGKey(1), jnp.zeros((2, 7, 7, 512)))
        h = tail.apply(vt, jnp.zeros((2, 7, 7, 512)))
        assert h.shape == (2, 4096)
