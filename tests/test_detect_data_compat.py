"""Reference RCNN config overrides (detect/config_compat.py) and the
aspect-ratio grouped batching pipeline (detect/data.py) — the capability
equivalents of `lib/model_rcnn/utils/config_rcnn.py:339-400` and
`lib/roi_data_layer/{roidb.py:49-74, roibatchLoader.py:37-177}`."""

import numpy as np
import pytest

from hand_integral_pose_estimation_tpu.config import DetectorConfig
from hand_integral_pose_estimation_tpu.detect import config_compat, data


class TestRcnnOverrides:
    def test_cfg_from_list_basic(self):
        cfg = config_compat.cfg_from_list(DetectorConfig(), [
            "TEST.RPN_POST_NMS_TOP_N", "64",
            "TEST.NMS", "0.4",
            "ANCHOR_SCALES", "[2, 4, 8]",
        ])
        assert cfg.rpn_post_nms_top_n_test == 64
        assert cfg.det_nms_thresh == pytest.approx(0.4)
        assert cfg.anchor_scales == (2, 4, 8)

    def test_train_and_test_namespaces(self):
        cfg = config_compat.cfg_from_list(DetectorConfig(), [
            "TRAIN.RPN_POST_NMS_TOP_N", "1000",
            "TRAIN.BATCH_SIZE", "64",
            "TRAIN.FG_FRACTION", "0.5",
            "TEST.SCALES", "(300,)",
            "TEST.MAX_SIZE", "500",
        ])
        assert cfg.rpn_post_nms_top_n_train == 1000
        assert cfg.roi_batch_size == 64
        assert cfg.roi_fg_fraction == pytest.approx(0.5)
        assert cfg.test_scale == 300
        assert cfg.test_max_size == 500

    def test_unknown_key_raises(self):
        # reference _merge_a_into_b: "a must specify keys that are in b"
        with pytest.raises(KeyError):
            config_compat.cfg_from_list(DetectorConfig(),
                                        ["NOT.A.KEY", "1"])

    def test_type_mismatch_raises(self):
        with pytest.raises(ValueError):
            config_compat.cfg_from_list(DetectorConfig(),
                                        ["TEST.MAX_SIZE", "'big'"])

    def test_multi_scale_rejected(self):
        with pytest.raises(ValueError):
            config_compat.cfg_from_list(DetectorConfig(),
                                        ["TEST.SCALES", "(600, 800)"])

    def test_environment_keys_ignored(self):
        base = DetectorConfig()
        cfg = config_compat.cfg_from_list(base, [
            "USE_GPU_NMS", "True", "GPU_ID", "3",
            "TRAIN.SNAPSHOT_PREFIX", "res101_faster_rcnn",
        ])
        assert cfg == base

    def test_pooling_mode(self):
        base = DetectorConfig()
        assert config_compat.cfg_from_list(
            base, ["POOLING_MODE", "align"]) == base
        with pytest.raises(ValueError):
            config_compat.cfg_from_list(base, ["POOLING_MODE", "crop"])

    def test_pixel_means_nested_array(self):
        # reference stores PIXEL_MEANS as a (1, 1, 3) array
        cfg = config_compat.apply_rcnn_overrides(
            DetectorConfig(), {"PIXEL_MEANS": [[[1.0, 2.0, 3.0]]]})
        assert cfg.pixel_means == (1.0, 2.0, 3.0)

    def test_cfg_from_file_reference_format(self, tmp_path):
        # the shape of the reference's cfgs/res101.yml
        y = tmp_path / "res101.yml"
        y.write_text(
            "EXP_DIR: res101\n"
            "POOLING_MODE: align\n"
            "ANCHOR_SCALES: [4, 8, 16, 32]\n"
            "TRAIN:\n"
            "  BATCH_SIZE: 128\n"
            "  BG_THRESH_LO: 0.0\n"
            "TEST:\n"
            "  RPN_POST_NMS_TOP_N: 128\n")
        cfg = config_compat.cfg_from_file(DetectorConfig(), str(y))
        assert cfg.anchor_scales == (4, 8, 16, 32)
        assert cfg.roi_batch_size == 128
        assert cfg.roi_bg_thresh_lo == pytest.approx(0.0)
        assert cfg.rpn_post_nms_top_n_test == 128

    def test_int_float_strictness(self):
        # int field refuses a float (reference asserts type equality)
        with pytest.raises(ValueError):
            config_compat.cfg_from_list(
                DetectorConfig(), ["TEST.RPN_POST_NMS_TOP_N", "64.5"])
        # float field accepts an int literal (widening)
        cfg = config_compat.cfg_from_list(DetectorConfig(),
                                          ["TEST.NMS", "1"])
        assert cfg.det_nms_thresh == pytest.approx(1.0)

    def test_evaluate_cli_wiring(self):
        from hand_integral_pose_estimation_tpu.cli import evaluate
        args = evaluate.build_argparser().parse_args([
            "--set", "TEST.RPN_POST_NMS_TOP_N", "32", "TEST.NMS", "0.45",
        ])
        cfg = evaluate.resolve_detector_cfg(args, DetectorConfig())
        assert cfg.rpn_post_nms_top_n_test == 32
        assert cfg.det_nms_thresh == pytest.approx(0.45)

    def test_cli_overrides_win_over_flags(self):
        from hand_integral_pose_estimation_tpu.cli import evaluate
        args = evaluate.build_argparser().parse_args([
            "--detector-proposals", "300",
            "--set", "TEST.RPN_POST_NMS_TOP_N", "16",
        ])
        cfg = evaluate.resolve_detector_cfg(args, DetectorConfig())
        assert cfg.rpn_post_nms_top_n_test == 16


class TestAspectGrouping:
    def test_rank_clamps_and_flags(self):
        ratios, order, need_crop = data.rank_aspect_ratios(
            widths=[100, 300, 100, 100], heights=[100, 100, 300, 150])
        # ratios: 1.0, 3.0->2.0 (crop), 1/3->0.5 (crop), 2/3
        assert np.allclose(ratios, [0.5, 2 / 3, 1.0, 2.0])
        assert list(order) == [2, 3, 0, 1]
        assert list(need_crop) == [True, False, False, True]

    def test_batch_target_ratio_rules(self):
        # all < 1 -> leftmost; all > 1 -> rightmost; crossing -> 1
        ratios = np.array([0.5, 0.6, 1.2, 1.5])
        idx = np.arange(4)
        below, above = data.aspect_ratio_batches(ratios, idx, 2)
        assert below[1] == pytest.approx(0.5)
        assert above[1] == pytest.approx(1.5)
        (crossing,) = data.aspect_ratio_batches(
            np.array([0.8, 1.3]), np.arange(2), 2)
        assert crossing[1] == pytest.approx(1.0)

    def test_crop_tall_image_keeps_box(self):
        rng = np.random.RandomState(0)
        img = np.arange(400 * 100 * 3, dtype=np.uint8).reshape(400, 100, 3)
        box = np.array([[10.0, 150.0, 90.0, 250.0]])
        out, boxes, (vh, vw) = data.crop_pad_to_ratio(
            img, box, target_ratio=0.5, need_crop=True, rng=rng)
        assert vh == 200 and vw == 100           # trim = W / ratio
        assert out.shape == (200, 100, 3)        # pad_h = ceil(W / ratio)
        # box extent (100 rows) fits in the 200-row window -> fully kept
        assert boxes[0, 3] - boxes[0, 1] == pytest.approx(100.0)
        assert 0 <= boxes[0, 1] and boxes[0, 3] <= vh - 1
        # the crop really is a contiguous slice of the source
        y0 = int(round(150.0 - boxes[0, 1]))
        np.testing.assert_array_equal(out[:vh], img[y0:y0 + vh])

    def test_crop_wide_image_keeps_box(self):
        img = np.zeros((100, 400, 3), np.uint8)
        img[:, 180:220] = 7
        box = np.array([[180.0, 20.0, 219.0, 80.0]])
        out, boxes, (vh, vw) = data.crop_pad_to_ratio(
            img, box, target_ratio=2.0, need_crop=True, rng=None)
        assert vh == 100 and vw == 200
        assert out.shape == (100, 200, 3)
        # the marked stripe survives the centred crop
        x0, x1 = int(boxes[0, 0]), int(boxes[0, 2]) + 1
        assert (out[:vh, x0:x1] == 7).all()

    def test_pad_only_when_no_crop_needed(self):
        img = np.full((100, 80, 3), 5, np.uint8)
        box = np.array([[0.0, 0.0, 79.0, 99.0]])
        out, boxes, (vh, vw) = data.crop_pad_to_ratio(
            img, box, target_ratio=0.8, need_crop=False)
        assert (vh, vw) == (100, 80)
        np.testing.assert_array_equal(out[:100, :80], img)
        assert (out[100:] == 0).all() if out.shape[0] > 100 else True
        np.testing.assert_array_equal(boxes, box)

    def test_build_grouped_batches_dense_and_valid(self):
        rng = np.random.RandomState(3)
        images, boxes = [], []
        for _ in range(10):
            h = int(rng.randint(60, 400))
            w = int(rng.randint(60, 400))
            images.append(rng.randint(0, 255, (h, w, 3)).astype(np.uint8))
            x1, y1 = rng.randint(0, w // 2), rng.randint(0, h // 2)
            boxes.append(np.array(
                [[x1, y1, x1 + w // 4, y1 + h // 4]], np.float32))
        batches = data.build_grouped_batches(images, boxes, batch_size=4,
                                             rng=rng)
        assert sum(len(b[0]) for b in batches) == 10
        seen = set()
        for idx, imgs, bxs, info in batches:
            assert imgs.ndim == 4 and imgs.shape[0] == len(idx)
            for k, i in enumerate(idx):
                seen.add(int(i))
                vh, vw = info[k]
                assert vh <= imgs.shape[1] and vw <= imgs.shape[2]
                # padding outside the valid region is zero
                assert (imgs[k, vh:] == 0).all()
                assert (imgs[k, :, vw:] == 0).all()
                # boxes live inside the valid region
                b = bxs[k]
                assert (b[:, 0] >= 0).all() and (b[:, 2] <= vw - 1).all()
                assert (b[:, 1] >= 0).all() and (b[:, 3] <= vh - 1).all()
        assert seen == set(range(10))

    def test_square_images_pass_through(self):
        # FreiHAND shape: square 224s group trivially, no crop, no pad
        images = [np.ones((224, 224, 3), np.uint8) * i for i in range(4)]
        boxes = [np.array([[10.0, 10.0, 50.0, 50.0]])] * 4
        (batch,) = data.build_grouped_batches(images, boxes, batch_size=4)
        idx, imgs, bxs, info = batch
        assert imgs.shape == (4, 224, 224, 3)
        assert (info == 224).all()
        for k, i in enumerate(idx):
            np.testing.assert_array_equal(imgs[k], images[i])
