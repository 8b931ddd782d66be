"""Synthetic detector dataset, flip augmentation, and convergence study.

The full TPU study (cli/detector_convergence.py, AP >= 0.9 in 600 steps) is
recorded in PERFORMANCE.md; here we cover the dataset/augmentation contracts
and — gated behind HIPE_RUN_SLOW=1 — a miniature convergence run asserting
AP rises from ~0, which exercises the exact train-step/eval loop the study
uses.
"""

import os

import numpy as np
import pytest

from hand_integral_pose_estimation_tpu.detect.data import (
    evaluate_detections,
    gt_bbox_from_keypoints,
)
from hand_integral_pose_estimation_tpu.detect.synthetic import (
    flip_batch,
    make_synthetic_box_dataset,
)

run_slow = pytest.mark.skipif(
    os.environ.get("HIPE_RUN_SLOW", "") != "1",
    reason="set HIPE_RUN_SLOW=1 to run the mini convergence study")


class TestSyntheticBoxes:
    def test_shapes_and_bounds(self):
        ds = make_synthetic_box_dataset(6, (96, 128), min_size=24,
                                        max_size=48, seed=3)
        assert ds.images.shape == (6, 96, 128, 3)
        assert ds.images.dtype == np.uint8
        for b in ds.gt_boxes:
            assert b.shape == (1, 4)
            x1, y1, x2, y2 = b[0]
            assert 0 <= x1 < x2 <= 127 and 0 <= y1 < y2 <= 95
            # target must be at least roughly min_size across
            assert (x2 - x1) >= 16 and (y2 - y1) >= 16

    def test_target_is_skin_toned_inside_box(self):
        ds = make_synthetic_box_dataset(4, (128, 128), seed=1,
                                        distractors=False, min_size=48,
                                        max_size=64)
        for img, box in zip(ds.images, ds.gt_boxes):
            x1, y1, x2, y2 = box[0].astype(int)
            inside = img[y1:y2 + 1, x1:x2 + 1].reshape(-1, 3).mean(0)
            # the palm ellipse dominates the box; skin is red-heavy
            assert inside[0] > inside[2]

    def test_deterministic_by_seed(self):
        a = make_synthetic_box_dataset(3, (64, 64), seed=7)
        b = make_synthetic_box_dataset(3, (64, 64), seed=7)
        np.testing.assert_array_equal(a.images, b.images)
        for ba, bb in zip(a.gt_boxes, b.gt_boxes):
            np.testing.assert_array_equal(ba, bb)


class TestFlipBatch:
    def test_flip_geometry(self):
        rng = np.random.RandomState(0)
        imgs = rng.randint(0, 255, (4, 32, 48, 3), np.uint8)
        boxes = np.array([[[2.0, 3.0, 10.0, 20.0]]] * 4)
        mask = np.array([True, False, True, False])
        fi, fb = flip_batch(imgs, boxes, mask)
        np.testing.assert_array_equal(fi[1], imgs[1])
        np.testing.assert_array_equal(fi[0], imgs[0][:, ::-1])
        # x1' = W - x2 - 1, x2' = W - x1 - 1 (roi_data_layer convention)
        np.testing.assert_allclose(fb[0, 0], [48 - 10 - 1, 3, 48 - 2 - 1, 20])
        np.testing.assert_allclose(fb[1, 0], boxes[1, 0])
        # widths preserved
        assert np.allclose(fb[..., 2] - fb[..., 0],
                           boxes[..., 2] - boxes[..., 0])

    def test_flip_is_involution(self):
        rng = np.random.RandomState(1)
        imgs = rng.randint(0, 255, (2, 16, 16, 3), np.uint8)
        boxes = np.array([[[1.0, 2.0, 8.0, 9.0]], [[0.0, 0.0, 15.0, 15.0]]])
        mask = np.ones(2, bool)
        fi, fb = flip_batch(*flip_batch(imgs, boxes, mask), mask)
        np.testing.assert_array_equal(fi, imgs)
        np.testing.assert_allclose(fb, boxes)


def test_gt_bbox_from_keypoints_consistency(rng):
    uv = rng.rand(2, 21, 2) * 100
    b = gt_bbox_from_keypoints(uv)
    assert b.shape == (2, 4)
    np.testing.assert_allclose(b[:, 0], uv[..., 0].min(-1))
    np.testing.assert_allclose(b[:, 3], uv[..., 1].max(-1))


def test_evaluate_detections_perfect_and_empty():
    gt = [np.array([[10.0, 10, 50, 50]]), np.array([[5.0, 5, 25, 25]])]
    res = evaluate_detections([g.copy() for g in gt],
                              [np.array([0.9]), np.array([0.8])], gt)
    assert res["ap"] == pytest.approx(1.0)
    res0 = evaluate_detections([np.zeros((0, 4))] * 2,
                               [np.zeros((0,))] * 2, gt)
    assert res0["ap"] == 0.0


@run_slow
def test_mini_convergence_ap_rises():
    from hand_integral_pose_estimation_tpu.cli.detector_convergence import (
        run_study,
    )
    r = run_study(train_n=24, val_n=8, hw=(112, 112), steps=60, batch=4,
                  eval_every=20, seed=0, proposal_sweep=(64, 16),
                  dtype_sweep=("float32", "bfloat16"))
    aps = [h["ap"] for h in r["history"]]
    assert r["best_ap"] > aps[0] or aps[0] > 0.3
    assert r["best_ap"] > 0.05
    # same-checkpoint AP at reduced post-NMS proposal counts (the serving
    # knob): finite and recorded for both settings; 64 is the study default
    # so it must agree with the final history AP
    assert set(r["proposal_sweep"]) == {64, 16}
    assert r["proposal_sweep"][64] == r["final_ap"]
    # bf16 serving knob: same checkpoint, conv stack in bf16 (decode/NMS/
    # softmax stay f32) — AP must match the f32 sweep arm closely
    assert r["dtype_sweep"]["float32"] == r["final_ap"]
    assert abs(r["dtype_sweep"]["bfloat16"]
               - r["dtype_sweep"]["float32"]) <= 0.05
