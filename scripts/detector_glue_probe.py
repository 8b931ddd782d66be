"""Localise the detector's composition overhead (round 5).

The round-5 stage breakdown sums to ~12.5 ms/batch-4 while the FULL
detect() program measures 17.1 (post blob fix) — isolated stages let XLA
pick layouts/fusions freely, the composed program pays transitions. This
probe times two COMPOSED halves on the same captured inputs:

  upstream   = base -> RPN convs -> proposal layer     (one jit)
  downstream = ROIAlign -> stage-4 tail -> heads -> class NMS (one jit)

If upstream ~= its stage sum, the overhead lives downstream (and vice
versa). Run on the TPU: python scripts/detector_glue_probe.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import _detector_images, _diff_timed


def main(batch=4, size=600, resnet_type=101):
    import jax
    import jax.numpy as jnp

    from hand_integral_pose_estimation_tpu.config import DetectorConfig
    from hand_integral_pose_estimation_tpu.detect import box_ops
    from hand_integral_pose_estimation_tpu.detect.faster_rcnn import (
        FasterRCNN,
    )
    from hand_integral_pose_estimation_tpu.detect.hand_detector import detect
    from hand_integral_pose_estimation_tpu.detect.rpn import proposal_layer
    from hand_integral_pose_estimation_tpu.models.resnet import (
        ResNetBackbone, ResNetStage4,
    )
    from hand_integral_pose_estimation_tpu.ops.nms import nms
    from hand_integral_pose_estimation_tpu.ops.roi_align import (
        roi_align_batched,
    )

    cfg = DetectorConfig(resnet_type=resnet_type, test_scale=size,
                         test_max_size=size)
    model = FasterRCNN(cfg=cfg)
    images = _detector_images(batch, size)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        jnp.zeros((1, size, size, 3)))
    v, bs = variables["params"], variables["batch_stats"]

    base = ResNetBackbone(cfg.resnet_type, jnp.float32, None, num_stages=3,
                          norm=cfg.norm, style=cfg.resnet_style)
    base_vars = {"params": v["base"], "batch_stats": bs["base"]}
    A = len(cfg.anchor_scales) * len(cfg.anchor_ratios)
    pre_n, post_n = cfg.rpn_pre_nms_top_n_test, cfg.rpn_post_nms_top_n_test

    def upstream(im):
        feats = base.apply(base_vars, im, train=False)
        fh, fw = feats.shape[1], feats.shape[2]
        trunk = jax.nn.relu(jax.lax.conv_general_dilated(
            feats, v["rpn_conv"]["kernel"], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
            + v["rpn_conv"]["bias"])
        cls = (jax.lax.conv_general_dilated(
            trunk, v["rpn_cls"]["kernel"], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
            + v["rpn_cls"]["bias"]).reshape(batch, fh, fw, A, 2)
        reg = (jax.lax.conv_general_dilated(
            trunk, v["rpn_bbox"]["kernel"], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
            + v["rpn_bbox"]["bias"]).reshape(batch, fh, fw, A, 4)
        anchors = box_ops.grid_anchors(
            (fh, fw), cfg.feat_stride,
            box_ops.generate_base_anchors(cfg.feat_stride, cfg.anchor_ratios,
                                          cfg.anchor_scales))
        props = jax.vmap(
            lambda c2, r2: proposal_layer(c2, r2, anchors, (size, size),
                                          pre_n, post_n, cfg.rpn_nms_thresh,
                                          cfg.rpn_min_size))(cls, reg)
        return feats, props.rois, props.valid

    feats0, rois0, valid0 = jax.jit(upstream)(images)

    tail = ResNetStage4(cfg.resnet_type, jnp.float32, None, norm=cfg.norm,
                        style=cfg.resnet_style)
    tail_vars = {"params": v["tail"], "batch_stats": bs["tail"]}
    R = rois0.shape[1]
    num_classes = len(cfg.classes)

    def downstream(feats, rois, valid):
        pooled = roi_align_batched(
            feats.astype(jnp.float32), rois, cfg.pooling_size,
            cfg.spatial_scale, cfg.sampling_ratio, impl="auto")
        p = pooled.reshape(batch * R, cfg.pooling_size, cfg.pooling_size, -1)
        h = tail.apply(tail_vars, p, train=False).mean(axis=(1, 2))
        cls_logits = (h @ v["cls_score"]["kernel"]
                      + v["cls_score"]["bias"]).reshape(batch, R, num_classes)
        bbox_pred = (h @ v["bbox_pred"]["kernel"]
                     + v["bbox_pred"]["bias"]).reshape(batch, R,
                                                       4 * num_classes)
        stds = jnp.asarray(cfg.bbox_normalize_stds, jnp.float32)
        means = jnp.asarray(cfg.bbox_normalize_means, jnp.float32)
        deltas = bbox_pred.reshape(batch, -1, num_classes, 4)[:, :, 1]
        deltas = deltas * stds + means
        boxes = jax.vmap(box_ops.decode_boxes)(rois, deltas)
        boxes = box_ops.clip_boxes(boxes, (size, size))
        probs = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
        scores = jnp.where(valid, probs[..., 1], 0.0)
        b, s, vl = jax.vmap(lambda b2, s2: nms(
            b2, s2, cfg.det_nms_thresh, cfg.max_detections,
            score_threshold=cfg.det_score_thresh))(boxes, scores)
        return b, s

    @functools.partial(jax.jit, static_argnums=(1,))
    def up_loop(images, n):
        def body(i, im):
            feats, rois, valid = upstream(im)
            return im + 1e-9 * (jnp.sum(rois) + jnp.sum(feats[0, 0, 0]))
        return jax.lax.fori_loop(0, n, body, images)

    @functools.partial(jax.jit, static_argnums=(1,))
    def down_loop(feats, n):
        def body(i, f):
            # rois must depend on the carry: loop-INVARIANT rois let XLA
            # hoist the ROIAlign weight construction out of the fori_loop
            # and undercount the stage (first probe run had this artifact)
            r = rois0 + 1e-7 * jnp.max(f[:, :1, :1, :1])
            b, s = downstream(f, r, valid0)
            return f + 1e-9 * (jnp.sum(b) + jnp.sum(s))
        return jax.lax.fori_loop(0, n, body, feats)

    @functools.partial(jax.jit, static_argnums=(1,))
    def updown_loop(images, n):
        """upstream -> downstream composed in ONE jit body: FULL minus the
        blob facade (BGR flip + mean subtract). Separates half-fusion
        overhead from facade overhead."""
        def body(i, im):
            feats, rois, valid = upstream(im)
            b, s = downstream(feats, rois, valid)
            return im + 1e-9 * (jnp.sum(b) + jnp.sum(s))
        return jax.lax.fori_loop(0, n, body, images)

    @functools.partial(jax.jit, static_argnums=(1,))
    def updown_barrier_loop(images, n):
        """Same one-jit composition with an optimization_barrier between
        the halves: if the FULL-vs-halves gap is XLA fusing/scheduling
        across the proposal boundary, the barrier should recover the
        two-program time inside one program."""
        def body(i, im):
            feats, rois, valid = upstream(im)
            feats, rois, valid = jax.lax.optimization_barrier(
                (feats, rois, valid))
            b, s = downstream(feats, rois, valid)
            return im + 1e-9 * (jnp.sum(b) + jnp.sum(s))
        return jax.lax.fori_loop(0, n, body, images)

    @functools.partial(jax.jit, static_argnums=(1,))
    def full_loop(images, n):
        def body(i, im):
            d = detect(model, variables, im, cfg)
            return im + 1e-9 * (jnp.sum(d.boxes) + jnp.sum(d.scores))
        return jax.lax.fori_loop(0, n, body, images)

    for name, timed in [
        ("upstream composed (base+rpn+proposals)", lambda n: np.asarray(
            up_loop(images, n)[0, 0, 0])),
        ("downstream composed (roi+tail+cnms)", lambda n: np.asarray(
            down_loop(feats0, n)[0, 0, 0])),
        ("up+down one jit (no facade)", lambda n: np.asarray(
            updown_loop(images, n)[0, 0, 0])),
        ("up+down one jit + barrier", lambda n: np.asarray(
            updown_barrier_loop(images, n)[0, 0, 0])),
        ("FULL detect()", lambda n: np.asarray(
            full_loop(images, n)[0, 0, 0])),
    ]:
        t = _diff_timed(timed, n_steps=10, reps=3)
        print(f"{name:42s} {t * 1e3:8.2f} ms/batch{batch}")


if __name__ == "__main__":
    main()
