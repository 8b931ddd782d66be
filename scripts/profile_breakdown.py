"""Phase breakdown of the headline e2e inference path on the live TPU.

Times three device-side loops with the same differenced method bench.py uses:
preprocess-only (crop/normalise chain), network-only (backbone + deconv head +
fused projection-integral on premade patches), and the full e2e chain. The
difference between (full) and (pre + net) is dispatch/fusion interaction.

    python scripts/profile_breakdown.py [--batch 32]
"""

import argparse
import functools
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import _diff_timed, _pose_inputs  # noqa: E402


def train_breakdown(batch):
    """Phase split of the train step: preprocess / fwd+loss / grad / full."""
    import jax
    import jax.numpy as jnp
    import optax
    from hand_integral_pose_estimation_tpu.config import Config
    from hand_integral_pose_estimation_tpu.data import pipeline
    from hand_integral_pose_estimation_tpu.models import get_pose_net
    from hand_integral_pose_estimation_tpu.training.state import TrainState
    from hand_integral_pose_estimation_tpu.training.train_step import (
        make_train_step,
    )

    cfg = Config()
    net = get_pose_net(cfg.model)
    B = batch
    images, joints, K, ref_len = _pose_inputs(B)
    labelled = jnp.arange(B) % 2 == 0
    teacher = joints * 1.001
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    tx = optax.adam(1e-3)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    train_step = make_train_step(net, tx, cfg)

    def make_batch(imgs, i):
        return pipeline.make_train_batch(
            jax.random.fold_in(jax.random.PRNGKey(0), i), imgs, joints, K,
            None, labelled, teacher, ref_len, cfg.augment,
            cfg.model.input_shape)

    batch0 = jax.jit(lambda im: make_batch(im, 0))(images)

    from hand_integral_pose_estimation_tpu import losses
    from hand_integral_pose_estimation_tpu.ops.fused_head import (
        head_projection_integral,
    )

    def fwd_loss(params, batch_stats, b):
        feats, _ = net.apply(
            {"params": params, "batch_stats": batch_stats}, b.image,
            train=True, return_features=True, mutable=["batch_stats"])
        Wp, bp = net.final_projection(params)
        coords = head_projection_integral(
            feats, Wp, bp, cfg.model.num_joints, cfg.model.depth_dim)
        out = losses.combined_loss(
            coords, b.label_teacher, b.label, b.label_weight, b.labelled,
            b.trans_inv, b.tprime, b.K, panet_apply=None, lam=cfg.train.lam,
            patch_width=cfg.model.input_shape[1],
            patch_height=cfg.model.input_shape[0])
        return out.loss

    @functools.partial(jax.jit, static_argnums=(1,))
    def pre_loop(images, n):
        def body(i, imgs):
            b = make_batch(imgs, i)
            return imgs + 1e-9 * jnp.sum(b.image)
        return jax.lax.fori_loop(0, n, body, images)

    # chain each iteration through the batch image (CLAUDE.md: the body must
    # depend on the carry or XLA hoists the loop-invariant forward/backward
    # out of the fori_loop entirely) and tap with FULL reductions
    @functools.partial(jax.jit, static_argnums=(1,))
    def fwd_loop(images, n):
        def body(i, s):
            b = batch0._replace(image=batch0.image + s)
            loss = fwd_loss(state.params, state.batch_stats, b)
            return 1e-9 * loss
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @functools.partial(jax.jit, static_argnums=(1,))
    def grad_loop(images, n):
        def body(i, s):
            b = batch0._replace(image=batch0.image + s)
            g = jax.grad(fwd_loss)(state.params, state.batch_stats, b)
            tot = sum(jnp.sum(le) for le in jax.tree_util.tree_leaves(g))
            return 1e-9 * tot
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @functools.partial(jax.jit, static_argnums=(2,))
    def step_loop(state, images, n):
        def body(i, carry):
            st, imgs = carry
            b = make_batch(imgs, i)
            st, metrics = train_step(st, b)
            return st, imgs + 1e-9 * metrics["loss"]
        return jax.lax.fori_loop(0, n, body, (state, images))

    # isolate the fused-head bwd: VJP of the projection+integral decode
    # given fixed backbone features (its closed-form custom VJP,
    # ops/integral.py)
    feats0 = jax.jit(lambda b: net.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        b.image, train=True, return_features=True,
        mutable=["batch_stats"])[0])(batch0)
    Wp0, bp0 = net.final_projection(state.params)

    def head_loss(feats, Wp, bp):
        coords = head_projection_integral(
            feats, Wp, bp, cfg.model.num_joints, cfg.model.depth_dim)
        return jnp.sum(jnp.abs(coords - 10.0))

    @functools.partial(jax.jit, static_argnums=(1,))
    def head_bwd_loop(feats0, n):
        def body(i, s):
            g_f, g_w, g_b = jax.grad(head_loss, argnums=(0, 1, 2))(
                feats0 + s, Wp0, bp0)
            return 1e-9 * (jnp.sum(g_f) + jnp.sum(g_w) + jnp.sum(g_b))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    # FLOP-based MFU (VERDICT r4 #8): XLA's own cost model for the compiled
    # single-step programs; peak = v5e bf16 MXU (the conv stack runs
    # ModelConfig.compute_dtype = bfloat16)
    def flops_of(fn, *args):
        try:
            c = jax.jit(fn).lower(*args).compile()
            a = c.cost_analysis()
            a = a[0] if isinstance(a, (list, tuple)) else a
            return float(a["flops"])
        except Exception:
            return float("nan")

    f_fwd = flops_of(fwd_loss, state.params, state.batch_stats, batch0)
    f_grad = flops_of(
        lambda p, bs, b: jax.grad(fwd_loss)(p, bs, b),
        state.params, state.batch_stats, batch0)
    f_step = flops_of(lambda st, im: step_loop(st, im, 1), state, images)
    PEAK = 197e12          # v5e bf16 MXU peak

    rows = []
    for name, run, fl in [
        ("train preprocess", lambda n: np.asarray(
            pre_loop(images, n)[0, 0, 0]), None),
        ("fwd+loss only", lambda n: np.asarray(fwd_loop(images, n)), f_fwd),
        ("fwd+bwd (grad)", lambda n: np.asarray(grad_loop(images, n)),
         f_grad),
        ("fused-head bwd only", lambda n: np.asarray(
            head_bwd_loop(feats0, n)), None),
        ("full step (pre+grad+adam)", lambda n: np.asarray(
            step_loop(state, images, n)[1][0, 0, 0]), f_step),
    ]:
        t = _diff_timed(run, n_steps=10)
        mfu = "" if fl is None or np.isnan(fl) else \
            f"  {fl / 1e9:8.1f} GFLOP  MFU {fl / t / PEAK * 100:5.1f}%"
        print(f"{name:28s} {t * 1e3:7.3f} ms/batch{B}"
              f"  {B / t:9.1f} img/s{mfu}")
        rows.append((name, t, fl))
    # bwd-only derivation (grad minus fwd), the dgrad+wgrad residual
    tf = dict((n, t) for n, t, _ in rows)
    ff = dict((n, f) for n, t, f in rows)
    t_bwd = tf["fwd+bwd (grad)"] - tf["fwd+loss only"]
    if not (np.isnan(ff["fwd+bwd (grad)"]) or np.isnan(ff["fwd+loss only"])):
        f_bwd = ff["fwd+bwd (grad)"] - ff["fwd+loss only"]
        print(f"{'bwd only (derived)':28s} {t_bwd * 1e3:7.3f} ms/batch{B}"
              f"  {'':9s}   {f_bwd / 1e9:8.1f} GFLOP"
              f"  MFU {f_bwd / t_bwd / PEAK * 100:5.1f}%")


def detector_breakdown(batch=4, size=600, resnet_type=101, proposals=None):
    """Stage split of the parity-scale detector (config #4): base backbone /
    RPN convs / proposal layer (decode+topk+NMS) / NMS alone / ROIAlign /
    stage-4 tail+heads / full detect. Stage inputs are CAPTURED from a real
    forward on the realistic synthetic scenes, so the NMS sees the true
    clustered proposal distribution (its fixpoint iteration count depends on
    it, PERFORMANCE.md round 3)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from bench import _detector_images
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

    kw = {} if proposals is None else dict(rpn_post_nms_top_n_test=proposals)
    cfg = DetectorConfig(resnet_type=resnet_type, test_scale=size,
                         test_max_size=size, **kw)
    model = FasterRCNN(cfg=cfg)
    images = _detector_images(batch, size)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        jnp.zeros((1, size, size, 3)))
    v, bs = variables["params"], variables["batch_stats"]

    # ---- capture real stage inputs with one annotated forward
    base = ResNetBackbone(cfg.resnet_type, jnp.float32, None, num_stages=3,
                          norm=cfg.norm, style=cfg.resnet_style)
    base_vars = {"params": v["base"],
                 "batch_stats": bs["base"]} if "base" in bs else \
                {"params": v["base"]}
    feats = jax.jit(lambda im: base.apply(base_vars, im, train=False))(
        images)
    fh, fw = feats.shape[1], feats.shape[2]
    A = len(cfg.anchor_scales) * len(cfg.anchor_ratios)

    def rpn_heads(feats):
        import flax.linen as nn
        trunk = nn.relu(jax.lax.conv_general_dilated(
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
        return cls, reg

    rpn_cls, rpn_reg = jax.jit(rpn_heads)(feats)
    anchors = box_ops.grid_anchors(
        (fh, fw), cfg.feat_stride,
        box_ops.generate_base_anchors(cfg.feat_stride, cfg.anchor_ratios,
                                      cfg.anchor_scales))
    pre_n = cfg.rpn_pre_nms_top_n_test
    post_n = cfg.rpn_post_nms_top_n_test

    def proposals_fn(cl, rg):
        return jax.vmap(
            lambda c, r: proposal_layer(c, r, anchors, (size, size), pre_n,
                                        post_n, cfg.rpn_nms_thresh,
                                        cfg.rpn_min_size))(cl, rg)

    props = jax.jit(proposals_fn)(rpn_cls, rpn_reg)

    # the NMS-alone stage gets the REAL top-6000 decoded boxes
    def topk_boxes(cl, rg):
        N = anchors.shape[0]
        fg = jax.nn.softmax(cl.astype(jnp.float32), axis=-1)[..., 1]
        def one(fg1, rg1):
            scores = fg1.reshape(N)
            boxes = box_ops.decode_boxes(anchors,
                                         rg1.reshape(N, 4)
                                         .astype(jnp.float32))
            boxes = box_ops.clip_boxes(boxes, (size, size))
            w = boxes[:, 2] - boxes[:, 0] + 1.0
            h = boxes[:, 3] - boxes[:, 1] + 1.0
            scores = jnp.where((w >= cfg.rpn_min_size)
                               & (h >= cfg.rpn_min_size), scores, -1.0)
            top_scores, top_idx = jax.lax.top_k(scores, min(pre_n, N))
            return boxes[top_idx], top_scores
        return jax.vmap(one)(fg, rg)

    top_boxes, top_scores = jax.jit(topk_boxes)(rpn_cls, rpn_reg)

    pooled = jax.jit(lambda f, r: roi_align_batched(
        f.astype(jnp.float32), r, cfg.pooling_size, cfg.spatial_scale,
        cfg.sampling_ratio, impl="auto"))(feats, props.rois)
    R = props.rois.shape[1]
    pooled_flat = pooled.reshape(batch * R, cfg.pooling_size,
                                 cfg.pooling_size, -1)

    tail = ResNetStage4(cfg.resnet_type, jnp.float32, None, norm=cfg.norm,
                        style=cfg.resnet_style)
    tail_vars = {"params": v["tail"],
                 "batch_stats": bs["tail"]} if "tail" in bs else \
                {"params": v["tail"]}

    def tail_heads(p):
        h = tail.apply(tail_vars, p, train=False).mean(axis=(1, 2))
        cls = h @ v["cls_score"]["kernel"] + v["cls_score"]["bias"]
        bb = h @ v["bbox_pred"]["kernel"] + v["bbox_pred"]["bias"]
        return cls, bb

    import functools as _ft

    def loop(fn, feed, reduce_out):
        @_ft.partial(jax.jit, static_argnums=(1,))
        def l(x, n):
            def body(i, x):
                out = fn(x)
                return x + 1e-9 * reduce_out(out)
            return jax.lax.fori_loop(0, n, body, x)
        return lambda n: np.asarray(
            jax.tree_util.tree_leaves(l(feed, n))[0]).ravel()[0]

    stages = [
        ("base conv1-layer3", loop(
            lambda im: base.apply(base_vars, im, train=False),
            images, jnp.sum)),
        ("rpn convs", loop(
            lambda f: rpn_heads(f)[0], feats,
            lambda o: jnp.sum(o))),
        ("proposal layer (decode+topk+nms)", loop(
            lambda t: proposals_fn(rpn_cls + 1e-12 * t[0, 0, 0, 0, 0],
                                   rpn_reg).rois,
            rpn_cls, jnp.sum)),
        ("nms alone (real top-%d)" % pre_n, loop(
            lambda tb: jax.vmap(lambda b2, s2: nms(
                b2, s2, cfg.rpn_nms_thresh, post_n,
                score_threshold=0.0)[0])(tb, top_scores),
            top_boxes, jnp.sum)),
        ("roi-align (%d rois)" % R, loop(
            lambda f: roi_align_batched(
                f.astype(jnp.float32), props.rois, cfg.pooling_size,
                cfg.spatial_scale, cfg.sampling_ratio, impl="auto"),
            feats, jnp.sum)),
        ("stage4 tail+heads (%d rois)" % R, loop(
            lambda p: tail_heads(p)[0], pooled_flat,
            lambda o: jnp.sum(o))),
        ("FULL detect()", loop(
            lambda im: detect(model, variables, im, cfg).boxes,
            images, jnp.sum)),
    ]
    print(f"detector breakdown: batch={batch} size={size} "
          f"R{resnet_type} pre_nms={pre_n} post_nms={post_n}")
    total = None
    for name, timed in stages:
        t = _diff_timed(timed, n_steps=10, reps=3)
        print(f"{name:36s} {t * 1e3:8.2f} ms/batch{batch}")
        if name.startswith("FULL"):
            total = t
    return total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--train", action="store_true",
                   help="break down the train step instead of inference")
    p.add_argument("--detector", action="store_true",
                   help="break down the parity-scale two-stage detector")
    p.add_argument("--detector-scale", type=int, default=600)
    p.add_argument("--detector-resnet", type=int, default=101)
    p.add_argument("--proposals", type=int, default=None)
    args = p.parse_args()
    if args.detector:
        detector_breakdown(4, args.detector_scale, args.detector_resnet,
                           args.proposals)
        return
    if args.train:
        train_breakdown(args.batch)
        return

    import jax
    import jax.numpy as jnp
    from hand_integral_pose_estimation_tpu.config import Config
    from hand_integral_pose_estimation_tpu.data import pipeline
    from hand_integral_pose_estimation_tpu.models import get_pose_net
    from hand_integral_pose_estimation_tpu.ops.fused_head import (
        head_projection_integral,
    )

    cfg = Config()
    net = get_pose_net(cfg.model)
    B = args.batch
    images, joints, K, ref_len = _pose_inputs(B)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    params, batch_stats = variables["params"], variables["batch_stats"]

    @functools.partial(jax.jit, static_argnums=(1,))
    def pre_loop(images, n):
        def body(i, imgs):
            b = pipeline.make_eval_batch(imgs, joints, K, None, ref_len,
                                         cfg.augment, cfg.model.input_shape)
            return imgs + 1e-9 * jnp.sum(b.image)
        return jax.lax.fori_loop(0, n, body, images)

    patches = pipeline.make_eval_batch(images, joints, K, None, ref_len,
                                       cfg.augment,
                                       cfg.model.input_shape).image

    @functools.partial(jax.jit, static_argnums=(1,))
    def net_loop(patches, n):
        def body(i, x):
            feats = net.apply({"params": params, "batch_stats": batch_stats},
                              x, train=False, return_features=True)
            Wp, bp = net.final_projection(params)
            coords = head_projection_integral(
                feats, Wp, bp, cfg.model.num_joints, cfg.model.depth_dim)
            return x + 1e-9 * jnp.sum(coords)
        return jax.lax.fori_loop(0, n, body, patches)

    @functools.partial(jax.jit, static_argnums=(1,))
    def backbone_loop(patches, n):
        def body(i, x):
            feats = net.apply({"params": params, "batch_stats": batch_stats},
                              x, train=False, return_features=True)
            return x + 1e-9 * jnp.sum(feats)
        return jax.lax.fori_loop(0, n, body, patches)

    @functools.partial(jax.jit, static_argnums=(1,))
    def e2e_loop(images, n):
        def body(i, imgs):
            b = pipeline.make_eval_batch(imgs, joints, K, None, ref_len,
                                         cfg.augment, cfg.model.input_shape)
            feats = net.apply({"params": params, "batch_stats": batch_stats},
                              b.image, train=False, return_features=True)
            Wp, bp = net.final_projection(params)
            coords = head_projection_integral(
                feats, Wp, bp, cfg.model.num_joints, cfg.model.depth_dim)
            return imgs + 1e-9 * jnp.sum(coords)
        return jax.lax.fori_loop(0, n, body, images)

    for name, fn, arg in [("preprocess", pre_loop, images),
                          ("backbone+head(feats)", backbone_loop, patches),
                          ("net(feats+fused decode)", net_loop, patches),
                          ("e2e", e2e_loop, images)]:
        t = _diff_timed(lambda n: np.asarray(fn(arg, n)[0, 0, 0]))
        print(f"{name:28s} {t * 1e3:7.3f} ms/batch{B}"
              f"  {B / t:9.1f} img/s")


if __name__ == "__main__":
    main()
