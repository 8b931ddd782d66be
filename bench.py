"""Benchmarks for the BASELINE.md measurement configs, TPU-side.

Default invocation (the driver contract) prints ONE JSON line — config #2,
the headline FreiHAND end-to-end inference images/sec/chip — and compares
against a cached CPU reference measurement of the equivalent torch pipeline
(per-sample cv2 double-warp preprocessing + torch float32 ResNet-50 forward
+ softmax-integral decode; the reference implementation's CPU throughput,
see BASELINE.md).

Flags benchmark the other configs with the same loop-differenced rigor:
    python bench.py --config 3        # train step (augment+fwd+bwd+Adam)
    python bench.py --config 4        # two-stage detector pipeline
    python bench.py --config 5        # teacher-label generation (21 rots)
    python bench.py --config 6        # serving two-program bound
    python bench.py --batch 256       # headline at a different batch size
    python bench.py --all             # every config, one JSON line each

All device measurements chain iterations through a data dependency inside a
device-side `lax.fori_loop`, timed at two loop lengths and differenced —
this cancels the axon tunnel's ~35 ms/call RPC latency and defeats both its
identical-computation caching and XLA dead-code elimination (see CLAUDE.md).

Outage handling (the tunnel's two documented failure modes are an
`UNAVAILABLE` error and an indefinite HANG at backend init): by default the
parent process never touches the device itself. It probes the backend in a
subprocess under a hard timeout (bounded retries), runs each measurement in
its own watchdog subprocess (`--raw`), and on any failure prints the
last-known-good record for that metric from `.bench_lkg.json` with
`"stale": true` and the outage noted — exit code 0, always one parsable
JSON line per requested config. Every successful measurement refreshes the
cache. `--raw` bypasses all of this (direct in-process measurement).
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_CACHE = os.path.join(_HERE, ".bench_cpu_baseline.json")
_LKG = os.path.join(_HERE, ".bench_lkg.json")
BATCH = 32
STEPS = 20

# Watchdog knobs (seconds / counts); env-overridable for tests and for
# driver environments with slower tunnels.
PROBE_TIMEOUT = float(os.environ.get("HIPE_BENCH_PROBE_TIMEOUT", 240))
PROBE_RETRIES = int(os.environ.get("HIPE_BENCH_PROBE_RETRIES", 3))
PROBE_RETRY_SLEEP = float(os.environ.get("HIPE_BENCH_PROBE_SLEEP", 45))
MEASURE_TIMEOUT = float(os.environ.get("HIPE_BENCH_MEASURE_TIMEOUT", 2400))


def _pose_inputs(batch):
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.randint(0, 255, (batch, 224, 224, 3)).astype(np.float32))
    K = jnp.broadcast_to(
        jnp.asarray([[531.9, 0, 112.0], [0, 532.2, 112.0], [0, 0, 1.0]],
                    jnp.float32), (batch, 3, 3))
    joints = jnp.asarray(
        (np.array([0, 0, 0.45]) + rng.uniform(-0.03, 0.03, (batch, 21, 3))
         ).astype(np.float32))
    ref_len = jnp.ones((batch,), jnp.float32)
    return images, joints, K, ref_len


def _diff_timed(loop_fn, n_steps=STEPS, reps=5, min_signal=0.25):
    """Time `loop_fn(n)` at two loop lengths and difference: per-iteration
    seconds with RPC latency and warmup cancelled.

    If the differenced signal is below `min_signal` seconds (or negative —
    both happen when per-iteration device time is small vs the ~35 ms
    tunnel RPC jitter, e.g. the native-224 detector at ~1 ms/iter), the
    long loop length escalates 8x (bounded) until the signal clears the
    noise floor. Each escalation costs one extra remote compile (the loop
    length is a static jit arg)."""
    def timed(n):
        loop_fn(n)                      # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            loop_fn(n)
            best = min(best, time.perf_counter() - t0)
        return best
    t_short = timed(1)
    while True:
        t_long = timed(1 + n_steps)
        if t_long - t_short >= min_signal or n_steps >= 4096:
            return (t_long - t_short) / n_steps
        n_steps *= 8


def measure_inference(batch=BATCH, int8=False):
    """Config #2: on-device crop/normalise -> R50 -> fused soft-argmax.

    int8=True runs the backbone+deconv convs as s8xs8->s32 MXU ops
    (quantize/ptq.py; per-channel weights, calibrated per-tensor
    activations; the fused projection head stays fp). Accuracy gate:
    tests/test_quantize.py."""
    import contextlib
    import functools

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
    images, joints, K, ref_len = _pose_inputs(batch)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))

    if int8:
        from hand_integral_pose_estimation_tpu.quantize import (
            calibrate, quantize_params, quantized_calls,
        )
        import dataclasses as _dc

        def calib_fwd(imgs):
            b = pipeline.make_eval_batch(imgs, joints, K, None, ref_len,
                                         cfg.augment, cfg.model.input_shape)
            return net.apply(variables, b.image, train=False,
                             return_features=True)
        amax = calibrate(calib_fwd, images)
        q = quantize_params(variables["params"], amax,
                            skip=("head/final",))
        q = _dc.replace(q, root_type=type(net))
        qctx = lambda: quantized_calls(q)   # noqa: E731
    else:
        qctx = contextlib.nullcontext

    @functools.partial(jax.jit, static_argnums=(6,))
    def e2e_loop(params, batch_stats, images, joints, K, ref_len, n):
        def body(i, imgs):
            b = pipeline.make_eval_batch(imgs, joints, K, None, ref_len,
                                         cfg.augment, cfg.model.input_shape)
            with qctx():
                feats = net.apply(
                    {"params": params, "batch_stats": batch_stats},
                    b.image, train=False, return_features=True)
            Wp, bp = net.final_projection(params)
            coords = head_projection_integral(
                feats, Wp, bp, cfg.model.num_joints, cfg.model.depth_dim)
            # data dependency: next iteration's input depends on this output
            return imgs + 1e-9 * jnp.sum(coords)
        return jax.lax.fori_loop(0, n, body, images)

    args = (variables["params"], variables["batch_stats"], images, joints,
            K, ref_len)
    per_batch = _diff_timed(
        lambda n: np.asarray(e2e_loop(*args, n)[0, 0, 0]))
    return batch / per_batch


def measure_train(batch=BATCH):
    """Config #3: augmented preprocess + forward + backward + Adam, the
    semi-supervised combined loss (the Trainer's device-side work)."""
    import functools

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
    images, joints, K, ref_len = _pose_inputs(batch)
    labelled = jnp.arange(batch) % 2 == 0
    teacher = joints * 1.001
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    tx = optax.adam(1e-3)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    train_step = make_train_step(net, tx, cfg)

    @functools.partial(jax.jit, static_argnums=(5,))
    def train_loop(state, images, joints, K, ref_len, n):
        def body(i, carry):
            state, imgs = carry
            b = pipeline.make_train_batch(
                jax.random.fold_in(jax.random.PRNGKey(0), i), imgs, joints,
                K, None, labelled, teacher, ref_len, cfg.augment,
                cfg.model.input_shape)
            state, metrics = train_step(state, b)
            return state, imgs + 1e-9 * metrics["loss"]
        return jax.lax.fori_loop(0, n, body, (state, images))

    def run(n):
        out_state, out_imgs = train_loop(state, images, joints, K,
                                         ref_len, n)
        np.asarray(out_imgs[0, 0, 0])
    per_batch = _diff_timed(run, n_steps=10)
    return batch / per_batch


def _detector_images(batch, size):
    """Realistic benchmark scenes (synthetic hands + distractors on noisy
    background), NOT rng noise: the proposal-NMS cost depends on how
    clustered the near-duplicate proposals are (PERFORMANCE.md), and
    random pixels underestimate it."""
    import jax.numpy as jnp
    from hand_integral_pose_estimation_tpu.detect.synthetic import (
        make_synthetic_box_dataset,
    )
    ds = make_synthetic_box_dataset(
        batch, hw=(size, size), min_size=int(size * 0.25),
        max_size=int(size * 0.62), seed=0)
    return jnp.asarray(ds.images.astype(np.float32))


def measure_detector(batch=4, size=600, resnet_type=101, proposals=None,
                     native=False, int8=False, dtype=None):
    """Config #4: the full two-stage detection call (blob -> R101-C4 ->
    RPN -> NMS proposals -> ROIAlign -> head -> decode -> class NMS).

    native=True swaps in the in-tree from-scratch recipe
    (cli/detector_convergence.study_config: GN backbone, small-hand anchor
    scales, 64 post-NMS proposals) sized at `size` — the same config the
    config-6 native-scale serving bound uses, so the two numbers compose."""
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp
    from hand_integral_pose_estimation_tpu.config import DetectorConfig
    from hand_integral_pose_estimation_tpu.detect.faster_rcnn import (
        FasterRCNN,
    )
    from hand_integral_pose_estimation_tpu.detect.hand_detector import detect

    if native:
        cfg = DetectorConfig.native(size, resnet_type)
        if proposals is not None:
            cfg = dataclasses.replace(cfg, rpn_post_nms_top_n_test=proposals)
    else:
        kw = {} if proposals is None else dict(
            rpn_post_nms_top_n_test=proposals)
        cfg = DetectorConfig(resnet_type=resnet_type, test_scale=size,
                             test_max_size=size, **kw)
    if dtype is not None:
        cfg = dataclasses.replace(cfg, compute_dtype=dtype)
    model = FasterRCNN(cfg=cfg)
    images = _detector_images(batch, size)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        jnp.zeros((1, size, size, 3)))

    import contextlib
    if int8:
        from hand_integral_pose_estimation_tpu.quantize import (
            calibrate, quantize_params, quantized_calls,
        )
        import dataclasses as _dc
        amax = calibrate(lambda im: detect(model, variables, im, cfg),
                         images)
        q = quantize_params(variables["params"], amax)
        q = _dc.replace(q, root_type=type(model))
        qctx = lambda: quantized_calls(q)   # noqa: E731
    else:
        qctx = contextlib.nullcontext

    @functools.partial(jax.jit, static_argnums=(2,))
    def det_loop(variables, images, n):
        def body(i, imgs):
            with qctx():
                d = detect(model, variables, imgs, cfg)
            return imgs + 1e-9 * (jnp.sum(d.boxes) + jnp.sum(d.scores))
        return jax.lax.fori_loop(0, n, body, images)

    per_call = _diff_timed(
        lambda n: np.asarray(det_loop(variables, images, n)[0, 0, 0]),
        n_steps=10, reps=3)
    return batch / per_call, per_call * 1e3


def measure_detector_split(batch=4, size=600, resnet_type=101,
                           proposals=None, native=False, dtype=None):
    """Config #4 --split: the two-dispatch detector (`detect_split`).

    The round-5 glue probe showed XLA loses ~29 % compiling the detector's
    two halves into one program (PERFORMANCE.md round-5 detector section);
    serving them as two back-to-back programs recovers it. A `fori_loop`
    cannot chain two PROGRAMS, so this is chained wall-clock: iteration k
    dispatches upstream then downstream (data-dependent through the image
    carry, carry tapped with full reductions), timed at two chain lengths
    and differenced — warmup and fixed RPC latency cancel as in
    `_diff_timed`, but per-dispatch client overhead (sub-ms on a PCIe
    host, more through the dev tunnel) stays IN: the result is an upper
    bound on the two-program device time."""
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp
    from hand_integral_pose_estimation_tpu.config import DetectorConfig
    from hand_integral_pose_estimation_tpu.detect.faster_rcnn import (
        FasterRCNN,
    )
    from hand_integral_pose_estimation_tpu.detect.hand_detector import (
        _blob_scale, _postprocess, prepare_blob,
    )

    if native:
        cfg = DetectorConfig.native(size, resnet_type)
        if proposals is not None:
            cfg = dataclasses.replace(cfg, rpn_post_nms_top_n_test=proposals)
    else:
        kw = {} if proposals is None else dict(
            rpn_post_nms_top_n_test=proposals)
        cfg = DetectorConfig(resnet_type=resnet_type, test_scale=size,
                             test_max_size=size, **kw)
    if dtype is not None:
        cfg = dataclasses.replace(cfg, compute_dtype=dtype)
    model = FasterRCNN(cfg=cfg)
    images = _detector_images(batch, size)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        jnp.zeros((1, size, size, 3)))

    scale = _blob_scale((size, size), cfg.test_scale, cfg.test_max_size)
    blob_hw = (int(round(size * scale)), int(round(size * scale)))

    @jax.jit
    def up(variables, im):
        blob, _ = prepare_blob(im, cfg)
        return model.apply(variables, blob, method="upstream")

    @jax.jit
    def down(variables, im, feats, rois, valid):
        out = model.apply(variables, feats, rois, valid,
                          method="downstream")
        det = _postprocess(out, cfg, blob_hw, scale)
        return im + 1e-9 * (jnp.sum(det.boxes) + jnp.sum(det.scores))

    def chain(k):
        im = images
        for _ in range(k):
            feats, rois, valid = up(variables, im)
            im = down(variables, im, feats, rois, valid)
        return np.asarray(im[0, 0, 0])

    per_pair = _diff_timed(chain, n_steps=10, reps=3)
    return batch / per_pair, per_pair * 1e3


def _teacher_setup(batch, dtype=None):
    """Shared config-5 fixture: frozen R50 teacher (fused projection head)
    + realistic 480-px images with per-row jittered crop boxes (identical
    geometry across the batch would let CSE share the per-rotation warp
    weight build — the VPU bottleneck of this config — and flatter the
    number)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from hand_integral_pose_estimation_tpu.config import Config
    from hand_integral_pose_estimation_tpu.models import get_pose_net
    from hand_integral_pose_estimation_tpu.ops.fused_head import (
        head_projection_integral,
    )

    cfg = Config()
    if dtype is not None and dtype != "int8":
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, compute_dtype=dtype))
    net = get_pose_net(cfg.model)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    _, joints, _, _ = _pose_inputs(batch)    # only the joints are reused
    images = jnp.asarray(np.random.RandomState(1).randint(
        0, 255, (batch, 480, 480, 3)).astype(np.float32))
    K = jnp.broadcast_to(
        jnp.asarray([[531.9, 0, 240.0], [0, 532.2, 240.0], [0, 0, 1.0]],
                    jnp.float32), (batch, 3, 3))
    jrng = np.random.RandomState(2)
    cxy = 240.0 + jrng.uniform(-40, 40, (batch, 2))
    wh = jrng.uniform(220, 300, (batch, 2))
    bbox = jnp.asarray(np.concatenate([cxy, wh], axis=1).astype(np.float32))
    labelled = jnp.zeros((batch,), bool)

    def teacher_apply(patches):
        feats = net.apply(variables, patches, train=False,
                          return_features=True)
        Wp, bp = net.final_projection(variables["params"])
        return head_projection_integral(feats, Wp, bp,
                                        cfg.model.num_joints,
                                        cfg.model.depth_dim)

    if dtype == "int8":
        # s8xs8->s32 teacher convs (distill.quantized_teacher_apply):
        # calibration runs the filter's OWN warped patches through the fp
        # sweep; the fused projection head stays fp by construction
        from hand_integral_pose_estimation_tpu.distill.teacher_labels import (
            quantized_teacher_apply,
        )
        teacher_apply, _ = quantized_teacher_apply(
            net, variables, images, K, bbox, cfg.augment,
            cfg.model.num_joints, cfg.model.depth_dim,
            patch_hw=cfg.model.input_shape, forward=teacher_apply)

    return cfg, teacher_apply, images, K, bbox, labelled, joints


def measure_teacher(batch=8, num_rotations=21, rotation_mode="factored",
                    dtype=None):
    """Config #5: teacher-label generation — 21-rotation batched warp +
    teacher forward + variance filter per image. `dtype` overrides the
    teacher's compute dtype (default = config default, bfloat16; the decode
    accumulates fp32 either way)."""
    import functools

    import jax
    import jax.numpy as jnp
    from hand_integral_pose_estimation_tpu.distill.teacher_labels import (
        generate_filtered_labels,
    )

    cfg, teacher_apply, images, K, bbox, labelled, joints = _teacher_setup(
        batch, dtype)

    @functools.partial(jax.jit, static_argnums=(2,))
    def gen_loop(images, joints, n):
        def body(i, imgs):
            out = generate_filtered_labels(
                teacher_apply, imgs, K, bbox, labelled, joints,
                cfg.augment, num_rotations=num_rotations,
                rotation_mode=rotation_mode)
            return imgs + 1e-9 * jnp.sum(out.joint_cam_normalized)
        return jax.lax.fori_loop(0, n, body, images)

    per_call = _diff_timed(
        lambda n: np.asarray(gen_loop(images, joints, n)[0, 0, 0]),
        n_steps=10, reps=3)
    return batch / per_call


def measure_teacher_cascade(batch=8, pass1=5, num_rotations=21,
                            rotation_mode="factored", dtype=None):
    """Config #5 --teacher-cascade: the exact early-reject cascade
    (distill/cascade.py). Times the two passes separately (pass 1 = the
    early-reject subset sweep every sample pays; pass 2 = the remaining
    rotations only pass-1 survivors pay) and reports effective throughput
    as a function of the survival rate f:

        t(f) = t_pass1 + f * t_pass2   per batch

    The host-side f64 variance combine is microseconds per batch against
    ~10 ms of device sweep and is not separately timed. Returns
    (pass1_s_per_batch, pass2_s_per_batch)."""
    import functools

    import jax
    import jax.numpy as jnp
    from hand_integral_pose_estimation_tpu.distill import (
        pass1_rotation_indices,
    )
    from hand_integral_pose_estimation_tpu.distill.teacher_labels import (
        rotation_sweep_camera,
    )

    cfg, teacher_apply, images, K, bbox, _, _ = _teacher_setup(batch, dtype)
    rot_range = 0.52
    thetas = np.linspace(-rot_range, rot_range, num_rotations)
    idx1 = pass1_rotation_indices(num_rotations, pass1)
    idx2 = np.setdiff1d(np.arange(num_rotations), idx1)

    def make_loop(th):
        @functools.partial(jax.jit, static_argnums=(1,))
        def loop(images, n):
            def body(i, imgs):
                cam, _ = rotation_sweep_camera(
                    teacher_apply, imgs, K, bbox, cfg.augment, th,
                    rot_range, cfg.model.input_shape, rotation_mode)
                return imgs + 1e-9 * jnp.sum(cam)
            return jax.lax.fori_loop(0, n, body, images)
        return loop

    loop1, loop2 = make_loop(thetas[idx1]), make_loop(thetas[idx2])
    t1 = _diff_timed(lambda n: np.asarray(loop1(images, n)[0, 0, 0]),
                     n_steps=10, reps=3)
    t2 = _diff_timed(lambda n: np.asarray(loop2(images, n)[0, 0, 0]),
                     n_steps=10, reps=3)
    return t1, t2


def measure_serving_two_program(batch=4, proposals=None, native_scale=None,
                                detector_resnet=None):
    """Config #6: bound the monolithic TwoStagePipeline (whose single MLIR
    the axon tunnel rejects with HTTP 413, PERFORMANCE.md) as the SUM of
    two loop-differenced programs over the same realistic images:
      A) detector -> square+padded crop bbox (detect_hand_crop_bbox);
      B) bbox -> on-device crop/normalise -> pose -> fused integral ->
         camera back-projection + bone rescale (inference.py:60-76).
    Each program chains its iterations through a data dependency; the sum
    over-counts only the one XLA fusion boundary the monolith would merge,
    so it is a valid lower bound on serving throughput."""
    import functools

    import jax
    import jax.numpy as jnp
    from hand_integral_pose_estimation_tpu.config import Config
    from hand_integral_pose_estimation_tpu.data import pipeline
    from hand_integral_pose_estimation_tpu.detect.faster_rcnn import (
        FasterRCNN,
    )
    from hand_integral_pose_estimation_tpu.detect.hand_detector import (
        detect_hand_crop_bbox,
    )
    from hand_integral_pose_estimation_tpu.evaluation import metrics
    from hand_integral_pose_estimation_tpu.geometry import labels
    from hand_integral_pose_estimation_tpu.models import get_pose_net
    from hand_integral_pose_estimation_tpu.ops.fused_head import (
        head_projection_integral,
    )

    import dataclasses

    cfg = Config()
    if native_scale is not None:
        # Native-resolution serving detector: skip the reference's 224->600
        # blob upscale (common/hand_detector.py's short-side-600 protocol)
        # and run detection at `native_scale` with the in-tree from-scratch
        # recipe (DetectorConfig.native; quality evidence: the AP-0.98
        # cli/detector_convergence study). The reference cannot take this
        # knob: its shipped checkpoint is bound to 600-scale statistics.
        from hand_integral_pose_estimation_tpu.config import DetectorConfig
        dcfg = DetectorConfig.native(native_scale, detector_resnet or 101)
        cfg = dataclasses.replace(cfg, detector=dcfg)
    elif detector_resnet is not None:
        cfg = dataclasses.replace(cfg, detector=dataclasses.replace(
            cfg.detector, resnet_type=detector_resnet))
    if proposals is not None:
        cfg = dataclasses.replace(cfg, detector=dataclasses.replace(
            cfg.detector, rpn_post_nms_top_n_test=proposals))
    J, D = cfg.model.num_joints, cfg.model.depth_dim
    hw = cfg.model.input_shape
    H = W = 224  # FreiHAND native resolution; detector blob upscales to 600
    images = _detector_images(batch, H)
    K = jnp.broadcast_to(
        jnp.asarray([[531.9, 0, W / 2.0], [0, 532.2, H / 2.0], [0, 0, 1.0]],
                    jnp.float32), (batch, 3, 3))
    ref_len = jnp.ones((batch,), jnp.float32)

    det = FasterRCNN(cfg=cfg.detector)
    det_vars = det.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        jnp.zeros((1, H, W, 3)))
    net = get_pose_net(cfg.model)
    pose_vars = net.init(jax.random.PRNGKey(0), jnp.zeros((1,) + hw + (3,)))

    @functools.partial(jax.jit, static_argnums=(2,))
    def detect_loop(det_vars, images, n):
        def body(i, imgs):
            bbox = detect_hand_crop_bbox(det, det_vars, imgs, cfg.detector,
                                         pad_factor=cfg.augment.pad_factor)
            return imgs + 1e-9 * jnp.sum(bbox)
        return jax.lax.fori_loop(0, n, body, images)

    bbox0 = detect_hand_crop_bbox(det, det_vars, images, cfg.detector,
                                  pad_factor=cfg.augment.pad_factor)

    @functools.partial(jax.jit, static_argnums=(3,))
    def pose_loop(pose_vars, images, bbox, n):
        def body(i, imgs):
            b = pipeline.make_eval_batch(
                imgs, jnp.zeros((batch, J, 3), jnp.float32), K, bbox,
                ref_len, cfg.augment, hw)
            feats = net.apply(pose_vars, b.image, train=False,
                              return_features=True)
            Wp, bp = net.final_projection(pose_vars["params"])
            coords = head_projection_integral(feats, Wp, bp, J, D)
            cam = labels.patch_label_to_camera(
                coords, b.trans_inv, b.tprime, K, R=None,
                patch_width=hw[1], patch_height=hw[0], derotate=False)
            cam = metrics.scale_by_ref_bone(cam, ref_len)
            return imgs + 1e-9 * jnp.sum(cam)
        return jax.lax.fori_loop(0, n, body, images)

    t_det = _diff_timed(
        lambda n: np.asarray(detect_loop(det_vars, images, n)[0, 0, 0]),
        n_steps=10, reps=3)
    t_pose = _diff_timed(
        lambda n: np.asarray(pose_loop(pose_vars, images, bbox0, n)
                             [0, 0, 0]),
        n_steps=10, reps=3)
    per_call = t_det + t_pose
    return batch / per_call, t_det * 1e3, t_pose * 1e3


def measure_serving_split(batch=4, proposals=None, native_scale=None,
                          detector_resnet=None, dtype=None):
    """Config #6 --split: the ACTUAL production split-program serving path
    (exactly what `cli/evaluate.py --split-detector` dispatches): detector
    upstream, detector downstream + crop math, pose program — three
    chained dispatches per batch, measured as chained wall-clock
    differenced at two chain lengths (per-dispatch client overhead
    included; upper bound on device time). Unlike the two-program BOUND
    above, nothing is summed — this is one number from the real API."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from hand_integral_pose_estimation_tpu.config import (
        Config, DetectorConfig,
    )
    from hand_integral_pose_estimation_tpu.data import pipeline
    from hand_integral_pose_estimation_tpu.detect.faster_rcnn import (
        FasterRCNN,
    )
    from hand_integral_pose_estimation_tpu.detect.hand_detector import (
        detect_hand_crop_bbox,
    )
    from hand_integral_pose_estimation_tpu.evaluation import metrics
    from hand_integral_pose_estimation_tpu.geometry import labels
    from hand_integral_pose_estimation_tpu.models import get_pose_net
    from hand_integral_pose_estimation_tpu.ops.fused_head import (
        head_projection_integral,
    )

    cfg = Config()
    if native_scale is not None:
        dcfg = DetectorConfig.native(native_scale, detector_resnet or 101)
        cfg = dataclasses.replace(cfg, detector=dcfg)
    elif detector_resnet is not None:
        cfg = dataclasses.replace(cfg, detector=dataclasses.replace(
            cfg.detector, resnet_type=detector_resnet))
    if proposals is not None:
        cfg = dataclasses.replace(cfg, detector=dataclasses.replace(
            cfg.detector, rpn_post_nms_top_n_test=proposals))
    if dtype is not None:
        cfg = dataclasses.replace(cfg, detector=dataclasses.replace(
            cfg.detector, compute_dtype=dtype))
    J, D = cfg.model.num_joints, cfg.model.depth_dim
    hw = cfg.model.input_shape
    H = W = 224  # FreiHAND native frame; parity mode blob-upscales to 600
    images = _detector_images(batch, H)
    K = jnp.broadcast_to(
        jnp.asarray([[531.9, 0, W / 2.0], [0, 532.2, H / 2.0], [0, 0, 1.0]],
                    jnp.float32), (batch, 3, 3))
    ref_len = jnp.ones((batch,), jnp.float32)

    det = FasterRCNN(cfg=cfg.detector)
    det_vars = det.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        jnp.zeros((1, H, W, 3)))
    net = get_pose_net(cfg.model)
    pose_vars = net.init(jax.random.PRNGKey(0), jnp.zeros((1,) + hw + (3,)))

    @jax.jit
    def pose_step(pose_vars, imgs, bbox):
        b = pipeline.make_eval_batch(
            imgs, jnp.zeros((batch, J, 3), jnp.float32), K, bbox,
            ref_len, cfg.augment, hw)
        feats = net.apply(pose_vars, b.image, train=False,
                          return_features=True)
        Wp, bp = net.final_projection(pose_vars["params"])
        coords = head_projection_integral(feats, Wp, bp, J, D)
        cam = labels.patch_label_to_camera(
            coords, b.trans_inv, b.tprime, K, R=None,
            patch_width=hw[1], patch_height=hw[0], derotate=False)
        cam = metrics.scale_by_ref_bone(cam, ref_len)
        return imgs + 1e-9 * jnp.sum(cam)

    def chain(k):
        im = images
        for _ in range(k):
            bbox = detect_hand_crop_bbox(det, det_vars, im, cfg.detector,
                                         pad_factor=cfg.augment.pad_factor,
                                         split=True)
            im = pose_step(pose_vars, im, bbox)
        return np.asarray(im[0, 0, 0])

    per_call = _diff_timed(chain, n_steps=10, reps=3)
    return batch / per_call, per_call * 1e3


def measure_serving_monolith(batch=4, native_scale=None,
                             detector_resnet=None, proposals=None,
                             int8=False):
    """Config #6 --monolith: the ACTUAL single-XLA-program TwoStagePipeline
    (detect -> crop -> pose -> camera in one jit), loop-differenced.

    Historically blocked through the axon tunnel: the 600-px R101 program's
    serialized MLIR exceeds the remote compiler's HTTP upload limit
    (HTTP 413, PERFORMANCE.md round 2) — hence the two-program bound above.
    The native-resolution detector (DetectorConfig.native) shrinks the
    program enough that the monolith compiles and runs; measured round 4 it
    agrees with the two-program sum (2.16 vs 2.1 ms/batch-4 at 224/R18),
    validating the bound."""
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp
    from hand_integral_pose_estimation_tpu.config import Config, DetectorConfig
    from hand_integral_pose_estimation_tpu.detect.faster_rcnn import (
        FasterRCNN,
    )
    from hand_integral_pose_estimation_tpu.inference import TwoStagePipeline
    from hand_integral_pose_estimation_tpu.models import get_pose_net

    cfg = Config()
    if native_scale is not None:
        cfg = dataclasses.replace(cfg, detector=DetectorConfig.native(
            native_scale, detector_resnet or 18))
    elif detector_resnet is not None:
        cfg = dataclasses.replace(cfg, detector=dataclasses.replace(
            cfg.detector, resnet_type=detector_resnet))
    if proposals is not None:
        cfg = dataclasses.replace(cfg, detector=dataclasses.replace(
            cfg.detector, rpn_post_nms_top_n_test=proposals))

    H = W = 224
    images = _detector_images(batch, H)
    K = jnp.broadcast_to(
        jnp.asarray([[531.9, 0, W / 2.0], [0, 532.2, H / 2.0], [0, 0, 1.0]],
                    jnp.float32), (batch, 3, 3))
    ref_len = jnp.ones((batch,), jnp.float32)

    det = FasterRCNN(cfg=cfg.detector)
    det_vars = det.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        jnp.zeros((1, H, W, 3)))
    net = get_pose_net(cfg.model)
    pose_vars = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1,) + cfg.model.input_shape + (3,)))
    # int8: the pipeline calibrates + wraps itself (first-class path,
    # inference.TwoStagePipeline(int8_calib=); one Quantized bundle per
    # model because the two nets share relative 'backbone/...' paths)
    pipe = TwoStagePipeline(
        cfg, net, pose_vars, det, det_vars,
        int8_calib=(images, K, ref_len) if int8 else None)
    run = pipe._raw_run

    @functools.partial(jax.jit, static_argnums=(1,))
    def loop(images, n):
        def body(i, imgs):
            cam = run(pose_vars, det_vars, imgs, K, ref_len).joints_cam
            return imgs + 1e-9 * jnp.sum(cam)
        return jax.lax.fori_loop(0, n, body, images)

    per_call = _diff_timed(
        lambda n: np.asarray(loop(images, n)[0, 0, 0]), n_steps=10, reps=3)
    return batch / per_call, per_call * 1e3


def _sustained_split(n_images, size=224):
    """Materialise (once, cached in /tmp) a synthetic eval split of `n`
    224-px JPEGs on disk + GT joints/K/ref_len — the file-backed input the
    north-star sentence starts from (BASELINE.md: decode -> detect -> pose
    -> Procrustes). Scenes come from detect.synthetic (real detectable
    content, not noise — JPEG entropy and NMS cost both depend on it)."""
    import cv2

    d = "/tmp/hipe_bench_split_%d_%d" % (n_images, size)
    meta = os.path.join(d, "meta.npz")
    if not os.path.exists(meta):
        from hand_integral_pose_estimation_tpu.detect.synthetic import (
            make_synthetic_box_dataset,
        )
        os.makedirs(d, exist_ok=True)
        ds = make_synthetic_box_dataset(
            n_images, hw=(size, size), min_size=int(size * 0.25),
            max_size=int(size * 0.62), seed=0)
        rng = np.random.RandomState(0)
        joints = (np.array([0, 0, 0.45])
                  + rng.uniform(-0.03, 0.03, (n_images, 21, 3))
                  ).astype(np.float32)
        for i in range(n_images):
            img = np.asarray(ds.images[i]).astype(np.uint8)
            cv2.imwrite(os.path.join(d, "%06d.jpg" % i), img[:, :, ::-1])
        np.savez(meta, joints=joints)
    joints = np.load(meta)["joints"]
    paths = [os.path.join(d, "%06d.jpg" % i) for i in range(n_images)]
    return paths, joints


def measure_loader(n_images=2048, size=224, threads=(1, 2, 4, 8, 16),
                   batch=32, yuv420=False):
    """Config #8: the native C++ JPEG loader standalone (native/hipe_io.cpp
    thread pool), host-only — the never-measured decode side of the
    north-star roofline. Returns {threads: images/sec} sustained over the
    whole split, submit/wait batched like the Trainer uses it. With
    yuv420=True the decode stops at the file's own subsampled planes
    (chroma upsample + color conversion move on-device, ops/yuv.py)."""
    from hand_integral_pose_estimation_tpu.data.native_loader import (
        NativeLoader, load_library,
    )

    paths, _ = _sustained_split(n_images, size)
    assert load_library() is not None, "native loader failed to build"
    layout = "yuv420" if yuv420 else "rgb"
    out = {}
    for t in threads:
        loader = NativeLoader(batch, size, size, num_threads=t,
                              layout=layout)
        assert loader.available
        batches = [paths[i:i + batch] for i in range(0, len(paths), batch)]
        loader.submit(batches[0])     # warm the pool
        loader.wait()
        t0 = time.perf_counter()
        loader.submit(batches[0])
        for i in range(len(batches)):
            imgs = loader.wait()
            if i + 1 < len(batches):
                loader.submit(batches[i + 1])
        dt = time.perf_counter() - t0
        assert imgs.shape[-1] == (size * size * 3 // 2 if yuv420 else 3)
        out[t] = n_images / dt
        del loader
    return out


def measure_sustained(n_images=1024, batch=32, detector_scale=None,
                      detector_resnet=None, proposals=None, int8=False,
                      loader_threads=None, max_inflight=3, split=False,
                      yuv420=False):
    """Config #7: the LITERAL north-star path, sustained wall-clock —
    JPEG files on disk -> native C++ decode (double-buffered) -> H2D ->
    detector -> crop -> pose -> camera back-projection -> batched
    Procrustes PA-MPJPE over the whole split. Everything the steady-state
    loop numbers exclude is included here: host decode, host->device
    transfer, per-batch dispatch, and the final metric program.

    Detection runs as its own jitted program feeding the jitted pose
    program (the 600-px monolith exceeds the tunnel's upload limit;
    the two-program split was validated against the monolith at native
    scale, PERFORMANCE.md round 4). Dispatch is ASYNC with a bounded
    in-flight queue so decode/H2D/compute overlap — the sustained number
    is max(pipeline stages), not their sum.

    Returns (img_per_sec, decode_only_img_per_sec, pa_mpjpe). With int8=
    True both networks run s8xs8->s32 (first-class TwoStagePipeline path
    semantics, applied per-program here)."""
    import contextlib
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp
    from hand_integral_pose_estimation_tpu.config import (
        Config, DetectorConfig,
    )
    from hand_integral_pose_estimation_tpu.data import pipeline
    from hand_integral_pose_estimation_tpu.data.native_loader import (
        NativeLoader,
    )
    from hand_integral_pose_estimation_tpu.detect.faster_rcnn import (
        FasterRCNN,
    )
    from hand_integral_pose_estimation_tpu.detect.hand_detector import (
        detect_hand_crop_bbox,
    )
    from hand_integral_pose_estimation_tpu.evaluation import metrics
    from hand_integral_pose_estimation_tpu.geometry import (
        labels, procrustes,
    )
    from hand_integral_pose_estimation_tpu.models import get_pose_net
    from hand_integral_pose_estimation_tpu.ops.fused_head import (
        head_projection_integral,
    )

    size = 224                         # FreiHAND native frame
    n_images = (n_images // batch) * batch
    paths, gt_joints = _sustained_split(n_images, size)

    cfg = Config()
    if detector_scale is not None:
        cfg = dataclasses.replace(cfg, detector=DetectorConfig.native(
            detector_scale, detector_resnet or 18))
    elif detector_resnet is not None:
        cfg = dataclasses.replace(cfg, detector=dataclasses.replace(
            cfg.detector, resnet_type=detector_resnet))
    if proposals is not None:
        cfg = dataclasses.replace(cfg, detector=dataclasses.replace(
            cfg.detector, rpn_post_nms_top_n_test=proposals))
    J, D = cfg.model.num_joints, cfg.model.depth_dim
    hw = cfg.model.input_shape

    det = FasterRCNN(cfg=cfg.detector)
    det_vars = det.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        jnp.zeros((1, size, size, 3)))
    net = get_pose_net(cfg.model)
    pose_vars = net.init(jax.random.PRNGKey(0), jnp.zeros((1,) + hw + (3,)))
    K = jnp.broadcast_to(
        jnp.asarray([[531.9, 0, size / 2.0], [0, 532.2, size / 2.0],
                     [0, 0, 1.0]], jnp.float32), (batch, 3, 3))
    ref_len = jnp.ones((batch,), jnp.float32)

    # int8 calibration needs a real decoded batch, so it waits for the
    # loader's first batch below
    loader = NativeLoader(batch, size, size, num_threads=loader_threads,
                          layout="yuv420" if yuv420 else "rgb")
    assert loader.available, "native loader failed to build"
    batches = [paths[i:i + batch] for i in range(0, len(paths), batch)]
    loader.submit(batches[0])
    first = loader.wait()

    if yuv420:
        # the loader ships the file's own subsampled planes (half the H2D
        # bytes against the measured ~38 MB/s tunnel ceiling); one small
        # jitted program finishes the decode on-device, BITWISE equal to
        # the host RGB path (tests/test_yuv.py)
        from hand_integral_pose_estimation_tpu.ops.yuv import yuv420_to_rgb

        @jax.jit
        def convert_prog(packed):
            return yuv420_to_rgb(packed, size, size)

        first_imgs = np.asarray(convert_prog(jnp.asarray(first)))
    else:
        convert_prog = None
        first_imgs = first

    if int8:
        from hand_integral_pose_estimation_tpu.quantize import (
            calibrate, quantize_params, quantized_calls,
        )
        calib = jnp.asarray(first_imgs.astype(np.float32))

        def calib_det(im):
            return detect_hand_crop_bbox(det, det_vars, im, cfg.detector,
                                         pad_factor=cfg.augment.pad_factor)

        bbox_c = calib_det(calib)

        def calib_pose(im):
            b = pipeline.make_eval_batch(
                im, jnp.zeros((batch, J, 3), jnp.float32), K, bbox_c,
                ref_len, cfg.augment, hw)
            return net.apply(pose_vars, b.image, train=False,
                             return_features=True)

        amax_det = calibrate(calib_det, calib, root_type=type(det))
        amax_pose = calibrate(calib_pose, calib, root_type=type(net))
        q_det = dataclasses.replace(
            quantize_params(det_vars["params"], amax_det),
            root_type=type(det))
        q_pose = dataclasses.replace(
            quantize_params(pose_vars["params"], amax_pose,
                            skip=("head/final",)), root_type=type(net))

        def qctx():
            stack = contextlib.ExitStack()
            stack.enter_context(quantized_calls(q_det))
            stack.enter_context(quantized_calls(q_pose))
            return stack
    else:
        qctx = contextlib.nullcontext

    @jax.jit
    def detect_prog(det_vars, images_u8):
        imgs = images_u8.astype(jnp.float32)
        with qctx():
            return detect_hand_crop_bbox(det, det_vars, imgs, cfg.detector,
                                         pad_factor=cfg.augment.pad_factor)

    if split:
        # two-dispatch detector (detect_split): recovers the one-program
        # composition loss at parity scale; the extra dispatch rides the
        # same async queue as everything else
        assert not int8, "--split does not compose with --int8"

        def detect_prog(det_vars, images_u8):              # noqa: F811
            # uint8 goes straight in: prepare_blob casts inside program 1
            # (no eager host-side cast dispatch)
            return detect_hand_crop_bbox(
                det, det_vars, images_u8, cfg.detector,
                pad_factor=cfg.augment.pad_factor, split=True)

    @jax.jit
    def pose_prog(pose_vars, images_u8, bbox):
        imgs = images_u8.astype(jnp.float32)
        b = pipeline.make_eval_batch(
            imgs, jnp.zeros((batch, J, 3), jnp.float32), K, bbox,
            ref_len, cfg.augment, hw)
        with qctx():
            feats = net.apply(pose_vars, b.image, train=False,
                              return_features=True)
        Wp, bp = net.final_projection(pose_vars["params"])
        coords = head_projection_integral(feats, Wp, bp, J, D)
        cam = labels.patch_label_to_camera(
            coords, b.trans_inv, b.tprime, K, R=None,
            patch_width=hw[1], patch_height=hw[0], derotate=False)
        return metrics.scale_by_ref_bone(cam, ref_len)

    @jax.jit
    def eval_prog(preds, gt):
        aligned = procrustes.compute_similarity_transform(
            gt, preds, compute_optimal_scale=True).Z
        return jnp.linalg.norm(aligned - gt, axis=-1).mean()

    gt_dev = jnp.asarray(gt_joints)

    def run_batch(images_u8):
        x = jnp.asarray(images_u8)                 # H2D (uint8: 4x smaller)
        if convert_prog is not None:               # yuv420: 1.5 B/px H2D,
            x = convert_prog(x)                    # finish decode on-device
        bbox = detect_prog(det_vars, x)
        return pose_prog(pose_vars, x, bbox)

    # compile everything OUTSIDE the timed window (steady-state sustained)
    warm_pred = run_batch(first)
    jax.block_until_ready(warm_pred)
    jax.block_until_ready(eval_prog(
        jnp.tile(warm_pred, (len(batches), 1, 1)), gt_dev))

    # ---- timed: decode || H2D || detect+pose, then the Procrustes metric
    t0 = time.perf_counter()
    loader.submit(batches[0])
    preds = []
    for i in range(len(batches)):
        imgs = loader.wait()
        if i + 1 < len(batches):
            loader.submit(batches[i + 1])         # decode overlaps device
        preds.append(run_batch(imgs))
        if len(preds) > max_inflight:             # bound the dispatch queue
            jax.block_until_ready(preds[-1 - max_inflight])
    pa = eval_prog(jnp.concatenate(preds), gt_dev)
    pa = float(pa)                                 # blocks on everything
    total = time.perf_counter() - t0

    # decode-only rate for the roofline decomposition (same loader state)
    t0 = time.perf_counter()
    loader.submit(batches[0])
    for i in range(len(batches)):
        loader.wait()
        if i + 1 < len(batches):
            loader.submit(batches[i + 1])
    decode_dt = time.perf_counter() - t0

    return n_images / total, n_images / decode_dt, pa


def measure_cpu_reference() -> float:
    """Equivalent pipeline the reference way: per-sample cv2 double warp +
    torch CPU ResNet-50+deconv forward + softmax-integral decode."""
    import cv2
    import torch
    import torch.nn as nn

    torch.set_num_threads(os.cpu_count() or 8)

    class Bottleneck(nn.Module):
        def __init__(self, cin, width, stride=1):
            super().__init__()
            cout = width * 4
            self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(width)
            self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(width)
            self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(cout)
            self.relu = nn.ReLU(inplace=True)
            self.down = None
            if stride != 1 or cin != cout:
                self.down = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))

        def forward(self, x):
            idn = self.down(x) if self.down is not None else x
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return self.relu(y + idn)

    def make_r50_posenet():
        layers = []
        layers += [nn.Conv2d(3, 64, 7, 2, 3, bias=False),
                   nn.BatchNorm2d(64), nn.ReLU(inplace=True),
                   nn.MaxPool2d(3, 2, 1)]
        cin = 64
        for stage, (width, n, stride) in enumerate(
                [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]):
            for i in range(n):
                layers.append(Bottleneck(cin, width, stride if i == 0 else 1))
                cin = width * 4
        # deconv head
        for _ in range(3):
            layers += [nn.ConvTranspose2d(cin, 256, 4, 2, 1, bias=False),
                       nn.BatchNorm2d(256), nn.ReLU(inplace=True)]
            cin = 256
        layers.append(nn.Conv2d(256, 21 * 56, 1))
        return nn.Sequential(*layers)

    net = make_r50_posenet().eval()

    rng = np.random.RandomState(0)
    B = 8
    imgs = rng.randint(0, 255, (B, 224, 224, 3)).astype(np.uint8)
    K = np.array([[531.9, 0, 112.0], [0, 532.2, 112.0], [0, 0, 1.0]])
    R = np.eye(3)

    def preprocess(img):
        # the reference's two warpPerspective passes (augment.py:371,409)
        homo = K @ R @ np.linalg.inv(K)
        w1 = cv2.warpPerspective(img, homo, (224, 224))
        trans = np.array([[224 / 150.0, 0, -(112 - 75) * 224 / 150.0],
                          [0, 224 / 150.0, -(112 - 75) * 224 / 150.0],
                          [0, 0, 1.0]])
        patch = cv2.warpPerspective(w1, trans, (224, 224),
                                    flags=cv2.INTER_LINEAR)
        return patch[:, :, ::-1].astype(np.float32)

    def integral(hm):
        hm = hm.reshape(B, 21, 56 * 56 * 56)
        p = torch.softmax(hm, dim=2).reshape(B, 21, 56, 56, 56)
        idx = torch.arange(56, dtype=torch.float32)
        z = (p.sum(dim=(3, 4)) * idx).sum(-1)
        y = (p.sum(dim=(2, 4)) * idx).sum(-1)
        x = (p.sum(dim=(2, 3)) * idx).sum(-1)
        return torch.stack([x, y, z], -1)

    def run_once():
        patches = np.stack([preprocess(im) for im in imgs])
        t = torch.from_numpy(patches.transpose(0, 3, 1, 2).copy())
        t = t - torch.tensor([0.4559, 0.5142, 0.5148]).view(1, 3, 1, 1)
        with torch.no_grad():
            hm = net(t)
            coords = integral(hm)
        return coords

    run_once()  # warmup
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        run_once()
    dt = (time.perf_counter() - t0) / n
    return B / dt


def _cpu_baseline(force=False):
    if force or not os.path.exists(_CACHE):
        cpu_ips = measure_cpu_reference()
        with open(_CACHE, "w") as f:
            json.dump({"cpu_images_per_sec": cpu_ips,
                       "batch": 8, "note": "torch CPU R50 posenet + cv2 "
                       "double-warp preprocess + integral decode"}, f)
    with open(_CACHE) as f:
        return json.load(f)["cpu_images_per_sec"]


def _parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=int, action="append", default=None,
                   choices=(2, 3, 4, 5, 6, 7, 8))
    p.add_argument("--all", action="store_true")
    p.add_argument("--batch", type=int, default=BATCH)
    p.add_argument("--cpu-baseline", action="store_true",
                   help="re-measure the cached CPU reference")
    p.add_argument("--rotation-mode", default="factored",
                   choices=("factored", "composed"),
                   help="config 5: teacher sweep warp structure")
    p.add_argument("--teacher-batch", type=int, default=8,
                   help="config 5: images per generation batch (each runs "
                   "batch*21 rotated teacher forwards)")
    p.add_argument("--teacher-dtype", default=None,
                   choices=("float32", "bfloat16", "int8"),
                   help="config 5: override the teacher compute dtype "
                   "(default = config default, bfloat16; int8 runs the "
                   "teacher convs as s8xs8->s32 via "
                   "distill.quantized_teacher_apply, keep-set gate "
                   "tests/test_distill.py::TestTeacherInt8)")
    p.add_argument("--teacher-cascade", type=int, default=None,
                   metavar="PASS1_ROTATIONS",
                   help="config 5: measure the exact early-reject cascade "
                   "instead of the single-pass sweep — reports pass-1/"
                   "pass-2 cost and effective img/s vs pass-1 survival "
                   "rate (distill/cascade.py)")
    p.add_argument("--proposals", type=int, default=None,
                   help="config 4: override rpn_post_nms_top_n_test "
                   "(serving knob; default keeps reference parity at 300)")
    p.add_argument("--detector-scale", type=int, default=None,
                   metavar="PX",
                   help="configs 4/6: run the detector at this resolution "
                   "with the in-tree from-scratch recipe instead of the "
                   "reference's short-side-600 blob (224 = FreiHAND native "
                   "resolution, no upscale; quality evidence: "
                   "cli/detector_convergence AP study)")
    p.add_argument("--detector-resnet", type=int, default=None,
                   help="configs 4/6: detector backbone depth override "
                   "(default 101 = reference parity)")
    p.add_argument("--detector-dtype", default=None,
                   choices=("float32", "bfloat16"),
                   help="config 4: detector conv-stack compute dtype "
                   "(DetectorConfig.compute_dtype; decode/NMS/softmax "
                   "always run float32)")
    p.add_argument("--split", action="store_true",
                   help="configs 4/6/7: dispatch the detector as TWO programs "
                   "(detect_split: upstream base+RPN+proposals, downstream "
                   "ROIAlign+tail+NMS) — recovers the ~29 %% one-program "
                   "composition loss (PERFORMANCE.md round-5 detector "
                   "section); chained wall-clock, upper bound on device "
                   "time")
    p.add_argument("--monolith", action="store_true",
                   help="config 6: measure the actual single-XLA-program "
                   "TwoStagePipeline instead of the two-program bound "
                   "(compiles through the tunnel at native scales; the "
                   "600-px parity program exceeds the remote compiler's "
                   "upload limit, HTTP 413)")
    p.add_argument("--serving-batch", type=int, default=4,
                   help="configs 4/6: detection/serving batch size "
                   "(default 4 = the latency-oriented setting every prior "
                   "round measured; larger batches measure the "
                   "throughput-oriented deployment)")
    p.add_argument("--int8", action="store_true",
                   help="configs 2/4/6-monolith: run the conv stacks as "
                   "s8xs8->s32 MXU ops (post-training quantization, "
                   "quantize/ptq.py; per-channel weights + calibrated "
                   "per-tensor activations; decode/epilogues stay fp). "
                   "Accuracy gate: tests/test_quantize.py")
    p.add_argument("--sustained-images", type=int, default=1024,
                   help="config 7: number of on-disk JPEGs in the "
                   "sustained sweep (rounded down to a batch multiple)")
    p.add_argument("--loader-threads", type=int, default=None,
                   help="config 7: decode thread count (default: the "
                   "NativeLoader default, min(cpus, 16))")
    p.add_argument("--yuv420", action="store_true",
                   help="configs 7/8: decode to the JPEG's own subsampled "
                        "4:2:0 planes on the host and finish (fancy "
                        "upsample + color convert, bitwise libjpeg-equal) "
                        "on-device — halves H2D bytes and host decode "
                        "work (ops/yuv.py; gate: tests/test_yuv.py)")
    p.add_argument("--raw", action="store_true",
                   help="measure in-process with no watchdog (the guarded "
                   "parent invokes this in a subprocess)")
    return p.parse_args(argv)


def _run_raw_config(c, args):
    """Measure one config in-process and print its JSON line."""
    if c == 2:
        # the CPU torch+cv2 reference baseline is only the headline's
        # comparison point — don't pay for it on configs 3-5
        cpu_ips = _cpu_baseline(force=args.cpu_baseline)
        ips = measure_inference(args.batch, int8=args.int8)
        out = {
            "metric": "freihand_e2e_inference_images_per_sec_per_chip",
            "value": round(ips, 1),
            "unit": "images/sec/chip",
            "vs_baseline": round(ips / cpu_ips, 2),
        }
        if args.int8:
            out["int8"] = True
        print(json.dumps(out))
    elif c == 3:
        ips = measure_train(args.batch)
        print(json.dumps({
            "metric": "freihand_train_images_per_sec_per_chip",
            "value": round(ips, 1), "unit": "images/sec/chip",
            "batch": args.batch}))
    elif c == 4:
        size = args.detector_scale or 600
        if args.split:
            assert not args.int8, "--split does not compose with --int8"
            ips, ms = measure_detector_split(
                batch=args.serving_batch, size=size,
                resnet_type=args.detector_resnet or 101,
                proposals=args.proposals,
                native=args.detector_scale is not None,
                dtype=args.detector_dtype)
        else:
            ips, ms = measure_detector(
                batch=args.serving_batch, size=size,
                resnet_type=args.detector_resnet or 101,
                proposals=args.proposals,
                native=args.detector_scale is not None,
                int8=args.int8, dtype=args.detector_dtype)
        out = {
            "metric": "detector_two_stage_images_per_sec_per_chip",
            "value": round(ips, 1), "unit": "images/sec/chip",
            "ms_per_batch%d_%dpx" % (args.serving_batch, size): round(ms, 1)}
        if args.split:
            out["split"] = True
        if args.int8:
            out["int8"] = True
        if args.proposals is not None:
            out["proposals"] = args.proposals
        if args.detector_scale is not None:
            out["detector_scale"] = args.detector_scale
        if args.detector_resnet is not None:
            out["detector_resnet"] = args.detector_resnet
        if args.detector_dtype is not None:
            out["detector_dtype"] = args.detector_dtype
        print(json.dumps(out))
    elif c == 5:
        if args.teacher_cascade is not None:
            b = args.teacher_batch
            t1, t2 = measure_teacher_cascade(
                batch=b, pass1=args.teacher_cascade,
                rotation_mode=args.rotation_mode, dtype=args.teacher_dtype)
            eff = {f"eff_f{int(f * 100)}": round(b / (t1 + f * t2), 1)
                   for f in (0.0, 0.25, 0.5, 0.75, 1.0)}
            out = {
                "metric": "teacher_label_cascade_images_per_sec_per_chip",
                # headline at f=0.5 survival; the eff_f* grid spans the range
                "value": eff["eff_f50"], "unit": "images/sec/chip",
                "rotations": 21, "pass1_rotations": args.teacher_cascade,
                "rotation_mode": args.rotation_mode,
                "pass1_ms_per_batch": round(t1 * 1e3, 2),
                "pass2_ms_per_batch": round(t2 * 1e3, 2),
                "note": "exact keep set; t(f) = pass1 + f*pass2, "
                        "f = pass-1 survival rate", **eff}
        else:
            ips = measure_teacher(batch=args.teacher_batch,
                                  rotation_mode=args.rotation_mode,
                                  dtype=args.teacher_dtype)
            out = {
                "metric": "teacher_label_images_per_sec_per_chip",
                "value": round(ips, 1), "unit": "images/sec/chip",
                "rotations": 21, "rotation_mode": args.rotation_mode}
        if args.teacher_batch != 8:
            out["batch"] = args.teacher_batch
        if args.teacher_dtype is not None:
            out["teacher_dtype"] = args.teacher_dtype
        print(json.dumps(out))
    elif c == 7:
        ips, decode_ips, pa = measure_sustained(
            n_images=args.sustained_images, batch=args.batch,
            detector_scale=args.detector_scale,
            detector_resnet=args.detector_resnet,
            proposals=args.proposals, int8=args.int8,
            loader_threads=args.loader_threads, split=args.split,
            yuv420=args.yuv420)
        out = {
            "metric": "sustained_e2e_images_per_sec_per_chip",
            "value": round(ips, 1), "unit": "images/sec/chip",
            "decode_only_images_per_sec": round(decode_ips, 1),
            "pa_mpjpe": round(pa, 6),
            "images": args.sustained_images, "batch": args.batch,
            "note": "disk JPEG -> native decode -> H2D -> detect -> pose "
                    "-> Procrustes PA-MPJPE, sustained wall-clock "
                    "(the BASELINE.md north-star sentence)"}
        if args.int8:
            out["int8"] = True
        if args.split:
            out["split"] = True
        if args.yuv420:
            out["yuv420"] = True
        if args.proposals is not None:
            out["proposals"] = args.proposals
        if args.detector_scale is not None:
            out["detector_scale"] = args.detector_scale
        if args.detector_resnet is not None:
            out["detector_resnet"] = args.detector_resnet
        if args.loader_threads is not None:
            out["loader_threads"] = args.loader_threads
        print(json.dumps(out))
    elif c == 8:
        rates = measure_loader(yuv420=args.yuv420)
        best_t = max(rates, key=rates.get)
        out = {
            "metric": "native_jpeg_decode_images_per_sec",
            "value": round(rates[best_t], 1), "unit": "images/sec",
            "best_threads": best_t,
            "per_thread_count": {str(k): round(v, 1)
                                 for k, v in rates.items()},
            "note": "native/hipe_io.cpp thread pool, 224px JPEGs, "
                    "host-only (the decode side of the sustained "
                    "roofline)"}
        if args.yuv420:
            out["yuv420"] = True
        print(json.dumps(out))
    elif c == 6:
        sb = args.serving_batch
        if args.monolith:
            ips, ms = measure_serving_monolith(
                batch=sb, proposals=args.proposals,
                native_scale=args.detector_scale,
                detector_resnet=args.detector_resnet, int8=args.int8)
            out = {
                "metric": "serving_two_stage_images_per_sec_per_chip",
                "value": round(ips, 1), "unit": "images/sec/chip",
                "ms_per_batch%d" % sb: round(ms, 2),
                "note": "single-XLA-program TwoStagePipeline monolith"}
            if args.int8:
                out["int8"] = True
        elif args.split:
            assert not args.int8, "--split does not compose with --int8"
            ips, ms = measure_serving_split(
                batch=sb, proposals=args.proposals,
                native_scale=args.detector_scale,
                detector_resnet=args.detector_resnet,
                dtype=args.detector_dtype)
            out = {
                "metric": "serving_two_stage_images_per_sec_per_chip",
                "value": round(ips, 1), "unit": "images/sec/chip",
                "ms_per_batch%d" % sb: round(ms, 2),
                "split": True,
                "note": "three-dispatch split-program serving path "
                        "(detect_split + pose program), chained "
                        "wall-clock"}
        else:
            ips, det_ms, pose_ms = measure_serving_two_program(
                batch=sb, proposals=args.proposals,
                native_scale=args.detector_scale,
                detector_resnet=args.detector_resnet)
            out = {
                "metric": "serving_two_stage_images_per_sec_per_chip",
                "value": round(ips, 1), "unit": "images/sec/chip",
                "detect_ms_batch%d" % sb: round(det_ms, 1),
                "pose_ms_batch%d" % sb: round(pose_ms, 1),
                "note": "two-program loop-differenced bound"}
        if args.proposals is not None:
            out["proposals"] = args.proposals
        if args.detector_scale is not None:
            out["detector_scale"] = args.detector_scale
            out["note"] += ("; native-res in-tree detector recipe "
                            "(study config), not the reference 600 blob")
        if args.detector_resnet is not None:
            out["detector_resnet"] = args.detector_resnet
        print(json.dumps(out))


# ---------------------------------------------------------------------------
# Outage-proof guarded driver path
# ---------------------------------------------------------------------------

_METRIC_BY_CONFIG = {
    2: "freihand_e2e_inference_images_per_sec_per_chip",
    3: "freihand_train_images_per_sec_per_chip",
    4: "detector_two_stage_images_per_sec_per_chip",
    5: "teacher_label_images_per_sec_per_chip",
    6: "serving_two_stage_images_per_sec_per_chip",
    7: "sustained_e2e_images_per_sec_per_chip",
    8: "native_jpeg_decode_images_per_sec",
}

_PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "print('HIPE_PROBE_OK', float(jnp.sum(jnp.ones((128, 128)))))"
)


def _load_lkg():
    try:
        with open(_LKG) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _store_lkg(record):
    lkg = _load_lkg()
    entry = dict(record)
    entry["captured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    lkg[record["metric"]] = entry
    tmp = _LKG + ".tmp"
    with open(tmp, "w") as f:
        json.dump(lkg, f, indent=1, sort_keys=True)
    os.replace(tmp, _LKG)


def _probe_cmd():
    # Test seam: HIPE_BENCH_SIMULATE_OUTAGE genuinely exercises the hang
    # (sleep past the timeout) / error paths without touching the backend.
    sim = os.environ.get("HIPE_BENCH_SIMULATE_OUTAGE")
    if sim == "hang":
        return [sys.executable, "-c", "import time; time.sleep(10**6)"]
    if sim == "error":
        return [sys.executable, "-c",
                "raise SystemExit('UNAVAILABLE: simulated')"]
    return [sys.executable, "-c", _PROBE_SRC]


def _tpu_alive():
    """Probe the backend in a subprocess under a hard timeout; retry over a
    bounded window. Returns (ok, reason)."""
    reason = "unknown"
    for attempt in range(PROBE_RETRIES):
        try:
            r = subprocess.run(_probe_cmd(), capture_output=True, text=True,
                               timeout=PROBE_TIMEOUT)
            if r.returncode == 0 and "HIPE_PROBE_OK" in r.stdout:
                return True, ""
            tail = (r.stderr or r.stdout).strip().splitlines()
            reason = "probe rc=%d: %s" % (r.returncode,
                                          tail[-1] if tail else "")
        except subprocess.TimeoutExpired:
            reason = ("probe hung past %.0fs (backend-init hang mode)"
                      % PROBE_TIMEOUT)
        except OSError as e:
            reason = "probe spawn failed: %s" % e
        if attempt + 1 < PROBE_RETRIES:
            time.sleep(PROBE_RETRY_SLEEP)
    return False, reason


def _raw_cmd(c, args):
    """The `bench.py --raw` invocation reproducing every knob of `args`.

    Keep in sync with _parse_args: a knob missing here silently measures
    the DEFAULT shape in the subprocess while the caller believes the knob
    was applied (tests/test_bench_guard.py::test_raw_cmd_forwards_every_knob
    guards this)."""
    cmd = [sys.executable, os.path.abspath(__file__), "--raw",
           "--config", str(c), "--batch", str(args.batch),
           "--rotation-mode", args.rotation_mode,
           "--teacher-batch", str(args.teacher_batch)]
    if args.teacher_dtype is not None:
        cmd += ["--teacher-dtype", args.teacher_dtype]
    if args.teacher_cascade is not None:
        cmd += ["--teacher-cascade", str(args.teacher_cascade)]
    if args.proposals is not None:
        cmd += ["--proposals", str(args.proposals)]
    if args.detector_scale is not None:
        cmd += ["--detector-scale", str(args.detector_scale)]
    if args.detector_resnet is not None:
        cmd += ["--detector-resnet", str(args.detector_resnet)]
    if args.detector_dtype is not None:
        cmd += ["--detector-dtype", args.detector_dtype]
    if args.split:
        cmd += ["--split"]
    if args.monolith:
        cmd += ["--monolith"]
    if args.int8:
        cmd += ["--int8"]
    if args.sustained_images != 1024:
        cmd += ["--sustained-images", str(args.sustained_images)]
    if args.loader_threads is not None:
        cmd += ["--loader-threads", str(args.loader_threads)]
    if args.yuv420:
        cmd += ["--yuv420"]
    if args.serving_batch != 4:
        cmd += ["--serving-batch", str(args.serving_batch)]
    if args.cpu_baseline and c == 2:
        cmd += ["--cpu-baseline"]
    return cmd


def _measure_in_subprocess(c, args):
    """Run one config's measurement as `bench.py --raw` under a watchdog.
    Returns (record_or_None, reason)."""
    cmd = _raw_cmd(c, args)
    if os.environ.get("HIPE_BENCH_SIMULATE_OUTAGE"):
        # the simulated outage must also fail the measurement stage when the
        # probe is (hypothetically) let through
        cmd = _probe_cmd()
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=MEASURE_TIMEOUT)
    except subprocess.TimeoutExpired:
        return None, ("measurement hung past %.0fs (tunnel died mid-run)"
                      % MEASURE_TIMEOUT)
    except OSError as e:
        return None, "measurement spawn failed: %s" % e
    if r.returncode != 0:
        tail = (r.stderr or r.stdout).strip().splitlines()
        return None, "measurement rc=%d: %s" % (r.returncode,
                                                tail[-1] if tail else "")
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if isinstance(rec, dict) and rec.get("metric"):
            return rec, ""
    return None, "measurement produced no JSON line"


def _is_default_shape(args):
    """True iff this run's knobs match the default shapes — only those runs
    may refresh the last-known-good cache (a knob run would poison the
    outage fallback with a non-headline number)."""
    return (args.batch == BATCH and args.proposals is None
            and args.rotation_mode == "factored"
            and args.teacher_batch == 8
            and args.teacher_dtype is None
            and args.teacher_cascade is None
            and args.detector_scale is None
            and args.detector_resnet is None
            and args.detector_dtype is None
            and not args.monolith
            and not args.split
            and not args.int8
            and args.serving_batch == 4
            and args.sustained_images == 1024
            and args.loader_threads is None
            and not args.yuv420)


def _emit_stale(c, reason, args=None):
    """Print the last-known-good record for config `c`, marked stale."""
    metric = _METRIC_BY_CONFIG[c]
    if c == 5 and args is not None and args.teacher_cascade is not None:
        metric = "teacher_label_cascade_images_per_sec_per_chip"
    lkg = _load_lkg().get(metric)
    if lkg is not None:
        out = dict(lkg)
        out["stale"] = True
        out["stale_from"] = out.pop("captured_at", None)
        out["error"] = "tpu_unavailable: " + reason
    else:
        out = {"metric": metric, "value": 0.0, "unit": "images/sec/chip",
               "vs_baseline": 0.0, "stale": True,
               "error": "tpu_unavailable (no cached last-known-good): "
                        + reason}
    print(json.dumps(out))


def main():
    args = _parse_args()
    configs = args.config or [2]
    if args.all:
        configs = [2, 3, 4, 5, 6]

    if args.raw:
        for c in configs:
            _run_raw_config(c, args)
        return

    # config 8 is host-only (JPEG decode): it never needs the device probe
    ok, reason = ((True, "") if configs == [8] else _tpu_alive())
    for c in configs:
        if not ok and c != 8:
            _emit_stale(c, reason, args)
            continue
        rec, why = _measure_in_subprocess(c, args)
        if rec is None:
            # tunnel may have died between probe and measurement: re-probe
            # once so remaining configs fail fast instead of re-timing out
            _emit_stale(c, why, args)
            ok, reason = _tpu_alive()
            continue
        # refresh the cache only for default-shaped runs (non-default
        # batch/proposals/rotation-mode/dtype would poison the fallback)
        if _is_default_shape(args):
            _store_lkg(rec)
        print(json.dumps(rec))


if __name__ == "__main__":
    try:
        main()
    except KeyboardInterrupt:
        raise
    except Exception as e:  # noqa: BLE001 — the driver contract is rc 0
        # last-ditch: even a bug in the guarded path must not erase the
        # round's perf record with a traceback
        args = None
        try:
            args = _parse_args()
        except SystemExit:
            pass
        if args is not None and not args.raw:
            for c in (args.config or ([2, 3, 4, 5, 6] if args.all else [2])):
                _emit_stale(c, "bench wrapper error: %r" % e)
        else:
            raise
