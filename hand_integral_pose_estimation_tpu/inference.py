"""Two-stage inference: raw image -> detector -> crop -> pose -> 3D joints.

The full production path (BASELINE config #4; reference call stacks §3.3-3.4:
`HandDetector.detect` -> `find_bb_hand_detector` square+pad crop ->
`generate_input_unlabelled` -> pose net -> integral -> back-projection) as a
single jitted function: both networks, the crop warp, the fused decode and
the camera back-projection run in one XLA program with zero host round trips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hand_integral_pose_estimation_tpu.config import Config
from hand_integral_pose_estimation_tpu.data import pipeline
from hand_integral_pose_estimation_tpu.detect.faster_rcnn import FasterRCNN
from hand_integral_pose_estimation_tpu.detect.hand_detector import (
    detect_hand_crop_bbox,
)
from hand_integral_pose_estimation_tpu.evaluation import metrics
from hand_integral_pose_estimation_tpu.models.pose_net import ResPoseNet
from hand_integral_pose_estimation_tpu.ops.fused_head import (
    head_projection_integral,
)


class PipelineOutput(NamedTuple):
    joints_cam: jnp.ndarray       # (B, J, 3) metric camera-frame joints
    coords_label: jnp.ndarray     # (B, J, 3) raw integral outputs
    crop_bbox: jnp.ndarray        # (B, 4) detector-derived crop box
    tprime: jnp.ndarray           # (B,)


class TwoStagePipeline:
    """Bundles a detector and a pose net into one jittable callable.

    With `mesh`, the whole two-stage program runs inside one `shard_map`
    region: images/K/ref_bone_len shard over `data`, both networks'
    weights are replicated, and every stage (detector, crop warp, pose
    forward, fused decode, back-projection) executes on its own batch
    shard — serving scales over the mesh exactly like the reference
    wrapping both nets in DataParallel (common/base.py:179-284). The
    global batch must divide by the data-axis size.

    With `int8_calib=(images_rgb, K, ref_bone_len)`, both networks'
    convs/matmuls execute as s8xs8->s32 MXU ops (quantize/ptq.py):
    construction calibrates per-tensor activation scales by running the
    pipeline itself on the given batch — once per model, because the two
    networks share relative flax paths ('backbone/...') and must each
    replay under their own root-type filter. The fused projection head
    stays fp (its params are consumed directly by the Pallas kernel).
    Composes with `mesh`: calibration runs un-meshed (scales are data
    statistics), the quantized program then shards over `data`. The
    bundles land on `self.quantized = (q_pose, q_det)` for reuse."""

    def __init__(self, cfg: Config, pose_net: ResPoseNet, pose_variables,
                 detector: FasterRCNN, detector_variables, mesh=None,
                 int8_calib=None, split_detector: bool = False):
        self.cfg = cfg
        self.pose_net = pose_net
        self.pose_variables = pose_variables
        self.detector = detector
        self.detector_variables = detector_variables
        self.mesh = mesh
        self.quantized = None
        self.split_detector = split_detector
        run = self._build()
        if split_detector:
            # latency knob: the detector dispatches as TWO programs
            # (detect_split — recovers the ~29 % one-program composition
            # loss at parity scale, PERFORMANCE.md round-5 detector
            # section) and the pose stage as a third. Single-chip serving
            # only: the multi-dispatch path can't live inside one
            # shard_map region, and the pre-jitted split programs would
            # silently miss the int8 trace-time interception.
            if mesh is not None:
                raise ValueError("split_detector does not compose with "
                                 "mesh — shard_map needs one program")
            if int8_calib is not None:
                raise ValueError("split_detector does not compose with "
                                 "int8_calib (trace-time interception "
                                 "cannot reach the cached split programs)")
            self._pose_run = jax.jit(self._pose_stage)
            self._run = None
            return
        if int8_calib is not None:
            run = self._quantize(run, int8_calib)
        # un-jitted, un-meshed program (int8 applied); bench.py chains it
        # through a device-side fori_loop for tunnel-safe timing
        self._raw_run = run
        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            data = P("data")
            run = jax.shard_map(run, mesh=mesh,
                                in_specs=(P(), P(), data, data, data),
                                out_specs=data, check_vma=False)
        self._run = jax.jit(run)

    def _quantize(self, run, int8_calib):
        """Calibrate both nets through the pipeline program and wrap `run`
        so every traced conv/dense replays int8 (trace-time interception —
        the wrapper activates inside whatever jit/shard_map traces it).

        `int8_calib` is either `(images_rgb, K, ref_bone_len)` calibration
        inputs, or a pre-built `(q_pose, q_det)` pair of `Quantized`
        bundles (e.g. from `quantize.load_quantized` — calibrate once,
        ship the bundles to every serving process)."""
        from hand_integral_pose_estimation_tpu.quantize import (
            Quantized, calibrate, quantize_params, quantized_calls,
            verify_source_params,
        )
        import dataclasses

        if (len(int8_calib) == 2
                and all(isinstance(x, Quantized) for x in int8_calib)):
            q_pose, q_det = int8_calib
            for q, want in ((q_pose, type(self.pose_net)),
                            (q_det, type(self.detector))):
                if q.root_type is None:
                    # both nets share relative 'backbone/...' paths, so an
                    # unlabelled bundle in the wrong slot would silently
                    # replay the other model's weights — require the label
                    # (load_quantized(root_type=...) sets it)
                    raise ValueError(
                        "pre-built int8 bundles must carry root_type "
                        f"(expected {want.__name__}); load them with "
                        "quantize.load_quantized(path, root_type=ModelCls)")
                if q.root_type is not want:
                    raise ValueError(
                        f"int8 bundle order is (q_pose, q_det): got a "
                        f"{q.root_type.__name__} bundle where a "
                        f"{want.__name__} one was expected")
            # the bundle carries its own kernels, so pairing a stale bundle
            # with a newer checkpoint would silently serve old weights
            verify_source_params(q_pose, self.pose_variables["params"],
                                 "pose net")
            verify_source_params(q_det, self.detector_variables["params"],
                                 "detector")
        else:
            images, K, ref = int8_calib
            pv, dv = self.pose_variables, self.detector_variables

            def calib_fn(im):
                return run(pv, dv, im, K, ref).joints_cam

            amax_det = calibrate(calib_fn, images,
                                 root_type=type(self.detector))
            amax_pose = calibrate(calib_fn, images,
                                  root_type=type(self.pose_net))
            q_det = dataclasses.replace(
                quantize_params(dv["params"], amax_det),
                root_type=type(self.detector))
            q_pose = dataclasses.replace(
                quantize_params(pv["params"], amax_pose,
                                skip=("head/final",)),
                root_type=type(self.pose_net))
        self.quantized = (q_pose, q_det)

        def qrun(pose_vars, det_vars, images_rgb, K, ref_bone_len):
            with quantized_calls(q_det), quantized_calls(q_pose):
                return run(pose_vars, det_vars, images_rgb, K, ref_bone_len)
        return qrun

    def _pose_stage(self, pose_vars, images_rgb, bbox, K, ref_bone_len):
        """Stage 2: on-device crop (R = I eval path) + pose net + fused
        decode + camera back-projection, from a given crop box."""
        cfg = self.cfg
        J, D = cfg.model.num_joints, cfg.model.depth_dim
        hw = cfg.model.input_shape
        batch = pipeline.make_eval_batch(
            images_rgb, jnp.zeros((images_rgb.shape[0], J, 3),
                                  jnp.float32),
            K, bbox, ref_bone_len, cfg.augment, hw)
        # fused projection+integral: the heatmap never leaves VMEM
        feats = self.pose_net.apply(pose_vars, batch.image, train=False,
                                    return_features=True)
        Wp, bp = self.pose_net.final_projection(pose_vars["params"])
        coords = head_projection_integral(feats, Wp, bp, J, D)
        # back-projection without derotation + bone rescale
        # (evaluate_evaluations contract, FreiHand.py:853-917)
        from hand_integral_pose_estimation_tpu.geometry import labels
        cam = labels.patch_label_to_camera(
            coords, batch.trans_inv, batch.tprime, K, R=None,
            patch_width=hw[1], patch_height=hw[0], derotate=False)
        cam = metrics.scale_by_ref_bone(cam, ref_bone_len)
        return PipelineOutput(joints_cam=cam, coords_label=coords,
                              crop_bbox=bbox, tprime=batch.tprime)

    def _build(self):
        cfg = self.cfg

        def run(pose_vars, det_vars, images_rgb, K, ref_bone_len):
            # stage 1: detector -> square+padded crop boxes
            bbox = detect_hand_crop_bbox(self.detector, det_vars,
                                         images_rgb, cfg.detector,
                                         pad_factor=cfg.augment.pad_factor)
            return self._pose_stage(pose_vars, images_rgb, bbox, K,
                                    ref_bone_len)
        return run

    def __call__(self, images_rgb, K, ref_bone_len) -> PipelineOutput:
        if self.split_detector:
            bbox = detect_hand_crop_bbox(
                self.detector, self.detector_variables, images_rgb,
                self.cfg.detector, pad_factor=self.cfg.augment.pad_factor,
                split=True)
            return self._pose_run(self.pose_variables, images_rgb, bbox,
                                  K, ref_bone_len)
        return self._run(self.pose_variables, self.detector_variables,
                         images_rgb, K, ref_bone_len)
