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
    global batch must divide by the data-axis size."""

    def __init__(self, cfg: Config, pose_net: ResPoseNet, pose_variables,
                 detector: FasterRCNN, detector_variables, mesh=None):
        self.cfg = cfg
        self.pose_net = pose_net
        self.pose_variables = pose_variables
        self.detector = detector
        self.detector_variables = detector_variables
        self.mesh = mesh
        run = self._build()
        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            data = P("data")
            run = jax.shard_map(run, mesh=mesh,
                                in_specs=(P(), P(), data, data, data),
                                out_specs=data, check_vma=False)
        self._run = jax.jit(run)

    def _build(self):
        cfg = self.cfg
        J, D = cfg.model.num_joints, cfg.model.depth_dim
        hw = cfg.model.input_shape

        def run(pose_vars, det_vars, images_rgb, K, ref_bone_len):
            # stage 1: detector -> square+padded crop boxes
            bbox = detect_hand_crop_bbox(self.detector, det_vars,
                                         images_rgb, cfg.detector,
                                         pad_factor=cfg.augment.pad_factor)
            # stage 2: on-device crop (R = I eval path) + pose net
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
        return run

    def __call__(self, images_rgb, K, ref_bone_len) -> PipelineOutput:
        return self._run(self.pose_variables, self.detector_variables,
                         images_rgb, K, ref_bone_len)
