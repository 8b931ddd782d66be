"""Convert torch checkpoints to this package's flax variable trees.

The reference initialises its pose backbone from torchvision ImageNet
weights (common/nets/resnet.py:70-76) and loads an externally-trained
Faster R-CNN hand detector from `faster_rcnn_{session}_{epoch}_{step}.pth`
(common/hand_detector.py:111-158); its whole training recipe presumes
those weights.  These converters ingest the same state dicts into the
NHWC flax modules:

  * torchvision/reference ResNet state dict  -> ResNetBackbone /
    ResNetStage4 variables (`convert_torchvision_resnet`,
    `convert_resnet_stage4`);
  * the jwyang-layout faster-rcnn `checkpoint["model"]` state dict
    (RCNN_base / RCNN_top / RCNN_rpn.* / RCNN_cls_score / RCNN_bbox_pred,
    lib/model_rcnn/faster_rcnn/resnet.py:229-288 + rpn/rpn.py:21-43)
    -> full FasterRCNN variables (`convert_faster_rcnn_state_dict`).

Layout rules (the only transforms — no numerics):
  * conv weights: torch (out, in, kh, kw) -> flax (kh, kw, in, out);
  * linear weights: torch (out, in) -> flax (in, out);
  * BatchNorm: weight/bias -> scale/bias params; running_mean/var ->
    batch_stats mean/var (`num_batches_tracked` is dropped);
  * the RPN cls conv's 2A output channels: torch orders them
    [bg x A, fg x A] (rpn.py:70-76 reshapes (B, 2A, H, W) -> (B, 2, A*H, W)
    and the proposal layer takes the LAST A channels as foreground,
    proposal_layer.py:43), while FasterRCNN reshapes to (..., A, 2) —
    channel a*2 + k.  The converter permutes out-channels accordingly.
    Anchor order within A (ratio-major, then scale) matches by the
    grid-anchors oracle test, so no A permutation is needed.
  * bbox heads are class-major 4-tuples in both (no permutation).

Converters are STRICT: every source key must be consumed and every target
leaf produced, with shape checks — a wrong-architecture checkpoint fails
attributably, not with NaN outputs.  They only target `norm="batch"`
modules (the reference's only mode); the detector converter requires
`resnet_style="caffe"` (see models/resnet.py:Bottleneck.stride_style).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from hand_integral_pose_estimation_tpu.models.resnet import RESNET_SPECS

Variables = Dict[str, Any]


def _np(x) -> np.ndarray:
    """torch tensor / array-like -> float32 numpy (host, no grad)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


class _Consumer:
    """Strict state-dict reader: every `take` must hit, and `finish`
    verifies nothing (except num_batches_tracked) was left behind."""

    def __init__(self, state_dict: Mapping[str, Any], what: str):
        self.sd = dict(state_dict)
        self.what = what

    def take(self, key: str, shape: Tuple[int, ...] = None) -> np.ndarray:
        if key not in self.sd:
            near = [k for k in self.sd if k.split(".")[0] == key.split(".")[0]]
            raise KeyError(
                f"{self.what}: missing key {key!r} "
                f"(same-prefix keys present: {near[:5]})")
        v = _np(self.sd.pop(key))
        if shape is not None and tuple(v.shape) != tuple(shape):
            raise ValueError(f"{self.what}: {key} has shape {v.shape}, "
                             f"expected {shape}")
        return v

    def has(self, key: str) -> bool:
        return key in self.sd

    def finish(self):
        left = [k for k in self.sd if not k.endswith("num_batches_tracked")]
        if left:
            raise ValueError(
                f"{self.what}: {len(left)} unconsumed keys, e.g. "
                f"{sorted(left)[:6]} — wrong resnet_type/architecture?")


def _conv(w: np.ndarray) -> np.ndarray:
    """(out, in, kh, kw) -> (kh, kw, in, out)."""
    return np.transpose(w, (2, 3, 1, 0))


def _bn(c: _Consumer, prefix: str):
    """-> ({"scale", "bias"}, {"mean", "var"}) for one BatchNorm."""
    params = {"scale": c.take(prefix + ".weight"),
              "bias": c.take(prefix + ".bias")}
    stats = {"mean": c.take(prefix + ".running_mean"),
             "var": c.take(prefix + ".running_var")}
    return params, stats


def _norm_entry(params, stats):
    """Wrap a converted BN into the flax _Norm/BatchNorm_0 nesting
    (models/resnet.py:_Norm)."""
    return {"BatchNorm_0": params}, {"BatchNorm_0": stats}


def _block(c: _Consumer, tprefix: str, bottleneck: bool):
    """One torch Basic/Bottleneck block -> (params, batch_stats) subtrees
    keyed Conv_i/_Norm_i in flax call order (models/resnet.py — main convs
    first, downsample last)."""
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    n_main = 3 if bottleneck else 2
    for i in range(n_main):
        p[f"Conv_{i}"] = {"kernel": _conv(c.take(f"{tprefix}.conv{i+1}.weight"))}
        bp, bs = _bn(c, f"{tprefix}.bn{i+1}")
        p[f"_Norm_{i}"], s[f"_Norm_{i}"] = _norm_entry(bp, bs)
    if c.has(f"{tprefix}.downsample.0.weight"):
        p[f"Conv_{n_main}"] = {
            "kernel": _conv(c.take(f"{tprefix}.downsample.0.weight"))}
        bp, bs = _bn(c, f"{tprefix}.downsample.1")
        p[f"_Norm_{n_main}"], s[f"_Norm_{n_main}"] = _norm_entry(bp, bs)
    return p, s


def convert_torchvision_resnet(state_dict: Mapping[str, Any],
                               resnet_type: int,
                               num_stages: int = 4) -> Variables:
    """torchvision-naming ResNet state dict -> ResNetBackbone variables.

    Accepts the model-zoo dicts the reference feeds to
    `ResNetBackbone.init_weights` (common/nets/resnet.py:70-76) — with or
    without the fc/avgpool head (fc.* is ignored).  `num_stages=3` consumes
    only conv1/bn1/layer1-3 and leaves layer4 keys for
    :func:`convert_resnet_stage4` (the detector's C4 split).
    """
    block_name, layers = RESNET_SPECS[resnet_type]
    bottleneck = block_name == "bottleneck"
    sd = {k: v for k, v in state_dict.items()
          if not k.startswith(("fc.", "avgpool."))}
    if num_stages < 4:
        sd = {k: v for k, v in sd.items()
              if not any(k.startswith(f"layer{j}.")
                         for j in range(num_stages + 1, 5))}
    c = _Consumer(sd, f"torchvision resnet{resnet_type}")

    params: Dict[str, Any] = {
        "conv1": {"kernel": _conv(c.take("conv1.weight",
                                         (64, 3, 7, 7)))}}
    stats: Dict[str, Any] = {}
    bp, bs = _bn(c, "bn1")
    params["_Norm_0"], stats["_Norm_0"] = _norm_entry(bp, bs)
    for stage in range(num_stages):
        for i in range(layers[stage]):
            p, s = _block(c, f"layer{stage + 1}.{i}", bottleneck)
            params[f"layer{stage + 1}_{i}"] = p
            stats[f"layer{stage + 1}_{i}"] = s
    c.finish()
    return {"params": params, "batch_stats": stats}


def convert_resnet_stage4(state_dict: Mapping[str, Any],
                          resnet_type: int,
                          prefix: str = "layer4.") -> Variables:
    """`layer4.*` keys -> ResNetStage4 variables (the detector's
    `RCNN_top` head-to-tail, faster_rcnn/resnet.py:242,285-288)."""
    block_name, layers = RESNET_SPECS[resnet_type]
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}
    c = _Consumer({f"b.{k}": v for k, v in sd.items()},
                  f"resnet{resnet_type} layer4")
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(layers[3]):
        p, s = _block(c, f"b.{i}", block_name == "bottleneck")
        params[f"layer4_{i}"] = p
        stats[f"layer4_{i}"] = s
    c.finish()
    return {"params": params, "batch_stats": stats}


def _rpn_cls_permutation(num_anchors: int) -> np.ndarray:
    """Out-channel permutation [bg x A, fg x A] -> (A, 2)-flattened.
    perm[a*2 + k] = k*A + a."""
    A = num_anchors
    perm = np.empty(2 * A, np.int64)
    for a in range(A):
        for k in range(2):
            perm[a * 2 + k] = k * A + a
    return perm


def convert_faster_rcnn_state_dict(state_dict: Mapping[str, Any],
                                   det_cfg) -> Variables:
    """Reference faster-rcnn `checkpoint["model"]` -> FasterRCNN variables.

    Source layout: lib/model_rcnn/faster_rcnn/resnet.py:229-249
    (`RCNN_base` = Sequential(conv1, bn1, relu, maxpool, layer1-3),
    `RCNN_top` = Sequential(layer4)), rpn/rpn.py:21-43 (`RPN_Conv`,
    `RPN_cls_score`, `RPN_bbox_pred`) and faster_rcnn.py head linears.
    Requires ``det_cfg.resnet_style == "caffe"`` — the torch blocks those
    weights were trained with stride the 1x1 conv (resnet.py:67-80).
    """
    if det_cfg.resnet_style != "caffe":
        raise ValueError(
            "reference faster_rcnn_*.pth weights use caffe-style blocks "
            "(stride on the 1x1 conv, faster_rcnn/resnet.py:67-80); "
            "set DetectorConfig.resnet_style='caffe' or the converted "
            "weights would be run through a different function")
    if det_cfg.norm != "batch":
        raise ValueError("torch checkpoints carry BatchNorm weights; "
                         "DetectorConfig.norm must be 'batch'")
    sd = dict(state_dict)
    if "model" in sd and not any("." in k for k in sd):
        sd = dict(sd["model"])

    # ---- backbone: RCNN_base indices -> torchvision names, then reuse ----
    seq_map = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
               "6": "layer3"}
    base_sd = {}
    top_sd = {}
    rest = {}
    for k, v in sd.items():
        if k.startswith("RCNN_base."):
            idx, tail = k[len("RCNN_base."):].split(".", 1)
            base_sd[f"{seq_map[idx]}.{tail}"] = v
        elif k.startswith("RCNN_top.0."):
            top_sd["layer4." + k[len("RCNN_top.0."):]] = v
        else:
            rest[k] = v
    base = convert_torchvision_resnet(base_sd, det_cfg.resnet_type,
                                      num_stages=3)
    tail = convert_resnet_stage4(top_sd, det_cfg.resnet_type)

    # ---- RPN + detection heads ----
    c = _Consumer(rest, "faster_rcnn heads")
    A = len(det_cfg.anchor_scales) * len(det_cfg.anchor_ratios)
    num_classes = len(det_cfg.classes)

    rpn_conv = {"kernel": _conv(c.take("RCNN_rpn.RPN_Conv.weight",
                                       (512, 1024, 3, 3))),
                "bias": c.take("RCNN_rpn.RPN_Conv.bias", (512,))}
    perm = _rpn_cls_permutation(A)
    wc = _conv(c.take("RCNN_rpn.RPN_cls_score.weight", (2 * A, 512, 1, 1)))
    bc = c.take("RCNN_rpn.RPN_cls_score.bias", (2 * A,))
    rpn_cls = {"kernel": wc[..., perm], "bias": bc[perm]}
    rpn_bbox = {"kernel": _conv(c.take("RCNN_rpn.RPN_bbox_pred.weight",
                                       (4 * A, 512, 1, 1))),
                "bias": c.take("RCNN_rpn.RPN_bbox_pred.bias", (4 * A,))}
    ch = 2048 if RESNET_SPECS[det_cfg.resnet_type][0] == "bottleneck" else 512
    cls_score = {"kernel": c.take("RCNN_cls_score.weight",
                                  (num_classes, ch)).T,
                 "bias": c.take("RCNN_cls_score.bias", (num_classes,))}
    bbox_pred = {"kernel": c.take("RCNN_bbox_pred.weight",
                                  (4 * num_classes, ch)).T,
                 "bias": c.take("RCNN_bbox_pred.bias", (4 * num_classes,))}
    c.finish()

    return {
        "params": {"base": base["params"], "tail": tail["params"],
                   "rpn_conv": rpn_conv, "rpn_cls": rpn_cls,
                   "rpn_bbox": rpn_bbox, "cls_score": cls_score,
                   "bbox_pred": bbox_pred},
        "batch_stats": {"base": base["batch_stats"],
                        "tail": tail["batch_stats"]},
    }


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """torch.load a .pth on host CPU and unwrap the reference's
    ``{"model": state_dict, ...}`` checkpoint envelope
    (hand_detector.py:136-142)."""
    import torch  # local import: converters stay importable without torch

    # weights_only=True: these are EXTERNALLY-sourced checkpoints (model-zoo
    # downloads, the reference's faster_rcnn_*.pth) and full unpickling
    # would execute arbitrary code from a tampered file. The reference's
    # envelope ({"model": state_dict, "pooling_mode": str, ...}) is tensors
    # and primitives only, which the weights-only unpickler accepts.
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "model" in ckpt \
            and isinstance(ckpt["model"], dict):
        return ckpt["model"]
    if isinstance(ckpt, dict) and "network" in ckpt \
            and isinstance(ckpt["network"], dict):
        # the pose trainer's snapshot envelope (common/base.py:57-67:
        # {"epoch", "network", "optimizer"})
        return ckpt["network"]
    return ckpt


def _deconv(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (in, out, kh, kw) -> flax ConvTranspose
    SAME kernel (kh, kw, in, out): spatial flip + axis moves (flax's
    conv_transpose applies the kernel unflipped over the zero-dilated
    input, torch applies it flipped; verified by forward-output oracle)."""
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()


def convert_pose_snapshot(state_dict: Mapping[str, Any],
                          resnet_type: int = 50,
                          num_deconv: int = 3) -> Variables:
    """Full reference ResPoseNet snapshot -> our ResPoseNet variables.

    The reference trains `ResPoseNet(backbone, head)` (main/model.py:58-66)
    and snapshots `model.state_dict()` — keys `backbone.*` (torchvision
    ResNet naming, common/nets/resnet.py:19-30) and `head.deconv_layers.
    {0,3,6}.weight` / `{1,4,7}.{BN}` / `head.final_layer.{weight,bias}`
    (main/model.py:5-44). DataParallel's `module.` prefix is stripped.
    With this, a user's trained reference snapshot_*.pth drops straight
    into our Tester/Evaluator (cli/test.py --torch-snapshot).
    """
    sd = {(k[len("module."):] if k.startswith("module.") else k): v
          for k, v in state_dict.items()}
    backbone = convert_torchvision_resnet(
        {k[len("backbone."):]: v for k, v in sd.items()
         if k.startswith("backbone.")}, resnet_type, num_stages=4)

    c = _Consumer({k: v for k, v in sd.items() if k.startswith("head.")},
                  "ResPoseNet head")
    hp: Dict[str, Any] = {}
    hs: Dict[str, Any] = {}
    for i in range(num_deconv):
        w = c.take(f"head.deconv_layers.{3 * i}.weight")
        hp[f"deconv{i}"] = {"kernel": _deconv(w)}
        bp, bs = _bn(c, f"head.deconv_layers.{3 * i + 1}")
        hp[f"_Norm_{i}"], hs[f"_Norm_{i}"] = _norm_entry(bp, bs)
    hp["final"] = {"kernel": _conv(c.take("head.final_layer.weight")),
                   "bias": c.take("head.final_layer.bias")}
    c.finish()
    return {"params": {"backbone": backbone["params"], "head": hp},
            "batch_stats": {"backbone": backbone["batch_stats"],
                            "head": hs}}


def imagenet_init_pose_variables(variables: Variables,
                                 state_dict: Mapping[str, Any],
                                 resnet_type: int) -> Variables:
    """Replace the `backbone` subtree of ResPoseNet variables with
    converted ImageNet weights — the flax analogue of
    `ResNetBackbone.init_weights` (common/nets/resnet.py:70-76): the
    deconv head keeps its fresh init, only the backbone is overwritten.

    Verifies leaf-for-leaf shape agreement with the existing subtree so a
    resnet_type mismatch fails here, not inside jit.
    """
    import jax

    conv = convert_torchvision_resnet(state_dict, resnet_type, num_stages=4)
    new_vars = {k: dict(v) for k, v in variables.items()}
    for col in ("params", "batch_stats"):
        old = variables[col]["backbone"]
        new = conv[col]
        old_shapes = jax.tree_util.tree_map(lambda x: tuple(x.shape), old)
        new_shapes = jax.tree_util.tree_map(lambda x: tuple(x.shape), new)
        if old_shapes != new_shapes:
            raise ValueError(
                f"converted {col} tree does not match the model's backbone "
                f"(resnet_type mismatch? model expects resnet{resnet_type})")
        new_vars[col]["backbone"] = jax.tree_util.tree_map(
            lambda o, n: np.asarray(n, dtype=o.dtype), old, new)
    return new_vars
