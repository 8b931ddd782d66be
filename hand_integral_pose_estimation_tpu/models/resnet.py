"""ResNet backbones (18/34/50/101/152) in flax, NHWC, TPU-first.

Capability equivalent of the reference backbone (common/nets/resnet.py:8-76,
torchvision-style blocks) with the same architectural contract: stride-32
feature map, no avgpool/fc, 2048 channels for R50+. Differences by design:

  * NHWC layout + configurable compute dtype (bfloat16 on the MXU, float32
    params) instead of NCHW float32;
  * optional cross-replica BatchNorm axis (the reference's DataParallel uses
    per-replica statistics — `bn_axis_name=None` reproduces that);
  * `frozen_stages` / `norm_eval` support the detector's frozen-BN contract
    (lib/model_rcnn/faster_rcnn/resnet.py:261-284);
  * init: He fan-out for convs (the reference's N(0, 0.001) is a placeholder
    that is always overwritten by ImageNet weights, resnet.py:70-76; see the
    note at `_conv_init`), BN scale=1 bias=0.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import variance_scaling

RESNET_SPECS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}

# NOTE: the reference initialises convs with N(0, 0.001) (resnet.py:32-38)
# but immediately overwrites them with ImageNet model-zoo weights
# (resnet.py:70-76) — the tiny init is never trained from. Without
# downloadable pretrained weights we default to He fan-out init (the
# torchvision scheme) for from-scratch trainability; the deconv head keeps
# the reference's N(0, 0.001) (model.py:46-56, applied on top of
# pretraining).
_conv_init = variance_scaling(2.0, "fan_out", "truncated_normal")


class _Norm(nn.Module):
    """Normalisation layer: BatchNorm (optional cross-replica stat sync and
    freeze) or GroupNorm.

    `kind="group"` (GN, 32 groups) is the from-scratch detector recipe:
    batch-size independent and train=eval consistent, where small-batch BN
    statistics diverge from the running averages and tank test-time AP
    (measured in the detector convergence study, PERFORMANCE.md). The
    reference never needs it because it always fine-tunes from ImageNet
    BN statistics."""

    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    train: bool = False
    kind: str = "batch"

    @nn.compact
    def __call__(self, x):
        if self.kind == "group":
            return nn.GroupNorm(num_groups=min(32, x.shape[-1]),
                                epsilon=1e-5, dtype=self.dtype)(x)
        return nn.BatchNorm(
            use_running_average=not self.train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.axis_name if self.train else None,
        )(x)


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype,
                    kernel_init=_conv_init)(x)
        y = _Norm(self.dtype, self.bn_axis_name, train, self.norm)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, kernel_init=_conv_init)(y)
        y = _Norm(self.dtype, self.bn_axis_name, train, self.norm)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               kernel_init=_conv_init)(x)
            residual = _Norm(self.dtype, self.bn_axis_name, train, self.norm)(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """`stride_style` picks where the stage stride sits: "torchvision" puts
    it on the 3x3 conv (the pose backbone's torchvision blocks,
    common/nets/resnet.py:8-76); "caffe" puts it on the first 1x1 conv —
    the detector's variant (lib/model_rcnn/faster_rcnn/resnet.py:67-80,
    the `# change` lines), which its `resnet101_caffe.pth` /
    `faster_rcnn_*.pth` weights were trained with. The two styles compute
    different functions at stride-2 blocks, so weight conversion requires
    matching the style, not just the shapes."""

    filters: int          # bottleneck width; output channels = 4x
    stride: int = 1
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    norm: str = "batch"
    stride_style: str = "torchvision"

    @nn.compact
    def __call__(self, x, train: bool = False):
        caffe = self.stride_style == "caffe"
        s1 = (self.stride, self.stride) if caffe else (1, 1)
        s3 = (1, 1) if caffe else (self.stride, self.stride)
        residual = x
        y = nn.Conv(self.filters, (1, 1), strides=s1, use_bias=False,
                    dtype=self.dtype, kernel_init=_conv_init)(x)
        y = _Norm(self.dtype, self.bn_axis_name, train, self.norm)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=s3,
                    padding=1, use_bias=False, dtype=self.dtype,
                    kernel_init=_conv_init)(y)
        y = _Norm(self.dtype, self.bn_axis_name, train, self.norm)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, kernel_init=_conv_init)(y)
        y = _Norm(self.dtype, self.bn_axis_name, train, self.norm)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               kernel_init=_conv_init)(x)
            residual = _Norm(self.dtype, self.bn_axis_name, train, self.norm)(residual)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """Stride-32 feature extractor: (B, H, W, 3) -> (B, H/32, W/32, C_out).

    `num_stages` trims the tail: the Faster R-CNN C4 split uses
    `num_stages=3` as the base (output stride 16, layer3 features) and
    :class:`ResNetStage4` as the head-to-tail (resnet.py:229-288).
    """

    resnet_type: int = 50
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    num_stages: int = 4
    stage_strides: Tuple[int, int, int, int] = (1, 2, 2, 2)
    norm: str = "batch"
    #: "torchvision" (pose backbone) or "caffe" (detector weights) — see
    #: Bottleneck. Also selects the stem maxpool padding: torchvision pads
    #: (1, 1); caffe uses padding=0 + ceil_mode=True
    #: (lib/model_rcnn/faster_rcnn/resnet.py:115), which for even inputs is
    #: one trailing pad row/col — nn.max_pool's -inf padding reproduces it.
    style: str = "torchvision"

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_name, layers = RESNET_SPECS[self.resnet_type]
        block = BasicBlock if block_name == "basic" else Bottleneck
        widths = (64, 128, 256, 512)

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, kernel_init=_conv_init,
                    name="conv1")(x)
        x = _Norm(self.dtype, self.bn_axis_name, train, self.norm)(x)
        x = nn.relu(x)
        pool_pad = (((0, 1), (0, 1)) if self.style == "caffe"
                    else ((1, 1), (1, 1)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=pool_pad)

        for stage in range(self.num_stages):
            for i in range(layers[stage]):
                stride = self.stage_strides[stage] if i == 0 else 1
                kw = ({"stride_style": self.style}
                      if block is Bottleneck else {})
                x = block(widths[stage], stride, self.dtype,
                          self.bn_axis_name, self.norm,
                          name=f"layer{stage + 1}_{i}", **kw)(x, train=train)
        return x

    @property
    def out_channels(self) -> int:
        block_name, _ = RESNET_SPECS[self.resnet_type]
        mult = 1 if block_name == "basic" else 4
        return 512 * mult if self.num_stages == 4 else 256 * mult


class ResNetStage4(nn.Module):
    """Stage-4 ("layer4") alone — the detector's `_head_to_tail`
    (lib/model_rcnn/faster_rcnn/resnet.py:285-288)."""

    resnet_type: int = 101
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    stride: int = 2
    norm: str = "batch"
    style: str = "torchvision"   # see ResNetBackbone.style

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_name, layers = RESNET_SPECS[self.resnet_type]
        block = BasicBlock if block_name == "basic" else Bottleneck
        for i in range(layers[3]):
            s = self.stride if i == 0 else 1
            kw = {"stride_style": self.style} if block is Bottleneck else {}
            x = block(512, s, self.dtype, self.bn_axis_name, self.norm,
                      name=f"layer4_{i}", **kw)(x, train=train)
        return x
