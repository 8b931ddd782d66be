"""Integral pose network: ResNet backbone + deconv head -> 3D heatmaps.

Capability equivalent of the reference pose model (main/model.py:5-78):
3x (4x4 stride-2 transposed conv -> BN -> ReLU), 2048->256->256->256, then a
1x1 conv to `num_joints * depth_dim` channels — a (B, 56, 56, 21*56) NHWC 3D
heatmap (channel = joint*depth + d), decoded by ops/integral.py.

Init matches the reference (model.py:46-56): deconv/final weights ~ N(0,
0.001), BN scale 1 / bias 0, final bias 0.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.nn.initializers import normal, zeros

from hand_integral_pose_estimation_tpu.config import ModelConfig
from hand_integral_pose_estimation_tpu.models.resnet import (
    ResNetBackbone,
    _Norm,
)
from hand_integral_pose_estimation_tpu.ops.integral import softmax_integral


class _PhaseDeconv(nn.Module):
    """4x4 stride-2 transposed conv computed as one dense 2x2 conv over the
    zero-padded input + phase interleave (depth-to-space).

    Numerically equivalent to ``nn.ConvTranspose(k=(4,4), s=(2,2), "SAME")``
    (= torch ConvTranspose2d(k=4, s=2, p=1), oracle-tested) with the SAME
    parameter name/shape ("kernel", (4, 4, Cin, Cout)) so checkpoints are
    interchangeable. Derivation: output phase (r, c) touches the input only
    through kernel taps K[r+2dr, c+2dc], so the four phases are stride-2
    slices of K applied as 2x2 convs over the 1-padded input.

    Measured on v5e this LOSES to the conv_transpose lowering (3.14 vs
    2.85 ms/batch-32 head forward): XLA's TPU conv_transpose is already
    dense (no zero-multiply waste), and the phase path pays for the
    pad/slice/interleave relayouts. Kept as a tested alternative lowering;
    `ModelConfig.deconv_impl` selects it.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        Cin = x.shape[-1]
        C = self.features
        K = self.param("kernel", normal(stddev=0.001),
                       (4, 4, Cin, C), jnp.float32)
        # phase kernels: G_{r,c} = K[r::2, c::2]  -> (2, 2, Cin, 4C)
        G = jnp.concatenate([K[r::2, c::2] for r in (0, 1) for c in (0, 1)],
                            axis=-1).astype(self.dtype)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        z = jax.lax.conv_general_dilated(
            xp.astype(self.dtype), G, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))    # (B, H+1, W+1, 4C)
        B, Hp, Wp, _ = z.shape
        H, W = Hp - 1, Wp - 1
        phases = [z[:, r:H + r, c:W + c, (2 * r + c) * C:(2 * r + c + 1) * C]
                  for r in (0, 1) for c in (0, 1)]
        s = jnp.stack(phases, axis=3).reshape(B, H, W, 2, 2, C)
        return s.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, C)


class DeconvHead(nn.Module):
    """3-layer transposed-conv upsampler + 1x1 heatmap projection
    (main/model.py:22-44).

    deconv_impl: "transpose" (nn.ConvTranspose lowering, the measured-faster
    default; "auto" resolves to it) or "phase" (dense phase-conv
    reformulation, see _PhaseDeconv). Both produce identical outputs from
    identical params.
    """

    num_joints: int = 21
    depth_dim: int = 56
    channels: int = 256
    num_layers: int = 3
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    deconv_impl: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False,
                 return_features: bool = False):
        impl = ("transpose" if self.deconv_impl == "auto"
                else self.deconv_impl)
        for i in range(self.num_layers):
            if impl == "phase":
                x = _PhaseDeconv(self.channels, self.dtype,
                                 name=f"deconv{i}")(x)
            else:
                # 4x4 stride-2 transposed conv, SAME padding == torch's
                # (k=4, s=2, p=1): exact 2x upsample
                x = nn.ConvTranspose(
                    self.channels, (4, 4), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype,
                    kernel_init=normal(stddev=0.001),
                    name=f"deconv{i}")(x)
            x = _Norm(self.dtype, self.bn_axis_name, train)(x)
            x = nn.relu(x)
        if return_features:
            # pre-projection activations for the fused projection+integral
            # kernel (ops/fused_head.py); the `final` params are consumed by
            # that kernel instead (init with the default path first)
            return x
        x = nn.Conv(self.num_joints * self.depth_dim, (1, 1),
                    dtype=self.dtype,
                    kernel_init=normal(stddev=0.001), bias_init=zeros,
                    name="final")(x)
        return x


class ResPoseNet(nn.Module):
    """backbone ∘ head (main/model.py:58-67). Returns NHWC heatmap logits."""

    cfg: ModelConfig = ModelConfig()
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False,
                 return_features: bool = False):
        dtype = jnp.dtype(self.cfg.compute_dtype)
        x = x.astype(dtype)
        feats = ResNetBackbone(self.cfg.resnet_type, dtype,
                               self.bn_axis_name, name="backbone")(
                                   x, train=train)
        hm = DeconvHead(self.cfg.num_joints, self.cfg.depth_dim,
                        self.cfg.deconv_channels, self.cfg.num_deconv_layers,
                        dtype, self.bn_axis_name,
                        deconv_impl=self.cfg.deconv_impl, name="head")(
                            feats, train=train,
                            return_features=return_features)
        return hm

    def final_projection(self, params):
        """(W (F, J*D), b (J*D,)) of the heatmap projection, for
        ops/fused_head.head_projection_integral."""
        k = params["head"]["final"]["kernel"]
        b = params["head"]["final"]["bias"]
        return k.reshape(k.shape[-2], k.shape[-1]), b

    def decode(self, heatmap, impl: str = "auto"):
        """Heatmap -> (B, J, 3) normalised coords (fused soft-argmax)."""
        return softmax_integral(heatmap, self.cfg.num_joints,
                                self.cfg.depth_dim, impl=impl)


def get_pose_net(cfg: ModelConfig | None = None,
                 bn_axis_name: Optional[str] = None) -> ResPoseNet:
    """Factory mirroring the reference's `get_pose_net` (main/model.py:69)."""
    return ResPoseNet(cfg=cfg or ModelConfig(), bn_axis_name=bn_axis_name)
