"""VGG16 detector backbone (reference: lib/model_rcnn/faster_rcnn/vgg16.py).

The reference's alternative Faster R-CNN backbone: conv1_1..conv5_3 (the last
max-pool dropped) as the base, the 4096-d fc stack as the head-to-tail. Kept
for detector-backbone parity; the hand pipeline uses the ResNet-101 C4 model.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
        512, 512, 512, "M", 512, 512, 512)


class VGG16Base(nn.Module):
    """(B, H, W, 3) -> (B, H/16, W/16, 512) conv features (stride 16)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        i = 0
        for v in _CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.relu(nn.Conv(v, (3, 3), padding=1, dtype=self.dtype,
                                    name=f"conv{i}")(x))
                i += 1
        return x


class VGG16Tail(nn.Module):
    """Pooled ROI features -> 4096-d fc head (vgg16.py classifier)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc7")(x))
        return x
