"""DenseNet-121 feature backbone (flax linen, NHWC).

Reimplements the torchvision densenet121 `features` trunk that DTOID uses as
its image encoder, including DTOID's surgery that replaces transition3's
2x2/s2 avg-pool with a 2x2/s1 pool so the final stride stays 16 and the map
shrinks by one pixel (ref models/dtoid/network.py:164-169 — for 480x640 input
the output is 29x39x1024, which is where DTOID's 29x39 heatmap comes from).

The trunk is split exactly where DTOID splits it (ref network.py:167-169):
  DenseNetStem   = conv0                         (template modulation is
  DenseNetEarly  = norm0, relu, pool0, block1     injected between stem and
  DenseNetLate   = trans1 ... block4, norm5       early — see dtoid/network.py)

Growth rate 32, block config (6, 12, 24, 16), bn_size 4. BatchNorm momentum
follows torch's 0.1 (flax momentum = 0.9).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from ossid_code_tpu.ops.conv import avg_pool, max_pool_ceil

class DenseLayer(nn.Module):
    growth_rate: int = 32
    bn_size: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="norm1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False, name="conv1")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="norm2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.growth_rate, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int = 32

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(self.num_layers):
            x = DenseLayer(self.growth_rate, name=f"denselayer{i + 1}")(x, train)
        return x


class Transition(nn.Module):
    out_channels: int
    pool_stride: int = 2  # DTOID sets transition3's pool stride to 1

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="norm")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="conv")(x)
        x = avg_pool(x, 2, self.pool_stride)
        return x


class DenseNetStem(nn.Module):
    """conv0 only: 7x7/s2 pad 3, 64ch, no bias."""

    @nn.compact
    def __call__(self, x):
        return nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False, name="conv0")(x)


class DenseNetEarly(nn.Module):
    """norm0 + relu + 3x3/s2 maxpool + denseblock1 -> 256ch at /8."""

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="norm0")(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = max_pool_ceil(x, 3, 2, ceil_mode=False)
        x = DenseBlock(6, name="denseblock1")(x, train)
        return x


class DenseNetLate(nn.Module):
    """transition1 ... denseblock4 + norm5 -> 1024ch at /16 (H-1, W-1)."""

    block_config: Sequence[int] = (12, 24, 16)

    @nn.compact
    def __call__(self, x, train: bool):
        x = Transition(128, name="transition1")(x, train)
        x = DenseBlock(self.block_config[0], name="denseblock2")(x, train)
        x = Transition(256, name="transition2")(x, train)
        x = DenseBlock(self.block_config[1], name="denseblock3")(x, train)
        x = Transition(512, pool_stride=1, name="transition3")(x, train)  # DTOID surgery
        x = DenseBlock(self.block_config[2], name="denseblock4")(x, train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="norm5")(x)
        return x
