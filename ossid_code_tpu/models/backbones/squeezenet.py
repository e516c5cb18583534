"""SqueezeNet-1.1 feature backbone with a 4-channel stem (flax linen, NHWC).

Reimplements the torchvision squeezenet1_1 `features` trunk as used by DTOID's
template encoders, whose first conv takes RGB+mask (4 channels) — the
reference grafts the pretrained 3-channel weights into a fresh 4-channel conv
(ref models/dtoid/network.py:195-258). Split where DTOID splits it:

  SqueezeStem4  = conv1 (4ch -> 64, 3x3/s2, valid padding)    [backbone_0]
  SqueezeEarly  = relu, maxpool, fire2, fire3 -> 128ch          [backbone_1]
  SqueezeLate   = maxpool, fire4..fire9 -> 512ch                [backbone_2]

All max pools are 3x3/s2 with torch ceil_mode=True (124px templates:
61 -> 30 -> 15 -> 7).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ossid_code_tpu.ops.conv import max_pool_ceil


class Fire(nn.Module):
    squeeze: int
    expand1: int
    expand3: int

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.squeeze, (1, 1), name="squeeze")(x))
        e1 = nn.relu(nn.Conv(self.expand1, (1, 1), name="expand1x1")(s))
        e3 = nn.relu(nn.Conv(self.expand3, (3, 3), padding=1, name="expand3x3")(s))
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeStem4(nn.Module):
    """4-channel 3x3/s2 valid conv -> 64ch (no activation; DTOID applies the
    ReLU in the next stage, mirroring the reference's module split)."""

    @nn.compact
    def __call__(self, x):
        return nn.Conv(64, (3, 3), strides=2, padding="VALID", name="conv1")(x)


class SqueezeEarly(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.relu(x)
        x = max_pool_ceil(x, 3, 2, ceil_mode=True)
        x = Fire(16, 64, 64, name="fire2")(x)
        x = Fire(16, 64, 64, name="fire3")(x)
        return x


class SqueezeLate(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = max_pool_ceil(x, 3, 2, ceil_mode=True)
        x = Fire(32, 128, 128, name="fire4")(x)
        x = Fire(32, 128, 128, name="fire5")(x)
        x = max_pool_ceil(x, 3, 2, ceil_mode=True)
        x = Fire(48, 192, 192, name="fire6")(x)
        x = Fire(48, 192, 192, name="fire7")(x)
        x = Fire(64, 256, 256, name="fire8")(x)
        x = Fire(64, 256, 256, name="fire9")(x)
        return x
