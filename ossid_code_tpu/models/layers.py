"""Residual blocks (flax): support code mirroring the reference's
models/layers.py:9-122 (torchvision BasicBlock/Bottleneck copies, unused by
DTOID but part of the model-family surface)."""

from __future__ import annotations

import flax.linen as nn


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        ra = not train
        identity = x
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1, use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=ra, momentum=0.9, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=ra, momentum=0.9, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1), strides=self.stride, use_bias=False, name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=ra, momentum=0.9, name="downsample_bn")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        ra = not train
        out_ch = self.planes * self.expansion
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(nn.BatchNorm(use_running_average=ra, momentum=0.9, name="bn1")(y))
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1, use_bias=False, name="conv2")(y)
        y = nn.relu(nn.BatchNorm(use_running_average=ra, momentum=0.9, name="bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=ra, momentum=0.9, name="bn3")(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), strides=self.stride, use_bias=False, name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=ra, momentum=0.9, name="downsample_bn")(identity)
        return nn.relu(y + identity)
