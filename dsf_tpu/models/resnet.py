"""ResNet blocks (ref: model/resnet.py:18-98) in Flax, NCHW."""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

from dsf_tpu.models.layers import Conv, BatchNorm


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = None
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        out = Conv(self.planes, 3, self.stride, 1, dtype=self.dtype,
                   name="conv1")(x)
        out = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                        name="bn1")(out, train)
        out = nn.relu(out)
        out = Conv(self.planes, 3, 1, 1, dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                        name="bn2")(out, train)
        if self.downsample:
            identity = Conv(self.planes * self.expansion, 1, self.stride, 0,
                            dtype=self.dtype, name="down_conv")(x)
            identity = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                                 name="down_bn")(identity, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        out = Conv(self.planes, 1, 1, 0, dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                        name="bn1")(out, train)
        out = nn.relu(out)
        out = Conv(self.planes, 3, self.stride, 1, dtype=self.dtype,
                   name="conv2")(out)
        out = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                        name="bn2")(out, train)
        out = nn.relu(out)
        out = Conv(self.planes * self.expansion, 1, 1, 0, dtype=self.dtype,
                   name="conv3")(out)
        out = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                        name="bn3")(out, train)
        if self.downsample:
            identity = Conv(self.planes * self.expansion, 1, self.stride, 0,
                            dtype=self.dtype, name="down_conv")(x)
            identity = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                                 name="down_bn")(identity, train)
        return nn.relu(out + identity)


RESNET_SPECS = {
    18: (BasicBlock, [2, 2, 2, 2]),
    50: (Bottleneck, [3, 4, 6, 3]),
    101: (Bottleneck, [3, 4, 23, 3]),
    152: (Bottleneck, [3, 8, 36, 3]),
}


class ResLayer(nn.Module):
    """A _make_layer stage (ref: backbone.py:269-282): first block may
    downsample / change width, rest are plain."""
    block: type
    planes: int
    blocks: int
    stride: int = 1
    in_planes: int = 64
    bn_axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        exp = self.block.expansion
        need_down = self.stride != 1 or self.in_planes != self.planes * exp
        x = self.block(self.planes, self.stride, need_down,
                       self.bn_axis_name, self.dtype, name="block0")(x, train)
        for i in range(1, self.blocks):
            x = self.block(self.planes, 1, False, self.bn_axis_name,
                           self.dtype, name=f"block{i}")(x, train)
        return x
