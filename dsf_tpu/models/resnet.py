"""ResNet blocks (ref: model/resnet.py:18-98) in Flax, NHWC."""

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
    bn_groups: int = 1
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        out = Conv(self.planes, 3, self.stride, 1, dtype=self.dtype,
                   name="conv1")(x)
        out = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                        groups=self.bn_groups,
                        name="bn1")(out, train)
        out = nn.relu(out)
        out = Conv(self.planes, 3, 1, 1, dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                        groups=self.bn_groups,
                        name="bn2")(out, train)
        if self.downsample:
            identity = Conv(self.planes * self.expansion, 1, self.stride, 0,
                            dtype=self.dtype, name="down_conv")(x)
            identity = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                        groups=self.bn_groups,
                                 name="down_bn")(identity, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = None
    bn_groups: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        out = Conv(self.planes, 1, 1, 0, dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                        groups=self.bn_groups,
                        name="bn1")(out, train)
        out = nn.relu(out)
        out = Conv(self.planes, 3, self.stride, 1, dtype=self.dtype,
                   name="conv2")(out)
        out = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                        groups=self.bn_groups,
                        name="bn2")(out, train)
        out = nn.relu(out)
        out = Conv(self.planes * self.expansion, 1, 1, 0, dtype=self.dtype,
                   name="conv3")(out)
        out = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                        groups=self.bn_groups,
                        name="bn3")(out, train)
        if self.downsample:
            identity = Conv(self.planes * self.expansion, 1, self.stride, 0,
                            dtype=self.dtype, name="down_conv")(x)
            identity = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                        groups=self.bn_groups,
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
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        exp = self.block.expansion
        need_down = self.stride != 1 or self.in_planes != self.planes * exp
        x = self.block(self.planes, self.stride, need_down,
                       self.bn_axis_name, self.dtype,
                       bn_groups=self.bn_groups, name="block0")(x, train)
        for i in range(1, self.blocks):
            x = self.block(self.planes, 1, False, self.bn_axis_name,
                           self.dtype, bn_groups=self.bn_groups,
                           name=f"block{i}")(x, train)
        return x


class RefineNet(nn.Module):
    """Tiny center-refiner CNN (ref: resnet.py:101-137) — small conv
    stack + FC producing a 3-D center offset.  Not used by the default
    DSF path; kept for inventory parity."""
    input_size: int = 96
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        from dsf_tpu.models.layers import (Conv, max_pool, nchw_to_nhwc,
                                           nhwc_to_nchw)
        x = nchw_to_nhwc(x)
        x = Conv(8, 5, 1, 2, use_bias=True, dtype=self.dtype, name="c1")(x)
        x = nn.relu(x)
        x = max_pool(x, 4)
        x = Conv(8, 3, 1, 1, use_bias=True, dtype=self.dtype, name="c2")(x)
        x = max_pool(x, 2)
        x = nn.relu(x)
        # flatten in torch (C, H, W) order so converted fc weights match
        x = nhwc_to_nchw(x).reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(128, name="fc1")(x))
        return nn.Dense(3, name="fc2")(x)


class ResNet18Regressor(nn.Module):
    """Standalone ResNet-18 joint regressor (ref: resnet.py:139+) —
    AdaptiveAvgPool + FC to joint_num*3.  Unused by the default path."""
    joint_num: int = 14
    bn_axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        from dsf_tpu.models.layers import (Conv, BatchNorm, max_pool_3x3_s2,
                                           adaptive_avg_pool_1, nchw_to_nhwc)
        import flax.linen as fnn
        x = nchw_to_nhwc(x)
        x = Conv(64, 5, 1, 2, dtype=self.dtype, name="pre_conv")(x)
        x = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                      name="pre_bn")(x, train)
        x = fnn.relu(x)
        x = max_pool_3x3_s2(x)
        block, layers = RESNET_SPECS[18]
        inp = 64
        for li, (planes, stride) in enumerate(
                zip((64, 128, 256, 512), (1, 2, 2, 2)), start=1):
            x = ResLayer(block, planes, layers[li - 1], stride, inp,
                         self.bn_axis_name, self.dtype,
                         name=f"layer{li}")(x, train)
            inp = planes
        feat = adaptive_avg_pool_1(x)
        return fnn.Dense(self.joint_num * 3, name="fc")(feat)
