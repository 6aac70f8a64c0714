"""Stacked-hourglass alternative backbone (ref: model/hourglass.py) in Flax.

Per stack: recursive 4-level hourglass over 256 channels, a feature head,
and three 1x1 output convs (offset 3J / distance J / weight J => 5J
channels), with merge layers feeding the next stack.  Named by the
BASELINE north-star; not the default net (`ResNet_stage_18` is), but a
selectable backbone.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsf_tpu.models.layers import (BatchNorm, kaiming_out_init,
                                   nchw_to_nhwc, nhwc_to_nchw)


class HgConv(nn.Module):
    """ref hourglass Conv (hourglass.py:65-85): conv(+bias) [+bn] [+relu]."""
    features: int
    kernel: int = 3
    stride: int = 1
    bn: bool = False
    relu: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        p = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), use_bias=True,
                    kernel_init=kaiming_out_init, dtype=self.dtype,
                    name="conv")(x)
        if self.bn:
            x = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                          name="bn")(x, train)
        if self.relu:
            x = nn.relu(x)
        return x


class Residual(nn.Module):
    """Pre-activation bottleneck residual (hourglass.py:88-125)."""
    features: int
    bn_axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        inp = x.shape[-1]
        half = self.features // 2
        skip = x
        if inp != self.features:
            skip = HgConv(self.features, 1, relu=False, dtype=self.dtype,
                          name="skip")(x, train)
        out = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                        name="bn1")(x, train)
        out = nn.relu(out)
        out = HgConv(half, 1, relu=False, dtype=self.dtype, name="c1")(out, train)
        out = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                        name="bn2")(out, train)
        out = nn.relu(out)
        out = HgConv(half, 3, relu=False, dtype=self.dtype, name="c2")(out, train)
        out = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                        name="bn3")(out, train)
        out = nn.relu(out)
        out = HgConv(self.features, 1, relu=False, dtype=self.dtype,
                     name="c3")(out, train)
        return out + skip


def _pool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
        ((0, 0), (0, 0), (0, 0), (0, 0)))


def _upsample2(x):
    return jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)


class Hourglass(nn.Module):
    """Recursive hourglass (hourglass.py:128-152)."""
    n: int
    features: int
    increase: int = 0
    bn_axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        f, nf = self.features, self.features + self.increase
        up1 = Residual(f, self.bn_axis_name, self.dtype, name="up1")(x, train)
        low = _pool2(x)
        low = Residual(nf, self.bn_axis_name, self.dtype, name="low1")(low, train)
        if self.n > 1:
            low = Hourglass(self.n - 1, nf, 0, self.bn_axis_name, self.dtype,
                            name="low2")(low, train)
        else:
            low = Residual(nf, self.bn_axis_name, self.dtype,
                           name="low2")(low, train)
        low = Residual(f, self.bn_axis_name, self.dtype, name="low3")(low, train)
        return up1 + _upsample2(low)


class PoseNet(nn.Module):
    """Stacked hourglass with per-stack offset/dis/weight heads
    (hourglass.py:169-259).  Returns (list of (B, 5J, S, S) preds, last hg)."""
    nstack: int = 1
    joint_num: int = 21
    inp_dim: int = 256
    bn_axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, imgs, train: bool = True):
        x = HgConv(64, 7, 2, bn=True, relu=True,
                   bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                   name="pre_conv")(nchw_to_nhwc(imgs), train)
        x = Residual(128, self.bn_axis_name, self.dtype, name="pre_r1")(x, train)
        x = _pool2(x)
        x = Residual(256, self.bn_axis_name, self.dtype, name="pre_r2")(x, train)
        x = Residual(self.inp_dim, self.bn_axis_name, self.dtype,
                     name="pre_r3")(x, train)

        preds_all = []
        hg = x
        for i in range(self.nstack):
            hg = Hourglass(4, self.inp_dim, 0, self.bn_axis_name, self.dtype,
                           name=f"hg{i}")(x, train)
            feat = Residual(self.inp_dim, self.bn_axis_name, self.dtype,
                            name=f"feat_r{i}")(hg, train)
            feat = HgConv(self.inp_dim, 1, bn=True, relu=True,
                          bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                          name=f"feat_c{i}")(feat, train)
            offset = HgConv(self.joint_num * 3, 1, relu=False,
                            dtype=self.dtype, name=f"out1_{i}")(feat, train)
            dis = HgConv(self.joint_num, 1, relu=False, dtype=self.dtype,
                         name=f"out2_{i}")(feat, train)
            weight = HgConv(self.joint_num, 1, relu=False, dtype=self.dtype,
                            name=f"out3_{i}")(feat, train)
            preds = jnp.concatenate([offset, dis, weight], axis=-1)
            preds_all.append(nhwc_to_nchw(preds))
            if i < self.nstack - 1:
                mp = HgConv(self.inp_dim, 1, relu=False, dtype=self.dtype,
                            name=f"merge_pred{i}")(preds, train)
                mf = HgConv(self.inp_dim, 1, relu=False, dtype=self.dtype,
                            name=f"merge_feat{i}")(feat, train)
                x = x + mp + mf
        return preds_all, nhwc_to_nchw(hg)
