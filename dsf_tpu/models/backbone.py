"""Dual-branch pose networks (ref: model/backbone.py:94-343) in Flax.

`ManoOCRStage` is the default net: a shared ResNet-18 trunk with two
heads per stage — (a) a MANO parameter regressor (62-D) and (b) a
3-deconv dense decoder emitting a 4J-channel offset feature at 64x64.
With ``refine=True`` the stage-2 cascade re-renders the stage-1 MANO
prediction (the model graph CONTAINS the differentiable renderer —
ref backbone.py:304), re-encodes it with the offset codec, fuses with
stage-1 features, and runs a second trunk + heads.

The renderer is passed into __call__ as a pytree argument so the whole
two-stage graph stays jit/pjit-traceable.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from dsf_tpu.models.layers import (
    Conv, BatchNorm, ConvBNRelu, DeconvBNRelu, max_pool_3x3_s2,
    adaptive_avg_pool_1, normal001_init, nchw_to_nhwc, nhwc_to_nchw)
from dsf_tpu.models.resnet import RESNET_SPECS, ResLayer
from dsf_tpu.ops.offset_codec import joint2offset
from dsf_tpu.render import renderer as rnd

MANO_PARAM_DIM = 3 + 45 + 10 + 4


def _maybe_remat(cls):
    """Optionally rematerialize a submodule's activations (DSF_REMAT=1).

    The train step's backward pass re-reads every stored conv/BN/ReLU
    activation from HBM; remat trades that traffic for recompute inside
    the backward fusions.  Kept behind an env flag so the effect can be
    measured as a single variable (the lifted transform preserves the
    parameter/stat tree, so checkpoints are unaffected).
    """
    if os.environ.get("DSF_REMAT", "0") != "1":
        return cls
    return nn.remat(cls, static_argnums=(2,))


class _Trunk(nn.Module):
    """pre-stem (conv5x5 stride-1 + maxpool) + ResNet stages
    (ref: backbone.py:198-208).  Returns (c0, c4)."""
    depth: int = 18
    stem: bool = True
    in_planes: int = 64
    bn_axis_name: Optional[str] = None
    dtype: Any = None
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        block, layers = RESNET_SPECS[self.depth]
        if self.stem:
            x = Conv(64, 5, 1, 2, dtype=self.dtype, name="pre_conv")(x)
            x = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                          groups=self.bn_groups, name="pre_bn")(x, train)
            x = nn.relu(x)
            x = max_pool_3x3_s2(x)
        c0 = x
        inp = self.in_planes
        exp = block.expansion
        g = self.bn_groups
        x = ResLayer(block, 64, layers[0], 1, inp, self.bn_axis_name,
                     self.dtype, g, name="layer1")(x, train)
        x = ResLayer(block, 128, layers[1], 2, 64 * exp, self.bn_axis_name,
                     self.dtype, g, name="layer2")(x, train)
        x = ResLayer(block, 256, layers[2], 2, 128 * exp, self.bn_axis_name,
                     self.dtype, g, name="layer3")(x, train)
        x = ResLayer(block, 512, layers[3], 2, 256 * exp, self.bn_axis_name,
                     self.dtype, g, name="layer4")(x, train)
        return c0, x


class _Heads(nn.Module):
    """MANO regressor + dense decoder heads (ref: backbone.py:209-221)."""
    joint_num: int
    bn_axis_name: Optional[str] = None
    dtype: Any = None
    bn_groups: int = 1

    @nn.compact
    def __call__(self, c4, train: bool = True):
        mano_para = nn.Dense(MANO_PARAM_DIM, kernel_init=normal001_init,
                             dtype=self.dtype, name="mano_regress")(
            adaptive_avg_pool_1(c4))
        x = DeconvBNRelu(256, self.bn_axis_name, self.dtype, self.bn_groups,
                         name="deconv4")(c4, train)
        x = DeconvBNRelu(256, self.bn_axis_name, self.dtype, self.bn_groups,
                         name="deconv3")(x, train)
        feat = DeconvBNRelu(256, self.bn_axis_name, self.dtype,
                            self.bn_groups, name="deconv2")(x, train)
        off = Conv(self.joint_num * 3, 1, 1, 0, use_bias=True,
                   kernel_init=normal001_init, dtype=self.dtype,
                   name="final_offset")(feat)
        heat = Conv(self.joint_num, 1, 1, 0, use_bias=True,
                    kernel_init=normal001_init, dtype=self.dtype,
                    name="final_heat")(feat)
        img_result = jnp.concatenate([off, heat], axis=-1)   # NHWC
        return img_result, mano_para, feat


class ManoOCR(nn.Module):
    """Single-stage variant (ref: MANO_OCR, backbone.py:94-185)."""
    joint_num: int = 21
    depth: int = 18
    bn_axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, img, train: bool = True):
        _, c4 = _maybe_remat(_Trunk)(self.depth, True, 64, self.bn_axis_name,
                                     self.dtype, name="trunk")(
            nchw_to_nhwc(img), train)
        img_result, mano_para, _ = _Heads(
            self.joint_num, self.bn_axis_name, self.dtype,
            name="heads")(c4, train)
        return [[nhwc_to_nchw(img_result), mano_para]]


class ManoOCRStage(nn.Module):
    """Dual-branch two-stage net (ref: MANO_OCR_stage, backbone.py:188-323).

    ``bn_groups`` > 1 lets the trainer run the reference's two
    SEQUENTIAL net calls (synth batch :640, real batch :671) as ONE
    stacked-batch forward with per-group BatchNorm statistics — same
    numerics, one graph (see layers.BatchNorm).  The parameter/stat tree
    is independent of bn_groups, so a groups=2 instance applies the same
    variables a groups=1 instance initialized.
    """
    joint_num: int = 21
    depth: int = 18
    refine: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Any = None
    bn_groups: int = 1

    @nn.compact
    def __call__(self, img, render: Optional[rnd.Renderer] = None,
                 center=None, cube=None, train: bool = True):
        g = self.bn_groups
        c0, c4 = _maybe_remat(_Trunk)(self.depth, True, 64, self.bn_axis_name,
                                      self.dtype, g, name="trunk")(
            nchw_to_nhwc(img), train)
        img_result, mano_para, img_feature = _maybe_remat(_Heads)(
            self.joint_num, self.bn_axis_name, self.dtype, g,
            name="heads")(c4, train)
        img_result_out = nhwc_to_nchw(img_result)

        if not self.refine:
            return [[img_result_out, mano_para]]

        # stage 2: re-render stage-1 MANO inside the forward pass.
        # The remap feature size equals the decoder resolution (input/2;
        # the reference hardcodes 64 for its 128 inputs, backbone.py:305)
        # and the remap codec nearest-downsamples the render to that
        # size anyway (GFM.joint2offset) — so raster DIRECTLY at the
        # decimated pixel subset (img_stride=2): bitwise-equal remap
        # input at 1/4 the raster work (see rasterize.crop_pixel_rays).
        mano_img, mano_joint_uvd, _, _ = rnd.render_params(
            render, mano_para.astype(jnp.float32), center, cube,
            img_stride=2)
        remap = joint2offset(mano_joint_uvd, mano_img, 0.8,
                             img_result.shape[1])
        fusion = jnp.concatenate(
            [c0, img_feature, img_result,
             nchw_to_nhwc(remap).astype(img_result.dtype)], axis=-1)
        x = ConvBNRelu(256, 3, self.bn_axis_name, self.dtype, g,
                       name="fusion")(fusion, train)
        _, c4_s2 = _maybe_remat(_Trunk)(self.depth, False, 256,
                                        self.bn_axis_name, self.dtype, g,
                                        name="trunk_s2")(x, train)
        img_result_s2, mano_para_s2, _ = _maybe_remat(_Heads)(
            self.joint_num, self.bn_axis_name, self.dtype, g,
            name="heads_s2")(c4_s2, train)
        return [[img_result_out, mano_para],
                [nhwc_to_nchw(img_result_s2), mano_para_s2]]
