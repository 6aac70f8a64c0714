"""Torch-semantics building blocks in Flax — NHWC-native.

Padding / stride / norm conventions are matched to the torch modules the
reference uses so that (a) converted checkpoints are bit-compatible and
(b) training dynamics line up.

Layout: every block here takes and returns **NHWC** activations.  TPU
convolutions want channels on the minor (lane) axis; round-2 profiling
showed the per-layer NCHW<->NHWC transpose pairs around every
Conv/BN/Deconv (with NCHW elementwise ops between them) kept XLA from
settling on one layout — convs were 54% of the 163 ms step at low MXU
utilization.  Models are NHWC end-to-end internally and convert at the
graph boundary only (`nchw_to_nhwc` at entry, `nhwc_to_nchw` at exit),
so the framework-facing API (images (B, C, H, W), codec features
(B, 4J, S, S)) is unchanged.

Weight layout is unaffected: Flax conv kernels are HWIO for any data
layout, so torch_import converters need no changes.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def nchw_to_nhwc(x):
    return x.transpose(0, 2, 3, 1)


def nhwc_to_nchw(x):
    return x.transpose(0, 3, 1, 2)


def kaiming_out_init(key, shape, dtype=jnp.float32):
    """Reference conv init: normal(0, sqrt(2 / (k*k*out_ch)))
    (model/backbone.py:246-250).  Flax HWIO shape (kh, kw, in, out)."""
    kh, kw, _, out = shape
    n = kh * kw * out
    return jax.random.normal(key, shape, dtype) * jnp.sqrt(2.0 / n)


def normal001_init(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * 0.001


class Conv(nn.Module):
    """torch nn.Conv2d equivalent (NHWC)."""
    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = False
    kernel_init: Callable = kaiming_out_init
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding),) * 2,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            dtype=self.dtype, name="conv",
        )(x)


class BatchNorm(nn.Module):
    """torch nn.BatchNorm2d(momentum=0.1) equivalent for NHWC input.

    Optional cross-device stat sync via ``axis_name`` (the reference is
    single-GPU BN with batch 32; under DP keep per-device batch 32 to
    match statistics, or sync for large global batches).

    ``groups`` > 1 treats the leading axis as ``groups`` stacked
    independent batches: statistics are computed PER GROUP and the
    running-stat EMA is applied once per group in order — numerically
    identical to calling the layer sequentially on each group.  This is
    what lets the trainer fuse the reference's two sequential net calls
    (synth batch then real batch, train_render.py:640,671) into ONE 2B
    forward with bit-matching BN semantics.  Implemented as ONE reshaped
    reduction + ONE elementwise pass (`_GroupedBN`) — a split/concat
    formulation was measured 7% slower end-to-end (two extra activation
    copies per BN layer, fwd and bwd).
    """
    momentum: float = 0.9     # flax decay == 1 - torch momentum
    axis_name: Optional[str] = None
    dtype: Any = None
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.groups <= 1 or not train:
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=self.momentum, epsilon=1e-5,
                axis_name=self.axis_name, dtype=self.dtype, name="bn")(x)
        return _GroupedBN(self.momentum, self.axis_name, self.dtype,
                          self.groups, name="bn")(x)


class _GroupedBN(nn.Module):
    """Train-mode BatchNorm with per-leading-axis-group statistics.

    Shares nn.BatchNorm's exact variable layout (params ``scale``/
    ``bias``, batch_stats ``mean``/``var``) so a tree initialized or
    checkpointed through the plain path applies unchanged.  Matches its
    train math: f32 stats with fast variance (E[x^2] - E[x]^2), EMA
    ``m*ra + (1-m)*batch``, normalize ``(x - mean)*rsqrt(var+eps)*scale
    + bias``.  The per-group EMA updates compose in group order exactly
    as sequential calls would.
    """
    momentum: float
    axis_name: Optional[str]
    dtype: Any
    groups: int

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        g = self.groups
        xg = x.reshape((g, x.shape[0] // g) + x.shape[1:])
        red = tuple(range(1, xg.ndim - 1))
        xf = xg.astype(jnp.float32)
        mean = xf.mean(red)                                   # (g, C)
        mean2 = (xf * xf).mean(red)
        if self.axis_name is not None:
            mean = jax.lax.pmean(mean, self.axis_name)
            mean2 = jax.lax.pmean(mean2, self.axis_name)
        var = mean2 - mean * mean
        if not self.is_initializing():
            m, rm, rv = self.momentum, ra_mean.value, ra_var.value
            for i in range(g):
                rm = m * rm + (1 - m) * mean[i]
                rv = m * rv + (1 - m) * var[i]
            ra_mean.value, ra_var.value = rm, rv
        dt = self.dtype or jnp.result_type(x, scale)
        mul = (jax.lax.rsqrt(var + 1e-5)
               * scale[None].astype(jnp.float32)).astype(dt)  # (g, C)
        bshape = (g,) + (1,) * (xg.ndim - 2) + (C,)
        y = ((xg.astype(dt) - mean.astype(dt).reshape(bshape))
             * mul.reshape(bshape) + bias.astype(dt))
        return y.reshape(x.shape)


class ConvTranspose(nn.Module):
    """torch nn.ConvTranspose2d(k, stride=2, padding=1) equivalent: exact
    2x upsampling (out = 2*in for k=4,p=1 and k=3,p=1,output_padding=1)."""
    features: int
    kernel: int = 4
    stride: int = 2
    padding: int = 1
    output_padding: int = 0
    use_bias: bool = False
    kernel_init: Callable = normal001_init
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k, s, p, op = self.kernel, self.stride, self.padding, self.output_padding
        # torch output: (i-1)*s - 2p + k + op.  lax.conv_transpose with
        # explicit padding gives out = (i-1)*s + k - 2(k-1) + padL + padR,
        # so torch padding p maps to padL = k-1-p and output_padding adds
        # to the high side: padR = k-1-p+op.
        return nn.ConvTranspose(
            self.features, (k, k), strides=(s, s),
            padding=((k - 1 - p, k - 1 - p + op),) * 2,
            use_bias=self.use_bias, kernel_init=self.kernel_init,
            transpose_kernel=True, dtype=self.dtype, name="deconv",
        )(x)


def max_pool_3x3_s2(x):
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1) on NHWC."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)))


def max_pool(x, k, s=None, pad=0):
    """torch MaxPool2d(k, stride=s, padding=pad) on NHWC."""
    s = k if s is None else s
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, k, k, 1), window_strides=(1, s, s, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)))


def adaptive_avg_pool_1(x):
    """torch AdaptiveAvgPool2d(1) + flatten on NHWC -> (B, C)."""
    return x.mean(axis=(1, 2))


class ConvBNRelu(nn.Module):
    """ref conv_bn_relu (backbone.py:16-27): conv k, stride 1, pad 1."""
    features: int
    kernel: int = 3
    bn_axis_name: Optional[str] = None
    dtype: Any = None
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv(self.features, self.kernel, 1, 1, dtype=self.dtype,
                 name="conv")(x)
        x = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                      groups=self.bn_groups, name="bn")(x, train)
        return nn.relu(x)


class DeconvBNRelu(nn.Module):
    """ref convtranspose_bn_relu (backbone.py:30-42): deconv k4 s2 p1."""
    features: int
    bn_axis_name: Optional[str] = None
    dtype: Any = None
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ConvTranspose(self.features, 4, 2, 1, dtype=self.dtype,
                          name="deconv")(x)
        x = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                      groups=self.bn_groups, name="bn")(x, train)
        return nn.relu(x)
