"""Consis-CycleGAN generator (domain transfer net) in Flax.

Public API is NCHW (images (B, C, H, W)); internals are NHWC-native
(see models/layers.py for the layout rationale).

The reference loads a frozen pretrained `ResnetGenerator` (1->1 ch,
ngf 64, instance norm, reflect pad, 2 down + 9 resblocks + 2 up + tanh;
render_model/transfer.py:393-449 via define_G 'resnet_9blocks'
'instance') and applies it to every rendered synth image.  The full
CycleGAN zoo (discriminators, GAN losses) exists in the reference but is
unused at runtime; the encoder/decoder splits and discriminators are
provided here for training-parity completeness.
"""

from __future__ import annotations

import os
from typing import Any

import jax.numpy as jnp
import flax.linen as nn


from dsf_tpu.models.layers import nchw_to_nhwc, nhwc_to_nchw


def _reflect_pad(x, p):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


def _instance_norm(x, eps=1e-5):
    """InstanceNorm2d(affine=False) on NHWC."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


class _ConvIN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    use_bias: bool = True   # instance norm => use_bias=True in the reference
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride),
                       padding=((self.pad, self.pad),) * 2,
                       use_bias=self.use_bias, dtype=self.dtype,
                       name="conv")(x)


class _FusedTail(nn.Module):
    """The generator head (7x7 C->1 conv + bias + tanh) through the
    taps-as-channels MXU + Pallas shift-sum op (ops/pallas_tapsum.py).

    Declares the SAME param tree as `_ConvIN(name="head")` —
    head/conv/{kernel, bias} with nn.Conv's default inits, so
    checkpoints and the torch converter are layout-identical; the RNG
    fold is by param path, so init values are bitwise-equal too.
    """
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        class _P(nn.Module):
            kernel: int
            in_features: int

            @nn.compact
            def __call__(s):
                k = s.param("kernel", nn.initializers.lecun_normal(),
                            (s.kernel, s.kernel, s.in_features, 1))
                b = s.param("bias", nn.initializers.zeros, (1,))
                return k, b

        k, b = _P(7, x.shape[-1], name="conv")()
        from dsf_tpu.ops.pallas_tapsum import tail_conv_tanh
        return tail_conv_tanh(x, k, b, self.dtype)


class ResnetBlock(nn.Module):
    """conv-IN-relu-conv-IN with reflect padding + skip
    (ref: transfer.py:547-604)."""
    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = _reflect_pad(x, 1)
        y = _ConvIN(self.dim, 3, dtype=self.dtype, name="c1")(y)
        y = nn.relu(_instance_norm(y))
        y = _reflect_pad(y, 1)
        y = _ConvIN(self.dim, 3, dtype=self.dtype, name="c2")(y)
        y = _instance_norm(y)
        return x + y


class ResnetGenerator(nn.Module):
    """(B, in_nc, H, W) -> (B, out_nc, H, W) in [-1, 1]."""
    input_nc: int = 1
    output_nc: int = 1
    ngf: int = 64
    n_blocks: int = 9
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nchw_to_nhwc(x)
        x = _reflect_pad(x, 3)
        x = _ConvIN(self.ngf, 7, dtype=self.dtype, name="stem")(x)
        x = nn.relu(_instance_norm(x))
        for i in range(2):                      # downsampling
            mult = 2 ** i
            x = _ConvIN(self.ngf * mult * 2, 3, 2, 1, dtype=self.dtype,
                        name=f"down{i}")(x)
            x = nn.relu(_instance_norm(x))
        for i in range(self.n_blocks):
            x = ResnetBlock(self.ngf * 4, dtype=self.dtype,
                            name=f"res{i}")(x)
        for i in range(2):                      # upsampling
            mult = 2 ** (2 - i)
            from dsf_tpu.models.layers import ConvTranspose
            y = ConvTranspose(int(self.ngf * mult / 2), 3, 2, 1,
                              output_padding=1, use_bias=True,
                              dtype=self.dtype, name=f"up{i}")(x)
            x = nn.relu(_instance_norm(y))
        x = _reflect_pad(x, 3)
        if self.output_nc == 1 and os.environ.get("DSF_FUSED_TAIL",
                                                  "0") == "1":
            # C_out=1 head as MXU contraction + Pallas shift-sum
            # (ops/pallas_tapsum.py; identical param tree).  Measured a
            # WASH in-graph (10.06 vs 10.03 ms) — kept off; see the
            # kernel docstring for the numbers.
            return nhwc_to_nchw(_FusedTail(dtype=self.dtype,
                                           name="head")(x))
        x = _ConvIN(self.output_nc, 7, dtype=self.dtype, name="head")(x)
        return nhwc_to_nchw(jnp.tanh(x))


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (ref: transfer.py:709-754) — present for
    CycleGAN training parity; unused in the self-boosting loop."""
    input_nc: int = 1
    ndf: int = 64
    n_layers: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nchw_to_nhwc(x)
        x = _ConvIN(self.ndf, 4, 2, 1, dtype=self.dtype, name="c0")(x)
        x = nn.leaky_relu(x, 0.2)
        mult = 1
        for i in range(1, self.n_layers):
            mult = min(2 ** i, 8)
            x = _ConvIN(self.ndf * mult, 4, 2, 1, dtype=self.dtype,
                        name=f"c{i}")(x)
            x = nn.leaky_relu(_instance_norm(x), 0.2)
        mult = min(2 ** self.n_layers, 8)
        x = _ConvIN(self.ndf * mult, 4, 1, 1, dtype=self.dtype,
                    name=f"c{self.n_layers}")(x)
        x = nn.leaky_relu(_instance_norm(x), 0.2)
        return nhwc_to_nchw(
            _ConvIN(1, 4, 1, 1, dtype=self.dtype, name="head")(x))


def gan_loss(pred, target_is_real, mode="lsgan"):
    """GANLoss (ref: transfer.py:287-354): lsgan = MSE vs 1/0 labels."""
    target = jnp.ones_like(pred) if target_is_real else jnp.zeros_like(pred)
    if mode == "lsgan":
        return jnp.mean((pred - target) ** 2)
    if mode == "vanilla":
        return jnp.mean(
            jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred))))
    raise ValueError(mode)


class ResnetEncoder(nn.Module):
    """Stem + downsampling + resblocks half of the generator
    (ref: transfer.py:451-498) — used by encoder/decoder CycleGAN
    variants."""
    input_nc: int = 1
    ngf: int = 64
    n_blocks: int = 6
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nchw_to_nhwc(x)
        x = _reflect_pad(x, 3)
        x = _ConvIN(self.ngf, 7, dtype=self.dtype, name="stem")(x)
        x = nn.relu(_instance_norm(x))
        for i in range(2):
            mult = 2 ** i
            x = _ConvIN(self.ngf * mult * 2, 3, 2, 1, dtype=self.dtype,
                        name=f"down{i}")(x)
            x = nn.relu(_instance_norm(x))
        for i in range(self.n_blocks):
            x = ResnetBlock(self.ngf * 4, dtype=self.dtype, name=f"res{i}")(x)
        return nhwc_to_nchw(x)


class ResnetDecoder(nn.Module):
    """Upsampling + head half (ref: transfer.py:501-544)."""
    output_nc: int = 1
    ngf: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        from dsf_tpu.models.layers import ConvTranspose
        x = nchw_to_nhwc(x)
        for i in range(2):
            mult = 2 ** (2 - i)
            x = ConvTranspose(int(self.ngf * mult / 2), 3, 2, 1,
                              output_padding=1, use_bias=True,
                              dtype=self.dtype, name=f"up{i}")(x)
            x = nn.relu(_instance_norm(x))
        x = _reflect_pad(x, 3)
        x = _ConvIN(self.output_nc, 7, dtype=self.dtype, name="head")(x)
        return nhwc_to_nchw(jnp.tanh(x))


class UnetGenerator(nn.Module):
    """U-Net generator (ref: transfer.py:607-706): num_downs nested
    skip blocks, innermost at a 1x1 bottleneck for 128 inputs."""
    input_nc: int = 1
    output_nc: int = 1
    num_downs: int = 7
    ngf: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        from dsf_tpu.models.layers import ConvTranspose

        def down(x, ch, name):
            return nn.Conv(ch, (4, 4), (2, 2), padding=((1, 1), (1, 1)),
                           use_bias=True, dtype=self.dtype, name=name)(x)

        def up(x, ch, name):
            y = ConvTranspose(ch, 4, 2, 1, use_bias=True, dtype=self.dtype,
                              name=name)(nn.relu(x))
            return _instance_norm(y)

        chans = [min(self.ngf * (2 ** i), self.ngf * 8)
                 for i in range(self.num_downs)]
        skips = []
        h = nchw_to_nhwc(x)
        for i, ch in enumerate(chans):
            h = down(nn.leaky_relu(h, 0.2) if i else h, ch, f"down{i}")
            if i < len(chans) - 1:
                h = _instance_norm(h)
            skips.append(h)
        h = skips.pop()
        for i, ch in enumerate(reversed(chans[:-1])):
            h = up(h, ch, f"up{i}")
            h = jnp.concatenate([skips.pop(), h], axis=-1)
        y = ConvTranspose(self.output_nc, 4, 2, 1, use_bias=True,
                          dtype=self.dtype, name="head")(nn.relu(h))
        return nhwc_to_nchw(jnp.tanh(y))


class PixelDiscriminator(nn.Module):
    """1x1 PatchGAN (ref: transfer.py:757-786)."""
    input_nc: int = 1
    ndf: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nchw_to_nhwc(x)
        x = _ConvIN(self.ndf, 1, dtype=self.dtype, name="c0")(x)
        x = nn.leaky_relu(x, 0.2)
        x = _ConvIN(self.ndf * 2, 1, dtype=self.dtype, name="c1")(x)
        x = nn.leaky_relu(_instance_norm(x), 0.2)
        return nhwc_to_nchw(_ConvIN(1, 1, dtype=self.dtype, name="head")(x))


def gradient_penalty(key, disc_apply, real, fake, mode="mixed", constant=1.0):
    """WGAN-GP style penalty (ref: cal_gradient_penalty,
    transfer.py:356-390)."""
    import jax
    if mode == "real":
        interp = real
    elif mode == "fake":
        interp = fake
    else:
        alpha = jax.random.uniform(key, (real.shape[0], 1, 1, 1))
        interp = alpha * real + (1 - alpha) * fake

    def d_sum(x):
        return disc_apply(x).sum()

    grads = jax.grad(d_sum)(interp)
    gnorm = jnp.sqrt(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2,
                             axis=1) + 1e-16)
    return jnp.mean((gnorm - constant) ** 2)
