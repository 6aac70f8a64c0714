"""Consis-CycleGAN generator (domain transfer net) in Flax, NCHW.

The reference loads a frozen pretrained `ResnetGenerator` (1->1 ch,
ngf 64, instance norm, reflect pad, 2 down + 9 resblocks + 2 up + tanh;
render_model/transfer.py:393-449 via define_G 'resnet_9blocks'
'instance') and applies it to every rendered synth image.  The full
CycleGAN zoo (discriminators, GAN losses) exists in the reference but is
unused at runtime; the encoder/decoder splits and discriminators are
provided here for training-parity completeness.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn


def _reflect_pad(x, p):
    return jnp.pad(x, ((0, 0), (0, 0), (p, p), (p, p)), mode="reflect")


def _instance_norm(x, eps=1e-5):
    """InstanceNorm2d(affine=False) on NCHW."""
    mean = x.mean(axis=(-1, -2), keepdims=True)
    var = x.var(axis=(-1, -2), keepdims=True)
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
        y = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((self.pad, self.pad),) * 2,
                    use_bias=self.use_bias, dtype=self.dtype,
                    name="conv")(x.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
        return y


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
        x = _ConvIN(self.output_nc, 7, dtype=self.dtype, name="head")(x)
        return jnp.tanh(x)


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (ref: transfer.py:709-754) — present for
    CycleGAN training parity; unused in the self-boosting loop."""
    input_nc: int = 1
    ndf: int = 64
    n_layers: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
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
        return _ConvIN(1, 4, 1, 1, dtype=self.dtype, name="head")(x)


def gan_loss(pred, target_is_real, mode="lsgan"):
    """GANLoss (ref: transfer.py:287-354): lsgan = MSE vs 1/0 labels."""
    target = jnp.ones_like(pred) if target_is_real else jnp.zeros_like(pred)
    if mode == "lsgan":
        return jnp.mean((pred - target) ** 2)
    if mode == "vanilla":
        return jnp.mean(
            jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred))))
    raise ValueError(mode)
