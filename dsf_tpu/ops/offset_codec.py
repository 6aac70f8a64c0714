"""Dense-representation codec: joints <-> 3D offset field + cone heatmap.

The single implementation replacing the reference's five copies
(util/generateFeature.py:14-59, model/backbone.py:45-91,
model/hourglass.py:9-58, CCSSL/consis.py:53, CCSSL/consistency.py:116).

Encoding (joint2offset): per joint, a 3-channel unit offset field toward
the joint plus a cone heatmap (k - dist)/k, masked to foreground pixels
(img < 0.99) within the cone; decoding (offset2joint_softmax) is a
softmax(scale * heatmap)-weighted vote of coords + offset * dist.

Feature layout: (B, 4J, S, S) = [3J offset channels | J heatmap channels].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dsf_tpu.ops.image import resize_nearest

USE_PALLAS_CODEC = True   # fused single-pass encode/decode kernels on
                          # TPU (pallas_codec.py); the jnp paths below
                          # are the reference for CPU and parity tests


def _coords(depth, feature_size):
    """(B, 3, S, S): normalized pixel-center u, v grids + depth channel."""
    B = depth.shape[0]
    r = (jnp.arange(feature_size, dtype=depth.dtype) + 0.5) / feature_size * 2.0 - 1.0
    v, u = jnp.meshgrid(r, r, indexing="ij")
    uu = jnp.broadcast_to(u, (B, 1, feature_size, feature_size))
    vv = jnp.broadcast_to(v, (B, 1, feature_size, feature_size))
    return jnp.concatenate([uu, vv, depth], axis=1)


def joint2offset(joint, img, kernel_size, feature_size):
    """joints (B, J, 3) normalized uvd + img (B, 1, H, W) -> (B, 4J, S, S).

    (ref: GFM.joint2offset, generateFeature.py:14-36.)
    """
    B, J, _ = joint.shape
    img_s = resize_nearest(img, (feature_size, feature_size))
    if (USE_PALLAS_CODEC and jax.default_backend() != "cpu"
            and (feature_size * feature_size) % 128 == 0
            and img.dtype == jnp.float32):
        try:
            from dsf_tpu.ops.pallas_codec import encode_pallas
            return encode_pallas(joint.astype(jnp.float32),
                                 img_s.astype(jnp.float32),
                                 float(kernel_size))
        except Exception:
            pass
    coords = _coords(img_s, feature_size)                       # (B,3,S,S)
    offset = joint.reshape(B, J, 3, 1, 1) - coords[:, None]      # (B,J,3,S,S)
    dist = jnp.sqrt(jnp.sum(offset * offset, axis=2) + 1e-8)     # (B,J,S,S)
    offset_norm = offset / dist[:, :, None]
    heatmap = (kernel_size - dist) / kernel_size
    fg = (img_s < 0.99).astype(img.dtype)                        # (B,1,S,S)
    mask = (heatmap >= 0).astype(img.dtype) * fg
    offset_m = (offset_norm * mask[:, :, None]).reshape(B, J * 3,
                                                        feature_size, feature_size)
    heatmap_m = heatmap * mask
    return jnp.concatenate([offset_m, heatmap_m], axis=1)


def offset2joint_softmax(offset, depth, kernel_size, scale=30.0):
    """(B, 4J, S, S) feature + depth (B, 1, H, W) -> joints (B, J, 3).

    (ref: GFM.offset2joint_softmax, generateFeature.py:39-59.)
    """
    B, C, S, _ = offset.shape
    J = C // 4
    if depth.shape[-1] != S:
        depth = resize_nearest(depth, (S, S))
    if (USE_PALLAS_CODEC and jax.default_backend() != "cpu"
            and C == 4 * J and (S * S) % 128 == 0
            and offset.dtype == jnp.float32):
        try:
            from dsf_tpu.ops.pallas_codec import decode_pallas
            return decode_pallas(offset, depth.astype(jnp.float32),
                                 float(kernel_size), float(scale))
        except Exception:
            pass
    unit = offset[:, : J * 3].reshape(B, J, 3, S * S)
    heatmap = offset[:, J * 3:].reshape(B, J, S * S)
    coords = _coords(depth, S).reshape(B, 1, 3, S * S)
    mask = (depth < 0.99).astype(offset.dtype).reshape(B, 1, S * S)
    unit_m = unit * mask[:, :, None]
    heat_m = heatmap * mask
    normal_heat = jax.nn.softmax(heat_m * scale, axis=-1)
    dist = kernel_size - heat_m * kernel_size
    vote = unit_m * dist[:, :, None] + coords
    return jnp.sum(vote * normal_heat[:, :, None], axis=-1)


def joint2feature(joint, img, feature_paras, feature_size, feature_types=("offset",)):
    """Dispatcher matching the reference API (generateFeature.py:68-74)."""
    feature = None
    for i, ft in enumerate(feature_types):
        if ft == "offset":
            feature = joint2offset(joint, img, feature_paras[i], feature_size)
    return feature


def feature2joint(img, pixel_pd, feature_types=("offset",), feature_paras=(0.8,)):
    """Dispatcher matching the reference API (generateFeature.py:61-66)."""
    joint = None
    for i, ft in enumerate(feature_types):
        if ft == "offset":
            joint = offset2joint_softmax(pixel_pd, img, feature_paras[i])
    return joint
