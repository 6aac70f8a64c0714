"""Elementwise losses: the reference's custom SmoothL1 and depth terms."""

from __future__ import annotations

import jax.numpy as jnp


def smooth_l1(x, y, size_average=True):
    """SmoothL1 with delta=0.01: 0.5 z^2 below, 0.01(|z|-0.005) above.

    Preserves the reference's mean-over-last-dim-then-reduce structure
    (metric/losses.py:6-30).
    """
    z = (x - y).astype(jnp.float32)
    az = jnp.abs(z)
    small = az < 0.01
    val = jnp.where(small, 0.5 * z * z, 0.01 * (az - 0.005))
    per = jnp.mean(jnp.where(small, val, 0.0), axis=-1) + \
        jnp.mean(jnp.where(small, 0.0, val), axis=-1)
    return jnp.mean(per) if size_average else jnp.sum(per)


def weighted_smooth_l1(x, y, weight, size_average=True):
    """Weighted variant (metric/losses.py:32-58): the weight scales z
    BEFORE the magnitude split is applied to the weighted residual."""
    z = (x - y).astype(jnp.float32)
    az = jnp.abs(z)
    small = az < 0.01
    zw = z * weight[..., None]
    val = jnp.where(small, 0.5 * zw * zw, 0.01 * (jnp.abs(zw) - 0.005))
    per = jnp.mean(jnp.where(small, val, 0.0), axis=-1) + \
        jnp.mean(jnp.where(small, 0.0, val), axis=-1)
    return jnp.mean(per) if size_average else jnp.sum(per)


def masked_depth_loss(real, synth, thresh=0.99):
    """Mean |real - synth| over pixels where either is foreground.

    The m2d term as the trainer inlines it (train_render.py:729-732):
    per-sample sum of masked |diff| / sum of mask, then batch mean.
    real/synth: (B, 1, H, W) normalized depth.
    """
    mask = ((real < thresh) | (synth < thresh)).astype(real.dtype)
    diff = jnp.abs(real - synth) * mask
    per = diff.sum((-1, -2)) / (mask.sum((-1, -2)) + 1e-8)
    return per  # (B, 1); caller means


def depth_loss_select(real, synth, thresh=0.99):
    """The standalone depth_loss module's semantics
    (render_model/render_loss.py:9-21): mean of |diff| over the mutual
    foreground (both < thresh) across the whole batch."""
    mask = (real < thresh) & (synth < thresh)
    diff = jnp.abs(real - synth)
    denom = jnp.maximum(mask.sum(), 1)
    return jnp.where(mask, diff, 0.0).sum() / denom


def surface_loss(real_img, verts_nl, center, M, cube, paras, img_size,
                 key=None, sample_num=1024, flip=1.0):
    """Chamfer between the depth-image cloud and the mesh vertices
    (ref: surface_loss, render_model/render_loss.py:37-117 — constructed
    but unused at runtime; provided for parity)."""
    import jax
    from dsf_tpu.ops.cloud import img_to_pcl
    from dsf_tpu.losses.icp import chamfer_distance
    if key is None:
        key = jax.random.PRNGKey(0)
    pcl = img_to_pcl(key, real_img, center, M, cube, paras, img_size,
                     sample_num, img_size, flip)
    return chamfer_distance(pcl, verts_nl).mean()
