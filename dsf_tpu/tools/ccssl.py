"""CCSSL pseudo-label generation: test-time-augmentation consistency.

On-device rewrite of the CCSSL baselines' TTA passes
(CCSSL/consis.py:9-50 prediction_check, CCSSL/consistency.py:72-113
prediction_check_pytorch): run N random rotation/scale augmentations of
each crop through the net, inverse-warp the SCORE MAPS, average, decode
joints with the offset codec, and derive per-joint confidence from the
softmax peak.  Pure JAX (warps + codec), fully jit-able.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dsf_tpu.ops.image import affine_warp
from dsf_tpu.ops.offset_codec import offset2joint_softmax


def _rot_scale_theta(key, B, max_angle=jnp.pi, scale_range=0.2):
    k1, k2 = jax.random.split(key)
    ang = jax.random.uniform(k1, (B,), minval=-max_angle, maxval=max_angle)
    sc = 1.0 + jax.random.uniform(k2, (B,), minval=-scale_range,
                                  maxval=scale_range)
    cos, sin = jnp.cos(ang) * sc, jnp.sin(ang) * sc
    zeros = jnp.zeros_like(cos)
    theta = jnp.stack([jnp.stack([cos, -sin, zeros], -1),
                       jnp.stack([sin, cos, zeros], -1)], -2)
    inv_sc = 1.0 / sc
    cos_i, sin_i = jnp.cos(-ang) * inv_sc, jnp.sin(-ang) * inv_sc
    theta_inv = jnp.stack([jnp.stack([cos_i, -sin_i, zeros], -1),
                           jnp.stack([sin_i, cos_i, zeros], -1)], -2)
    return theta, theta_inv


def prediction_check(key, forward_fn, img, n_aug=5, kernel=0.8):
    """Average inverse-warped score maps over n_aug TTA passes.

    forward_fn: img -> (B, 4J, S, S) pixel feature (stage of choice).
    Returns (joints_uvd (B, J, 3), confidence (B, J)).
    """
    B = img.shape[0]
    acc = None
    for i in range(n_aug):
        key, sub = jax.random.split(key)
        theta, theta_inv = _rot_scale_theta(sub, B)
        img_aug = affine_warp(img - 1.0, theta, mode="nearest") + 1.0
        feat = forward_fn(img_aug)
        feat_back = affine_warp(feat, theta_inv, mode="bilinear")
        acc = feat_back if acc is None else acc + feat_back
    feat_mean = acc / n_aug
    joints = offset2joint_softmax(feat_mean, img, kernel)
    J = feat_mean.shape[1] // 4
    S = feat_mean.shape[-1]
    heat = feat_mean[:, 3 * J:].reshape(B, J, S * S)
    conf = jax.nn.softmax(heat * 30.0, axis=-1).max(-1)
    return joints, conf


def export_refine_centers(dataset, out_path):
    """Export a dataset's refined centers as world-xyz rows after the
    reference's y-negation roundtrip (project with flip=-1, unproject
    with flip=+1) — the live body of debug_CCSSL
    (ref: data/render_loader.py:5488-5495), which writes
    center_test_<view>_refine_xyz.txt for the CCSSL center files."""
    import numpy as np
    from dsf_tpu.data import crop as C

    c = np.asarray(dataset.center_xyz, np.float32).reshape(-1, 1, 3)
    c = C.joint_img_to_3d(C.joint_3d_to_img(c, dataset.paras, flip=-1),
                          dataset.paras, flip=1).reshape(-1, 3)
    np.savetxt(out_path, c, fmt="%.3f")
    return c
