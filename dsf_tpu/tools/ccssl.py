"""CCSSL pseudo-label generation: test-time-augmentation consistency.

The reference ships two TTA implementations:

* ``CCSSL/consistency.py:72-113`` (``prediction_check_pytorch``) —
  device-side: N rotation/scale passes through the net, the SCORE MAPS
  are inverse-warped and averaged, one codec decode at the end.
* ``CCSSL/consis.py:9-50`` (``prediction_check``) — host-side: cv2
  warps, per-pass codec decode, the JOINTS are inverse-transformed and
  averaged; this is the only variant that returns a confidence (the
  per-pass spatial-softmax peak of the heat channels, averaged).

``prediction_check`` here is the exact device-side parity op (jit-able,
batched), augmented with consis.py's confidence definition (the
reference's score-map variant computes a raw max it never returns).
``prediction_check_joints`` is the exact host-side parity op.  Both are
A/B-tested against the live reference code
(tests/test_ccssl_reference_ab.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from dsf_tpu.ops.image import affine_warp
from dsf_tpu.ops.offset_codec import offset2joint_softmax


def ref_tta_draws(key, batch, n_aug):
    """The reference's TTA scale/rotation draws (consistency.py:82-94):
    pass 0 is the identity; then s = clamp(randn*0.25 + 1, 0.75, 1.25)
    and rot = clamp(randn*30, -60, 60) — the score-map variant feeds
    this "rot" straight into cos/sin, i.e. treats it as RADIANS (so
    effectively a random angle mod 2pi); preserved as-is."""
    k1, k2 = jax.random.split(key)
    s = jnp.clip(jax.random.normal(k1, (n_aug, batch)) * 0.25 + 1.0,
                 0.75, 1.25).at[0].set(1.0)
    rot = jnp.clip(jax.random.normal(k2, (n_aug, batch)) * 30.0,
                   -60.0, 60.0).at[0].set(0.0)
    return s, rot


def _ref_theta(s, rot):
    """consistency.py:142-152 get_trans_M: scale multiplies ONLY the
    diagonal (the off-diagonal sin terms are unscaled) — an anisotropic
    quirk of the reference, preserved exactly.  Returns the theta and
    its exact inverse (get_Inverse_M inverts the padded 3x3; the
    translation is 0 so this is the plain 2x2 inverse)."""
    a, b = s * jnp.cos(rot), -jnp.sin(rot)
    c, d = jnp.sin(rot), s * jnp.cos(rot)
    zeros = jnp.zeros_like(a)
    theta = jnp.stack([jnp.stack([a, b, zeros], -1),
                       jnp.stack([c, d, zeros], -1)], -2)
    det = a * d - b * c
    theta_inv = jnp.stack([jnp.stack([d / det, -b / det, zeros], -1),
                           jnp.stack([-c / det, a / det, zeros], -1)], -2)
    return theta, theta_inv


def _pass_confidence(feat, n_kpts):
    """consis.py:42 — per-pass confidence: spatial softmax(30*heat) peak."""
    B = feat.shape[0]
    heat = feat[:, 3 * n_kpts:].reshape(B, n_kpts, -1)
    return jax.nn.softmax(heat * 30.0, axis=-1).max(-1)


def prediction_check(key, forward_fn, img, n_aug=5, kernel=0.8, draws=None):
    """Score-map-averaging TTA, exact consistency.py:72-113 parity.

    forward_fn: img (B,1,S,S) -> (B, 4J, S', S') pixel feature (the
    stage of choice; the reference uses outputs[-1]).  Pass 0 is the
    identity; augmented passes warp the image (nearest, img-1 so the
    background pads to 1), inverse-warp the score maps (nearest, zero
    pad), and average.  Returns (joints_uvd (B, J, 3), confidence
    (B, J) — consis.py:42's per-pass softmax peak, averaged).
    """
    B = img.shape[0]
    s_all, rot_all = ref_tta_draws(key, B, n_aug) if draws is None else draws
    acc = None
    conf = 0.0
    for i in range(n_aug):
        theta, theta_inv = _ref_theta(s_all[i], rot_all[i])
        img_aug = affine_warp(img - 1.0, theta, mode="nearest") + 1.0
        feat = forward_fn(img_aug)
        conf += _pass_confidence(feat, feat.shape[1] // 4)
        feat_back = affine_warp(feat, theta_inv, mode="nearest")
        acc = feat_back if acc is None else acc + feat_back
    feat_mean = acc / n_aug
    joints = offset2joint_softmax(feat_mean, img, kernel)
    return joints, conf / n_aug


def ref_crop_affine(center, scale, rot_deg, out_size):
    """data/transform.py:57-91 get_affine_transform (the 128-anchored
    variant consis.py uses): the 2x3 affine solved from the reference's
    exact 3 source/destination point pairs."""
    cx, cy = float(center[0]), float(center[1])
    src_w = scale * 128.0
    dst_w = dst_h = float(out_size)
    rot = np.pi * rot_deg / 180.0
    sn, cs = np.sin(rot), np.cos(rot)
    # get_dir([0, -src_w/2], rot)
    sdir = np.array([src_w * 0.5 * sn, -src_w * 0.5 * cs])
    src = np.zeros((3, 2), np.float64)
    dst = np.zeros((3, 2), np.float64)
    src[0] = (cx, cy)
    src[1] = src[0] + sdir
    dst[0] = (dst_w * 0.5, dst_h * 0.5)
    dst[1] = dst[0] + np.array([0.0, -dst_w * 0.5])
    for p, q in ((src, src), (dst, dst)):
        d = q[0] - q[1]                      # get_3rd_point(a, b)
        p[2] = q[1] + np.array([-d[1], d[0]])
    A = np.zeros((6, 6))
    bvec = np.zeros(6)
    for i in range(3):
        A[2 * i, :3] = (src[i, 0], src[i, 1], 1.0)
        A[2 * i + 1, 3:] = (src[i, 0], src[i, 1], 1.0)
        bvec[2 * i:2 * i + 2] = dst[i]
    return np.linalg.solve(A, bvec).reshape(2, 3)


def prediction_check_joints(rng, forward_fn, img, n_aug=5, kernel=0.8,
                            draws=None):
    """Joint-averaging TTA, exact consis.py:9-50 parity (host-side).

    Per pass: cv2 nearest warp (borderValue=1) by the reference's
    128-anchored crop affine (rot in DEGREES here), per-pass codec
    decode on the WARPED image, joints inverse-transformed in the
    128-px frame (consis.py:102-118 trans_joint/inverse_M), then
    averaged.  img: (B, 1, S, S) array; forward_fn as above.
    Returns (joints_uvd (B, J, 3), confidence (B, J)).
    """
    import cv2

    img = np.asarray(img, np.float32)
    B, _, H, W = img.shape
    if draws is None:
        s_all = np.clip(rng.randn(n_aug, B) * 0.25 + 1.0, 0.75, 1.25)
        rot_all = np.clip(rng.randn(n_aug, B) * 30.0, -60.0, 60.0)
        s_all[0], rot_all[0] = 1.0, 0.0
    else:
        s_all, rot_all = draws
    joint_acc = 0.0
    conf_acc = 0.0
    for i in range(n_aug):
        Ms = [ref_crop_affine((W // 2, H // 2), s_all[i, b], rot_all[i, b],
                              W) for b in range(B)]
        warped = np.stack([
            cv2.warpAffine(img[b, 0], Ms[b].astype(np.float32), (W, H),
                           flags=cv2.INTER_NEAREST, borderValue=1.0)
            for b in range(B)])[:, None]
        feat = forward_fn(jnp.asarray(warped))
        juvd = np.array(
            offset2joint_softmax(feat, jnp.asarray(warped), kernel))
        conf_acc += np.asarray(_pass_confidence(feat, feat.shape[1] // 4))
        # trans_joint (consis.py:102-111): px = (u+1)*64, inverse affine
        half = W / 2.0
        for b in range(B):
            Minv = np.linalg.inv(np.vstack([Ms[b], (0.0, 0.0, 1.0)]))[:2]
            px = (juvd[b, :, :2] + 1.0) * half
            px = px @ Minv[:, :2].T + Minv[:, 2]
            juvd[b, :, :2] = px / half - 1.0
        joint_acc = joint_acc + juvd
    return joint_acc / n_aug, conf_acc / n_aug


def export_refine_centers(dataset, out_path):
    """Export a dataset's refined centers as world-xyz rows after the
    reference's y-negation roundtrip (project with flip=-1, unproject
    with flip=+1) — the live body of debug_CCSSL
    (ref: data/render_loader.py:5488-5495), which writes
    center_test_<view>_refine_xyz.txt for the CCSSL center files."""
    from dsf_tpu.data import crop as C

    c = np.asarray(dataset.center_xyz, np.float32).reshape(-1, 1, 3)
    c = C.joint_img_to_3d(C.joint_3d_to_img(c, dataset.paras, flip=-1),
                          dataset.paras, flip=1).reshape(-1, 3)
    np.savetxt(out_path, c, fmt="%.3f")
    return c
