"""Tests for the parity-completeness additions: aux models, pcl utils,
native host lib, surface loss."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsf_tpu.data import pcl_utils as P


def test_refine_net_and_resnet_regressor_shapes():
    from dsf_tpu.models.resnet import RefineNet, ResNet18Regressor
    x = jnp.zeros((2, 1, 96, 96))
    net = RefineNet()
    v = net.init(jax.random.PRNGKey(0), x)
    assert net.apply(v, x).shape == (2, 3)
    reg = ResNet18Regressor(joint_num=14)
    x2 = jnp.zeros((2, 1, 128, 128))
    v2 = reg.init(jax.random.PRNGKey(0), x2, train=False)
    out = reg.apply(v2, x2, train=False)
    assert out.shape == (2, 42)


def test_farthest_point_sample():
    rng = np.random.RandomState(0)
    xyz = rng.randn(200, 3)
    idx = P.farthest_point_sample(xyz, 50)
    assert len(idx) == 50
    assert len(np.unique(idx)) == 50
    # FPS spreads: min pairwise distance among samples should beat random
    d_fps = np.sort(np.linalg.norm(
        xyz[idx][:, None] - xyz[idx][None], axis=-1) + np.eye(50) * 1e9,
        axis=None)[0]
    rnd = rng.choice(200, 50, replace=False)
    d_rnd = np.sort(np.linalg.norm(
        xyz[rnd][:, None] - xyz[rnd][None], axis=-1) + np.eye(50) * 1e9,
        axis=None)[0]
    assert d_fps >= d_rnd * 0.5


def test_pca_point_normalization():
    rng = np.random.RandomState(1)
    pcl = rng.randn(300, 3) * np.array([30.0, 10.0, 5.0])
    joint = rng.randn(14, 3) * 10
    sampled, jnorm, offset, coeff, max_len = P.pca_point(pcl, joint, 128)
    assert sampled.shape == (128, 3)
    # principal axis aligned with x, roughly unit box after scaling
    assert np.abs(sampled[:, 0]).max() <= 1.2
    # rotation is orthonormal
    np.testing.assert_allclose(coeff @ coeff.T, np.eye(3), atol=1e-6)


def test_depth_to_pcl_roundtrip():
    from dsf_tpu.data import crop as C
    paras = (588.03, 587.07, 320.0, 240.0)
    com = np.array([320.0, 240.0, 750.0])
    depth = np.zeros((480, 640), np.float32)
    depth[200:280, 280:360] = 750.0
    cube = np.array([250.0, 250.0, 250.0])
    img, M = C.crop_image_deep_pp(depth, com, cube, (128, 128), paras)
    pcl = P.depth_to_pcl(img, M, paras)
    assert len(pcl) > 100
    np.testing.assert_allclose(pcl[:, 2], 750.0, atol=1.0)
    # unprojected xy within the physical blob extent (~100mm)
    assert np.abs(pcl[:, 0]).max() < 120


def test_native_lib_parity_if_built():
    from dsf_tpu.data import native, crop as C
    if not native.available():
        pytest.skip("native lib not built")
    paras = np.array((588.03, 587.07, 320.0, 240.0), np.float32)
    rng = np.random.RandomState(0)
    depth = np.zeros((480, 640), np.float32)
    depth[200:300, 250:380] = 700 + rng.rand(100, 130).astype(np.float32) * 150
    com = np.array([320.0, 245.0, 760.0], np.float32)
    cube = np.array([250.0, 250.0, 250.0], np.float32)
    img_np, M_np = C.crop_image_deep_pp(depth, com, cube, (128, 128),
                                        tuple(paras))
    img_c, M_c = native.crop_deep_pp(depth, com, cube, paras, 128)
    np.testing.assert_allclose(img_c, img_np, atol=1e-4)
    np.testing.assert_allclose(M_c, M_np, atol=1e-4)


def test_surface_loss_runs():
    from dsf_tpu.losses.basic import surface_loss
    from dsf_tpu import geometry as geo
    B, S = 1, 64
    paras = (588.03, 587.07, 320.0, 240.0)
    center = jnp.asarray([[0.0, 0.0, 750.0]])
    cube = jnp.full((B, 3), 250.0)
    com = geo.xyz_to_uvd(center, paras)
    M = geo.crop_matrix(com, cube, paras, (S, S))
    img = jnp.full((B, 1, S, S), 1.0).at[:, :, 20:40, 20:40].set(0.1)
    verts = jnp.asarray(np.random.RandomState(0).uniform(
        -0.5, 0.5, (B, 77, 3)).astype(np.float32))
    loss = surface_loss(img, verts, center, M, cube, paras, S)
    assert np.isfinite(float(loss))
