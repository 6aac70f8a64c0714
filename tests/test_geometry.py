"""Golden tests for the geometry core against independently-derived values.

Expected values are computed with small NumPy re-derivations of the
reference formulas (render_loader.py:290-401, mano_layer.py:1133-1324)
rather than by importing the reference (whose deps aren't available).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dsf_tpu import geometry as geo

NYU_PARAS = (588.03, 587.07, 320.0, 240.0)


def np_joint_img_to_3d(uvd, paras, flip):
    fx, fy, fu, fv = paras
    ret = np.zeros_like(uvd)
    ret[..., 0] = (uvd[..., 0] - fu) * uvd[..., 2] / fx
    ret[..., 1] = flip * (uvd[..., 1] - fv) * uvd[..., 2] / fy
    ret[..., 2] = uvd[..., 2]
    return ret


def test_uvd_xyz_roundtrip():
    rng = np.random.RandomState(0)
    uvd = rng.uniform([0, 0, 500], [640, 480, 1200], size=(4, 21, 3)).astype(np.float32)
    for flip in (1.0, -1.0):
        xyz = geo.uvd_to_xyz(jnp.asarray(uvd), NYU_PARAS, flip)
        np.testing.assert_allclose(
            np.asarray(xyz), np_joint_img_to_3d(uvd, NYU_PARAS, flip), rtol=1e-5
        )
        back = geo.xyz_to_uvd(xyz, NYU_PARAS, flip)
        np.testing.assert_allclose(np.asarray(back), uvd, rtol=1e-4, atol=1e-2)


def np_com_to_bounds(com, size, paras):
    fx, fy, _, _ = paras
    zstart = com[2] - size[2] / 2.0
    zend = com[2] + size[2] / 2.0
    xstart = int(np.floor((com[0] * com[2] / fx - size[0] / 2.0) / com[2] * fx + 0.5))
    xend = int(np.floor((com[0] * com[2] / fx + size[0] / 2.0) / com[2] * fx + 0.5))
    ystart = int(np.floor((com[1] * com[2] / fy - size[1] / 2.0) / com[2] * fy + 0.5))
    yend = int(np.floor((com[1] * com[2] / fy + size[1] / 2.0) / com[2] * fy + 0.5))
    return xstart, xend, ystart, yend, zstart, zend


def np_com_to_transform(com, size, dsize, paras):
    """Reference comToTransform (render_loader.py:366-401)."""
    xstart, xend, ystart, yend, _, _ = np_com_to_bounds(com, size, paras)
    trans = np.eye(3)
    trans[0, 2] = -xstart
    trans[1, 2] = -ystart
    wb = xend - xstart
    hb = yend - ystart
    if wb > hb:
        scale = np.eye(3) * dsize[0] / float(wb)
        sz = (dsize[0], hb * dsize[0] / wb)
    else:
        scale = np.eye(3) * dsize[1] / float(hb)
        sz = (wb * dsize[1] / hb, dsize[1])
    scale[2, 2] = 1
    xstart = int(np.floor(dsize[0] / 2.0 - sz[0] / 2.0))
    ystart = int(np.floor(dsize[1] / 2.0 - sz[1] / 2.0))
    off = np.eye(3)
    off[0, 2] = xstart
    off[1, 2] = ystart
    return off @ scale @ trans


@pytest.mark.parametrize("com", [(320.0, 240.0, 750.0), (100.0, 400.0, 550.0),
                                 (613.2, 37.8, 1100.0)])
def test_crop_matrix_matches_reference(com):
    cube = (250.0, 250.0, 250.0)
    com_j = jnp.asarray(com)
    cube_j = jnp.asarray(cube)
    M = geo.crop_matrix(com_j, cube_j, NYU_PARAS, (128, 128))
    # Offset2Trans truncates sz via .int() which only differs from
    # comToTransform's float sz at the "changed by pengfeiren" offset; the
    # reference trainer uses Offset2Trans for synth and comToTransform for
    # real — both to generate 128x128 crops.  sz here is near-integer so
    # results agree.
    expected = np_com_to_transform(np.array(com), np.array(cube), (128, 128), NYU_PARAS)
    np.testing.assert_allclose(np.asarray(M), expected, rtol=1e-5, atol=1e-5)


def test_crop_matrix_batched():
    coms = jnp.asarray([[320.0, 240.0, 750.0], [100.0, 400.0, 550.0]])
    cubes = jnp.asarray([[250.0] * 3, [300.0] * 3])
    M = geo.crop_matrix(coms, cubes, NYU_PARAS, (128, 128))
    assert M.shape == (2, 3, 3)
    for i in range(2):
        Mi = geo.crop_matrix(coms[i], cubes[i], NYU_PARAS, (128, 128))
        np.testing.assert_allclose(np.asarray(M[i]), np.asarray(Mi), rtol=1e-6)


def test_uvd_nl_xyz_nl_roundtrip():
    rng = np.random.RandomState(1)
    B, J = 3, 21
    center = jnp.asarray(
        rng.uniform([-100, -100, 600], [100, 100, 1000], size=(B, 3)).astype(np.float32))
    cube = jnp.full((B, 3), 250.0)
    com_uvd = geo.xyz_to_uvd(center, NYU_PARAS)
    M = geo.crop_matrix(com_uvd, cube, NYU_PARAS, (128, 128))
    uvd_nl = jnp.asarray(rng.uniform(-0.9, 0.9, size=(B, J, 3)).astype(np.float32))
    xyz_nl = geo.uvd_nl_to_xyz_nl(uvd_nl, center, M, cube, NYU_PARAS, 128)
    back = geo.xyz_nl_to_uvd_nl(xyz_nl, center, M, cube, NYU_PARAS, 128)
    np.testing.assert_allclose(np.asarray(back), np.asarray(uvd_nl), rtol=1e-3, atol=1e-3)


def test_joint_trans_consistent_with_uvdnl():
    """Render.JointTrans must agree with xyz_nl_to_uvd_nl up to the d-term
    (JointTrans normalizes d against com_uvd z rather than center z; with
    com_uvd = project(center) these coincide)."""
    rng = np.random.RandomState(2)
    B, J = 2, 21
    center = jnp.asarray(
        rng.uniform([-50, -50, 700], [50, 50, 900], size=(B, 3)).astype(np.float32))
    cube = jnp.full((B, 3), 250.0)
    com_uvd = geo.xyz_to_uvd(center, NYU_PARAS)
    M = geo.crop_matrix(com_uvd, cube, NYU_PARAS, (128, 128))
    joints = center[:, None, :] + jnp.asarray(
        rng.uniform(-80, 80, size=(B, J, 3)).astype(np.float32))
    a = geo.joint_trans(joints, M, com_uvd, cube, NYU_PARAS, 128)
    xyz_nl = (joints - center[:, None, :]) / (cube[:, None, :] / 2.0)
    b = geo.xyz_nl_to_uvd_nl(xyz_nl, center, M, cube, NYU_PARAS, 128)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-3)


def test_rodrigues_matches_scipy_style():
    rng = np.random.RandomState(3)
    theta = rng.uniform(-2, 2, size=(5, 3)).astype(np.float32)
    R = np.asarray(geo.rodrigues(jnp.asarray(theta)))
    # independent axis-angle formula
    for i in range(5):
        t = theta[i]
        a = np.linalg.norm(t + 1e-8)
        k = t / a
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        expected = np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)
        np.testing.assert_allclose(R[i], expected, rtol=1e-4, atol=1e-5)
    # rotation matrices: orthonormal, det 1
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (5, 1, 1)), atol=1e-5)


def test_normalize_depth():
    img = jnp.asarray([[0.0, 700.0, 900.0, 760.0, -1.0]]).reshape(1, 1, 5)
    out = geo.normalize_depth(img, jnp.asarray([800.0]), jnp.asarray([200.0]))
    np.testing.assert_allclose(
        np.asarray(out).ravel(), [1.0, -1.0, 1.0, -0.4, 1.0], atol=1e-6)
