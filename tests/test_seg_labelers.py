"""A/B parity: skeleton-interpolation segmentation labelers vs the
reference's torch implementations (render_loader.py:1352-1480)."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from reference_import import load_reference_module  # noqa: E402

from dsf_tpu import geometry as geo  # noqa: E402
from dsf_tpu.ops import cloud  # noqa: E402

PARAS = (588.03, 587.07, 320.0, 240.0)
S = 32
B = 2
INTERVAL = 4


@pytest.fixture(scope="module")
def ref_loader():
    m = load_reference_module("data/render_loader.py", "ref_render_loader")
    ld = m.loader("", "train", S, "refine", "nyu")
    ld.paras = PARAS
    ld.flip = 1
    ld.img_size = S
    return ld


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(3)
    joint = rng.uniform(-0.6, 0.6, (B, 21, 3)).astype(np.float32)
    center = np.stack([rng.uniform(-30, 30, B), rng.uniform(-30, 30, B),
                       rng.uniform(700, 800, B)], -1).astype(np.float32)
    cube = np.full((B, 3), 250.0, np.float32)
    com = np.asarray(geo.xyz_to_uvd(jnp.asarray(center), PARAS))
    M = np.asarray(geo.crop_matrix(jnp.asarray(com), jnp.asarray(cube),
                                   PARAS, (S, S)))
    img = rng.uniform(-1, 1, (B, 1, S, S)).astype(np.float32)
    img[:, :, :4] = 1.0                      # some background
    return joint, center, cube, M, img


def test_interpolation_joint_matches_reference(ref_loader, data):
    joint = data[0]
    ours = np.asarray(cloud.interpolation_joint(jnp.asarray(joint), INTERVAL))
    theirs = ref_loader.InterpolationJoint(torch.from_numpy(joint),
                                           INTERVAL).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def _t(x):
    return torch.from_numpy(np.asarray(x))


def test_joint2bkseg_matches_reference(ref_loader, data):
    joint, center, cube, M, img = data
    ours = np.asarray(cloud.joint_to_bk_seg(
        jnp.asarray(img), jnp.asarray(joint), jnp.asarray(center),
        jnp.asarray(M), jnp.asarray(cube), PARAS, S))
    theirs = ref_loader.Joint2BKSeg(_t(img), _t(joint), _t(center), _t(M),
                                    _t(cube)).numpy()
    agree = (ours == theirs).mean()
    assert agree > 0.995, agree


def test_joint2fingerseg_matches_reference(ref_loader, data):
    joint, center, cube, M, img = data
    mask = cloud.joint_to_bk_seg(
        jnp.asarray(img), jnp.asarray(joint), jnp.asarray(center),
        jnp.asarray(M), jnp.asarray(cube), PARAS, S)
    ours = np.asarray(cloud.joint_to_finger_seg(
        jnp.asarray(img), jnp.asarray(joint), jnp.asarray(center),
        jnp.asarray(M), jnp.asarray(cube), PARAS, S, INTERVAL, mask))
    theirs = ref_loader.Joint2FingerSeg(
        _t(img), _t(joint), _t(center), _t(M), _t(cube), INTERVAL,
        _t(np.asarray(mask))).numpy()
    agree = (ours == theirs).mean()
    assert agree > 0.99, agree
    assert set(np.unique(ours)) <= set(range(7))


def test_joint2jointseg_matches_reference(ref_loader, data):
    joint, center, cube, M, img = data
    mask = cloud.joint_to_bk_seg(
        jnp.asarray(img), jnp.asarray(joint), jnp.asarray(center),
        jnp.asarray(M), jnp.asarray(cube), PARAS, S)
    ours = np.asarray(cloud.joint_to_joint_seg(
        jnp.asarray(img), jnp.asarray(joint), jnp.asarray(center),
        jnp.asarray(M), jnp.asarray(cube), PARAS, S, INTERVAL, mask))
    theirs = ref_loader.Joint2JointSeg(
        _t(img), _t(joint), _t(center), _t(M), _t(cube), INTERVAL,
        _t(np.asarray(mask))).numpy()
    agree = (ours == theirs).mean()
    assert agree > 0.99, agree
    assert set(np.unique(ours)) <= set(range(22))


def test_pcl2jointseg_matches_reference(ref_loader, data):
    joint = data[0]
    rng = np.random.RandomState(5)
    pcl = rng.uniform(-0.8, 0.8, (B, 64, 3)).astype(np.float32)
    mask = np.ones((B, 64), np.int32)
    mask[:, :8] = 0
    ours = np.asarray(cloud.pcl_to_joint_seg(
        jnp.asarray(pcl), jnp.asarray(joint), INTERVAL, jnp.asarray(mask)))
    theirs = ref_loader.PCL2JointSeg(_t(pcl), _t(joint), INTERVAL,
                                     _t(mask)).numpy()
    agree = (ours == theirs.astype(np.int64)).mean()
    assert agree > 0.99, agree
    assert (ours[:, :8] == 21).all()
