"""Tests for the diagnostics visual toolkit (vis_debug)."""

import os

import numpy as np
import jax.numpy as jnp

from dsf_tpu.utils import vis_debug as VD


def test_adj_mats():
    adj = VD.get_adj_mat("hands")
    assert adj.shape == (21, 21)
    assert (adj == adj.T).all()
    assert adj[0, 1] == 1 and adj[6, 7] == 1 and adj[8, 9] == 0
    nyu = VD.get_adj_mat("nyu")
    assert nyu.shape == (14, 14)
    assert (np.diag(nyu) == 1).all()


def test_hand_model_tables():
    assert len(VD.get_hand_model_bone()) == 20
    mean, std = VD.get_bone_len()
    assert len(mean) == 20 and len(std) == 20
    assert len(VD.get_finger_group()) == 4
    assert len(VD.get_palm_group()) == 5
    assert VD.get_palm_angle_con().shape == (4, 2)


def test_debug_2d_heatmap(tmp_path):
    hm = np.random.RandomState(0).rand(2, 3, 16, 16).astype(np.float32)
    out = VD.debug_2d_heatmap(hm, size=32, out_dir=str(tmp_path))
    assert out.shape == (6, 32, 32, 3)
    assert out.dtype == np.uint8
    assert len(os.listdir(tmp_path)) == 6


def test_offset_field_quiver():
    off = np.random.RandomState(1).rand(2, 4 * 21, 16, 16).astype(np.float32)
    pos, vec = VD.debug_offset_field(off, joint_index=2, stride=4)
    assert pos.shape == (4, 4, 2)
    assert vec.shape == (2, 4, 4, 2)


def test_sphere_vis_and_sdf(tmp_path):
    from dsf_tpu.mano import model as mano, synthetic
    npz = str(tmp_path / "m.npz")
    synthetic.save_synthetic_mano(npz)
    m = mano.load_model(npz)
    rng = np.random.RandomState(2)
    rot = jnp.zeros((1, 3))
    theta = jnp.asarray(rng.randn(1, 45).astype(np.float32) * 0.3)
    beta = jnp.zeros((1, 10))
    cam = jnp.asarray([[1.0, 0, 0, 0]])
    verts, joints = mano.get_mano_vertices(m, rot, theta, beta, cam)
    fig = VD.vis_sphere(m, np.asarray(joints[0]), np.asarray(verts[0]),
                        path=str(tmp_path / "sphere.png"))
    assert os.path.exists(tmp_path / "sphere.png")
    sdf = VD.sphere_sdf_slice(m, np.asarray(joints[0]),
                              np.asarray(verts[0]), z=0.0,
                              extent=((-120, 120), (-120, 120)), res=32)
    assert sdf.shape == (32, 32)
    assert sdf.min() < 0 < sdf.max()   # slice crosses the hand


def test_save_label(tmp_path):
    import jax.numpy as jnp
    from dsf_tpu.mano import model as mano, synthetic
    from dsf_tpu.render import renderer as rnd
    npz = str(tmp_path / "m.npz")
    synthetic.save_synthetic_mano(npz)
    m = mano.load_model(npz)
    paras = (588.03, 587.07, 320.0, 240.0)
    r = rnd.Renderer.create(m, "nyu", paras, (640, 480))
    rng = np.random.RandomState(3)
    B = 4
    para = np.concatenate([rng.uniform(-1, 1, (B, 3)),
                           rng.randn(B, 45) * 0.3, rng.randn(B, 10) * 0.3,
                           np.ones((B, 1)), np.zeros((B, 3))],
                          1).astype(np.float32)
    center = np.tile([[0, 0, 750.0]], (B, 1)).astype(np.float32)
    cube = np.full((B, 3), 250.0, np.float32)
    out = VD.save_label(r, [(para, center, cube)], paras,
                        str(tmp_path / "labels.txt"))
    rows = np.loadtxt(out)
    assert rows.shape == (B, 21 * 3)
    assert np.isfinite(rows).all()
