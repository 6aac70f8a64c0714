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


def test_batch_debug_writers(tmp_path):
    rng = np.random.RandomState(4)
    img = rng.uniform(-1, 1, (2, 1, 32, 32)).astype(np.float32)
    juv = rng.uniform(-0.9, 0.9, (2, 21, 3)).astype(np.float32)

    out = VD.debug_2d_pose(img, juv, 0, "MANO", str(tmp_path), "pd",
                           save=True)
    assert out.shape == (2, 32, 32, 3)
    assert len(list(tmp_path.glob("*_pd.png"))) == 2

    out = VD.debug_2d_img(img, 0, str(tmp_path), "raw")
    assert out.shape == (2, 32, 32, 3)

    show = VD.debug_2d_pose_index(img[0], juv[0], 7, "MANO",
                                  str(tmp_path), "one")
    assert show.shape == (32, 32, 3)
    assert (tmp_path / "7_one.png").exists()

    conf = rng.rand(2, 21).astype(np.float32)
    out = VD.debug_confidence_joint(img, juv, conf, 0, "MANO",
                                    str(tmp_path), "conf", save=True)
    assert out.shape == (2, 32, 32, 3)

    visible = rng.randint(0, 2, (2, 21))
    out = VD.debug_visible_joint(img, juv, visible, 0, "MANO",
                                 str(tmp_path), "vis")
    assert out.shape == (2, 32, 32, 3)

    out = VD.debug_point(img, juv[:, :5], 0, "MANO", str(tmp_path), "pt")
    assert out.shape == (2, 32, 32, 3)

    edges = VD.debug_canny(img, 0, str(tmp_path))
    assert edges.shape == (2, 32, 32)

    VD.debug_cluster(img, np.array([0, 1]), 0, str(tmp_path), "cl")
    assert (tmp_path / "0").is_dir() and (tmp_path / "1").is_dir()


def test_three_view_and_pcl_heatmap(tmp_path):
    rng = np.random.RandomState(5)
    pcl = rng.uniform(-0.9, 0.9, (2, 64, 3)).astype(np.float32)
    joints = rng.uniform(-0.9, 0.9, (2, 21, 3)).astype(np.float32)
    n = VD.debug_three_view_pose(pcl, joints, 0, "MANO", str(tmp_path),
                                 "tv")
    assert n == 3
    assert len(list(tmp_path.glob("*-view*.png"))) == 6

    hm = rng.uniform(-0.9, 0.9, (1, 2, 64, 3)).astype(np.float32)
    out = VD.debug_pcl_heatmap(hm, 0, str(tmp_path))
    assert out.shape == (2, 128, 128, 3)

    img = VD.draw_depth_heatmap("MANO", pcl[0].T,
                                rng.rand(21, 64).astype(np.float32), 3)
    assert img.shape == (128, 128, 3)


def test_debug_mesh_and_loss_distribution(tmp_path):
    rng = np.random.RandomState(6)
    verts = rng.randn(2, 10, 3).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    VD.debug_mesh(verts, faces, 1, str(tmp_path), "mesh")
    assert (tmp_path / "2_mesh.obj").exists()
    assert (tmp_path / "3_mesh.obj").exists()

    hist = VD.LossDistribution(bin_num=10)
    hist.update(rng.rand(4, 21, 3) * 0.01, np.zeros((4, 21, 3)))
    assert hist.batch_count.sum() == 4
    assert hist.joint_count.sum() == 4 * 21
    hist.vis(str(tmp_path))
    assert (tmp_path / "loss_distribute.png").exists()
