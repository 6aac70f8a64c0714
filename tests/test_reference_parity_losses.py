"""A/B parity vs the reference's LIVE loss/cloud/sphere code.

Extends tests/test_reference_parity.py to the pieces the trainer calls
on GPU tensors every iteration — all pure torch, so they run on CPU
against the same synthetic MANO asset:

* MANO_SMPL.calculate_coll / seg_pcl / seg_pcl_21 / seg_pcl_finger /
  calculate_point2mesh_distance  (render_model/mano_layer.py:373-567)
* loader.crop_hand / Img2pcl      (data/render_loader.py:1121-1227)
* metric/meshLoss.py ICPLoss / JointICPLoss / FingerICPLoss — with the
  pytorch3d `_C.point_face_dist` kernel monkey-patched to THIS repo's
  exact point->triangle distance, so what is verified is the reference's
  COMPOSITION (packed meshes, x15 part replication, seg masking,
  empty-part guards) against our fused factorized-mask implementation.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dsf_tpu import geometry as geo  # noqa: E402
from dsf_tpu.losses.icp import (  # noqa: E402
    icp_loss, joint_icp_loss, finger_icp_loss)
from dsf_tpu.mano import model as mano  # noqa: E402
from dsf_tpu.mano import spheres as sph  # noqa: E402
from dsf_tpu.mano import synthetic  # noqa: E402
from dsf_tpu.ops import cloud  # noqa: E402
from dsf_tpu.ops.point_mesh import point_tri_sqdist  # noqa: E402

from tests.reference_import import load_reference_module  # noqa: E402

NYU = (588.03, 587.07, 320.0, 240.0)


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("mano_assets_l")
    pkl = synthetic.save_synthetic_mano_pkl(str(d / "MANO_RIGHT.pkl"))
    npz = synthetic.save_synthetic_mano(str(d / "mano.npz"))
    return pkl, npz


@pytest.fixture(scope="module")
def ref_mano(assets):
    m = load_reference_module("render_model/mano_layer.py", "ref_mano_layer")
    return m, m.MANO_SMPL(assets[0], "nyu")


@pytest.fixture(scope="module")
def our_mano(assets):
    return mano.load_model(assets[1])


@pytest.fixture(scope="module")
def ref_loader():
    m = load_reference_module("data/render_loader.py", "ref_render_loader")
    ld = m.loader("", "train", 128, "refine", "nyu")
    ld.paras = NYU
    ld.flip = 1
    return m, ld


def _posed(our_mano, B=3, seed=7):
    """Normalized-unit joints/mesh as the train losses see them
    (get_mano_vertices with the render path's global_scale=1/125)."""
    rng = np.random.RandomState(seed)
    rot = rng.uniform(-np.pi, np.pi, (B, 3)).astype(np.float32)
    theta = (rng.randn(B, 45) * 0.5).astype(np.float32)
    beta = rng.randn(B, 10).astype(np.float32)
    cam = np.concatenate([np.ones((B, 1)), rng.randn(B, 3) * 0.1],
                         axis=1).astype(np.float32)
    verts, joints = mano.get_mano_vertices(
        our_mano, jnp.asarray(rot), jnp.asarray(theta), jnp.asarray(beta),
        jnp.asarray(cam), global_scale=1.0 / 125.0)
    return np.asarray(verts), np.asarray(joints)


# ---------------------------------------------------------------------------
# sphere model: collision + segmentation
# ---------------------------------------------------------------------------

def test_calculate_coll_matches_reference(ref_mano, our_mano):
    _, ref = ref_mano
    mesh, joints = _posed(our_mano, B=3, seed=7)
    # push fingers together so some sphere pairs actually penetrate
    squeeze = joints * np.array([0.4, 1.0, 1.0], np.float32)
    with torch.no_grad():
        r = ref.calculate_coll(torch.tensor(squeeze),
                               torch.tensor(mesh)).item()
    ours = float(sph.collision_loss(our_mano, jnp.asarray(squeeze),
                                    jnp.asarray(mesh)))
    assert abs(ours - r) < 1e-6 + 1e-4 * abs(r)


def test_seg_pcl_matches_reference(ref_mano, our_mano):
    _, ref = ref_mano
    mesh, joints = _posed(our_mano, B=2, seed=9)
    rng = np.random.RandomState(1)
    pcl = (mesh[:, rng.randint(0, 778, 256)]
           + rng.randn(2, 256, 3).astype(np.float32) * 0.05)
    jm = joints + rng.randn(*joints.shape).astype(np.float32) * 0.01
    with torch.no_grad():
        r = ref.seg_pcl(torch.tensor(joints), torch.tensor(jm),
                        torch.tensor(mesh), torch.tensor(pcl)).numpy()
    ours = np.asarray(sph.seg_pcl(our_mano, jnp.asarray(joints),
                                  jnp.asarray(jm), jnp.asarray(mesh),
                                  jnp.asarray(pcl)))
    assert (ours == r).mean() > 0.995   # identical up to argmin float ties


@pytest.mark.parametrize("variant", ["21", "finger"])
def test_seg_pcl_variants_match_reference(ref_mano, our_mano, variant):
    _, ref = ref_mano
    mesh, joints = _posed(our_mano, B=2, seed=10)
    rng = np.random.RandomState(2)
    pcl = (mesh[:, rng.randint(0, 778, 256)]
           + rng.randn(2, 256, 3).astype(np.float32) * 0.05)
    with torch.no_grad():
        rfn = getattr(ref, f"seg_pcl_{variant}")
        r = rfn(torch.tensor(joints), torch.tensor(joints),
                torch.tensor(mesh), torch.tensor(pcl)).numpy()
    ofn = getattr(sph, f"seg_pcl_{variant}")
    ours = np.asarray(ofn(our_mano, jnp.asarray(joints), jnp.asarray(joints),
                          jnp.asarray(mesh), jnp.asarray(pcl)))
    assert (ours == r).mean() > 0.995


def test_point2mesh_part_distance_matches_reference(ref_mano, our_mano):
    _, ref = ref_mano
    mesh, joints = _posed(our_mano, B=2, seed=11)
    rng = np.random.RandomState(3)
    pcl = (mesh[:, rng.randint(0, 778, 200)]
           + rng.randn(2, 200, 3).astype(np.float32) * 0.03)
    seg = np.asarray(sph.seg_pcl(our_mano, jnp.asarray(joints),
                                 jnp.asarray(joints), jnp.asarray(mesh),
                                 jnp.asarray(pcl)))
    with torch.no_grad():
        r = ref.calculate_point2mesh_distance(
            torch.tensor(mesh), torch.tensor(pcl),
            torch.tensor(seg)).numpy()
    ours = np.asarray(sph.point2mesh_part_distance(
        our_mano, jnp.asarray(mesh), jnp.asarray(pcl), jnp.asarray(seg)))
    np.testing.assert_allclose(ours, r, atol=1e-6, rtol=1e-5)


# ---------------------------------------------------------------------------
# loader GPU-tensor methods: crop_hand, Img2pcl
# ---------------------------------------------------------------------------

def _fake_crop(rng, B=2, S=128):
    """Normalized crop images: background +1, blob of hand depths."""
    img = np.ones((B, 1, S, S), np.float32)
    for b in range(B):
        u, v = rng.randint(30, S - 40, 2)
        img[b, 0, v:v + 36, u:u + 30] = rng.uniform(
            -0.6, 0.6, (36, 30)).astype(np.float32)
    center = np.tile(np.array([[20.0, -10.0, 750.0]], np.float32), (B, 1))
    cube = np.full((B, 3), 250.0, np.float32)
    com = geo.xyz_to_uvd(jnp.asarray(center), NYU)
    M = np.asarray(geo.crop_matrix(com, jnp.asarray(cube), NYU, (S, S)))
    return img, center, M, cube


def test_crop_hand_matches_reference(ref_loader, our_mano):
    _, ld = ref_loader
    rng = np.random.RandomState(21)
    img, center, M, cube = _fake_crop(rng)
    joints = rng.uniform(-0.4, 0.4, (2, 21, 3)).astype(np.float32)
    with torch.no_grad():
        r = ld.crop_hand(torch.tensor(img), torch.tensor(joints),
                         torch.tensor(center), torch.tensor(M),
                         torch.tensor(cube)).numpy()
    ours = np.asarray(cloud.crop_hand(
        jnp.asarray(img), jnp.asarray(joints), jnp.asarray(center),
        jnp.asarray(M), jnp.asarray(cube), NYU, 128, flip=1.0))
    # boundary pixels may flip on < vs <= float noise; demand near-exact
    assert (np.abs(ours - r) < 1e-5).mean() > 0.999


def test_img2pcl_set_and_multiplicity_parity(ref_loader):
    """Img2pcl draws random subsamples, so compare SUPPORT and
    MULTIPLICITY semantics rather than exact rows: every output point is
    a valid foreground point, and when sample_num > n_valid each valid
    point appears floor(N/n) or ceil(N/n) times (both implementations
    repeat the valid set then top up)."""
    _, ld = ref_loader
    rng = np.random.RandomState(22)
    img, center, M, cube = _fake_crop(rng, B=1)
    N = 2048
    with torch.no_grad():
        r = ld.Img2pcl(torch.tensor(img), 128, torch.tensor(center),
                       torch.tensor(M), torch.tensor(cube),
                       sample_num=N).numpy()[0]
    ours = np.asarray(cloud.img_to_pcl(
        jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(center),
        jnp.asarray(M), jnp.asarray(cube), NYU, 128, N, 128, 1.0))[0]

    # identical support: every point of each side has a near-exact match
    # on the other (distinct pixels are >= 2/127 apart, float noise from
    # the per-sample vs batched transform chains is ~1e-5)
    uref = np.unique(np.round(r, 4), axis=0)
    uours = np.unique(np.round(ours, 4), axis=0)
    assert uref.shape == uours.shape
    d = np.abs(uref[:, None] - uours[None]).max(-1).min(-1)
    assert d.max() < 2e-4
    n_valid = len(uref)
    lo, hi = N // n_valid, -(-N // n_valid)
    for rows in (r, ours):
        _, counts = np.unique(np.round(rows, 4), axis=0, return_counts=True)
        assert counts.min() >= lo and counts.max() <= hi


# ---------------------------------------------------------------------------
# ICP family: reference composition over our exact distance kernel
# ---------------------------------------------------------------------------

class _FakePointclouds:
    def __init__(self, points):
        self.pts = points

    def __len__(self):
        return self.pts.shape[0]

    def points_packed(self):
        return self.pts.reshape(-1, 3)

    def cloud_to_packed_first_idx(self):
        n, p, _ = self.pts.shape
        return torch.arange(n, dtype=torch.long) * p

    def num_points_per_cloud(self):
        n, p, _ = self.pts.shape
        return torch.full((n,), p, dtype=torch.long)


class _FakeMeshes:
    def __init__(self, verts, faces):
        if torch.is_tensor(verts):
            verts = list(torch.unbind(verts, 0))
        if torch.is_tensor(faces):
            faces = list(torch.unbind(faces, 0))
        self.verts, self.faces = verts, faces

    def __len__(self):
        return len(self.verts)

    def verts_packed(self):
        return torch.cat(self.verts, 0)

    def faces_packed(self):
        out, off = [], 0
        for v, f in zip(self.verts, self.faces):
            out.append(f.long() + off)
            off += v.shape[0]
        return torch.cat(out, 0)

    def mesh_to_faces_packed_first_idx(self):
        sizes = [f.shape[0] for f in self.faces]
        return torch.tensor(np.concatenate([[0], np.cumsum(sizes)[:-1]]))

    def num_faces_per_mesh(self):
        return torch.tensor([f.shape[0] for f in self.faces])


def _our_point_face_distance(points, points_first_idx, tris, tris_first_idx,
                             max_points):
    """Drop-in for pytorch3d _C point_face_dist: per-point squared
    distance to the nearest face of the point's own cloud's mesh,
    computed with this repo's exact point_tri_sqdist."""
    P = points.shape[0]
    pfi = points_first_idx.tolist() + [P]
    tfi = tris_first_idx.tolist() + [tris.shape[0]]
    outs = []
    for i in range(len(pfi) - 1):
        p = jnp.asarray(points[pfi[i]:pfi[i + 1]].numpy())
        t = jnp.asarray(tris[tfi[i]:tfi[i + 1]].numpy())
        d = point_tri_sqdist(p[:, None, :], t[None, :, :, :]).min(-1)
        outs.append(torch.tensor(np.asarray(d)))
    return torch.cat(outs)


@pytest.fixture(scope="module")
def ref_meshloss():
    ml = load_reference_module("metric/meshLoss.py", "ref_meshloss")
    ml.point_face_distance = _our_point_face_distance
    ml.Meshes = _FakeMeshes
    ml.Pointclouds = _FakePointclouds
    return ml


def _icp_inputs(our_mano, B=2, P=256, seed=31):
    mesh, joints = _posed(our_mano, B=B, seed=seed)
    rng = np.random.RandomState(seed)
    pcl = (mesh[:, rng.randint(0, 778, P)]
           + rng.randn(B, P, 3).astype(np.float32) * 0.05)
    seg = np.asarray(sph.seg_pcl(our_mano, jnp.asarray(joints),
                                 jnp.asarray(joints), jnp.asarray(mesh),
                                 jnp.asarray(pcl)))
    return mesh, pcl, seg


def test_icp_loss_matches_reference(ref_meshloss, ref_mano, our_mano):
    ml = ref_meshloss
    mesh, pcl, _ = _icp_inputs(our_mano)
    faces_t = torch.tensor(np.asarray(our_mano.faces)).long()
    with torch.no_grad():
        r = ml.ICPLoss(torch.tensor(mesh), torch.tensor(pcl),
                       faces_t).numpy()
    ours = np.asarray(icp_loss(jnp.asarray(mesh), jnp.asarray(pcl),
                               our_mano.faces))
    np.testing.assert_allclose(ours, r, atol=1e-6, rtol=1e-5)


def test_joint_icp_loss_matches_reference(ref_meshloss, ref_mano, our_mano):
    """The reference replicates the cloud x15 and builds 15 ragged
    part meshes (full verts + that bone's faces); ours is one pass with
    the factorized (T, 15) face mask.  Same numbers required."""
    ml = ref_meshloss
    _, ref = ref_mano
    mesh, pcl, seg = _icp_inputs(our_mano, seed=33)
    joint_faces = [f.long() for f in ref.joint_faces]
    with torch.no_grad():
        r = ml.JointICPLoss(torch.tensor(mesh), torch.tensor(pcl),
                            joint_faces, torch.tensor(seg)).numpy()
    ours = np.asarray(joint_icp_loss(
        jnp.asarray(mesh), jnp.asarray(pcl), our_mano.faces,
        our_mano.joint_face_mask, jnp.asarray(seg)))
    np.testing.assert_allclose(ours, r, atol=1e-6, rtol=1e-5)


def test_finger_icp_loss_matches_reference(ref_meshloss, ref_mano, our_mano):
    ml = ref_meshloss
    _, ref = ref_mano
    mesh, pcl, _ = _icp_inputs(our_mano, seed=34)
    fseg = np.asarray(sph.seg_pcl_finger(
        our_mano, jnp.asarray(_posed(our_mano, B=2, seed=34)[1]),
        jnp.asarray(_posed(our_mano, B=2, seed=34)[1]),
        jnp.asarray(mesh), jnp.asarray(pcl)))
    finger_faces = [f.long() for f in ref.finger_faces]
    with torch.no_grad():
        r = ml.FingerICPLoss(torch.tensor(mesh), torch.tensor(pcl),
                             finger_faces, torch.tensor(fseg)).numpy()
    ours = np.asarray(finger_icp_loss(
        jnp.asarray(mesh), jnp.asarray(pcl), our_mano.faces,
        our_mano.finger_face_mask, jnp.asarray(fseg)))
    np.testing.assert_allclose(ours, r, atol=1e-6, rtol=1e-5)


# ---------------------------------------------------------------------------
# Render-side label chain: forward / render label math + M
# ---------------------------------------------------------------------------

class _Fragments:
    def __init__(self, zbuf):
        self.zbuf = zbuf


@pytest.fixture(scope="module")
def ref_render(assets):
    """The reference Render module on CPU with (a) .cuda() no-op'd,
    (b) the pytorch3d rasterizer replaced by an all-background stub —
    the LABEL chain (JointTrans / comToBounds / Offset2Trans /
    normalize_img) is pure torch and runs for real."""
    m = load_reference_module("render_model/mano_layer.py", "ref_mano_layer")
    orig_t_cuda = torch.Tensor.cuda
    orig_m_cuda = torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    try:
        import os
        rend = m.Render(os.path.dirname(assets[0]), "nyu", NYU, (640, 480))
    finally:
        torch.Tensor.cuda = orig_t_cuda
        torch.nn.Module.cuda = orig_m_cuda
    rend.rasterizer = lambda meshes: _Fragments(
        torch.full((0,), 0.0).new_full((_REF_B, 640, 640, 1), -1.0))
    return m, rend


_REF_B = 3


def _render_inputs(seed=41, B=_REF_B):
    rng = np.random.RandomState(seed)
    para = np.concatenate(
        [rng.uniform(-1, 1, (B, 3)), rng.randn(B, 45) * 0.5,
         rng.randn(B, 10) * 0.5, np.ones((B, 1)), rng.randn(B, 3) * 0.1],
        axis=1).astype(np.float32)
    center = rng.uniform([-60, -60, 650], [60, 60, 950],
                         (B, 3)).astype(np.float32)
    cube = np.full((B, 3), 250.0, np.float32)
    return para, center, cube


def test_render_labels_match_reference(ref_render, our_mano):
    """Render.render's joint_uvd / joint_xyz / mesh_xyz — the mm-parity
    label chain through comToBounds -> Offset2Trans -> JointTrans
    (ref mano_layer.py:1071-1097)."""
    import dsf_tpu.render.renderer as rnd
    _, rend = ref_render
    para, center, cube = _render_inputs()
    with torch.no_grad():
        _, r_uvd, r_xyz, r_mesh = rend.render(
            torch.tensor(para), torch.tensor(center), torch.tensor(cube))
    r = rnd.Renderer.create(our_mano, "nyu", NYU, (640, 480))
    _, o_uvd, o_xyz, o_mesh = rnd.render_params(
        r, jnp.asarray(para), jnp.asarray(center), jnp.asarray(cube))
    np.testing.assert_allclose(np.asarray(o_uvd), r_uvd.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(o_xyz), r_xyz.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(o_mesh), r_mesh.numpy(), atol=2e-4)


def test_synth_factory_labels_match_reference(ref_render, our_mano):
    """Render.forward's label outputs + crop matrix M with every
    augmentation channel active (fixed draws), mask off
    (ref mano_layer.py:983-1039)."""
    import dsf_tpu.render.renderer as rnd
    _, rend = ref_render
    para, center, cube = _render_inputs(seed=42)
    rng = np.random.RandomState(43)
    B = para.shape[0]
    aug_view = rng.uniform(0, 2 * np.pi, (B, 3)).astype(np.float32)
    aug_shape = (rng.randn(B, 10) * 3).astype(np.float32)
    aug_center = ((rng.rand(B, 3) - 0.5) * 40).astype(np.float32)
    aug_size = (1 + (rng.rand(B, 1) - 0.5) * 0.4).astype(np.float32)
    with torch.no_grad():
        out = rend.forward(torch.tensor(para), torch.tensor(center),
                           torch.tensor(cube),
                           augmentView=torch.tensor(aug_view),
                           augmentShape=torch.tensor(aug_shape),
                           augmentCenter=torch.tensor(aug_center),
                           augmentSize=torch.tensor(aug_size), mask=False)
    _, r_juvd, r_vuvd, r_jxyz, r_vxyz, r_c3d, r_cube, r_M = out
    r = rnd.Renderer.create(our_mano, "nyu", NYU, (640, 480))
    o = rnd.synth_sample(
        r, jax.random.PRNGKey(0), jnp.asarray(para), jnp.asarray(cube),
        center3d=jnp.asarray(center), augment_view=jnp.asarray(aug_view),
        augment_shape=jnp.asarray(aug_shape),
        augment_center=jnp.asarray(aug_center),
        augment_size=jnp.asarray(aug_size), mask=False)
    _, o_juvd, o_vuvd, o_jxyz, o_vxyz, o_c3d, o_cube, o_M = o
    np.testing.assert_allclose(np.asarray(o_M), r_M.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_c3d), r_c3d.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_cube), r_cube.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_juvd), r_juvd.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(o_vuvd), r_vuvd.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(o_jxyz), r_jxyz.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(o_vxyz), r_vxyz.numpy(), atol=2e-4)


# ---------------------------------------------------------------------------
# xyz2error: per-dataset mm-error semantics (ref train_render.py:826-864)
# ---------------------------------------------------------------------------

def test_xyz2error_matches_reference_all_datasets():
    """The reference Trainer.xyz2error vs phases.xyz2error_mm for every
    dataset branch and reduction flag: ICVL subtracts its (1,16) z bias
    from the prediction BEFORE the error; MSRA's scalar mean skips the
    wrist joint; keep_joint/keep_batch skip the dataset-specific scalar
    reductions (except the ICVL bias, which always applies)."""
    import types
    import torch
    from dsf_tpu.training import phases

    ref_train = load_reference_module("train_render.py", "ref_train_render")
    rng = np.random.RandomState(3)

    for dataset, J in (("nyu", 14), ("icvl", 16), ("msra", 21)):
        shim = types.SimpleNamespace(
            config=types.SimpleNamespace(dataset=dataset), phase="train")
        xyz2error = types.MethodType(ref_train.Trainer.xyz2error, shim)
        B = 5
        pd = rng.uniform(-1, 1, (B, J, 3)).astype(np.float32)
        gt = rng.uniform(-1, 1, (B, J, 3)).astype(np.float32)
        center = rng.uniform([-50, -50, 650], [50, 50, 900],
                             (B, 3)).astype(np.float32)
        cube = np.full((B, 3), 250.0, np.float32)
        for kw in ({}, {"keep_batch": True}, {"keep_joint": True}):
            ref = xyz2error(torch.tensor(pd), torch.tensor(gt),
                            torch.tensor(center), torch.tensor(cube), **kw)
            ours = phases.xyz2error_mm(
                jnp.asarray(pd), jnp.asarray(gt), jnp.asarray(center),
                jnp.asarray(cube), dataset=dataset, **kw)
            np.testing.assert_allclose(
                np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-4,
                err_msg=f"{dataset} {kw}")
