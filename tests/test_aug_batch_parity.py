"""The batched augmented train fetch (data/aug_batch.py + the native
batch_crop_raw / batch_finish_aug kernels) must be interchangeable with
the per-sample python path (crop.augment_crop inside __getitem__) given
identical (mode, off, rot, sc) draws — images bit-for-bit (the warps are
the same cv2 calls), labels within the established fast-path tolerance
(f32 crop bounds in C++ vs mixed f32/f64 in python, cf.
test_fast_batch_parity.py's 2e-4)."""

import numpy as np
import pytest

from dsf_tpu.data import aug_batch
from dsf_tpu.data import crop as C
from dsf_tpu.data import datasets as D
from dsf_tpu.data import native

pytestmark = pytest.mark.skipif(not aug_batch.available(),
                                reason="native lib or cv2 not available")

PARAS = (588.03, 587.07, 320.0, 240.0)
S = 128


def _make_frames(B, seed):
    """Integer-mm synthetic full frames with a hand-sized blob around
    each center (plus near/far outliers so the z-thresholds fire)."""
    rng = np.random.RandomState(seed)
    H, W = 480, 640
    depths = np.zeros((B, H, W), np.float32)
    centers_xyz = np.empty((B, 3), np.float32)
    joints = np.empty((B, 14, 3), np.float32)
    for b in range(B):
        cz = rng.randint(650, 900)
        cu, cv = rng.randint(200, 440), rng.randint(150, 330)
        hw = rng.randint(40, 80)
        blob = rng.randint(cz - 110, cz + 111,
                           (2 * hw, 2 * hw)).astype(np.float32)
        # outliers beyond the cube -> exercise zstart clamp / far drop
        blob[rng.rand(*blob.shape) < 0.02] = cz - 200
        blob[rng.rand(*blob.shape) < 0.02] = cz + 200
        blob[rng.rand(*blob.shape) < 0.1] = 0
        depths[b, cv - hw:cv + hw, cu - hw:cu + hw] = blob
        center_uvd = np.asarray([cu, cv, cz], np.float32)
        centers_xyz[b] = C.joint_img_to_3d(center_uvd, PARAS, 1.0)
        joints[b] = centers_xyz[b] + rng.uniform(-80, 80, (14, 3))
    return depths, centers_xyz, joints


def _item_reference(depth, joint_xyz, center_xyz, cube_size, draw):
    """The exact per-sample __getitem__ body (datasets.py NYU/ICVL/MSRA)
    with an injected augmentation draw."""
    center_uvd = C.joint_3d_to_img(center_xyz, PARAS, 1.0)
    gt3Dcrop = joint_xyz - center_xyz.reshape(1, 3)
    depth_crop, trans = C.crop_image_deep_pp(depth, center_uvd, cube_size,
                                             (S, S), PARAS)
    mode, off, rot, sc = draw
    imgD, curLabel, cube, com2D, M, _ = C.augment_crop(
        depth_crop, gt3Dcrop, center_uvd, cube_size, trans, mode, off,
        rot, sc, PARAS, 1.0)
    curLabel = curLabel / (cube[2] / 2.0)
    com3D = C.joint_img_to_3d(com2D, PARAS, 1.0)
    joint_img = C.transform_points_2d(
        C.joint_3d_to_img(curLabel * (cube[0] / 2.0) + com3D, PARAS, 1.0),
        M)
    joint_img[:, 0:2] = joint_img[:, 0:2] / (S / 2) - 1
    joint_img[:, 2] = (joint_img[:, 2] - com3D[2]) / (cube[0] / 2.0)
    return {
        "img": imgD[None].astype(np.float32),
        "xyz_gt": curLabel.astype(np.float32),
        "uvd_gt": joint_img.astype(np.float32),
        "center": com3D.astype(np.float32),
        "M": M.astype(np.float32),
        "cube": np.asarray(cube, np.float32),
    }


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_all_modes_match_per_sample(seed):
    rng = np.random.RandomState(100 + seed)
    # two of each mode per batch, in shuffled order
    modes = np.repeat(np.arange(4), 2)
    rng.shuffle(modes)
    B = len(modes)
    draws = []
    for m in modes:
        _, off, rot, sc = C.rand_augment(rng, 10.0, 0.2, 180.0)
        draws.append((int(m), off, rot, sc))
    depths, centers, joints = _make_frames(B, seed)
    cube = np.asarray([250.0, 250.0, 250.0])

    fast = aug_batch.augment_fast_batch(
        depths, joints, centers, np.tile(cube, (B, 1)), PARAS, 1.0, S,
        draws, nthreads=2)

    for b in range(B):
        ref = _item_reference(depths[b], joints[b], centers[b],
                              cube.copy(), draws[b])
        np.testing.assert_array_equal(
            fast["img"][b], ref["img"],
            err_msg=f"sample {b} mode {C.AUG_MODES[draws[b][0]]}")
        for k in ("xyz_gt", "uvd_gt", "center", "M", "cube"):
            np.testing.assert_allclose(
                fast[k][b], ref[k], atol=2e-4,
                err_msg=f"sample {b} key {k} "
                        f"mode {C.AUG_MODES[draws[b][0]]}")


def test_empty_crop_falls_back_to_identity():
    """A crop with no depth support must take augment_crop's max==0
    branch (no warp, no thresholds) in the batch path too."""
    depths, centers, joints = _make_frames(2, 7)
    depths[1] = 0.0                                 # sample 1: empty frame
    cube = np.asarray([250.0, 250.0, 250.0])
    draws = [(1, np.array([5.0, -3.0, 4.0]), 90.0, 1.1)] * 2
    fast = aug_batch.augment_fast_batch(
        depths, joints, centers, np.tile(cube, (2, 1)), PARAS, 1.0, S,
        draws, nthreads=1)
    ref = _item_reference(depths[1], joints[1], centers[1], cube.copy(),
                          draws[1])
    np.testing.assert_array_equal(fast["img"][1], ref["img"])
    np.testing.assert_allclose(fast["xyz_gt"][1], ref["xyz_gt"], atol=2e-4)


def test_nyu_train_fetch_routes_through_fast_path(tmp_path, monkeypatch):
    """NYUDataset train _fetch_batch uses the batched augment path (and
    the depth cache round-trips losslessly)."""
    from dsf_tpu.data.fake import make_fake_nyu
    from dsf_tpu.mano import synthetic

    mano = synthetic.save_synthetic_mano(str(tmp_path / "m.npz"))
    make_fake_nyu(str(tmp_path / "d"), mano, n_train=6, n_test=2)
    ds = D.NYUDataset(str(tmp_path / "d" / "nyu"), "train", img_size=64)
    assert ds.augment

    called = {}
    orig = D.BaseDataset._aug_fast_batch

    def spy(self, *a, **kw):
        called["yes"] = True
        return orig(self, *a, **kw)

    monkeypatch.setattr(D.BaseDataset, "_aug_fast_batch", spy)
    batch = ds._fetch_batch(np.arange(4))
    assert called.get("yes")
    assert batch["img"].shape == (4, 1, 64, 64)
    assert np.isfinite(batch["img"]).all()
    assert np.abs(batch["img"]).max() <= 1.0 + 1e-6

    # depth cache: identical fetch results, decode skipped on 2nd pass
    ds.enable_depth_cache()
    d0 = ds._read_depth_cached(0)
    assert 0 in ds._depth_cache
    np.testing.assert_array_equal(d0, ds._read_depth_cached(0))
    np.testing.assert_array_equal(d0, ds._read_depth(0))


def _spy_aug(monkeypatch):
    called = {}
    orig = D.BaseDataset._aug_fast_batch

    def spy(self, *a, **kw):
        called["yes"] = True
        return orig(self, *a, **kw)

    monkeypatch.setattr(D.BaseDataset, "_aug_fast_batch", spy)
    return called


def test_icvl_train_fetch_routes_through_fast_path(tmp_path, monkeypatch):
    from test_datasets_protocol import _write_icvl_png, _icvl_line

    root = tmp_path / "icvl"
    (root / "Depth").mkdir(parents=True)
    # long (>6 char) sequence dir passes the subsequence protocol filter
    names = [f"201403121135/image_{i:04d}.png" for i in range(1, 5)]
    for i, nm in enumerate(names):
        _write_icvl_png(str(root / "Depth" / nm), value=410 + 5 * i)
    (root / "train.txt").write_text(
        "\n".join(_icvl_line(nm, base=400.0) for nm in names) + "\n")
    centers = np.tile([10.0, 5.0, 400.0], (len(names), 1))
    np.savetxt(root / "center_train_refined.txt", centers, fmt="%.4f")

    ds = D.ICVLDataset(str(root), "train", img_size=64)
    called = _spy_aug(monkeypatch)
    batch = ds._fetch_batch(np.arange(4))
    assert called.get("yes")
    assert batch["img"].shape == (4, 1, 64, 64)
    assert np.isfinite(batch["img"]).all()


def test_msra_train_fetch_routes_through_fast_path(tmp_path, monkeypatch):
    from test_datasets_protocol import _write_msra_bin

    root = tmp_path / "msra"
    rng = np.random.RandomState(0)
    joints = rng.uniform(-40, 40, (2, 21, 3)).astype(np.float32)
    joints[:, :, 2] = -(400.0 + joints[:, :, 2])
    for p in range(2):
        gdir = root / f"P{p}" / "1"
        for i in range(2):
            _write_msra_bin(str(gdir / f"{i:06d}_depth.bin"), z=400.0 + i)
        lines = [" ".join(f"{v:.4f}" for v in joints[i].ravel())
                 for i in range(2)]
        (gdir / "joint.txt").write_text("2\n" + "\n".join(lines) + "\n")

    # train split = persons != test_persons -> P1
    ds = D.MSRADataset(str(root), "train", test_persons=0, img_size=64)
    called = _spy_aug(monkeypatch)
    batch = ds._fetch_batch(np.arange(len(ds)))
    assert called.get("yes")
    assert batch["img"].shape == (len(ds), 1, 64, 64)
    assert np.isfinite(batch["img"]).all()
