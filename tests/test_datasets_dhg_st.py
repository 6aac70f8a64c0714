"""Generated-fixture tests for the DHG loader and the NYU self-training
loader (ref: DHG_loader render_loader.py:2964-3075, nyu_ST_loader
:1949-2052)."""

import os

import numpy as np


def _make_fake_dhg(root, seqs=((1, 1, 1, 1), (2, 2, 1, 1)), n_frames=5,
                   trunc=(1, 3), seed=0):
    """DHG layout: gesture_{g}/finger_{f}/subject_{s}/essai_{e}/ with
    depth_N.png (1-based), skeleton_image.txt (all frames),
    skeletons_world_pred_normal_DSSF.txt (truncated frames only), and the
    top-level informations_troncage_sequences.txt."""
    from PIL import Image
    rng = np.random.RandomState(seed)
    paras = (463.889, 463.889, 320.0, 240.0)
    fx, fy, fu, fv = paras
    lines = []
    for (g, fi, s, e) in seqs:
        d = os.path.join(root, f"gesture_{g}", f"finger_{fi}",
                         f"subject_{s}", f"essai_{e}")
        os.makedirs(d, exist_ok=True)
        start, end = trunc
        uvd_rows, xyz_rows = [], []
        for i in range(n_frames):
            depth = np.zeros((480, 640), np.uint16)
            cx, cy = 320 + rng.randint(-30, 30), 240 + rng.randint(-20, 20)
            z = rng.uniform(600, 800)
            patch = z + np.linspace(-15, 15, 80)[None] * np.ones((80, 1))
            depth[cy - 40:cy + 40, cx - 40:cx + 40] = patch.astype(np.uint16)
            Image.fromarray(depth).save(os.path.join(d, f"depth_{i + 1}.png"))
            # NOTE the loader LR-flips the image and the center u
            x = (cx - fu) * z / fx
            y = (cy - fv) * z / fy
            j = np.tile([x, y, z / 1000.0], (21, 1))
            j[:, :2] += rng.randn(21, 2) * 0.015
            xyz_rows.append((j * [1, 1, 1]).reshape(-1))
            uv = np.tile([640 - cx, cy], (21, 1)) + rng.randn(21, 2) * 4
            uvd_rows.append(uv.reshape(-1))
        np.savetxt(os.path.join(d, "skeleton_image.txt"),
                   np.stack(uvd_rows), fmt="%.4f")
        # world preds in mm/1000 scale rows for truncated frames only;
        # stored in METERS here (center_d = mean z * 1000, ref :3047)
        xyz = np.stack(xyz_rows)[start:end + 1]
        np.savetxt(os.path.join(d, "skeletons_world_pred_normal_DSSF.txt"),
                   xyz, fmt="%.6f")
        lines.append(f"{g} {fi} {s} {e} {start} {end}")
    with open(os.path.join(root, "informations_troncage_sequences.txt"),
              "w") as f:
        f.write("\n".join(lines) + "\n")
    return root


def test_dhg_dataset_structure_and_labels(tmp_path):
    from dsf_tpu.data.datasets import DHGDataset, read_dhg_sequences

    root = _make_fake_dhg(str(tmp_path / "dhg"))
    seqs = read_dhg_sequences(root)
    assert len(seqs) == 2
    assert seqs[0]["gesture"] == 1 and seqs[1]["finger"] == 2

    ds = DHGDataset(root, img_size=64)
    # 2 sequences x 3 truncated frames each
    assert len(ds) == 6
    s0 = ds[0]
    assert s0["img"].shape == (1, 64, 64)
    assert np.isfinite(s0["img"]).all()
    assert s0["xyz_gt"].shape == (21, 3)
    assert int(s0["gesture"]) == 1
    assert int(s0["label28"]) == 0
    s5 = ds[5]
    assert int(s5["gesture"]) == 2
    assert int(s5["label28"]) == (2 - 1) * 2 + (2 - 1)
    # image must show the (flipped) hand blob
    assert (s0["img"] < 0.99).mean() > 0.005


def test_dhg_write_joints_roundtrip(tmp_path):
    from dsf_tpu.data.datasets import DHGDataset

    root = _make_fake_dhg(str(tmp_path / "dhg"))
    ds = DHGDataset(root, img_size=64)
    pred = np.arange(len(ds) * 63, dtype=np.float64).reshape(len(ds), 21, 3)
    n = ds.write_joints(pred, out_name="skeletons_world_pred_new.txt")
    assert n == len(ds)
    first = np.loadtxt(os.path.join(ds.sequences[0]["dir"],
                                    "skeletons_world_pred_new.txt"))
    assert first.shape == (3, 63)
    np.testing.assert_allclose(first[0], pred[0].reshape(-1))


def test_nyu_st_dataset(tmp_path):
    from dsf_tpu.data.fake import make_fake_nyu
    from dsf_tpu.data.datasets import NYUSTDataset
    from dsf_tpu.mano import synthetic

    npz = str(tmp_path / "m.npz")
    synthetic.save_synthetic_mano(npz)
    root = make_fake_nyu(str(tmp_path / "data"), npz, n_train=8, n_test=4)
    ds = NYUSTDataset(os.path.join(root, "nyu"), "train", img_size=64)
    assert len(ds) == 8
    s = ds[0]
    assert s["model_para"].shape == (62,)
    assert s["img"].shape == (1, 64, 64)
    assert np.isfinite(s["model_para"]).all()
    assert ds.mask.shape == (8,)

    # feeds the trainer: the standard keys are all present
    for k in ("img", "xyz_gt", "uvd_gt", "center", "M", "cube"):
        assert k in s, k
