"""End-to-end skeleton export on a generated SHREC-format sequence."""

import os

import numpy as np
import pytest


def _make_fake_shrec(root, n_frames=6, seed=0):
    from PIL import Image
    rng = np.random.RandomState(seed)
    seq = os.path.join(root, "gesture_1", "finger_1", "subject_1", "essai_1")
    os.makedirs(seq, exist_ok=True)
    paras = (463.889, 463.889, 320.0, 240.0)
    joints = []
    for i in range(n_frames):
        depth = np.zeros((480, 640), np.uint16)
        cx, cy = 320 + rng.randint(-40, 40), 240 + rng.randint(-30, 30)
        z = rng.uniform(600, 800)
        # gradient: normalize_img maps pixels == max to background
        patch = z + np.linspace(-15, 15, 80)[None, :] * np.ones((80, 1))
        depth[cy - 40:cy + 40, cx - 40:cx + 40] = patch.astype(np.uint16)
        Image.fromarray(depth).save(
            os.path.join(seq, f"{i}_depth.png"))
        # world joints near the blob center
        fx, fy, fu, fv = paras
        x = (cx - fu) * z / fx
        y = (cy - fv) * z / fy
        j = np.tile([x, y, z], (21, 1)) + rng.randn(21, 3) * 15
        joints.append(j)
    np.savetxt(os.path.join(seq, "skeletons_world_pred.txt"),
               np.stack(joints).reshape(n_frames, -1), fmt="%.4f")
    return root, seq


def test_shrec_dataset_and_export(tmp_path):
    from dsf_tpu.data.datasets import SHRECDataset
    from dsf_tpu.mano import synthetic
    from dsf_tpu.config import Config
    from dsf_tpu.training.trainer import Trainer
    from dsf_tpu.tools.skeleton_export import export_skeletons

    root, seq = _make_fake_shrec(str(tmp_path / "shrec"))
    ds = SHRECDataset(root, img_size=64)
    assert len(ds) == 6
    s = ds[0]
    assert s["img"].shape == (1, 64, 64)
    assert (s["img"] < 0.99).mean() > 0.02      # blob visible

    synthetic.save_synthetic_mano(str(tmp_path / "m.npz"))
    cfg = Config(dataset="shrec", batch_size=4, stage_num=1, input_size=64)
    tr = Trainer(cfg, str(tmp_path / "m.npz"), steps_per_epoch=2)
    state = tr.init_state()
    seqs = export_skeletons(tr, state, ds, batch_size=4,
                            out_name="skeletons_world_pred_new.txt")
    assert seq in seqs
    out = np.loadtxt(os.path.join(seq, "skeletons_world_pred_new.txt"))
    assert out.shape == (6, 63)
    assert np.isfinite(out).all()
