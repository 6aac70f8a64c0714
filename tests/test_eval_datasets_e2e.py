"""End-to-end eval (production Trainer.eval_step_fn + loop._test_view)
on on-disk ICVL and MSRA fixtures.

The NYU eval path is A/B'd against the reference's test_iter
(test_reference_phase_ab).  These smokes drive the DATASET-SPECIFIC
integration the unit tests can't: the ICVL z-bias branch inside the
jitted eval step + the u-flip export (train_render.py:857-860), and the
MSRA wrist-skip per-sample reduction (ref :851-852) — through the real
loaders, the padded tail batch, and the export writers.
"""

import os

import numpy as np
import pytest

from dsf_tpu.config import Config
from dsf_tpu.mano import synthetic
from dsf_tpu.parallel import mesh as pmesh
from dsf_tpu.training import loop as L
from dsf_tpu.training.trainer import Trainer

from test_datasets_protocol import _write_icvl_png, _icvl_line, _write_msra_bin


@pytest.fixture(scope="module")
def mano_npz(tmp_path_factory):
    d = tmp_path_factory.mktemp("mano")
    return synthetic.save_synthetic_mano(str(d / "mano.npz"))


def _run_eval(root_parent, dataset, mano_npz, run_dir):
    cfg = Config(dataset=dataset, phase="test", batch_size=2,
                 root_dir=root_parent, mano_model_path=mano_npz,
                 save_result=True, save_mesh=False, save_obj=False)
    tr = Trainer(cfg, mano_npz, steps_per_epoch=1, mesh=pmesh.make_mesh(1))
    state = tr.init_state()
    os.makedirs(run_dir, exist_ok=True)
    errs = np.asarray(L._test_view(tr, state, cfg, 0, run_dir))
    return cfg, errs


def test_icvl_eval_end_to_end(tmp_path, mano_npz):
    root = tmp_path / "icvl"
    names = [f"201403121135/image_{i:04d}.png" for i in range(1, 4)]
    (root / "Depth").mkdir(parents=True)
    for n in names:
        _write_icvl_png(str(root / "Depth" / n), value=420)
    (root / "test_seq_1.txt").write_text(
        "\n".join(_icvl_line(n, base=400.0) for n in names) + "\n")
    (root / "test_seq_2.txt").write_text("\n")
    centers = np.tile([10.0, 5.0, 400.0], (3, 1))
    np.savetxt(root / "center_test_refined.txt", centers, fmt="%.4f")

    cfg, errs = _run_eval(str(tmp_path), "icvl", mano_npz,
                          str(tmp_path / "run"))
    assert errs.shape == (4,) and np.isfinite(errs).all()
    # all 3 frames exported despite batch 2 (padded tail masked out)
    # the export carries ALL 21 net joints (the reference exports
    # all_joint_xyz the same way, train_render.py:395-396)
    rows = np.loadtxt(tmp_path / "run" / "result_0_0.txt")
    assert rows.shape == (3, 21 * 3)
    # ICVL u-flip export (ref :857-860): u = 320 - u_projected, so all
    # exported u must land inside the mirrored frame
    u = rows.reshape(3, 21, 3)[:, :, 0]
    assert (u > 0).all() and (u < 320).all()
    for i in (2, 3):
        assert os.path.getsize(tmp_path / "run" / f"result_{i}_0.txt") == 0


def test_msra_eval_end_to_end(tmp_path, mano_npz):
    root = tmp_path / "msra"
    rng = np.random.RandomState(0)
    joints = rng.uniform(-40, 40, (3, 21, 3)).astype(np.float32)
    joints[:, :, 2] = -(400.0 + joints[:, :, 2])
    joints[:, :, 1] = -joints[:, :, 1]
    gdir = root / "P0" / "1"
    gdir.mkdir(parents=True)
    with open(gdir / "joint.txt", "w") as f:
        f.write("3\n")
        for j in joints:
            f.write(" ".join(f"{v:.4f}" for v in j.ravel()) + "\n")
    for i in range(3):
        _write_msra_bin(str(gdir / f"{i:06d}_depth.bin"))
    np.savetxt(root / "center_test_0_refined.txt",
               np.tile([0.0, 0.0, 400.0], (3, 1)), fmt="%.4f")

    cfg, errs = _run_eval(str(tmp_path), "msra", mano_npz,
                          str(tmp_path / "run"))
    assert errs.shape == (4,) and np.isfinite(errs).all()
    rows = np.loadtxt(tmp_path / "run" / "result_0_0.txt")
    assert rows.shape == (3, 21 * 3)
