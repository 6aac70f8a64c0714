"""End-to-end CCSSL and CycleGAN pipeline drivers on generated data
(VERDICT r1 item 9): both must run CI-sized on the fake NYU dataset and
produce consumable artifacts."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    from dsf_tpu.data.fake import make_fake_nyu
    from dsf_tpu.mano import synthetic
    d = tmp_path_factory.mktemp("pipe")
    npz = str(d / "m.npz")
    synthetic.save_synthetic_mano(npz)
    root = make_fake_nyu(str(d / "data"), npz, n_train=8, n_test=4)
    return root, npz, str(d)


def _cfg(root, npz, tmp, **kw):
    from dsf_tpu.config import Config
    return Config(dataset="nyu", batch_size=4, input_size=64, stage_num=2,
                  root_dir=root, mano_model_path=npz,
                  save_dir=os.path.join(tmp, "ckpt"), **kw)


def test_cyclegan_pipeline_trains_and_exports(fake_root, tmp_path):
    root, npz, tmp = fake_root
    from dsf_tpu.training import pipelines

    cfg = _cfg(root, npz, str(tmp_path))
    out, state = pipelines.run_cyclegan(cfg, steps=2, log_every=1)
    assert os.path.exists(out)

    # the exported generator loads back and feeds the Trainer
    variables = pipelines.load_variables_npz(out)
    assert "params" in variables
    from dsf_tpu.training.trainer import Trainer
    cfg2 = _cfg(root, npz, str(tmp_path), transferNet_pth=out)
    tr = Trainer(cfg2, npz, steps_per_epoch=2)
    assert tr.transfer_vars is not None
    fn = tr._transfer_fn()
    import jax.numpy as jnp
    img = jnp.zeros((2, 1, 64, 64))
    out_img = fn(img)
    assert out_img.shape == img.shape
    assert np.isfinite(np.asarray(out_img)).all()


def test_ccssl_pipeline_end_to_end(fake_root, tmp_path):
    root, npz, tmp = fake_root
    from dsf_tpu.training import pipelines

    cfg = _cfg(root, npz, str(tmp_path))
    run_dir, state = pipelines.run_ccssl(cfg, epochs=1)
    # pseudo labels written
    pseudo = os.path.join(run_dir, "pseudo")
    uvd = np.loadtxt(os.path.join(pseudo, "joint_uvd.txt"))
    w = np.loadtxt(os.path.join(pseudo, "weight.txt"))
    assert uvd.shape == (8, 21 * 3)
    assert w.shape == (8, 21)
    assert np.isfinite(uvd).all() and np.isfinite(w).all()
    # a checkpoint was written and training advanced
    assert int(state.step) > 0
    assert os.path.isdir(os.path.join(run_dir, "latest"))
