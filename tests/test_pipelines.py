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


def test_pseudo_labels_use_real_geometry(tmp_path):
    """generate_pseudo_labels must feed each sample's OWN center/cube into
    the net (VERDICT r2 weak#3: the round-2 version used a (0,0,750)/250
    dummy).  A stub net echoes the center into its heatmap peak position,
    so per-sample geometry shows up in the decoded joints."""
    import jax.numpy as jnp
    from types import SimpleNamespace
    from dsf_tpu.training.ccssl_trainer import generate_pseudo_labels

    J, S = 2, 16

    class EchoNet:
        def apply(self, variables, img, r, center, cube, train=False):
            B = img.shape[0]
            # constant fields (robust to the TTA inverse-warp): offset-u
            # everywhere = center u, heatmap 0.5 => decoded joint u is a
            # monotone function of center u
            off = jnp.zeros((B, 3 * J, S, S), jnp.float32)
            off = off.at[:, 0::3].set(center[:, 0][:, None, None, None])
            heat = jnp.full((B, J, S, S), 0.5, jnp.float32)
            feat = jnp.concatenate([off, heat], axis=1)
            return [[feat, jnp.zeros((B, 62))]]

    class DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return {"img": np.full((1, S, S), -1.0, np.float32),
                    "center": np.asarray([i / 2.0 - 0.75, 0, 0], np.float32),
                    "cube": np.full((3,), 250.0, np.float32)}

    tr = SimpleNamespace(
        net=EchoNet(), renderer=None,
        cfg=SimpleNamespace(feature_para=[0.8], cube_size=[250]))
    state = SimpleNamespace(params={}, batch_stats={})
    joints, conf = generate_pseudo_labels(tr, state, DS(), str(tmp_path),
                                          batch_size=4, n_aug=1, stage=0)
    # distinct centers => strictly increasing decoded joint u
    u = joints[:, 0, 0]
    assert np.all(np.diff(u) > 0.01), u
