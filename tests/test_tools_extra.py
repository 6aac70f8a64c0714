"""Tests: hand-object intersection tool and loss-value regression
snapshots (lock phase semantics against future refactors)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsf_tpu.tools import intersect as IX


def _cube(center, size):
    c = np.asarray(center, float)
    s = size / 2.0
    v = np.array([[x, y, z] for x in (-s, s) for y in (-s, s)
                  for z in (-s, s)]) + c
    f = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]])
    return v, f


def test_intersect_vox_volume():
    a = _cube((0, 0, 0), 10.0)
    b = _cube((5.3, 0.1, 0.2), 10.0)   # overlap ~ 4.7 x 9.9 x 9.8
    vol = IX.intersect_vox(a, b, pitch=0.5)
    expected = (10 - 5.3) * (10 - 0.1) * (10 - 0.2)
    assert abs(vol - expected) / expected < 0.15
    far = _cube((100, 0, 0), 10.0)
    assert IX.intersect_vox(a, far) == 0.0
    vols = IX.get_all_volumes([(a, b), (a, far)], pitch=1.0)
    assert vols[1] == 0.0 and vols[0] > 0


def test_load_obj(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    v, f = IX.load_obj(str(p))
    assert v.shape == (3, 3) and f.shape == (1, 3)
    assert (f == [[0, 1, 2]]).all()


# ---------------------------------------------------------------- snapshot

def test_pretrain_loss_snapshot(tmp_path):
    """Regression lock: the Pretrain loss on fixed inputs must stay
    stable across refactors (recorded on the CPU backend, f32).
    If an INTENTIONAL semantic change moves it, re-record the value."""
    from dsf_tpu.config import Config
    from dsf_tpu.mano import synthetic
    from dsf_tpu.training.trainer import Trainer
    synthetic.save_synthetic_mano(str(tmp_path / "m.npz"), seed=0)
    cfg = Config(dataset="nyu", batch_size=2, stage_num=1,
                 train_stage="Pretrain", input_size=64)
    tr = Trainer(cfg, str(tmp_path / "m.npz"), steps_per_epoch=5)
    state = tr.init_state()
    loss_fn = tr._loss_fn("Pretrain")
    rng = np.random.RandomState(0)
    para = np.concatenate([
        rng.uniform(-1, 1, (2, 3)), rng.randn(2, 45) * 0.5,
        rng.randn(2, 10) * 0.5, np.ones((2, 1)), np.zeros((2, 3))],
        axis=1).astype(np.float32)
    batch = {"model_para": jnp.asarray(para),
             "cube_synth": jnp.full((2, 3), 250.0)}
    loss, (_, metrics) = loss_fn(state.params, state.batch_stats,
                                 jax.random.PRNGKey(7), batch)
    loss = float(loss)
    # recorded 2026-08-16 (round 1); tolerance covers backend noise
    RECORDED = 1.2539
    assert np.isfinite(loss)
    assert abs(loss - RECORDED) / RECORDED < 0.05, \
        f"Pretrain loss moved: {loss:.4f} vs recorded {RECORDED}"
