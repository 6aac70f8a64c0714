"""End-to-end `loop.run` on an on-disk fake NYU dataset.

This drives the one production surface the other tests only cover in
pieces: the epoch loop itself — dataset construction, the synth
fallback, fit_epoch, per-epoch test + best-checkpoint selection, async
orbax saves, epoch resume, and the final 3-view evaluation with txt
exports (ref: train_render.py's train() + test() flow).

Shapes (B=8, input 64, steps_per_epoch=10) intentionally match
test_train_step so the persistent jit cache can serve the train-step
graph.
"""

import os

import numpy as np
import pytest

from dsf_tpu.config import Config


N_TRAIN, N_TEST, BATCH = 80, 6, 8


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    from dsf_tpu.data.fake import make_fake_nyu
    from dsf_tpu.mano import synthetic

    d = tmp_path_factory.mktemp("e2e")
    mano = synthetic.save_synthetic_mano(str(d / "mano.npz"))
    make_fake_nyu(str(d / "data"), mano, n_train=N_TRAIN, n_test=N_TEST)
    return str(d / "data"), mano


def _cfg(fake_root, **kw):
    root, mano = fake_root
    # save_dir shared module-wide so the resume test can reuse the
    # first test's checkpoints instead of retraining
    return Config(dataset="nyu", batch_size=BATCH, stage_num=2,
                  train_stage="Finetune", input_size=64,
                  root_dir=root, mano_model_path=mano,
                  save_dir=os.path.join(os.path.dirname(root), "ckpt"),
                  save_result=True, save_mesh=False, save_obj=False,
                  image_every=0, **kw)


def test_loop_run_trains_saves_and_evaluates(fake_root, monkeypatch):
    from dsf_tpu.training import loop as L

    monkeypatch.setattr(Config, "max_epoch", property(lambda self: 1))
    cfg = _cfg(fake_root)
    L.run(cfg)

    run_dir = os.path.join(cfg.save_dir, "nyu", cfg.run_name())
    # run artifacts (ref: train_render.py:78-84, 229, 284-308)
    assert os.path.exists(os.path.join(run_dir, "train.log"))
    assert os.path.exists(os.path.join(run_dir, "config.json"))
    assert os.listdir(os.path.join(run_dir, "files"))
    assert os.path.isdir(os.path.join(run_dir, "latest"))
    assert os.path.isdir(os.path.join(run_dir, "best"))
    # final 3-view NYU eval exports, every frame present despite the
    # padded tail batch (6 frames at batch 8).  The full result_{0..3}
    # file set exists, but only 0/1 carry rows — the reference's save
    # block sits outside the stage loop and writes only the last
    # stage's two branches (train_render.py:394-398)
    for view in range(3):
        for i in (0, 1):
            rows = np.loadtxt(
                os.path.join(run_dir, f"result_{i}_{view}.txt"))
            assert rows.shape[0] == N_TEST, (view, i, rows.shape)
            assert np.isfinite(rows).all()
        for i in range(2, cfg.stage_num * 2):
            assert os.path.exists(
                os.path.join(run_dir, f"result_{i}_{view}.txt"))
    log = open(os.path.join(run_dir, "train.log")).read()
    assert "Epoch#0" in log and "test:" in log


def test_loop_run_resumes_from_checkpoint(fake_root, monkeypatch):
    """load_model resumes AFTER the saved epoch: with max_epoch == the
    resumed epoch the loop does zero train steps and goes straight to
    the final eval (the production resume semantics)."""
    from dsf_tpu.training import loop as L
    from dsf_tpu.training import checkpoints as ckpt

    monkeypatch.setattr(Config, "max_epoch", property(lambda self: 1))
    first = _cfg(fake_root)
    prev = os.path.join(first.save_dir, "nyu", first.run_name())
    if not os.path.isdir(os.path.join(prev, "latest")):
        L.run(first)                      # independent-run fallback
    ckpt.wait_until_finished()

    cfg = _cfg(fake_root, add_info="resume",
               load_model=os.path.join(prev, "latest"))
    L.run(cfg)
    run_dir = os.path.join(cfg.save_dir, "nyu", cfg.run_name())
    rows = np.loadtxt(os.path.join(run_dir, "result_0_0.txt"))
    assert rows.shape[0] == N_TEST
    log = open(os.path.join(run_dir, "train.log")).read()
    # resumed at epoch 1 == max_epoch -> no further training epochs
    assert "Epoch#1:" not in log
