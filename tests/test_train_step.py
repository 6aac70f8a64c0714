"""End-to-end train-step smoke tests on the virtual 8-device CPU mesh.

Exercises the full vertical: synth factory -> transfer(None) -> dual
branch net -> rendering inside forward -> all losses -> grads -> optax,
with the batch sharded across 8 virtual devices (SURVEY §4 item c).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsf_tpu.config import Config
from dsf_tpu.data.synth_params import random_param_source
from dsf_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    from dsf_tpu.mano import synthetic
    path = tmp_path_factory.mktemp("mano") / "syn.npz"
    synthetic.save_synthetic_mano(str(path))
    # input_size 64 (not the production 128) purely to cut CPU compile
    # time; the model is size-agnostic and 128 is covered on-TPU by bench
    cfg = Config(dataset="nyu", batch_size=8, stage_num=2,
                 train_stage="Pretrain", input_size=64)
    return Trainer(cfg, str(path), steps_per_epoch=10)


def _real_batch(B, J=14, S=64):
    rng = np.random.RandomState(0)
    from dsf_tpu import geometry as geo
    center = jnp.asarray(
        rng.uniform([-50, -50, 700], [50, 50, 900], (B, 3)).astype(np.float32))
    cube = jnp.full((B, 3), 250.0)
    com = geo.xyz_to_uvd(center, (588.03, 587.07, 320.0, 240.0))
    M = geo.crop_matrix(com, cube, (588.03, 587.07, 320.0, 240.0), (S, S))
    img = jnp.asarray(
        rng.uniform(-1, 1, (B, 1, S, S)).astype(np.float32))
    xyz_gt = jnp.asarray(rng.uniform(-1, 1, (B, J, 3)).astype(np.float32))
    return img, xyz_gt, center, M, cube


def test_pretrain_step_runs_and_descends(trainer):
    state = trainer.init_state()
    src = random_param_source(8)
    step = trainer.train_step_fn("Pretrain")
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(3):
        para, cube = next(src)
        batch = {"model_para": jnp.asarray(para), "cube_synth": jnp.asarray(cube)}
        key, sub = jax.random.split(key)
        state, metrics = step(state, sub, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert int(state.step) == 3


def test_finetune_stage_step_runs(trainer):
    state = trainer.init_state()
    step = trainer.train_step_fn("FinetuneStage")
    para, cube_s = next(random_param_source(8))
    img, xyz_gt, center, M, cube = _real_batch(8)
    batch = {"model_para": jnp.asarray(para), "cube_synth": jnp.asarray(cube_s),
             "img": img, "xyz_gt": xyz_gt, "center": center, "M": M,
             "cube": cube}
    state, metrics = step(state, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(metrics["loss"]))
    for k in ("m2d_0", "d2m_1", "pd2m_0", "coll_1", "M2P"):
        assert k in metrics, k
        assert np.isfinite(float(metrics[k])), k


def test_eval_step(trainer):
    state = trainer.init_state()
    img, xyz_gt, center, M, cube = _real_batch(8)
    batch = {"img": img, "xyz_gt": xyz_gt, "center": center, "M": M,
             "cube": cube}
    errors = trainer.evaluate(state, iter([batch]))
    assert errors.shape == (4,)          # 2 stages x 2 branches
    assert np.isfinite(errors).all()


def test_batch_is_sharded_across_devices(trainer):
    from dsf_tpu.parallel import mesh as pmesh
    assert len(jax.devices()) == 8
    batch = {"x": jnp.zeros((8, 4))}
    sharded = pmesh.shard_batch(trainer.mesh, batch)
    assert len(sharded["x"].sharding.device_set) == 8


def test_lr_schedule_modes():
    """The reference's three scheduler modes (train_render.py:148-153,
    310-313): StepLR decays every step_size epochs; MultiStepLR decays
    at each milestone; 'auto' (ReduceLROnPlateau) is constructed but
    never stepped in the reference -> constant lr."""
    import dataclasses
    from dsf_tpu.config import Config
    from dsf_tpu.training.trainer import lr_schedule

    spe = 100
    cfg = Config(dataset="nyu")                      # step_size = 10
    sch = lr_schedule(cfg, spe)
    assert float(sch(0)) == cfg.lr
    assert float(sch(9 * spe)) == cfg.lr
    np.testing.assert_allclose(float(sch(10 * spe)), cfg.lr * 0.1)
    np.testing.assert_allclose(float(sch(20 * spe)), cfg.lr * 0.01)

    cfg = Config(dataset="nyu", scheduler="multi_step")
    sch = lr_schedule(cfg, spe)                      # milestone at 10
    np.testing.assert_allclose(float(sch(5 * spe)), cfg.lr, rtol=1e-6)
    np.testing.assert_allclose(float(sch(10 * spe)), cfg.lr * 0.1)
    np.testing.assert_allclose(float(sch(25 * spe)), cfg.lr * 0.1)

    cfg = Config(dataset="nyu", scheduler="auto")
    sch = lr_schedule(cfg, spe)
    np.testing.assert_allclose(float(sch(0)), cfg.lr, rtol=1e-6)
    np.testing.assert_allclose(float(sch(50 * spe)), cfg.lr, rtol=1e-6)


def test_flat_opt_is_numerically_identical(monkeypatch):
    """DSF_FLAT_OPT=1 (optax.flatten around the optimizer) must produce
    bit-identical updates to the per-leaf form — it only changes kernel
    granularity, not math."""
    from dsf_tpu.config import Config
    from dsf_tpu.training.trainer import make_optimizer

    cfg = Config(dataset="nyu")
    rng = np.random.RandomState(0)
    params = {
        "conv": {"kernel": jnp.asarray(rng.randn(3, 3, 4, 8), jnp.float32)},
        "bn": {"scale": jnp.asarray(rng.rand(8), jnp.float32),
               "bias": jnp.asarray(rng.randn(8), jnp.float32)},
    }
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32), params)

    monkeypatch.setenv("DSF_FLAT_OPT", "0")
    tx0 = make_optimizer(cfg, 100)
    monkeypatch.setenv("DSF_FLAT_OPT", "1")
    tx1 = make_optimizer(cfg, 100)

    p0, p1 = params, params
    s0, s1 = tx0.init(p0), tx1.init(p1)
    for _ in range(3):
        u0, s0 = tx0.update(grads, s0, p0)
        u1, s1 = tx1.update(grads, s1, p1)
        import optax
        p0 = optax.apply_updates(p0, u0)
        p1 = optax.apply_updates(p1, u1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=0, atol=1e-7), p0, p1)


def test_opt_guard_select_matches_cond(monkeypatch):
    """DSF_OPT_GUARD=select (where-fused finite guard) must match
    optax.apply_if_finite's lax.cond on every path: finite updates,
    rejected non-finite updates, and the give-up acceptance after
    max_consecutive_errors.  Guard state is exactly equal; update
    values are compared at the flat-opt test's 1e-7 bar (the cond
    branch compiles as one XLA computation whose FMA fusion rounds
    ~1 ulp differently from the inlined form)."""
    from dsf_tpu.config import Config
    from dsf_tpu.training.trainer import make_optimizer
    import optax

    cfg = Config(dataset="nyu")
    rng = np.random.RandomState(1)
    params = {
        "w": jnp.asarray(rng.randn(4, 8), jnp.float32),
        "b": jnp.asarray(rng.randn(8), jnp.float32),
    }
    good = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32), params)
    bad = jax.tree_util.tree_map(
        lambda g: g.at[(0,) * g.ndim].set(jnp.nan), good)

    monkeypatch.setenv("DSF_OPT_GUARD", "cond")
    tx_c = make_optimizer(cfg, 100)
    monkeypatch.setenv("DSF_OPT_GUARD", "select")
    tx_s = make_optimizer(cfg, 100)

    pc, ps = params, params
    sc, ss = tx_c.init(pc), tx_s.init(ps)
    # finite, finite, 10x non-finite (crosses max_consecutive_errors=8
    # -> the give-up path accepts the nan update in BOTH variants),
    # then finite again
    schedule = [good, good] + [bad] * 10 + [good]
    for g in schedule:
        uc, sc = tx_c.update(g, sc, pc)
        us, ss = tx_s.update(g, ss, ps)
        pc = optax.apply_updates(pc, uc)
        ps = optax.apply_updates(ps, us)
        assert int(sc.notfinite_count) == int(ss.notfinite_count)
        assert bool(sc.last_finite) == bool(ss.last_finite)
        assert int(sc.total_notfinite) == int(ss.total_notfinite)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=1e-7), uc, us)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.isnan(np.asarray(a)), np.isnan(np.asarray(b))), uc, us)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-7), pc, ps)
