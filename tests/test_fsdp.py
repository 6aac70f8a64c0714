"""DP x FSDP sharding: parameters/optimizer sharded along a 2-D mesh's
'fsdp' axis (ZeRO-3 via GSPMD), numerics identical to pure DP.

The reference has no distributed story (SURVEY §2.4); this layer is the
TPU-native scale-out design (dsf_tpu/parallel/mesh.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsf_tpu import geometry as geo
from dsf_tpu.config import Config
from dsf_tpu.parallel import mesh as pmesh
from dsf_tpu.training.trainer import Trainer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def mano_npz(tmp_path_factory):
    from dsf_tpu.mano import synthetic
    path = tmp_path_factory.mktemp("mano") / "syn.npz"
    synthetic.save_synthetic_mano(str(path))
    return str(path)


def _make_batch(tr, B, seed=0):
    rng = np.random.RandomState(seed)
    paras = tr.renderer.paras
    center = jnp.asarray(
        rng.uniform([-50, -50, 700], [50, 50, 900], (B, 3)).astype(np.float32))
    cube = jnp.full((B, 3), 250.0)
    com = geo.xyz_to_uvd(center, paras)
    S = tr.cfg.input_size
    M = geo.crop_matrix(com, cube, paras, (S, S))
    return {
        "model_para": jnp.asarray(np.concatenate(
            [rng.uniform(-1, 1, (B, 3)), rng.randn(B, 45) * 0.5,
             rng.randn(B, 10) * 0.5, np.ones((B, 1)), np.zeros((B, 3))],
            axis=1).astype(np.float32)),
        "cube_synth": jnp.full((B, 3), 250.0),
        "img": jnp.asarray(rng.uniform(-1, 1, (B, 1, S, S)).astype(np.float32)),
        "xyz_gt": jnp.asarray(rng.uniform(-1, 1, (B, 14, 3)).astype(np.float32)),
        "center": center, "M": M, "cube": cube,
    }


def _trainer(mano_npz_path, mesh, B):
    cfg = Config(dataset="nyu", batch_size=B, stage_num=2, input_size=64,
                 transferNet_pth="")
    return Trainer(cfg, mano_npz_path, steps_per_epoch=10, mesh=mesh)


def test_param_spec_shards_largest_divisible_axis():
    mesh = pmesh.make_mesh(8, n_fsdp=2)
    assert mesh.axis_names == ("data", "fsdp")
    assert mesh.shape["data"] == 4 and mesh.shape["fsdp"] == 2
    # conv kernel: shard the biggest divisible dim
    spec = pmesh.param_spec(mesh, jnp.zeros((3, 3, 64, 128)))
    assert spec == jax.sharding.PartitionSpec(None, None, None, "fsdp")
    # bias divisible -> sharded; odd leaf -> replicated; scalar -> replicated
    assert pmesh.param_spec(mesh, jnp.zeros((64,))) == \
        jax.sharding.PartitionSpec("fsdp")
    assert pmesh.param_spec(mesh, jnp.zeros((3, 5))) == \
        jax.sharding.PartitionSpec()
    assert pmesh.param_spec(mesh, jnp.zeros(())) == \
        jax.sharding.PartitionSpec()
    # 1-D mesh: everything replicated
    mesh1 = pmesh.make_mesh(8)
    assert pmesh.param_spec(mesh1, jnp.zeros((64,))) == \
        jax.sharding.PartitionSpec()


def test_fsdp_state_is_sharded_and_step_matches_dp(mano_npz):
    B = 8
    mesh_dp = pmesh.make_mesh(8)
    mesh_fs = pmesh.make_mesh(8, n_fsdp=2)

    tr_dp = _trainer(mano_npz, mesh_dp, B)
    tr_fs = _trainer(mano_npz, mesh_fs, B)

    state_dp = tr_dp.init_state()
    state_fs = tr_fs.init_state()

    # parameters are REALLY sharded: an fsdp leaf's addressable shard is
    # half the leaf; total per-device param bytes shrink accordingly
    leaves = jax.tree_util.tree_leaves(state_fs.params)
    sharded = [x for x in leaves
               if any(s is not None and "fsdp" in str(s)
                      for s in x.sharding.spec)]
    assert sharded, "no parameter leaf is fsdp-sharded"
    x = max(sharded, key=lambda l: l.size)
    shard_rows = x.addressable_shards[0].data.size
    assert shard_rows * 2 == x.size

    # optimizer moments shard like their parameters
    opt_leaves = [l for l in jax.tree_util.tree_leaves(state_fs.opt_state)
                  if hasattr(l, "sharding") and l.ndim >= 1 and
                  l.size == x.size]
    assert any(l.sharding == x.sharding for l in opt_leaves)

    batch = _make_batch(tr_dp, B)
    step_dp = tr_dp.train_step_fn("FinetuneStage")
    step_fs = tr_fs.train_step_fn("FinetuneStage")
    key = jax.random.PRNGKey(0)

    state_dp, m_dp = step_dp(state_dp, key,
                             pmesh.shard_batch(mesh_dp, batch))
    state_fs, m_fs = step_fs(state_fs, key,
                             pmesh.shard_batch(mesh_fs, batch))

    np.testing.assert_allclose(float(m_dp["loss"]), float(m_fs["loss"]),
                               rtol=3e-4)  # reduce-scatter reassociation

    # updated params: AdamW's step-1 update is lr * g/(|g|+eps), so ANY
    # gradient difference is clamped to a <= 2*lr (2e-3) param delta —
    # assert that bound.  Elementwise equality beyond it is NOT a valid
    # expectation: the loss gates terms on hard thresholds (M2P's
    # depth/icp masks, collision gating, raster/ICP argmin winners), so
    # the ~1e-7 forward reassociation noise a different GSPMD layout
    # introduces flips a few binary gates and redistributes O(1/B) of
    # the gradient (measured: loss rel diff 5.8e-5, grad L2 rel diff
    # 5.6% — all from gate flips; a systematic sharding bug would show
    # ~100%).  The meaningful FSDP guarantees asserted here: same loss,
    # bounded update, sharding preserved, second step healthy.
    p_dp = jax.tree_util.tree_leaves(state_dp.params)
    p_fs = jax.tree_util.tree_leaves(state_fs.params)
    diffs = [np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
             for a, b in zip(p_dp, p_fs)]
    worst = max(float(d.max()) for d in diffs)
    assert worst < 2.5e-3, worst

    # a second step runs and stays finite on the sharded state
    state_fs, m_fs2 = step_fs(state_fs, jax.random.PRNGKey(1),
                              pmesh.shard_batch(mesh_fs, batch))
    assert np.isfinite(float(m_fs2["loss"]))

    # updated state STAYS fsdp-sharded across steps (no silent
    # re-replication after the optimizer update)
    leaves2 = jax.tree_util.tree_leaves(state_fs.params)
    assert any(any(s is not None and "fsdp" in str(s)
                   for s in l.sharding.spec) for l in leaves2)


def test_eval_under_fsdp_mesh(mano_npz):
    B = 8
    mesh_fs = pmesh.make_mesh(8, n_fsdp=2)
    tr = _trainer(mano_npz, mesh_fs, B)
    state = tr.init_state()
    batch = _make_batch(tr, B, seed=3)
    ev = tr.eval_step_fn()
    out = ev(state.params, state.batch_stats,
             pmesh.shard_batch(mesh_fs, batch))
    errs = jax.tree_util.tree_leaves(out)
    assert all(np.isfinite(np.asarray(e)).all() for e in errs)
