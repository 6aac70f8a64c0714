"""Serving engine: bucketed jit inference, raw-depth path, run-dir load.

The reference has no deployment path (inference exists only inside
train_render.py's test loop); dsf_tpu.serving packages it.  These tests
pin the serving contracts: bucket padding never changes results, raw
frames route through the parity-tested host crop, and a run dir written
by the production checkpointer serves without a Trainer.
"""

import json
import os

import numpy as np
import pytest

from dsf_tpu.config import Config
from dsf_tpu.serving import InferenceEngine


S = 64  # input_size 64 to cut CPU compile time (model is size-agnostic)


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    import jax
    import jax.numpy as jnp
    from dsf_tpu.mano import synthetic

    path = tmp_path_factory.mktemp("mano") / "syn.npz"
    synthetic.save_synthetic_mano(str(path))
    cfg = Config(dataset="nyu", stage_num=2, input_size=S,
                 mano_model_path=str(path))
    eng = InferenceEngine(cfg, None, buckets=(1, 2, 4))
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((2, 1, S, S))
    center = jnp.asarray([[0.0, 0.0, 750.0]] * 2)
    cube = jnp.full((2, 3), 250.0)
    eng.variables = eng.net.init(key, img, eng.renderer, center, cube,
                                 train=False)
    return eng


def _inputs(B, seed=0):
    from dsf_tpu import geometry as geo

    rng = np.random.RandomState(seed)
    img = rng.uniform(-1, 1, (B, 1, S, S)).astype(np.float32)
    center = rng.uniform([-40, -40, 650], [40, 40, 900],
                         (B, 3)).astype(np.float32)
    cube = np.full((B, 3), 250.0, np.float32)
    com = geo.xyz_to_uvd(center, (588.03, 587.07, 320.0, 240.0))
    M = np.asarray(geo.crop_matrix(com, cube,
                                   (588.03, 587.07, 320.0, 240.0), (S, S)))
    return img, center, M, cube


def test_predict_shapes_and_aliases(engine):
    img, center, M, cube = _inputs(2)
    out = engine.predict(img, center, M, cube)
    # both stages, both branches, world mm
    for idx in (0, 1):
        assert out[f"joint_xyz_mm_{idx}"].shape == (2, 21, 3)
        assert out[f"mano_mesh_mm_{idx}"].shape[1:] == (779, 3)
        assert out[f"mano_para_{idx}"].shape == (2, 62)
        assert np.isfinite(out[f"joint_xyz_mm_{idx}"]).all()
    # canonical alias = last stage in dataset joint order (MANO2NYU
    # keeps 12 of 21, mano/constants.py)
    J = len(engine.transfer_map)
    assert out["joint_xyz_mm"].shape == (2, J, 3)
    np.testing.assert_allclose(
        out["joint_xyz_mm"],
        out["joint_xyz_mm_1"][:, engine.transfer_map], rtol=0, atol=0)
    # world frame: predictions live near the crop centers, not at 0
    d = np.linalg.norm(out["joint_xyz_mm"] - center[:, None], axis=-1)
    assert (d < 500).all() and (np.linalg.norm(out["joint_xyz_mm"],
                                               axis=-1) > 100).all()


def test_bucket_padding_is_invisible(engine):
    """B=3 runs padded in the 4-bucket; rows must equal the B=4 run's
    first three (same program, padding masked out on return)."""
    img, center, M, cube = _inputs(4, seed=1)
    full = engine.predict(img, center, M, cube)
    part = engine.predict(img[:3], center[:3], M[:3], cube[:3])
    for k in full:
        np.testing.assert_array_equal(part[k], full[k][:3])


def test_async_predict_matches_sync(engine):
    """as_numpy=False is a pure dispatch returning device arrays whose
    rows equal the sync path's — across bucket padding AND chunking."""
    import jax

    for B, seed in ((3, 5), (6, 6)):   # padded bucket; two chunks
        img, center, M, cube = _inputs(B, seed=seed)
        sync = engine.predict(img, center, M, cube)
        dev = engine.predict(img, center, M, cube, as_numpy=False)
        assert not isinstance(dev["joint_xyz_mm"], np.ndarray)
        jax.block_until_ready(dev["joint_xyz_mm"])
        for k in sync:
            np.testing.assert_array_equal(np.asarray(dev[k]), sync[k])


def test_oversize_requests_chunk(engine):
    """B=6 > max bucket 4 → two chunks; matches per-row evaluation."""
    img, center, M, cube = _inputs(6, seed=2)
    out = engine.predict(img, center, M, cube)
    assert out["joint_xyz_mm"].shape[0] == 6
    one = engine.predict(img[4:5], center[4:5], M[4:5], cube[4:5])
    # different bucket programs may fuse differently; only rounding may
    # differ, never the math
    np.testing.assert_allclose(out["joint_xyz_mm"][4],
                               one["joint_xyz_mm"][0], rtol=1e-5, atol=1e-4)


def test_predict_from_depth(engine):
    """Raw mm frames with no detector: the CoM fallback centers the
    crop on the blob and the whole chain stays finite."""
    depth = np.zeros((2, 480, 640), np.float32)
    depth[:, 200:280, 280:360] = 730.0  # a hand-sized blob at ~730mm
    out = engine.predict_from_depth(depth)
    assert out["joint_xyz_mm"].shape == (2, len(engine.transfer_map), 3)
    assert np.isfinite(out["joint_xyz_mm"]).all()
    # predictions land around the blob's depth, not the origin
    assert (np.abs(out["joint_xyz_mm"][..., 2] - 730) < 300).all()


def test_from_run_dir_serves_production_checkpoints(engine, tmp_path):
    """A run dir written by the production checkpointer + config.json
    (as loop.run writes them) serves without a Trainer."""
    from dsf_tpu.training import checkpoints as ckpt

    run_dir = tmp_path / "run"
    os.makedirs(run_dir)
    with open(run_dir / "config.json", "w") as f:
        json.dump({k: str(v) for k, v in vars(engine.cfg).items()}, f)

    class _State:  # save() only reads these fields
        params = engine.variables["params"]
        batch_stats = engine.variables["batch_stats"]
        opt_state = {}
        step = 0

    ckpt.save(str(run_dir / "best"), None, _State, epoch=3)
    ckpt.wait_until_finished()

    eng2 = InferenceEngine.from_run_dir(str(run_dir), buckets=(2,))
    assert eng2.cfg.input_size == S and eng2.cfg.dataset == "nyu"
    img, center, M, cube = _inputs(2, seed=3)
    a = engine.predict(img, center, M, cube)
    b = eng2.predict(img, center, M, cube)
    np.testing.assert_allclose(a["joint_xyz_mm"], b["joint_xyz_mm"],
                               rtol=1e-6, atol=1e-6)


def test_export_artifact_roundtrip(engine, tmp_path):
    """jax.export deployment artifact: weights baked in, loads and
    predicts without the engine, matches live outputs exactly."""
    from dsf_tpu.serving import load_exported

    path = str(tmp_path / "predict_b2.bin")
    engine.export(path, bucket=2)
    assert os.path.getsize(path) > 1000

    fn = load_exported(path)
    img, center, M, cube = _inputs(2, seed=4)
    live = engine.predict(img, center, M, cube)
    art = fn(img, center, M, cube)
    # reloading recompiles the StableHLO; fusion choices may differ by
    # float rounding — tolerance is 0.2mm on ~700mm world coordinates
    np.testing.assert_allclose(np.asarray(art["joint_xyz_mm"]),
                               live["joint_xyz_mm"], rtol=2e-4, atol=0.2)
    np.testing.assert_allclose(np.asarray(art["mano_mesh_mm_1"]),
                               live["mano_mesh_mm_1"], rtol=2e-4, atol=0.2)


def test_multi_device_serving_matches_single(engine):
    """DP serving over the virtual 8-device mesh: batch sharded, params
    replicated — same numbers as the single-device engine."""
    import jax
    from dsf_tpu.serving import InferenceEngine

    if len(jax.devices()) < 8:
        import pytest as _pytest
        _pytest.skip("needs the 8-device CPU mesh")
    cfg = engine.cfg.replace(num_devices=8)
    eng8 = InferenceEngine(cfg, engine.variables, buckets=(8,))
    assert eng8.mesh is not None
    img, center, M, cube = _inputs(3, seed=5)   # pads 3 -> 8 over 8 devices
    a = engine.predict(img, center, M, cube)
    b = eng8.predict(img, center, M, cube)
    for k in a:
        np.testing.assert_allclose(b[k], a[k], rtol=1e-5, atol=1e-4,
                                   err_msg=k)


def test_multi_device_bucket_divisibility_checked(engine):
    import jax
    from dsf_tpu.serving import InferenceEngine

    if len(jax.devices()) < 8:
        import pytest as _pytest
        _pytest.skip("needs the 8-device CPU mesh")
    with pytest.raises(ValueError):
        InferenceEngine(engine.cfg.replace(num_devices=8),
                        engine.variables, buckets=(1, 4))


def test_from_torch_checkpoint_serves(tmp_path):
    """The migration path: a reference-format .pth serves directly."""
    import torch
    from dsf_tpu.mano import synthetic
    from test_backbone_import import _synthetic_state_dict

    sd = _synthetic_state_dict(np.random.RandomState(7))
    # a real checkpoint stores tensors (the reference torch.saves
    # {'model': state_dict}); exercise that exact on-disk form
    pth = str(tmp_path / "net.pth")
    torch.save({"model": {k: torch.from_numpy(np.asarray(v))
                          for k, v in sd.items()}}, pth)
    npz = str(tmp_path / "m.npz")
    synthetic.save_synthetic_mano(npz)

    eng = InferenceEngine.from_torch_checkpoint(pth, dataset="nyu",
                                                mano_npz=npz, buckets=(1,))
    depth = np.zeros((1, 480, 640), np.float32)
    depth[:, 200:280, 280:360] = 730.0
    out = eng.predict_from_depth(depth)
    assert out["joint_xyz_mm"].shape == (1, len(eng.transfer_map), 3)
    assert np.isfinite(out["joint_xyz_mm"]).all()


def test_warmup_runs_production_signatures(engine):
    engine.warmup()            # all buckets through the predict path
    img, center, M, cube = _inputs(2, seed=6)
    out = engine.predict(img, center, M, cube)
    assert np.isfinite(out["joint_xyz_mm"]).all()
