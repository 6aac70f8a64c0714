"""Multi-host helpers, exercised single-process on the 8-device CPU mesh
(jax.make_array_from_process_local_data works with process_count()==1:
the host shard IS the global batch)."""

import jax
import jax.numpy as jnp
import numpy as np

from dsf_tpu.parallel import distributed as dist
from dsf_tpu.parallel import mesh as pmesh


def test_initialize_noop_single_process():
    # no coordinator configured -> must not raise, must report False
    assert dist.initialize() is False


def test_global_data_mesh_covers_all_devices():
    mesh = dist.global_data_mesh()
    assert mesh.axis_names == ("data",)
    assert mesh.devices.size == len(jax.devices())


def test_host_local_batch_to_global_shards_batch_dim():
    mesh = dist.global_data_mesh()
    n_dev = mesh.devices.size
    batch = {
        "img": np.random.RandomState(0).rand(n_dev * 2, 1, 8, 8)
        .astype(np.float32),
        "center": np.zeros((n_dev * 2, 3), np.float32),
    }
    out = dist.host_local_batch_to_global(mesh, batch)
    assert out["img"].shape == (n_dev * 2, 1, 8, 8)
    # batch axis sharded over 'data'
    assert out["img"].sharding.spec == jax.sharding.PartitionSpec("data")
    np.testing.assert_allclose(np.asarray(out["img"]), batch["img"])

    # the sharded batch must feed a psum'd computation unchanged
    @jax.jit
    def mean(b):
        return b["img"].mean()
    assert np.isfinite(float(mean(out)))


def test_shard_dataset_indices_partition():
    idx = dist.shard_dataset_indices(100, batch_size=8, seed=3)
    # single process: stripe == full batch
    assert idx.shape == (12, 8)
    flat = idx.reshape(-1)
    assert len(set(flat.tolist())) == len(flat)   # no duplicates
    assert flat.max() < 100
