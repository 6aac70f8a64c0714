"""Multi-host (DCN) initialization and per-host input sharding.

The reference has no distributed story (SURVEY §2.4).  Here: standard
jax.distributed bring-up + helpers to build a global-device mesh and
assemble globally-sharded batches from per-host shards
(`make_array_from_process_local_data`), so the same DP train step runs
across pods — ICI within a slice, DCN across hosts — without touching
the model code.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Bring up jax.distributed (no-op when single-process).  Arguments
    default to the standard env vars (JAX_COORDINATOR_ADDRESS etc.)."""
    if num_processes in (None, 1) and jax.process_count() == 1 \
            and coordinator_address is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_data_mesh() -> Mesh:
    """1-D 'data' mesh over ALL devices across hosts."""
    return Mesh(np.asarray(jax.devices()), ("data",))


def host_local_batch_to_global(mesh: Mesh, host_batch):
    """Per-host numpy batch (this host's shard of the global batch) ->
    globally-sharded jax.Arrays on the mesh."""
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x,
                                                      global_shape)

    return jax.tree_util.tree_map(put, host_batch)


def shard_dataset_indices(n: int, batch_size: int, seed: int = 0):
    """Per-host epoch index shards: every host permutes identically and
    takes its stripe, so the union covers the dataset exactly once."""
    rng = np.random.RandomState(seed)
    order = rng.permutation(n)
    pc, pid = jax.process_count(), jax.process_index()
    per_host = batch_size // pc
    usable = (n // batch_size) * batch_size
    order = order[:usable].reshape(-1, batch_size)
    return order[:, pid * per_host:(pid + 1) * per_host]
