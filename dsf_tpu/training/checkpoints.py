"""Checkpoint save/restore via orbax (replaces torch.save of
{'model','optimizer','epoch'}, ref: train_render.py:284-308, with the
same partial-restore warm-start semantics for finetune_dir).

Saves are ASYNC (ocp.AsyncCheckpointer): the epoch loop keeps training
while the previous checkpoint serializes in a background thread — the
reference blocks the loop on torch.save every epoch.  Call
``wait_until_finished`` (or rely on the atexit hook) before reading a
just-written checkpoint.
"""

from __future__ import annotations

import atexit
import os

import jax
import numpy as np

_ASYNC = None


def _checkpointer():
    """Process-wide async checkpointer (orbax allows one per dir tree)."""
    global _ASYNC
    if _ASYNC is None:
        import orbax.checkpoint as ocp
        _ASYNC = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        atexit.register(_ASYNC.wait_until_finished)
    return _ASYNC


def wait_until_finished():
    if _ASYNC is not None:
        _ASYNC.wait_until_finished()


def save(path: str, trainer, state, epoch: int):
    ckpt = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        "epoch": epoch,
    }
    cp = _checkpointer()
    cp.wait_until_finished()          # at most one in-flight save
    cp.save(os.path.abspath(path), ckpt, force=True)


def restore_variables(path: str):
    """Weights-only load without a Trainer/state — the serving path
    (dsf_tpu.serving).  Reads ONLY params + batch_stats (the opt_state,
    ~2x the param bytes, is never touched); the tree structure comes
    from the checkpoint's own metadata.  Returns
    ``{"params", "batch_stats"}``."""
    import orbax.checkpoint as ocp

    path = _resolve(path)
    wait_until_finished()
    cp = _checkpointer()
    md = cp.metadata(os.path.abspath(path)).item_metadata.tree
    sub = {k: md[k] for k in ("params", "batch_stats")}
    restore_args = jax.tree_util.tree_map(lambda m: ocp.RestoreArgs(), sub)
    return cp.restore(os.path.abspath(path), item=sub, transforms={},
                      restore_args=restore_args)


def _resolve(path: str) -> str:
    """Accept either a checkpoint dir or a run dir: a run dir (no
    checkpoint metadata of its own) resolves to its ``latest``
    checkpoint — so ``--load_model <run dir>`` just works."""
    if (not os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA"))
            and os.path.isdir(os.path.join(path, "latest"))):
        return os.path.join(path, "latest")
    return path


def restore(path: str, trainer, state, weights_only: bool = False):
    """Restore into an existing state.  With weights_only (the reference's
    finetune_dir warm start, train_render.py:138-145) only params +
    batch_stats load and the optimizer restarts."""
    path = _resolve(path)
    wait_until_finished()             # a save to `path` may be in flight
    cp = _checkpointer()
    ref = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": 0, "epoch": 0,
    }
    ckpt = cp.restore(os.path.abspath(path), item=ref)
    state = state.replace(params=ckpt["params"],
                          batch_stats=ckpt["batch_stats"])
    epoch = 0
    if not weights_only:
        state = state.replace(opt_state=ckpt["opt_state"],
                              step=np.int32(ckpt["step"]))
        epoch = int(ckpt["epoch"]) + 1
    return state, epoch
