"""Checkpoint save/restore via orbax (replaces torch.save of
{'model','optimizer','epoch'}, ref: train_render.py:284-308, with the
same partial-restore warm-start semantics for finetune_dir)."""

from __future__ import annotations

import os

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save(path: str, trainer, state, epoch: int):
    ckpt = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        "epoch": epoch,
    }
    cp = _checkpointer()
    cp.save(os.path.abspath(path), ckpt, force=True)


def restore(path: str, trainer, state, weights_only: bool = False):
    """Restore into an existing state.  With weights_only (the reference's
    finetune_dir warm start, train_render.py:138-145) only params +
    batch_stats load and the optimizer restarts."""
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
