"""Determinism helpers (ref: data/render_loader.py:3734-3756 — the
reference seeds python/numpy/torch globally at import with seed 0 and
re-seeds each DataLoader worker from GLOBAL_SEED + worker_id).

The JAX side of this repo is deterministic by construction (explicit
`jax.random` keys everywhere); these helpers cover the host-side RNGs
the data pipeline and tools use, and torch when the reference's modules
are driven in A/B tests.  Unlike the reference, nothing is seeded at
import time — call set_seed explicitly.
"""

from __future__ import annotations

import os
import random

import numpy as np

GLOBAL_SEED = 1
GLOBAL_WORKER_ID = None


def set_seed(seed):
    """Seed python, numpy, torch (if present) and return a jax PRNG key
    for the same seed (ref: set_seed, render_loader.py:3737)."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    try:
        import torch
        torch.manual_seed(seed)
        if torch.cuda.is_available():            # pragma: no cover
            torch.cuda.manual_seed_all(seed)
    except ImportError:                          # pragma: no cover
        pass
    import jax
    return jax.random.PRNGKey(seed)


def worker_init_fn(worker_id):
    """Per-worker re-seed for multiprocess data loading (ref:
    worker_init_fn, render_loader.py:3753)."""
    global GLOBAL_WORKER_ID
    GLOBAL_WORKER_ID = worker_id
    set_seed(GLOBAL_SEED + worker_id)
