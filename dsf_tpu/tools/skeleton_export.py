"""Skeleton export for action-recognition pipelines (SHREC / DHG).

Rebuild of the reference's write_joints flow (render_loader.py:3166-3181
and :3053-3071): run the trained model over gesture-sequence frames and
write per-sequence `skeletons_world_pred.txt` files (21 joints x 3,
world mm, one frame per row) consumable by DG-STA.
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np


def export_skeletons(trainer, state, dataset, batch_size=32,
                     out_name="skeletons_world_pred.txt", stage=-1):
    """dataset: SHRECDataset (or compatible) whose samples carry their
    sequence directory; predictions are grouped per sequence and written
    next to the frames."""
    import jax.numpy as jnp

    eval_step = trainer.eval_step_fn()
    seq_of = [s[2] for s in dataset.samples]
    preds = {}
    n = len(dataset)
    for s in range(0, n, batch_size):
        idx = list(range(s, min(s + batch_size, n)))
        pad = batch_size - len(idx)
        items = [dataset[i] for i in idx] + [dataset[idx[-1]]] * pad
        batch = {k: jnp.asarray(np.stack([it[k] for it in items]))
                 for k in ("img", "xyz_gt", "center", "M", "cube")}
        _, results = eval_step(state.params, state.batch_stats, batch)
        key = [k for k in results if k.startswith("mano_joint_xyz")][stage]
        jxyz = np.asarray(results[key])
        center = np.asarray(batch["center"])
        cube = np.asarray(batch["cube"])
        world = jxyz * cube[:, None] / 2.0 + center[:, None]
        for bi, i in enumerate(idx):
            preds[i] = world[bi]

    grouped = defaultdict(list)
    for i in range(n):
        grouped[seq_of[i]].append(preds[i])
    for seq_dir, frames in grouped.items():
        arr = np.stack(frames).reshape(len(frames), -1)
        np.savetxt(os.path.join(seq_dir, out_name), arr, fmt="%.4f")
    return list(grouped)
