"""CCSSL baseline: confidence-weighted training on TTA pseudo labels.

The reference ships the CCSSL comparison pipeline in pieces (offline
pseudo-label generation CCSSL/consis*.py, a weighted loss
metric/losses.py:32, and the nyu_CCSSL_loader with joint_uvd.txt +
weight.txt).  This module closes the loop natively:

1. `generate_pseudo_labels` — run the trained net with TTA consistency
   (tools/ccssl.py) over a dataset and write joint_uvd.txt / weight.txt.
2. `ccssl_step_fn` — supervised training on those labels with
   WeightSmoothL1 (per-joint confidence), the CCSSL objective.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from dsf_tpu.losses.basic import weighted_smooth_l1, smooth_l1
from dsf_tpu.ops.offset_codec import joint2offset, offset2joint_softmax
from dsf_tpu.tools.ccssl import prediction_check


def generate_pseudo_labels(trainer, state, dataset, out_dir,
                           batch_size=32, n_aug=5, stage=-1):
    """TTA-averaged joints + softmax-peak confidences for every frame."""
    os.makedirs(out_dir, exist_ok=True)
    net, r, cfg = trainer.net, trainer.renderer, trainer.cfg
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def forward(img_aug, center, cube):
        # each sample's REAL center/cube feeds the stage-2 input render,
        # so the stage=-1 pixel head TTA runs on faithful features (the
        # round-2 version used a fixed (0,0,750)/250 dummy)
        out = net.apply(variables, img_aug, r, center, cube, train=False)
        return out[stage][0].astype(jnp.float32)

    def check_fn(key, img, center, cube):
        return prediction_check(
            key, lambda im: forward(im, center, cube), img,
            n_aug=n_aug, kernel=cfg.feature_para[0])

    check = jax.jit(check_fn)
    joints_all, conf_all = [], []
    key = jax.random.PRNGKey(0)
    n = len(dataset)
    for s in range(0, n, batch_size):
        idx = list(range(s, min(s + batch_size, n)))
        pad = batch_size - len(idx)
        items = [dataset[i] for i in idx] + [dataset[idx[-1]]] * pad
        img = jnp.asarray(np.stack([it["img"] for it in items]))
        center = jnp.asarray(np.stack([it["center"] for it in items]))
        cube = jnp.asarray(np.stack([it["cube"] for it in items]))
        key, sub = jax.random.split(key)
        joints, conf = check(sub, img, center, cube)
        joints_all.append(np.asarray(joints)[:len(idx)])
        conf_all.append(np.asarray(conf)[:len(idx)])
    joints = np.concatenate(joints_all)
    conf = np.concatenate(conf_all)
    np.savetxt(os.path.join(out_dir, "joint_uvd.txt"),
               joints.reshape(n, -1), fmt="%.5f")
    np.savetxt(os.path.join(out_dir, "weight.txt"), conf, fmt="%.5f")
    return joints, conf


def ccssl_step_fn(trainer):
    """Supervised step on pseudo labels: pixel-feature + coord losses
    weighted by per-joint confidence (WeightSmoothL1, losses.py:32)."""
    net, r, cfg = trainer.net, trainer.renderer, trainer.cfg
    tx = trainer.tx

    def loss_fn(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        out, mut = net.apply(variables, batch["img"], r, batch["center"],
                             batch["cube"], train=True,
                             mutable=["batch_stats"])
        loss = 0.0
        for pixel_pd, _para in out:
            pixel_pd = pixel_pd.astype(jnp.float32)
            uvd_pd = offset2joint_softmax(pixel_pd, batch["img"],
                                          cfg.feature_para[0])
            J = uvd_pd.shape[1]
            gt = batch["uvd_gt"]
            w = batch.get("weight")
            if gt.shape[1] != J:                # pseudo labels cover J=21
                gt = jnp.pad(gt, ((0, 0), (0, J - gt.shape[1]), (0, 0)))
                if w is not None:
                    w = jnp.pad(w, ((0, 0), (0, J - w.shape[1])))
            pixel_gt = joint2offset(gt, batch["img"], cfg.feature_para[0],
                                    pixel_pd.shape[-1])
            loss += smooth_l1(pixel_pd, pixel_gt) * cfg.deconv_weight
            if w is not None:
                loss += weighted_smooth_l1(uvd_pd, gt, w) * cfg.coord_weight
            else:
                loss += smooth_l1(uvd_pd, gt) * cfg.coord_weight
        return loss, mut

    import optax

    def step(state, batch):
        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch)
        updates, opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             batch_stats=mut.get("batch_stats",
                                                 state.batch_stats),
                             opt_state=opt), {"loss": loss}

    return jax.jit(step, donate_argnums=(0,))
