"""End-to-end drivers for the auxiliary training pipelines.

The reference ships these as disconnected pieces the user wires by hand:
CCSSL pseudo-labeling scripts (CCSSL/consis*.py) + nyu_CCSSL_loader, and
a pre-trained Consis-CycleGAN checkpoint with no training code.  Here
both are runnable pipelines:

* ``run_ccssl``   — (re)generate TTA pseudo labels with the current
  model, then train on them with confidence-weighted losses.
* ``run_cyclegan`` — train the synth->real translator on (rendered
  synth crop, real crop) streams and export the frozen generator in the
  format the Trainer's transfer net consumes.

CLI: ``python -m dsf_tpu.training ccssl ...`` / ``... cyclegan ...``.
"""

from __future__ import annotations

import logging
import os
import time

import numpy as np


# ---------------------------------------------------------------------------
# flax-variable (de)serialization: npz of '/'-joined tree paths
# ---------------------------------------------------------------------------

def save_variables_npz(path, variables):
    import jax
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]

    def key_str(kp):
        parts = []
        for k in kp:
            parts.append(getattr(k, "key", getattr(k, "idx", k)))
        return "/".join(str(p) for p in parts)

    np.savez(path, **{key_str(kp): np.asarray(v) for kp, v in flat})
    return path


def load_variables_npz(path):
    raw = np.load(path)
    out = {}
    for key, val in raw.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out


# ---------------------------------------------------------------------------
# CCSSL pipeline (ref pieces: CCSSL/consis.py, nyu_CCSSL_loader)
# ---------------------------------------------------------------------------

def run_ccssl(cfg, epochs=None, regenerate=True):
    import jax
    from dsf_tpu.data import datasets as D
    from dsf_tpu.training import checkpoints as ckpt
    from dsf_tpu.training.ccssl_trainer import (ccssl_step_fn,
                                                generate_pseudo_labels)
    from dsf_tpu.training.trainer import Trainer

    root = os.path.join(cfg.root_dir, cfg.dataset)
    run_dir = os.path.join(cfg.save_dir, cfg.dataset,
                           "ccssl_" + cfg.run_name())
    pseudo_dir = os.path.join(run_dir, "pseudo")
    os.makedirs(pseudo_dir, exist_ok=True)

    base = D.NYUDataset(root, "train", img_size=cfg.input_size,
                        cube_size=cfg.cube_size,
                        center_type=cfg.center_type)
    steps = max(len(base) // cfg.batch_size, 1)
    tr = Trainer(cfg, cfg.mano_model_path, steps_per_epoch=steps)
    state = tr.init_state()
    if cfg.load_model:
        state, _ = ckpt.restore(cfg.load_model, tr, state)

    if regenerate or not os.path.exists(
            os.path.join(pseudo_dir, "joint_uvd.txt")):
        logging.info("CCSSL: generating pseudo labels for %d frames",
                     len(base))
        generate_pseudo_labels(tr, state, base, pseudo_dir,
                               batch_size=cfg.batch_size)

    ds = D.NYUCCSSLDataset(root, "train", pseudo_dir,
                           img_size=cfg.input_size, cube_size=cfg.cube_size,
                           center_type=cfg.center_type)
    step = ccssl_step_fn(tr)
    import jax.numpy as jnp
    for epoch in range(epochs or cfg.max_epoch):
        t0 = time.time()
        losses = []
        for b in ds.prefetch_batches(cfg.batch_size, shuffle=True,
                                     drop_last=True):
            batch = {k: jnp.asarray(v) for k, v in b.items()
                     if k in ("img", "uvd_gt", "center", "cube", "weight")}
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        logging.info("CCSSL epoch#%d loss=%.4f (%.1fs)", epoch,
                     float(np.mean(losses)), time.time() - t0)
        ckpt.save(os.path.join(run_dir, "latest"), tr, state, epoch)
    ckpt.wait_until_finished()      # saves are async; drain before return
    return run_dir, state


# ---------------------------------------------------------------------------
# CycleGAN pipeline (the reference loads latest_net_G_A.pth, no trainer)
# ---------------------------------------------------------------------------

def run_cyclegan(cfg, steps=None, log_every=50):
    import jax
    import jax.numpy as jnp
    from dsf_tpu.data import datasets as D
    from dsf_tpu.data.synth_params import (ModelParaDataset,
                                           random_param_source)
    from dsf_tpu.mano import model as mano_model
    from dsf_tpu.render import renderer as rnd
    from dsf_tpu.training.cyclegan_trainer import CycleGANTrainer
    from dsf_tpu.training.trainer import CAMERA

    root = os.path.join(cfg.root_dir, cfg.dataset)
    run_dir = os.path.join(cfg.save_dir, cfg.dataset,
                           "cyclegan_" + cfg.run_name())
    os.makedirs(run_dir, exist_ok=True)

    paras, img_size = CAMERA[cfg.dataset]
    m = mano_model.load_model(cfg.mano_model_path)
    r = rnd.Renderer.create(m, cfg.dataset, paras, img_size,
                            (cfg.input_size, cfg.input_size))

    synth_root = os.path.join(cfg.root_dir, "hands20")
    if os.path.isdir(os.path.join(synth_root, "posePara_lm_collosion")):
        synth_iter = ModelParaDataset(synth_root, "hands",
                                      cube_size=cfg.cube_size).iterator(
            cfg.batch_size)
    else:
        synth_iter = random_param_source(cfg.batch_size,
                                         cube_size=cfg.cube_size)

    real_ds = D.NYUDataset(root, "train", img_size=cfg.input_size,
                           cube_size=cfg.cube_size,
                           center_type=cfg.center_type)
    real_batches = real_ds.prefetch_batches(cfg.batch_size, shuffle=True,
                                            loop=True, drop_last=True)

    gan = CycleGANTrainer()
    key = jax.random.PRNGKey(cfg.seed)
    key, sub = jax.random.split(key)
    state = gan.init_state(sub, (1, 1, cfg.input_size, cfg.input_size))
    gan_step = gan.train_step_fn()

    @jax.jit
    def make_synth(key, model_para, cube):
        img, *_ = rnd.synth_sample(r, key, model_para, cube, mask=False)
        return img

    n_steps = steps or cfg.max_epoch * 1000
    for i in range(n_steps):
        model_para, cube = next(synth_iter)
        key, sub = jax.random.split(key)
        synth = make_synth(sub, jnp.asarray(model_para), jnp.asarray(cube))
        real = jnp.asarray(next(real_batches)["img"])
        state, metrics = gan_step(state, synth, real)
        if i % log_every == 0:
            logging.info("cyclegan step %d: %s", i,
                         " ".join(f"{k}={float(v):.3f}"
                                  for k, v in metrics.items()))
    out = os.path.join(run_dir, "transfer_G_A.npz")
    save_variables_npz(out, gan.export_transfer_variables(state))
    logging.info("cyclegan: exported frozen G_A to %s", out)
    return out, state
