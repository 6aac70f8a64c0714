"""Top-level train/test loop: epochs, checkpointing, logging, export.

(ref: Trainer.train/test, train_render.py:231-353 + the __main__ block
:874-889: train -> per-epoch test -> best.pth, then 3-view NYU eval.)
"""

from __future__ import annotations

import json
import logging
import os
import time

import numpy as np

from dsf_tpu.config import Config


def _make_datasets(cfg: Config):
    from dsf_tpu.data import datasets as D
    from dsf_tpu.data.synth_params import ModelParaDataset, random_param_source

    root = os.path.join(cfg.root_dir, cfg.dataset)
    train_ds = test_ds = None
    if cfg.dataset == "nyu":
        if cfg.phase == "train":
            train_ds = D.NYUDataset(root, "train", img_size=cfg.input_size,
                                    cube_size=cfg.cube_size,
                                    center_type=cfg.center_type,
                                    aug_para=cfg.augment_para)
        test_ds = D.NYUDataset(root, "test", view=0, img_size=cfg.input_size,
                               cube_size=cfg.cube_size,
                               center_type=cfg.center_type)
    elif cfg.dataset == "icvl":
        if cfg.phase == "train":
            train_ds = D.ICVLDataset(root, "train", img_size=cfg.input_size,
                                     cube_size=cfg.cube_size,
                                     aug_para=cfg.augment_para)
        test_ds = D.ICVLDataset(root, "test", img_size=cfg.input_size,
                                cube_size=cfg.cube_size)
    elif cfg.dataset == "msra":
        if cfg.phase == "train":
            train_ds = D.MSRADataset(root, "train", test_persons=cfg.test_id,
                                     img_size=cfg.input_size,
                                     aug_para=cfg.augment_para)
        test_ds = D.MSRADataset(root, "test", test_persons=cfg.test_id,
                                img_size=cfg.input_size)
    elif cfg.dataset == "shrec":
        test_ds = D.SHRECDataset(root, img_size=cfg.input_size,
                                 cube_size=cfg.cube_size)
        train_ds = test_ds

    synth_root = os.path.join(cfg.root_dir, "hands20")
    if os.path.isdir(os.path.join(synth_root, "posePara_lm_collosion")):
        synth = ModelParaDataset(synth_root, "hands",
                                 cube_size=cfg.cube_size)
        synth_iter = synth.iterator(cfg.batch_size)
    else:
        logging.warning("hands20 params not found; using random synth params")
        synth_iter = random_param_source(cfg.batch_size,
                                         cube_size=cfg.cube_size)
    return train_ds, test_ds, synth_iter


def _real_iter(ds, cfg, loop=True):
    import jax.numpy as jnp
    for b in ds.prefetch_batches(cfg.batch_size, shuffle=True, loop=loop,
                                 drop_last=True):
        yield (jnp.asarray(b["img"]), jnp.asarray(b["xyz_gt"]),
               jnp.asarray(b["uvd_gt"]), jnp.asarray(b["center"]),
               jnp.asarray(b["M"]), jnp.asarray(b["cube"]))


def run(cfg: Config):
    import jax
    from dsf_tpu.training.trainer import Trainer
    from dsf_tpu.training import checkpoints as ckpt

    run_dir = os.path.join(cfg.save_dir, cfg.dataset, cfg.run_name())
    os.makedirs(run_dir, exist_ok=True)
    logging.basicConfig(
        format="%(asctime)s %(message)s", datefmt="%Y/%m/%d %H:%M:%S",
        filename=os.path.join(run_dir, "train.log"), level=logging.INFO)
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        json.dump({k: str(v) for k, v in vars(cfg).items()}, f, indent=2)

    train_ds, test_ds, synth_iter = _make_datasets(cfg)
    steps = (len(train_ds) // cfg.batch_size if train_ds is not None
             else 1000)
    tr = Trainer(cfg, cfg.mano_model_path, steps_per_epoch=steps)
    state = tr.init_state()

    # TB writer (ref: train_render.py:229 SummaryWriter('runs/...'))
    writer = None
    try:
        from tensorboardX import SummaryWriter
        writer = SummaryWriter(
            os.path.join("runs", f"{cfg.dataset}-{cfg.add_info}"))
    except Exception:
        logging.warning("tensorboardX unavailable; skipping TB logging")

    start_epoch = 0
    if cfg.load_model:
        state, start_epoch = ckpt.restore(cfg.load_model, tr, state)
    if cfg.finetune_dir:
        state, _ = ckpt.restore(cfg.finetune_dir, tr, state,
                                weights_only=True)

    if cfg.phase == "test":
        views = range(3) if cfg.dataset == "nyu" else [0]
        for view in views:
            errs = _test_view(tr, state, cfg, view)
            print(f"view {view}: " + " ".join(f"[{e:.2f}mm]" for e in errs))
        return

    key = jax.random.PRNGKey(cfg.seed)
    best = np.inf
    real_it = _real_iter(train_ds, cfg) if cfg.train_stage != "Pretrain" else None
    for epoch in range(start_epoch, cfg.max_epoch):
        t0 = time.time()
        state, key, metrics = tr.fit_epoch(state, key, synth_iter, real_it,
                                           num_steps=steps)
        logging.info("Epoch#%d: %s (%.1fs)", epoch,
                     " ".join(f"{k}={v:.3f}" for k, v in metrics.items()),
                     time.time() - t0)
        if writer is not None:
            for k, v in metrics.items():
                writer.add_scalar(k, v, global_step=epoch)
        ckpt.save(os.path.join(run_dir, "latest"), tr, state, epoch)
        if cfg.test_during_train:
            errs = _test_view(tr, state, cfg, 0)
            mean_err = float(np.mean(errs))
            logging.info("Epoch#%d test: %.2f mm", epoch, mean_err)
            if mean_err <= best:
                best = mean_err
                ckpt.save(os.path.join(run_dir, "best"), tr, state, epoch)

    views = range(3) if cfg.dataset == "nyu" else [0]
    for view in views:
        errs = _test_view(tr, state, cfg, view)
        print(f"view {view}: " + " ".join(f"[{e:.2f}mm]" for e in errs))


def _test_view(tr, state, cfg, view):
    import jax.numpy as jnp
    from dsf_tpu.data import datasets as D
    root = os.path.join(cfg.root_dir, cfg.dataset)
    if cfg.dataset == "nyu":
        ds = D.NYUDataset(root, "test", view=view, img_size=cfg.input_size,
                          cube_size=cfg.cube_size, center_type=cfg.center_type)
    else:
        _, ds, _ = _make_datasets(cfg)

    def batches():
        for b in ds.prefetch_batches(cfg.batch_size, shuffle=False,
                                     drop_last=True):
            yield {k: jnp.asarray(v) for k, v in b.items()
                   if k in ("img", "xyz_gt", "center", "M", "cube")}

    return tr.evaluate(state, batches())
