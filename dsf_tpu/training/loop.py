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

    if train_ds is not None and cfg.cache_depths:
        # decode-once RAM cache (uint16 when lossless): PNG decode is
        # ~88% of the augmented item cost on this host, so epochs after
        # the first run at crop+augment speed (~5x; measured in
        # docs/PERFORMANCE.md).  Bounded to half of currently-available
        # RAM so eval loaders and the device runtime keep headroom.
        try:
            avail = os.sysconf("SC_AVPHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
        except (ValueError, OSError):                 # pragma: no cover
            avail = 16 << 30
        train_ds.enable_depth_cache(max_bytes=avail // 2)

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
    import jax
    import jax.numpy as jnp

    def tup(b):
        return (jnp.asarray(b["img"]), jnp.asarray(b["xyz_gt"]),
                jnp.asarray(b["uvd_gt"]), jnp.asarray(b["center"]),
                jnp.asarray(b["M"]), jnp.asarray(b["cube"]))

    if jax.process_count() > 1:
        # multi-host: every host loads ONLY its stripe of each global
        # batch (identical permutation, disjoint slices — the union is
        # the global batch); pmesh.shard_batch assembles the global
        # array via make_array_from_process_local_data
        from dsf_tpu.parallel import distributed
        epoch = 0
        while True:
            rows = distributed.shard_dataset_indices(
                len(ds), cfg.batch_size, seed=cfg.seed + epoch)
            for row in rows:
                items = [ds[i] for i in row]
                yield tup({k: np.stack([it[k] for it in items])
                           for k in items[0]})
            epoch += 1
            if not loop:
                return
    for b in ds.prefetch_batches(cfg.batch_size, shuffle=True, loop=loop,
                                 drop_last=True):
        yield tup(b)


def run(cfg: Config):
    # multi-host bring-up when a coordinator is configured (DCN across
    # hosts, ICI within a slice — SURVEY §2.4 plan); no-op single-host
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        from dsf_tpu.parallel import distributed
        distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))

    run_dir = os.path.join(cfg.save_dir, cfg.dataset, cfg.run_name())
    os.makedirs(run_dir, exist_ok=True)
    # per-run file handler (NOT basicConfig: it is a no-op once any
    # handler exists, and force=True would close a host application's
    # handlers — the run gets its train.log without hijacking global
    # logging); detached when the run ends
    root = logging.getLogger()
    handler = logging.FileHandler(os.path.join(run_dir, "train.log"))
    handler.setFormatter(logging.Formatter("%(asctime)s %(message)s",
                                           "%Y/%m/%d %H:%M:%S"))
    handler.setLevel(logging.INFO)
    prev_level = root.level
    if root.level > logging.INFO or root.level == logging.NOTSET:
        root.setLevel(logging.INFO)
    root.addHandler(handler)
    # orbax/absl flood INFO per checkpoint write; keep train.log readable
    for noisy in ("absl", "orbax", "jax._src", "etils"):
        logging.getLogger(noisy).setLevel(logging.WARNING)
    try:
        _run(cfg, run_dir)
    finally:
        root.removeHandler(handler)
        handler.close()
        root.setLevel(prev_level)


def _run(cfg: Config, run_dir: str):
    import jax
    from dsf_tpu.training.trainer import Trainer
    from dsf_tpu.training import checkpoints as ckpt

    with open(os.path.join(run_dir, "config.json"), "w") as f:
        json.dump({k: str(v) for k, v in vars(cfg).items()}, f, indent=2)

    # snapshot the core sources into the run dir for reproducibility
    # (ref: train_render.py:78-84 copies its 5 core files)
    import shutil
    import dsf_tpu
    pkg = os.path.dirname(dsf_tpu.__file__)
    files_dir = os.path.join(run_dir, "files")
    os.makedirs(files_dir, exist_ok=True)
    for rel in ("training/phases.py", "training/trainer.py", "config.py",
                "models/backbone.py", "render/renderer.py",
                "mano/model.py", "ops/rasterize.py"):
        src = os.path.join(pkg, rel)
        if os.path.exists(src):
            shutil.copyfile(src, os.path.join(files_dir,
                                              rel.replace("/", "_")))

    train_ds, test_ds, synth_iter = _make_datasets(cfg)
    steps = (len(train_ds) // cfg.batch_size if train_ds is not None
             else 1000)
    mesh = None
    if cfg.n_fsdp > 1:
        from dsf_tpu.parallel import mesh as pmesh
        mesh = pmesh.make_mesh(n_fsdp=cfg.n_fsdp)
    tr = Trainer(cfg, cfg.mano_model_path, steps_per_epoch=steps, mesh=mesh)
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
            errs = _test_view(tr, state, cfg, view, run_dir)
            print(f"view {view}: " + " ".join(f"[{e:.2f}mm]" for e in errs))
        return

    key = jax.random.PRNGKey(cfg.seed)
    best = np.inf
    real_it = _real_iter(train_ds, cfg) if cfg.train_stage != "Pretrain" else None
    for epoch in range(start_epoch, cfg.max_epoch):
        t0 = time.time()
        state, key, metrics = tr.fit_epoch(
            state, key, synth_iter, real_it, num_steps=steps, writer=writer,
            epoch=epoch, image_every=cfg.image_every)
        logging.info("Epoch#%d: %s (%.1fs)", epoch,
                     " ".join(f"{k}={v:.3f}" for k, v in metrics.items()),
                     time.time() - t0)
        if writer is not None:
            for k, v in metrics.items():
                writer.add_scalar(f"epoch/{k}", v, global_step=epoch)
        ckpt.save(os.path.join(run_dir, "latest"), tr, state, epoch)
        if cfg.test_during_train:
            errs = _test_view(tr, state, cfg, 0)
            mean_err = float(np.mean(errs))
            logging.info("Epoch#%d test: %.2f mm", epoch, mean_err)
            if mean_err <= best:
                best = mean_err
                ckpt.save(os.path.join(run_dir, "best"), tr, state, epoch)

    ckpt.wait_until_finished()      # saves are async; drain before eval
    views = range(3) if cfg.dataset == "nyu" else [0]
    for view in views:
        errs = _test_view(tr, state, cfg, view, run_dir)
        print(f"view {view}: " + " ".join(f"[{e:.2f}mm]" for e in errs))


def _test_view(tr, state, cfg, view, run_dir=None):
    """Evaluate one view; optionally export result/mesh/MANO txt files
    (ref: test exports, train_render.py:320-325, 383-398)."""
    import jax.numpy as jnp
    from dsf_tpu.data import datasets as D
    from dsf_tpu.data import crop as C
    root = os.path.join(cfg.root_dir, cfg.dataset)
    if cfg.dataset == "nyu":
        ds = D.NYUDataset(root, "test", view=view, img_size=cfg.input_size,
                          cube_size=cfg.cube_size, center_type=cfg.center_type)
    else:
        _, ds, _ = _make_datasets(cfg)

    export = run_dir is not None and (cfg.save_result or cfg.save_mesh
                                      or cfg.save_obj)
    files = {}
    if export:
        # reference file set (train_render.py:320-325): result_{i}_{view}
        # for i in 0..2S-1 (only 0 and 1 are written — the save block sits
        # outside the stage loop and uses the LAST stage's outputs), plus
        # MANO/mesh/coll files named with index 2S-1.
        s = cfg.stage_num * 2 - 1
        if cfg.save_obj:
            os.makedirs(os.path.join(run_dir, "obj"), exist_ok=True)
        if cfg.save_result:
            for i in range(cfg.stage_num * 2):
                files[f"r{i}"] = open(
                    os.path.join(run_dir, f"result_{i}_{view}.txt"), "w")
        if cfg.save_mesh:
            files["mesh"] = open(
                os.path.join(run_dir, f"mesh_result_{s}_{view}.txt"), "w")
            files["mano"] = open(
                os.path.join(run_dir, f"MANO_result_{s}_{view}.txt"), "w")
            files["coll"] = open(
                os.path.join(run_dir, f"coll_{s}_{view}.txt"), "w")

    step = tr.eval_step_fn()
    totals, n = None, 0
    from dsf_tpu.parallel import mesh as pmesh
    # drop_last=False + pad-and-mask: the reference's test DataLoader keeps
    # the tail batch (train_render.py:332, default drop_last=False) and the
    # NYU protocol expects all 8,252 export rows per view.  The step runs
    # at a fixed batch size (one compiled graph); short tails are padded by
    # repeating the last row and masked out of errors/exports.
    for b in ds.prefetch_batches(cfg.batch_size, shuffle=False,
                                 drop_last=False):
        valid = len(b["img"])
        if valid < cfg.batch_size:
            pad = cfg.batch_size - valid
            b = {k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                 for k, v in b.items()}
        batch = {k: jnp.asarray(v) for k, v in b.items()
                 if k in ("img", "xyz_gt", "center", "M", "cube")}
        batch = pmesh.shard_batch(tr.mesh, batch)
        errors, results = step(state.params, state.batch_stats, batch)
        errors = np.asarray(errors)[:, :valid]          # (2*stages, valid)
        totals = errors.sum(-1) if totals is None else totals + errors.sum(-1)
        n += valid
        if export:
            center = np.asarray(batch["center"])[:valid, None]
            cube = np.asarray(batch["cube"])[:valid, None]
            last = cfg.stage_num - 1
            if cfg.save_result:
                for key, fh in (("joint_xyz_%d" % last, files["r0"]),
                                ("mano_joint_xyz_%d" % last, files["r1"])):
                    world = np.asarray(results[key])[:valid] * cube / 2 + center
                    uvd = C.joint_3d_to_img(world, ds.paras, ds.flip)
                    if cfg.dataset == "icvl":
                        # ICVL exports un-flip u (ref train_render.py:857-860)
                        uvd[:, :, 0] = ds.ori_img_size[0] - uvd[:, :, 0]
                    np.savetxt(fh, uvd.reshape(valid, -1), fmt="%.3f")
            if cfg.save_mesh:
                mesh_world = (np.asarray(results[f"mano_mesh_{last}"])[:valid]
                              * cube / 2 + center)
                np.savetxt(files["mesh"], mesh_world.reshape(valid, -1),
                           fmt="%.3f")
                np.savetxt(files["mano"],
                           np.asarray(results[f"mano_para_{last}"])[:valid],
                           fmt="%.3f")
            if cfg.save_obj:
                # per-sample .obj dumps (ref train_render.py:391-393)
                from dsf_tpu.utils.vis import save_obj
                mesh_world = (np.asarray(results[f"mano_mesh_{last}"])[:valid]
                              * cube / 2 + center)
                faces = np.asarray(tr.renderer.mano.faces)
                batch_index = (n - valid) // cfg.batch_size
                for bi in range(mesh_world.shape[0]):
                    save_obj(os.path.join(
                        run_dir, "obj", f"{view}_{batch_index}_{bi}.obj"),
                        mesh_world[bi], faces)
    for fh in files.values():
        fh.close()
    return totals / max(n, 1)
