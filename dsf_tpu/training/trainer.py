"""Trainer: jit-compiled train/eval steps, optimizer, checkpointing.

Functional rebuild of the reference Trainer (train_render.py:38-864):
one pjit-able train step per phase (Pretrain / Finetune / FinetuneStage)
containing the full compute graph; AdamW + StepLR via optax; orbax
checkpoints; mm-error evaluation with the reference's exact joint
transfer/slicing semantics.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from dsf_tpu import geometry as geo
from dsf_tpu.config import Config
from dsf_tpu.mano import model as mano_model, transfer_for_dataset
from dsf_tpu.models.backbone import ManoOCR, ManoOCRStage
from dsf_tpu.models.cyclegan import ResnetGenerator
from dsf_tpu.ops.offset_codec import offset2joint_softmax
from dsf_tpu.parallel import mesh as pmesh
from dsf_tpu.render import renderer as rnd
from dsf_tpu.training import phases

# camera intrinsics / frame size per dataset (ref: render_loader.py
# loader __init__s; all loaders use flip=1)
CAMERA = {
    "nyu": ((588.03, 587.07, 320.0, 240.0), (640, 480)),
    "icvl": ((240.99, 240.96, 160.0, 120.0), (320, 240)),
    "msra": ((241.42, 241.42, 160.0, 120.0), (320, 240)),
    "shrec": ((463.889, 463.889, 320.0, 240.0), (640, 480)),
    "hands": ((475.065948, 475.065857, 315.944855, 245.287079), (640, 480)),
}


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def lr_schedule(cfg: Config, steps_per_epoch: int):
    """The reference's three scheduler modes (train_render.py:148-153):

    * ``step``       — StepLR(step_size epochs, gamma=0.1), stepped per
                       epoch (ref :311)
    * ``multi_step`` — MultiStepLR(milestones, 0.1), stepped per epoch
                       (ref :313); ``cfg.step_size`` may be an int (one
                       milestone) or a sequence of milestone epochs
    * ``auto``       — ReduceLROnPlateau is CONSTRUCTED but never
                       stepped in the reference (no 'auto' branch at
                       :310-313), so faithfully: constant lr
    """
    milestones = cfg.step_size
    if not isinstance(milestones, (tuple, list)):
        milestones = (milestones,)
    milestones = jnp.asarray(milestones)

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        if cfg.scheduler == "multi_step":
            return cfg.lr * (0.1 ** jnp.sum(epoch >= milestones))
        if cfg.scheduler == "auto":
            return cfg.lr
        return cfg.lr * (0.1 ** (epoch // cfg.step_size))

    return schedule


def _apply_if_finite_select(inner, max_consecutive_errors):
    """optax.apply_if_finite with the lax.cond replaced by scalar-pred
    selects.

    Semantics are identical (same ApplyIfFiniteState fields, same
    accept rule ``isfinite | notfinite_count > max``): on the accept
    path the inner update is applied unchanged; on the reject path the
    updates become zeros and the inner state is kept.  The difference
    is purely operational — the cond materializes copies of every
    param/moment tensor entering/leaving the conditional (1.3 ms /
    1.4 GB touched in the round-5 step trace), while a scalar-pred
    jnp.where fuses into the update fusions.  The inner update runs
    unconditionally; non-finite garbage it may compute on the reject
    path is discarded elementwise by the selects.
    """
    import optax._src.base as _ob
    from optax._src import numerics as _on

    inner = _ob.with_extra_args_support(inner)

    def init(params):
        return optax.ApplyIfFiniteState(
            notfinite_count=jnp.zeros([], jnp.int32),
            last_finite=jnp.array(True, jnp.bool_),
            total_notfinite=jnp.zeros([], jnp.int32),
            inner_state=inner.init(params))

    def update(updates, state, params=None, **extra_args):
        inner_state = state.inner_state
        flat = jax.tree_util.tree_leaves(updates)
        isfinite = jnp.all(
            jnp.array([jnp.all(jnp.isfinite(p)) for p in flat]))
        notfinite_count = jnp.where(
            isfinite, jnp.zeros([], jnp.int32),
            _on.safe_increment(state.notfinite_count))
        accept = jnp.logical_or(isfinite,
                                notfinite_count > max_consecutive_errors)
        new_updates, new_inner = inner.update(
            updates, inner_state, params, **extra_args)
        out_updates = jax.tree_util.tree_map(
            lambda u: jnp.where(accept, u, jnp.zeros_like(u)), new_updates)
        out_inner = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), new_inner, inner_state)
        return out_updates, optax.ApplyIfFiniteState(
            notfinite_count=notfinite_count,
            last_finite=isfinite,
            total_notfinite=jnp.where(
                isfinite, state.total_notfinite,
                _on.safe_increment(state.total_notfinite)),
            inner_state=out_inner)

    return _ob.GradientTransformationExtraArgs(init=init, update=update)


def make_optimizer(cfg: Config, steps_per_epoch: int):
    """AdamW(wd=0.01) + the configured LR scheduler
    (ref: train_render.py:102-109, 148-153)."""
    schedule = lr_schedule(cfg, steps_per_epoch)

    if cfg.opt == "adamw":
        tx = optax.adamw(schedule, weight_decay=0.01)
    elif cfg.opt == "adam":
        tx = optax.adam(schedule)
    elif cfg.opt == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(1e-4),
            optax.sgd(schedule, momentum=0.9))
    else:
        raise ValueError(cfg.opt)
    # failure detection the reference lacks (SURVEY §5): skip updates on
    # non-finite grads instead of poisoning the parameters.  The select
    # variant (default) fuses the guard into the update kernels; =cond
    # restores optax.apply_if_finite's lax.cond (1.3 ms of conditional
    # copies in the round-5 trace).
    if os.environ.get("DSF_OPT_GUARD", "select") == "select":
        tx = _apply_if_finite_select(tx, max_consecutive_errors=8)
    else:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=8)
    if os.environ.get("DSF_FLAT_OPT", "0") == "1":
        # run the (elementwise) optimizer on ONE flattened vector instead
        # of ~260 per-leaf kernels — numerically identical, fewer launches.
        # Measured on v5e (round 4): 239.4 vs 245.3 fps baseline — the
        # ravel/unravel copies of ~47M params cost more than the
        # kernel-count win, so this stays OFF by default.
        tx = optax.flatten(tx)
    return tx


@dataclasses.dataclass
class Trainer:
    cfg: Config
    mano_npz: str
    steps_per_epoch: int = 1000
    mesh: Optional[Any] = None

    def __post_init__(self):
        cfg = self.cfg
        paras, img_size = CAMERA[cfg.dataset]
        self._mano = mano_model.load_model(self.mano_npz)
        self.renderer = rnd.Renderer.create(
            self._mano, cfg.dataset, paras, img_size,
            (cfg.input_size, cfg.input_size))
        self.transfer_map = transfer_for_dataset(cfg.dataset)

        refine = cfg.stage_num == 2
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        if "ResNet" in cfg.net:
            depth = int(cfg.net.split("_")[-1])
            self.net = ManoOCRStage(joint_num=21, depth=depth, refine=refine,
                                    dtype=dtype)
            # same params/stats tree, per-group BN over a stacked
            # [synth | real] 2B batch — used by the finetune phases to
            # fuse the reference's two sequential net calls into one
            self.net2 = self.net.clone(bn_groups=2)
        else:
            raise NotImplementedError(cfg.net)

        self.transfer_net = (ResnetGenerator(dtype=dtype)
                             if cfg.transferNet_pth else None)
        self.transfer_vars = None
        if self.transfer_net is not None:
            if os.path.exists(cfg.transferNet_pth):
                if cfg.transferNet_pth.endswith(".npz"):
                    # natively-trained generator (pipelines.run_cyclegan)
                    from dsf_tpu.training.pipelines import load_variables_npz
                    self.transfer_vars = load_variables_npz(
                        cfg.transferNet_pth)
                else:
                    from dsf_tpu.models.torch_import import (
                        load_cyclegan_generator)
                    self.transfer_vars = load_cyclegan_generator(
                        cfg.transferNet_pth)
            else:
                # cost-faithful stand-in: the reference runs the frozen
                # 9-block generator on every synth image
                # (train_render.py:95-100, 639); without the checkpoint a
                # randomly-initialized frozen G keeps the step's compute
                # identical (used by bench.py / the driver entry points)
                import logging
                logging.warning("transferNet_pth %r not found; using a "
                                "randomly initialized frozen generator",
                                cfg.transferNet_pth)
                self.transfer_vars = self.transfer_net.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, 1, cfg.input_size, cfg.input_size)))

        self.tx = make_optimizer(cfg, self.steps_per_epoch)
        if self.mesh is None:
            self.mesh = pmesh.make_mesh()
        self._jit_cache: Dict[str, Any] = {}

    # ------------------------------------------------------------- init

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed if seed is None else seed)
        img = jnp.zeros((2, 1, cfg.input_size, cfg.input_size))
        center = jnp.asarray([[0.0, 0.0, 750.0]] * 2)
        cube = jnp.full((2, 3), float(cfg.cube_size[0]))
        variables = self.net.init(key, img, self.renderer, center, cube,
                                  train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats,
                           opt_state=self.tx.init(params))
        # DP: everything replicated; DP x FSDP ('fsdp' mesh axis):
        # params + optimizer moments sharded along 'fsdp' (ZeRO-3)
        return pmesh.place_state(self.mesh, state)

    # ------------------------------------------------------------ steps

    def _transfer_fn(self):
        if self.transfer_net is None or self.transfer_vars is None:
            return None
        net, var = self.transfer_net, self.transfer_vars
        return lambda img: jax.lax.stop_gradient(net.apply(var, img))

    def _loss_fn(self, phase_name):
        r = self.renderer
        cfg = self.cfg
        transfer_fn = self._transfer_fn()
        tm = self.transfer_map

        def apply_fn(variables, img, rend, center, cube, train, mutable=None,
                     **kw):
            if mutable:
                return self.net.apply(variables, img, rend, center, cube,
                                      train=train, mutable=mutable, **kw)
            return self.net.apply(variables, img, rend, center, cube,
                                  train=train, **kw)

        def apply2_fn(variables, img, rend, center, cube, train,
                      mutable=None, **kw):
            if mutable:
                return self.net2.apply(variables, img, rend, center, cube,
                                       train=train, mutable=mutable, **kw)
            return self.net2.apply(variables, img, rend, center, cube,
                                   train=train, **kw)

        if phase_name == "Pretrain":
            def fn(params, batch_stats, key, batch):
                variables = {"params": params, "batch_stats": batch_stats}
                return phases.pretrain_loss(
                    apply_fn, variables, key, batch["model_para"],
                    batch["cube_synth"], r=r, transfer_fn=transfer_fn,
                    cfg=cfg, stage_num=cfg.stage_num)
            return fn
        if phase_name == "Finetune":
            def fn(params, batch_stats, key, batch):
                variables = {"params": params, "batch_stats": batch_stats}
                return phases.finetune_loss(
                    apply_fn, variables, key, batch["model_para"],
                    batch["cube_synth"], batch["img"], batch["center"],
                    batch["cube"], batch["M"], batch["xyz_gt"],
                    r=r, transfer_fn=transfer_fn, cfg=cfg, transfer_map=tm,
                    apply2_fn=apply2_fn)
            return fn
        if phase_name == "FinetuneStage":
            def fn(params, batch_stats, key, batch):
                variables = {"params": params, "batch_stats": batch_stats}
                return phases.finetune_stage_loss(
                    apply_fn, variables, key, batch["model_para"],
                    batch["cube_synth"], batch["img"], batch["center"],
                    batch["cube"], batch["M"], batch["xyz_gt"],
                    r=r, transfer_fn=transfer_fn, cfg=cfg, transfer_map=tm,
                    apply2_fn=apply2_fn)
            return fn
        raise ValueError(phase_name)

    def train_step_fn(self, phase_name):
        """Build (and cache) the jitted train step for a phase."""
        if phase_name in self._jit_cache:
            return self._jit_cache[phase_name]
        loss_fn = self._loss_fn(phase_name)
        tx = self.tx

        mesh = self.mesh
        fsdp = "fsdp" in getattr(mesh, "axis_names", ())

        def step(state: TrainState, key, batch):
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (loss, (new_model_state, metrics)), grads = grad_fn(
                state.params, state.batch_stats, key, batch)
            if fsdp:
                # pin gradients to the parameter shardings so GSPMD
                # reduce-scatters them instead of all-reducing to a
                # replicated layout (ZeRO-3 backward)
                grads = jax.tree_util.tree_map(
                    lambda g: jax.lax.with_sharding_constraint(
                        g, pmesh.NamedSharding(mesh, pmesh.param_spec(mesh, g))),
                    grads)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_bs = new_model_state.get("batch_stats", state.batch_stats)
            metrics = dict(metrics, loss=loss)
            new_state = state.replace(step=state.step + 1, params=new_params,
                                      batch_stats=new_bs, opt_state=new_opt)
            if fsdp:
                # keep the updated state on the FSDP layout across steps
                new_state = jax.tree_util.tree_map(
                    lambda x, s: jax.lax.with_sharding_constraint(x, s),
                    new_state, pmesh.state_shardings(mesh, new_state))
            return new_state, metrics

        jitted = jax.jit(step, donate_argnums=(0,))
        self._jit_cache[phase_name] = jitted
        return jitted

    # ------------------------------------------------------------- eval

    def eval_step_fn(self):
        """Per-batch test errors (ref: Trainer.test_iter,
        train_render.py:355-400): per stage, pixel-branch and MANO-branch
        mm error on the transfer-mapped joints [:n-1]."""
        if "eval" in self._jit_cache:
            return self._jit_cache["eval"]
        cfg = self.cfg
        r = self.renderer
        tm = jnp.asarray(self.transfer_map)
        n_eval = len(self.transfer_map) - 1

        def step(params, batch_stats, batch):
            variables = {"params": params, "batch_stats": batch_stats}
            outputs = self.net.apply(variables, batch["img"], r,
                                     batch["center"], batch["cube"],
                                     train=False)
            errors = []
            results = {}
            for idx, (pixel_pd, para_pd) in enumerate(outputs):
                juvd = offset2joint_softmax(pixel_pd, batch["img"],
                                            cfg.feature_para[0])
                jxyz = geo.uvd_nl_to_xyz_nl(juvd, batch["center"], batch["M"],
                                            batch["cube"], r.paras,
                                            cfg.input_size, r.flip)
                mano_jxyz, mano_mesh = rnd.get_mesh_xyz(r, para_pd)
                # per-sample errors so callers can mask padded eval rows
                # (drop_last=False protocol — all 8,252 NYU frames count)
                e0 = phases.xyz2error_mm(jxyz[:, tm][:, :n_eval],
                                         batch["xyz_gt"][:, :n_eval],
                                         batch["center"], batch["cube"],
                                         keep_batch=True, dataset=cfg.dataset)
                e1 = phases.xyz2error_mm(mano_jxyz[:, tm][:, :n_eval],
                                         batch["xyz_gt"][:, :n_eval],
                                         batch["center"], batch["cube"],
                                         keep_batch=True, dataset=cfg.dataset)
                if cfg.dataset == "msra":
                    # MSRA's scalar mean skips the wrist (ref :852-854);
                    # keep that semantics in the per-sample reduction
                    ej0 = phases.xyz2error_mm(
                        jxyz[:, tm][:, :n_eval], batch["xyz_gt"][:, :n_eval],
                        batch["center"], batch["cube"], keep_joint=True,
                        dataset=cfg.dataset)
                    ej1 = phases.xyz2error_mm(
                        mano_jxyz[:, tm][:, :n_eval],
                        batch["xyz_gt"][:, :n_eval],
                        batch["center"], batch["cube"], keep_joint=True,
                        dataset=cfg.dataset)
                    e0, e1 = ej0[:, 1:].mean(-1), ej1[:, 1:].mean(-1)
                errors += [e0, e1]
                results[f"joint_xyz_{idx}"] = jxyz
                results[f"mano_joint_xyz_{idx}"] = mano_jxyz
                results[f"mano_mesh_{idx}"] = mano_mesh
                results[f"mano_para_{idx}"] = para_pd
            return jnp.stack(errors), results           # (2*stages, B)

        jitted = jax.jit(step)
        self._jit_cache["eval"] = jitted
        return jitted

    def evaluate(self, state: TrainState, batches: Iterator[dict]):
        step = self.eval_step_fn()
        totals, n = None, 0
        for batch in batches:
            batch = pmesh.shard_batch(self.mesh, batch)
            errors, _ = step(state.params, state.batch_stats, batch)
            errors = np.asarray(errors)                 # (2*stages, B)
            totals = errors.sum(-1) if totals is None else totals + errors.sum(-1)
            n += errors.shape[-1]
        return totals / max(n, 1)

    # -------------------------------------------------------------- fit

    def fit_epoch(self, state: TrainState, key, synth_iter, real_iter=None,
                  num_steps: Optional[int] = None, writer=None, epoch=0,
                  image_every=0):
        """One epoch.  With a TB ``writer``, logs every loss term as a
        per-iteration scalar and (every ``image_every`` steps) pose- and
        depth-overlay images — the reference logs both each iteration
        (train_render.py:259-270).  Returns the epoch-MEAN metrics."""
        cfg = self.cfg
        phase = cfg.train_stage if cfg.train_stage == "Pretrain" else (
            "Finetune" if cfg.stage_num == 1 else "FinetuneStage")
        step = self.train_step_fn(phase)
        steps = num_steps or self.steps_per_epoch
        sums: Dict[str, float] = {}
        pending = None     # (step_idx, metrics) — read one step late so
        for i in range(steps):                # the device isn't stalled
            model_para, cube_synth = next(synth_iter)
            batch = {"model_para": model_para, "cube_synth": cube_synth}
            uvd_gt = None
            if phase != "Pretrain":
                img, xyz_gt, uvd_gt, center, M, cube = next(real_iter)
                batch.update(img=img, xyz_gt=xyz_gt, center=center, M=M,
                             cube=cube)
            batch = pmesh.shard_batch(self.mesh, batch)
            key, sub = jax.random.split(key)
            state, metrics = step(state, sub, batch)

            if pending is not None:
                self._log_step(writer, epoch, steps, *pending, sums)
            pending = (i, metrics)

            if (writer is not None and image_every and phase != "Pretrain"
                    and i % image_every == 0):
                self._log_images(writer, epoch * steps + i, state, batch,
                                 uvd_gt)
        if pending is not None:
            self._log_step(writer, epoch, steps, *pending, sums)
        mean = {k: v / steps for k, v in sums.items()}
        return state, key, mean

    def _log_step(self, writer, epoch, steps, i, metrics, sums):
        vals = {k: float(v) for k, v in metrics.items()}
        for k, v in vals.items():
            sums[k] = sums.get(k, 0.0) + v
            if writer is not None:
                writer.add_scalar(k, v, global_step=epoch * steps + i)

    def _log_images(self, writer, gstep, state, batch, uvd_gt):
        """Pose-overlay + depth images (ref: add_image,
        train_render.py:262-270)."""
        import numpy as np
        from dsf_tpu.utils import vis
        from dsf_tpu.ops.offset_codec import offset2joint_softmax

        outputs = self.net.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["img"], self.renderer, batch["center"], batch["cube"],
            train=False)
        img = np.asarray(batch["img"][0, 0])
        for idx, (pixel_pd, _) in enumerate(outputs):
            juvd = offset2joint_softmax(pixel_pd[:1], batch["img"][:1],
                                        self.cfg.feature_para[0])
            writer.add_image(f"pose_pd_{idx}",
                             vis.draw_2d_pose(img, np.asarray(juvd[0])),
                             gstep, dataformats="HWC")
        if uvd_gt is not None:
            writer.add_image("pose_gt",
                             vis.draw_2d_pose(img, np.asarray(uvd_gt[0])),
                             gstep, dataformats="HWC")
        writer.add_image("depth", vis.depth_to_u8(img)[..., None], gstep,
                         dataformats="HWC")
