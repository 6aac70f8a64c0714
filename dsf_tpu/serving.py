"""Production inference: load a trained model, predict world-frame hand
pose/mesh from depth, at serving-friendly latency.

The reference has no deployment path at all — its only inference is the
eval loop inside train_render.py (test_iter, :355-400).  This module
packages that capability as a standalone engine:

* one jit-compiled predict program per batch bucket (arbitrary request
  sizes are padded up to the nearest bucket — no recompiles in steady
  state, the XLA requirement for production serving);
* inputs are either pre-cropped normalized depth (the network's native
  interface) or raw depth frames (host-side crop via the parity-tested
  ``data.crop`` pipeline);
* outputs are world-frame millimetre joints (both the pixel branch and
  the MANO branch), the 779-vertex MANO mesh, and the 62-D MANO
  parameter vector — everything the reference's txt exports contain
  (train_render.py:383-398), returned as arrays;
* weights come from a native orbax run dir, a bare variables pytree, or
  a converted reference ``.pth`` checkpoint.

Example::

    eng = InferenceEngine.from_run_dir("checkpoint/nyu/<run>")
    out = eng.predict(img, center, M, cube)      # normalized crops
    out["joint_xyz_mm"]                           # (B, 21, 3) world mm

    out = eng.predict_from_depth(depth_frame)     # raw (480, 640) mm
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import numpy as np


def load_exported(path: str):
    """Load an artifact written by :meth:`InferenceEngine.export`.
    Returns ``f(img, center, M, cube) -> dict`` at the exported bucket
    size (fixed shapes — the XLA deployment contract)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())

    def call(img, center, M, cube):
        return exported.call(img, center, M, cube)

    return call


def _load_config(run_dir: str):
    """Rebuild a Config from the run dir's config.json (values are
    stringified by loop.run; parse them back by field type)."""
    import ast
    import dataclasses
    from dsf_tpu.config import Config

    with open(os.path.join(run_dir, "config.json")) as f:
        raw = json.load(f)
    kwargs = {}
    for fld in dataclasses.fields(Config):
        if fld.name not in raw:
            continue
        s = raw[fld.name]
        if not isinstance(s, str):
            kwargs[fld.name] = s
        elif isinstance(fld.default, bool):
            kwargs[fld.name] = s in ("True", "true", "1")
        elif isinstance(fld.default, tuple):
            kwargs[fld.name] = tuple(ast.literal_eval(s))
        elif isinstance(fld.default, (int, float)):
            kwargs[fld.name] = type(fld.default)(s)
        else:
            kwargs[fld.name] = s
    return Config(**kwargs)


class InferenceEngine:
    """Bucketed, jit-compiled hand-pose inference on TPU.

    Args:
      cfg: a ``dsf_tpu.config.Config`` (dataset selects camera/joint
        tables; ``compute_dtype`` selects bf16/f32 activations).
      variables: ``{"params": ..., "batch_stats": ...}`` pytree.
      mano_npz: path to the converted MANO asset (defaults to
        ``cfg.mano_model_path``).
      buckets: allowed compiled batch sizes, ascending.  Requests above
        the largest bucket are processed in chunks of it.
    """

    def __init__(self, cfg, variables, mano_npz: Optional[str] = None,
                 buckets: Sequence[int] = (1, 8, 32), mesh=None):
        import jax.numpy as jnp
        from dsf_tpu.mano import model as mano_model
        from dsf_tpu.models.backbone import ManoOCRStage
        from dsf_tpu.render import renderer as rnd
        from dsf_tpu.training.trainer import CAMERA
        from dsf_tpu.mano.constants import transfer_for_dataset

        self.cfg = cfg
        self.buckets = tuple(sorted(buckets))
        self.paras, self.img_size = CAMERA[cfg.dataset]
        mano = mano_model.load_model(mano_npz or cfg.mano_model_path)
        self.renderer = rnd.Renderer.create(
            mano, cfg.dataset, self.paras, self.img_size,
            (cfg.input_size, cfg.input_size))
        self.transfer_map = np.asarray(transfer_for_dataset(cfg.dataset))
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        if "ResNet" not in cfg.net:          # same guard as the Trainer
            raise NotImplementedError(cfg.net)
        depth = int(cfg.net.split("_")[-1])
        self.net = ManoOCRStage(joint_num=21, depth=depth,
                                refine=cfg.stage_num == 2, dtype=dtype)
        self.variables = variables
        # optional data-parallel serving: a 1-D device mesh shards each
        # bucket's batch over chips (params replicated).  cfg.num_devices
        # > 1 builds one; every bucket must then divide into it.
        if mesh is None and cfg.num_devices > 1:
            from dsf_tpu.parallel import mesh as pmesh
            mesh = pmesh.make_mesh(cfg.num_devices)
        self.mesh = mesh
        if mesh is not None:
            n = mesh.devices.size
            bad = [b for b in self.buckets if b % n]
            if bad:
                raise ValueError(
                    f"buckets {bad} not divisible by mesh size {n}")
        self._prog = None                    # jit specializes per shape

    # ------------------------------------------------------- constructors

    @classmethod
    def from_run_dir(cls, run_dir: str, which: str = "best",
                     mano_npz: Optional[str] = None,
                     buckets: Sequence[int] = (1, 8, 32)):
        """Load a natively-trained run (orbax).  ``which`` picks the
        ``best`` (val-selected, only written when test_during_train) or
        ``latest`` checkpoint, falling back best→latest; a run dir that
        is itself a checkpoint dir also works."""
        from dsf_tpu.training import checkpoints as ckpt

        cfg = _load_config(run_dir)
        candidates = [os.path.join(run_dir, which),
                      os.path.join(run_dir, "latest"), run_dir]
        for path in candidates:
            if os.path.isdir(path) and path != run_dir:
                break
        else:
            path = run_dir
        variables = ckpt.restore_variables(path)
        return cls(cfg, variables, mano_npz=mano_npz, buckets=buckets)

    @classmethod
    def from_torch_checkpoint(cls, pth: str, dataset: str = "nyu",
                              stage_num: int = 2,
                              mano_npz: str = "./MANO/mano_right.npz",
                              buckets: Sequence[int] = (1, 8, 32)):
        """Serve a converted reference checkpoint directly
        (models.torch_import; no retraining needed to migrate)."""
        from dsf_tpu.config import Config
        from dsf_tpu.models.torch_import import load_mano_ocr_stage

        cfg = Config(dataset=dataset, stage_num=stage_num, phase="test",
                     mano_model_path=mano_npz)
        variables = load_mano_ocr_stage(pth, refine=stage_num == 2)
        return cls(cfg, variables, buckets=buckets)

    # ------------------------------------------------------------ predict

    def _program(self, bucket: int = 0):
        """The jitted predict program (jax.jit specializes per batch
        shape, so ONE wrapper serves every bucket; ``bucket`` is kept
        for call-site readability only)."""
        if self._prog is not None:
            return self._prog
        import jax
        import jax.numpy as jnp
        from dsf_tpu import geometry as geo
        from dsf_tpu.ops.offset_codec import offset2joint_softmax
        from dsf_tpu.render import renderer as rnd

        cfg = self.cfg
        r = self.renderer
        tm = jnp.asarray(self.transfer_map)

        def predict(variables, img, center, M, cube):
            outputs = self.net.apply(variables, img, r, center, cube,
                                     train=False)
            out = {}
            for idx, (pixel_pd, para_pd) in enumerate(outputs):
                juvd = offset2joint_softmax(pixel_pd, img,
                                            cfg.feature_para[0])
                jxyz = geo.uvd_nl_to_xyz_nl(juvd, center, M, cube, r.paras,
                                            cfg.input_size, r.flip)
                mano_jxyz, mano_mesh = rnd.get_mesh_xyz(r, para_pd)
                half = (cube[:, None, 2:] / 2.0)
                out[f"joint_xyz_mm_{idx}"] = jxyz * half + center[:, None]
                out[f"mano_joint_xyz_mm_{idx}"] = (mano_jxyz * half
                                                   + center[:, None])
                out[f"mano_mesh_mm_{idx}"] = mano_mesh * half + center[:, None]
                out[f"mano_para_{idx}"] = para_pd
                out[f"joint_uvd_nl_{idx}"] = juvd
            last = len(outputs) - 1
            # canonical aliases: the final stage, dataset joint order
            out["joint_xyz_mm"] = out[f"joint_xyz_mm_{last}"][:, tm]
            out["mano_joint_xyz_mm"] = out[f"mano_joint_xyz_mm_{last}"][:, tm]
            return out

        self._prog = jax.jit(predict)
        return self._prog

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def predict(self, img, center, M, cube,
                as_numpy: bool = True) -> Dict[str, np.ndarray]:
        """Network-native interface: ``img`` (B, 1, S, S) normalized
        depth crops in [-1, 1], ``center`` (B, 3) xyz mm, ``M`` (B, 3, 3)
        crop matrices, ``cube`` (B, 3) mm.  Any B ≥ 1.

        ``as_numpy=False`` returns device arrays WITHOUT a host sync —
        the call is a pure async dispatch, letting callers pipeline
        requests (dispatch the next batch while the device runs this
        one) and fetch results when needed.  With the default
        ``as_numpy=True`` every call blocks on a device→host transfer,
        which on remote-attached TPUs costs a full RTT per request."""
        import jax.numpy as jnp

        img = np.asarray(img, np.float32)
        center = np.asarray(center, np.float32)
        M = np.asarray(M, np.float32)
        cube = np.asarray(cube, np.float32)
        n = img.shape[0]
        chunks = []
        i = 0
        while i < n:
            take = min(n - i, self.buckets[-1])
            bucket = self._bucket(take)
            sl = slice(i, i + take)
            pads = bucket - take
            def pad(x):
                if pads == 0:
                    return x[sl]
                return np.concatenate(
                    [x[sl], np.repeat(x[sl][-1:], pads, axis=0)])
            prog = self._program(bucket)
            args = (pad(img), pad(center), pad(M), pad(cube))
            if self.mesh is not None:
                from dsf_tpu.parallel import mesh as pmesh
                if getattr(self, "_replicated", None) is None:
                    self._replicated = pmesh.replicate(self.mesh,
                                                       self.variables)
                args = tuple(pmesh.shard_batch(self.mesh, a) for a in args)
                res = prog(self._replicated, *args)
            else:
                res = prog(self.variables, *map(jnp.asarray, args))
            if as_numpy:
                chunks.append({k: np.asarray(v)[:take]
                               for k, v in res.items()})
            else:
                chunks.append({k: v[:take] for k, v in res.items()})
            i += take
        if len(chunks) == 1:
            return chunks[0]
        cat = np.concatenate if as_numpy else jnp.concatenate
        return {k: cat([c[k] for c in chunks]) for k in chunks[0]}

    def predict_from_depth(self, depth, com_xyz=None, cube_mm=None
                           ) -> Dict[str, np.ndarray]:
        """Raw-frame interface: ``depth`` (H, W) or (B, H, W) mm.
        ``com_xyz`` (B, 3) hand center in camera mm; if None, uses the
        depth center-of-mass of the nonzero foreground (serving without
        a detector — for protocol-grade centers pass refined ones)."""
        from dsf_tpu.data import crop as C

        depth = np.asarray(depth, np.float32)
        if depth.ndim == 2:
            depth = depth[None]
        B = depth.shape[0]
        cube = np.asarray(
            cube_mm if cube_mm is not None
            else np.tile(np.asarray(self.cfg.cube_size, np.float32), (B, 1)),
            np.float32)
        if cube.ndim == 1:
            cube = np.tile(cube, (B, 1))
        if com_xyz is None:
            com_xyz = np.stack([self._com(d) for d in depth])
        com_xyz = np.asarray(com_xyz, np.float32)

        S = self.cfg.input_size
        imgs = np.empty((B, 1, S, S), np.float32)
        Ms = np.empty((B, 3, 3), np.float32)
        for i in range(B):
            com_uvd = C.joint_3d_to_img(com_xyz[i], self.paras,
                                        self.renderer.flip)
            dcrop, trans = C.crop_image_deep_pp(
                depth[i], com_uvd, cube[i].astype(np.float64), (S, S),
                self.paras)
            imgs[i, 0] = C.normalize_img(dcrop.max(), dcrop, com_xyz[i],
                                         cube[i])
            Ms[i] = trans
        return self.predict(imgs, com_xyz, Ms, cube)

    def _com(self, depth) -> np.ndarray:
        """Foreground centre of mass in camera xyz (fallback detector)."""
        from dsf_tpu.data import crop as C

        v, u = np.nonzero(depth > 0)
        if len(v) == 0:
            return np.array([0.0, 0.0, float(np.asarray(
                self.cfg.cube_size)[2])], np.float32)
        z = depth[v, u]
        com_uvd = np.array([u.mean(), v.mean(), z.mean()], np.float32)
        return C.joint_img_to_3d(com_uvd, self.paras,
                                 self.renderer.flip).astype(np.float32)

    # --------------------------------------------------------------- ops

    def export(self, path: str, bucket: Optional[int] = None) -> str:
        """Serialize one bucket's predict program (weights baked in) to
        a self-contained artifact via ``jax.export`` — deployable
        without the model code or checkpoint, loadable with
        :func:`load_exported`.  Returns the written path."""
        import jax
        import jax.numpy as jnp
        from jax import export as jexport

        b = bucket or self.buckets[-1]
        prog = self._program(b)
        var = self.variables

        def fn(img, center, M, cube):
            return prog(var, img, center, M, cube)

        S = self.cfg.input_size
        f32 = jnp.float32
        exported = jexport.export(jax.jit(fn))(
            jax.ShapeDtypeStruct((b, 1, S, S), f32),
            jax.ShapeDtypeStruct((b, 3), f32),
            jax.ShapeDtypeStruct((b, 3, 3), f32),
            jax.ShapeDtypeStruct((b, 3), f32))
        with open(path, "wb") as f:
            f.write(exported.serialize())
        return path

    def warmup(self, buckets: Optional[Sequence[int]] = None) -> None:
        """Compile all (or the given) buckets before taking traffic —
        through the production predict path, so the compiled signatures
        (incl. mesh shardings) are exactly the steady-state ones."""
        import numpy as _np
        from dsf_tpu import geometry as geo

        S = self.cfg.input_size
        for b in buckets or self.buckets:
            img = _np.zeros((b, 1, S, S), _np.float32)
            center = _np.tile([[0.0, 0.0, 750.0]], (b, 1)).astype(_np.float32)
            cube = _np.full((b, 3), float(self.cfg.cube_size[0]), _np.float32)
            com = geo.xyz_to_uvd(center, self.paras)
            M = _np.asarray(geo.crop_matrix(com, cube, self.paras, (S, S)))
            self.predict(img, center, M, cube)
