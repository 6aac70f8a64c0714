"""Offline dataset pre-rendering: synth depth for whole datasets.

Rebuild of the reference's render_msra/render_nyu offline tools
(render_loader.py:3205-3255): render per-frame MANO params into
full-frame synth depth images (the `synthdepth_*`/`render/` inputs the
loaders can consume).  Uses the device rasterizer in batches — orders of
magnitude faster than the reference's per-frame pytorch3d loop.
"""

from __future__ import annotations

import os

import numpy as np


def prerender_dataset(mano_npz, params_62d, out_dir, dataset="nyu",
                      batch_size=32, scale=1.0, prefix="render"):
    """params_62d: (N, 62) parameter bank; writes 16-bit PNGs of the
    rendered full-frame depth (mm)."""
    import jax
    import jax.numpy as jnp
    from dsf_tpu.mano import model as mano_model
    from dsf_tpu.ops import rasterize as R
    from dsf_tpu.training.trainer import CAMERA

    paras, (W, H) = CAMERA[dataset]
    m = mano_model.load_model(mano_npz)
    rays = R.full_frame_pixel_rays((W, H))

    @jax.jit
    def render(params):
        rot, pose, shape, cam = mano_model.split_params(params)
        verts, _ = mano_model.get_mano_vertices(m, rot, pose, shape, cam)
        z = R.rasterize_depth(verts, m.faces, rays, paras)
        return z.reshape(-1, H, W)

    os.makedirs(out_dir, exist_ok=True)
    try:
        import cv2
    except Exception:                               # pragma: no cover
        cv2 = None
    N = len(params_62d)
    for s in range(0, N, batch_size):
        chunk = np.asarray(params_62d[s:s + batch_size], np.float32)
        pad = batch_size - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.tile(chunk[-1:], (pad, 1))])
        depth = np.asarray(render(jnp.asarray(chunk)))
        for i in range(len(chunk) - pad):
            img = (depth[i] * scale).astype(np.uint16)
            path = os.path.join(out_dir, f"{prefix}_{s + i + 1:07d}.png")
            if cv2 is not None:
                cv2.imwrite(path, img)
            else:
                from PIL import Image
                Image.fromarray(img).save(path)
    return N
