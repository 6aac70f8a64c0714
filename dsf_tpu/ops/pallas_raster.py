"""Pallas TPU kernel for the depth rasterizer inner loop.

The XLA scan path (ops/rasterize.py) re-reads the running min from HBM
every face chunk; this kernel keeps all per-face coefficients and the
per-pixel-tile accumulators resident in VMEM and streams face chunks
through the VPU.  Invalid (degenerate) faces are disabled by folding
-inf into their c0 coefficient — no separate mask array.

Grid: one program per batch element (all coefficients for one mesh fit
easily in VMEM: 12 x F floats ~ 80 KB).  The kernel loops pixel tiles x
face chunks, evaluating three edge functions + the depth line on
(TILE, FC) vector blocks and folding a running (zmin, argmin) pair.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e10
TILE = 2048          # pixels per inner tile
FACE_CHUNK = 256     # faces per inner step


def _kernel(pix_ref, ke_ref, kz_ref, zbuf_ref, idx_ref):
    """pix (1, P, 2); ke (1, 9, Fp); kz (1, 3, Fp); out (1, P) f32/i32."""
    P = pix_ref.shape[1]
    Fp = ke_ref.shape[2]
    n_face_chunks = Fp // FACE_CHUNK
    n_pix_tiles = P // TILE

    def pix_tile(ti, _):
        u = pix_ref[0, pl.ds(ti * TILE, TILE), 0:1]       # (TILE, 1)
        v = pix_ref[0, pl.ds(ti * TILE, TILE), 1:2]

        def face_chunk(ci, carry):
            zmin, imin = carry
            s = ci * FACE_CHUNK
            ke = ke_ref[0, :, pl.ds(s, FACE_CHUNK)]       # (9, FC)
            kz = kz_ref[0, :, pl.ds(s, FACE_CHUNK)]       # (3, FC)
            e0 = u * ke[0:1] + v * ke[1:2] + ke[2:3]      # (TILE, FC)
            e1 = u * ke[3:4] + v * ke[4:5] + ke[5:6]
            e2 = u * ke[6:7] + v * ke[7:8] + ke[8:9]
            z = u * kz[0:1] + v * kz[1:2] + kz[2:3]
            hit = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (z > 0)
            z = jnp.where(hit, z, _INF)
            cmin = jnp.min(z, axis=1, keepdims=True)
            carg = jnp.argmin(z, axis=1).reshape(-1, 1).astype(jnp.int32) + s
            better = cmin < zmin
            return (jnp.where(better, cmin, zmin),
                    jnp.where(better, carg, imin))

        zmin0 = jnp.full((TILE, 1), _INF, jnp.float32)
        imin0 = jnp.full((TILE, 1), -1, jnp.int32)
        zmin, imin = jax.lax.fori_loop(0, n_face_chunks, face_chunk,
                                       (zmin0, imin0))
        bg = zmin >= _INF
        zbuf_ref[0, pl.ds(ti * TILE, TILE)] = jnp.where(bg, 0.0, zmin)[:, 0]
        idx_ref[0, pl.ds(ti * TILE, TILE)] = jnp.where(bg, -1, imin)[:, 0]
        return 0

    jax.lax.fori_loop(0, n_pix_tiles, pix_tile, 0)


def raster_pallas(proj, pix_uv, faces):
    """Rasterize with the Pallas kernel.  proj (B, V, 3); pix_uv
    (B, P, 2); faces (F, 3).  Returns (zbuf (B, P), idx (B, P))."""
    from dsf_tpu.ops.rasterize import _face_coeffs, _pad_to_multiple

    B, P = pix_uv.shape[0], pix_uv.shape[1]
    a, b, c, az, bz, cz, valid = _face_coeffs(proj, faces)
    # disable invalid faces via c0 = -inf (their e0 is always negative)
    c = c.at[..., 0].set(jnp.where(valid, c[..., 0], -_INF))

    ke = jnp.stack([a[..., 0], b[..., 0], c[..., 0],
                    a[..., 1], b[..., 1], c[..., 1],
                    a[..., 2], b[..., 2], c[..., 2]], axis=1)   # (B, 9, F)
    kz = jnp.stack([az, bz, cz], axis=1)                        # (B, 3, F)
    ke = _pad_to_multiple(ke, 2, FACE_CHUNK, 0.0)
    F = faces.shape[0]
    Fp = ke.shape[2]
    if Fp != F:
        pad_mask = jnp.arange(Fp) >= F
        ke = ke.at[:, 2, :].set(jnp.where(pad_mask, -_INF, ke[:, 2, :]))
    kz = _pad_to_multiple(kz, 2, FACE_CHUNK, 0.0)

    P_pad = ((P + TILE - 1) // TILE) * TILE
    if P_pad != P:
        pix_uv = jnp.pad(pix_uv, ((0, 0), (0, P_pad - P), (0, 0)))

    zbuf, idx = pl.pallas_call(
        _kernel,
        out_shape=(jax.ShapeDtypeStruct((B, P_pad), jnp.float32),
                   jax.ShapeDtypeStruct((B, P_pad), jnp.int32)),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P_pad, 2), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, Fp), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Fp), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, P_pad), lambda bi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_pad), lambda bi: (bi, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(pix_uv.astype(jnp.float32), ke, kz)
    idx = jnp.where(idx >= F, -1, idx)
    return zbuf[:, :P], idx[:, :P]
