"""Pallas TPU kernel for the depth rasterizer inner loop.

The XLA scan path (ops/rasterize.py) re-reads the running min from HBM
every face chunk; this kernel keeps all per-face coefficients and the
per-pixel-tile accumulators resident in VMEM and streams face chunks
through the VPU.  Invalid (degenerate) faces are disabled by folding
-inf into their c0 coefficient — no separate mask array.

Layout: PIXELS ON LANES (u, v stored as (2, P) rows — a (P, 2) block
would pad its minor dim to 128 lanes and blow VMEM), faces on sublanes.
Grid: one program per batch element; the kernel loops pixel tiles x
face chunks evaluating three edge functions + the depth line on
(FC, TILE) blocks, reducing min/argmin over the face (sublane) axis.

Dead end, measured and removed: evaluating the 4 linear functions as
K=8 MXU dots (dot((FC,8) coeff slices, (8,TILE) [u;v;1;0..])) is WRONG
at Mosaic's default dot precision (bf16 passes flip edge signs up to 1%
of pixels -> full-depth zbuf errors) and 3.6x SLOWER at
Precision.HIGHEST (6-pass f32: 32.8ms vs 9.9ms scan at B=32/128^2/
1554f).  Coverage tests need exact f32 edge arithmetic; keep them on
the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e10
TILE = 1024          # pixels per inner tile (lane axis)
FACE_CHUNK = 256     # faces per inner step (sublane axis)


def _kernel_impl(tile, face_chunk_n, pix_ref, ke_ref, zbuf_ref, idx_ref):
    """pix (1, 2, P); ke (1, Fp, 16): per-face rows
    [a0 b0 c0 a1 b1 c1 a2 b2 c2 az bz cz 0 0 0 0]; out (1, 1, P)."""
    P = pix_ref.shape[2]
    Fp = ke_ref.shape[1]
    n_face_chunks = Fp // face_chunk_n
    n_pix_tiles = P // tile

    def pix_tile(ti, _):
        sl = pl.ds(ti * tile, tile)
        u = pix_ref[0, 0:1, sl]                  # (1, tile)
        v = pix_ref[0, 1:2, sl]

        def face_chunk(ci, carry):
            zmin, imin = carry
            s = ci * face_chunk_n
            ke = ke_ref[0, pl.ds(s, face_chunk_n), :]     # (FC, 16)
            e0 = ke[:, 0:1] * u + ke[:, 1:2] * v + ke[:, 2:3]   # (FC, tile)
            e1 = ke[:, 3:4] * u + ke[:, 4:5] * v + ke[:, 5:6]
            e2 = ke[:, 6:7] * u + ke[:, 7:8] * v + ke[:, 8:9]
            z = ke[:, 9:10] * u + ke[:, 10:11] * v + ke[:, 11:12]
            hit = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (z > 0)
            z = jnp.where(hit, z, _INF)
            cmin = jnp.min(z, axis=0, keepdims=True)      # (1, tile)
            carg = jnp.argmin(z, axis=0).reshape(1, -1).astype(jnp.int32) + s
            better = cmin < zmin
            return (jnp.where(better, cmin, zmin),
                    jnp.where(better, carg, imin))

        zmin0 = jnp.full((1, tile), _INF, jnp.float32)
        imin0 = jnp.full((1, tile), -1, jnp.int32)
        zmin, imin = jax.lax.fori_loop(0, n_face_chunks, face_chunk,
                                       (zmin0, imin0))
        bg = zmin >= _INF
        zbuf_ref[0, 0, sl] = jnp.where(bg, 0.0, zmin)[0]
        idx_ref[0, 0, sl] = jnp.where(bg, -1, imin)[0]
        return 0

    jax.lax.fori_loop(0, n_pix_tiles, pix_tile, 0)


_kernel = functools.partial(_kernel_impl, TILE, FACE_CHUNK)


TILES_PER_PROGRAM = 8


def raster_pallas_tiles(pix_tiles, ke_tiles, tsq, cap):
    """Binned raster: pix_tiles (B, 2, G*tsq) tile-major pixel positions;
    ke_tiles (B, G*cap, 16) tile-major per-tile face-coefficient rows
    (disabled rows via c0=-inf).  Grid = (B, G/TPB) with TPB tiles per
    program: whole-image ke blocks lane-pad 16 -> 128 and blow the 16MB
    VMEM budget, while one-tile programs drown in dispatch overhead
    (measured ~6us x 2048); 8 tiles/program keeps blocks ~2MB and
    dispatch ~256 programs.  Returns (zbuf (B, G*tsq), idx (B, G*tsq));
    idx local to each tile's cap-row list (-1 = background)."""
    B, _, P = pix_tiles.shape
    G = P // tsq
    assert tsq % 128 == 0 and cap % 128 == 0, (tsq, cap)
    tpb = TILES_PER_PROGRAM
    while G % tpb:
        tpb //= 2
    fc = min(FACE_CHUNK, cap)
    kernel = functools.partial(_kernel_binned, tsq, cap, fc)
    ngp = G // tpb
    zbuf, idx = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((B * ngp, 1, tpb * tsq),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((B * ngp, 1, tpb * tsq),
                                        jnp.int32)),
        grid=(B, ngp),
        in_specs=[
            pl.BlockSpec((1, 2, tpb * tsq), lambda i, g: (i, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tpb * cap, 16), lambda i, g: (i, g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, tpb * tsq),
                         lambda i, g, _n=ngp: (i * _n + g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tpb * tsq),
                         lambda i, g, _n=ngp: (i * _n + g, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(pix_tiles.astype(jnp.float32), ke_tiles.astype(jnp.float32))
    return zbuf.reshape(B, P), idx.reshape(B, P)


MOM_TILE = 512       # pixels per grid step (sublane axis of the one-hot)


def _moments_kernel(Tp, tile, upd_ref, idx_ref, out_ref):
    """One grid step: accumulate this pixel tile's per-face moments.

    upd (1, 8, tile) f32: rows [g, g*u, g*v, 0...]; idx (1, tile, 1)
    int32 hit-face ids (-1 / out-of-range = no face); out (1, 8, Tp)
    f32 accumulated over the pixel-tile grid axis.

    The one-hot is built pixels-on-SUBLANES x faces-on-LANES so the
    MXU dot is (8, tile) @ (tile, Tp): m=8 streams through the array
    in 8 cycles per (k, n) block — the transposed orientation
    (Tp, tile) @ (tile, 8) would stream m=Tp rows and is ~16x slower.
    Exactness: the 0/1 mask is exact in bf16, and the f32 cotangent
    rows are fed as a 3-way bf16 split (hi + mid + lo covers ~24
    mantissa bits), so every MXU product is exact and accumulation is
    f32 — equivalent precision to a HIGHEST f32 matmul in half the
    passes (3 vs 6)."""
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    U = upd_ref[0]                                       # (8, tile) f32
    idc = idx_ref[0]                                     # (tile, 1) int32
    iota = jax.lax.broadcasted_iota(jnp.int32, (tile, Tp), 1)
    mask = (iota == idc).astype(jnp.bfloat16)            # (tile, Tp)
    hi = U.astype(jnp.bfloat16)
    r1 = U - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)

    def dot(a):
        return jax.lax.dot_general(a, mask, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    out_ref[0] += dot(hi) + dot(mid) + dot(lo)


def face_moments_pallas(idx, upd, num_faces):
    """Per-face cotangent moments for the raster backward.

    idx: (B, P) int32 winning-face ids (-1 = background).
    upd: (B, P, 3) f32 per-pixel rows [g, g*u, g*v] (misses zeroed).
    Returns (B, num_faces, 3) f32 = sum of upd rows over each face's
    covering pixels — the same contraction as rasterize._attach_bwd's
    chunked one-hot einsum, restructured so the one-hot never leaves
    VMEM and the dot runs m=8-thin on the MXU.

    Measured on v5e (B=64, P=128^2, T=1554, trace-exclusive device
    time): 3.15 ms/iter end-to-end (kernel 2.3 + the (B,8,P) relayout
    copy 0.8) vs the XLA chunked einsum's 3.25 — a wash, so the einsum
    stays the production default (rasterize.USE_PALLAS_MOMENTS=False).
    Also measured: an m=3 variant taking (B,3,P) rows from one stack
    fusion with the iota hoisted to VMEM scratch — 3.19 ms/iter (the
    thinner dot gives back what the copy saves).  Kept (exact to
    1.5e-7 vs a float64 scatter) as the building block for a future
    fully-fused raster backward."""
    B, P = idx.shape
    tile = MOM_TILE
    Pp = ((P + tile - 1) // tile) * tile
    Tp = ((num_faces + 127) // 128) * 128
    upd8 = jnp.concatenate(
        [upd.astype(jnp.float32), jnp.zeros((B, P, 5), jnp.float32)],
        axis=-1).transpose(0, 2, 1)                      # (B, 8, P)
    if Pp != P:
        upd8 = jnp.pad(upd8, ((0, 0), (0, 0), (0, Pp - P)))
        idx = jnp.pad(idx, ((0, 0), (0, Pp - P)), constant_values=-1)
    idxc = idx[..., None]                                # (B, Pp, 1)

    out = pl.pallas_call(
        functools.partial(_moments_kernel, Tp, tile),
        out_shape=jax.ShapeDtypeStruct((B, 8, Tp), jnp.float32),
        grid=(B, Pp // tile),
        in_specs=[
            pl.BlockSpec((1, 8, tile), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, Tp), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )(upd8, idxc)
    return out[:, :3, :num_faces].transpose(0, 2, 1)     # (B, T, 3)


# --------------------------------------------------------------------------
# skip-raster: bbox-predicated face-chunk x pixel-tile kernel
# --------------------------------------------------------------------------

SKIP_TILE = 512      # pixels per tile (lane axis, 4 crop rows at 128^2)
SKIP_FC = 128        # faces per chunk (sublane axis)


def _kernel_skip_impl(tile, fc, use_mxu, flags_ref, pix_ref, ke_ref,
                      wm_ref, zbuf_ref, idx_ref, bc_ref, zscr, iscr):
    """Skip-raster kernel body.

    flags (B, NT) int32 in SMEM: bit ci of word [b, ti] says chunk ci's
    face bbox overlaps pixel-tile ti's bbox — whole (tile, chunk) blocks
    with the bit clear are skipped (the work reduction the dense kernel
    lacks).  Loop order is CHUNK-outer so the 12 per-face coefficient
    columns are lane-broadcast into VMEM scratch ONCE per chunk and
    reused by every surviving pixel tile — the dense kernel re-broadcast
    (FC, 1) columns per (tile, chunk), which profiled as its main
    overhead vs the XLA scan.  zmin/argmin accumulate in VMEM scratch
    across the whole image (one running buffer per pixel), with the
    same chunk-major `<` update and in-chunk argmin-first semantics as
    rasterize._scan_minz — results are bitwise-identical.
    """
    b = pl.program_id(0)
    P = pix_ref.shape[2]
    Fp = ke_ref.shape[1]
    nc = Fp // fc
    nt = P // tile

    zscr[...] = jnp.full(zscr.shape, _INF, jnp.float32)
    iscr[...] = jnp.full(iscr.shape, -1, jnp.int32)

    def chunk(ci, _):
        s = ci * fc
        if use_mxu:
            # (4, 4fc) [uvc0-row x (e0|e1|e2|z)-field] coefficient
            # block, pre-assembled in XLA (Mosaic can't concat slices
            # with mismatched non-concat offsets in-kernel)
            w = wm_ref[0, :, pl.ds(4 * s, 4 * fc)]
        else:
            rows = ke_ref[0, pl.ds(s, fc), :]          # (fc, 16)
            for i in range(12):
                bc_ref[i] = jnp.broadcast_to(rows[:, i:i + 1], (fc, tile))

        def tloop(ti, _):
            bit = (flags_ref[b, ti] >> ci) & 1

            @pl.when(bit != 0)
            def _():
                sl = pl.ds(ti * tile, tile)
                u = pix_ref[0, 0:1, sl]                # (1, tile)
                v = pix_ref[0, 1:2, sl]
                if use_mxu:
                    # pix rows are [u, v, 1, 0]; contract the shared
                    # sublane-4 axis: (4, 4fc)^T . (4, tile)
                    pq = pix_ref[0, :, sl]             # (4, tile)
                    ez = jax.lax.dot_general(
                        w, pq, (((0,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)  # (4fc, tile)
                    e0 = ez[0:fc]
                    e1 = ez[fc:2 * fc]
                    e2 = ez[2 * fc:3 * fc]
                    z = ez[3 * fc:4 * fc]
                else:
                    e0 = bc_ref[0] * u + bc_ref[1] * v + bc_ref[2]
                    e1 = bc_ref[3] * u + bc_ref[4] * v + bc_ref[5]
                    e2 = bc_ref[6] * u + bc_ref[7] * v + bc_ref[8]
                    z = bc_ref[9] * u + bc_ref[10] * v + bc_ref[11]
                hit = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (z > 0)
                z = jnp.where(hit, z, _INF)
                cmin = jnp.min(z, axis=0, keepdims=True)
                carg = (jnp.argmin(z, axis=0)
                        .reshape(1, -1).astype(jnp.int32) + s)
                zo = zscr[0:1, sl]
                better = cmin < zo
                zscr[0:1, sl] = jnp.where(better, cmin, zo)
                io = iscr[0:1, sl]
                iscr[0:1, sl] = jnp.where(better, carg, io)
            return 0

        jax.lax.fori_loop(0, nt, tloop, 0)
        return 0

    jax.lax.fori_loop(0, nc, chunk, 0)
    z = zscr[0:1, :]
    bg = z >= _INF
    zbuf_ref[0] = jnp.where(bg, 0.0, z)
    idx_ref[0] = jnp.where(bg, -1, iscr[0:1, :])


def _tile_major(x, H, W, bh, bw):
    """(B, H*W, C) row-major -> tile-major over (bh, bw) blocks."""
    B, C = x.shape[0], x.shape[-1]
    x = x.reshape(B, H // bh, bh, W // bw, bw, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H * W, C)


def _untile_major(x, H, W, bh, bw):
    """(B, H*W) tile-major -> row-major."""
    B = x.shape[0]
    x = x.reshape(B, H // bh, W // bw, bh, bw).transpose(0, 1, 3, 2, 4)
    return x.reshape(B, H * W)


def raster_pallas_skip(proj, pix_uv, faces, tile=SKIP_TILE, fc=SKIP_FC,
                       tile_hw=None, block=(16, 32), use_mxu=False):
    """Skip-raster: dense-exact zbuf/idx, with (pixel-tile x face-chunk)
    blocks skipped when the chunk's projected bbox misses the tile's.

    Work reduction comes free from the mesh's face-order locality:
    topologically adjacent faces (MANO numbers its faces part-by-part)
    project to nearby pixels in ANY pose, so a 128-face chunk covers a
    small screen region and most tiles skip it.  Requires
    F/fc <= 31 chunks (int32 bitmask); larger meshes fall back to the
    dense scan in the caller.

    ``tile_hw``: (H, W) row-major layout of pix_uv.  When given, pixels
    are reordered tile-major over ``block`` (bh, bw) 2-D blocks so each
    kernel tile is a compact screen rectangle instead of bh*bw/W full
    rows — a 1-D tile spans the whole crop width, so only the vertical
    bbox test can reject (measured flag density 0.42 at MANO scale);
    2-D blocks reject in both axes.
    """
    from dsf_tpu.ops.rasterize import _face_coeffs

    B, P = pix_uv.shape[0], pix_uv.shape[1]
    retile = None
    if tile_hw is not None:
        H, W = tile_hw
        bh, bw = block
        if H % bh == 0 and W % bw == 0 and P == H * W:
            tile = bh * bw
            pix_uv = _tile_major(pix_uv, H, W, bh, bw)
            retile = (H, W, bh, bw)
    a, b, c, az, bz, cz, valid, _sgn = _face_coeffs(proj, faces)
    c = c.at[..., 0].set(jnp.where(valid, c[..., 0], -_INF))

    # one-hot basis contraction -> a single fused (B, F, 16) write;
    # both the direct minor-dim stack and the quantity-major
    # stack+transpose lowered to ~14 GB/s concats (see _rows16)
    ke = _rows16(a, b, c, az, bz, cz)
    F = faces.shape[0]
    pad_f = (-F) % fc
    if pad_f:
        ke = jnp.pad(ke, ((0, 0), (0, pad_f), (0, 0)))
        far = (jnp.arange(F + pad_f) >= F)[None, :]
        ke = ke.at[:, :, 2].set(jnp.where(far, -_INF, ke[:, :, 2]))
    Fp = ke.shape[1]
    nc = Fp // fc
    assert nc <= 31, (Fp, fc)

    pad_p = (-P) % tile
    if pad_p:
        pix_uv = jnp.pad(pix_uv, ((0, 0), (0, pad_p), (0, 0)),
                         constant_values=4e9)
    Pp = pix_uv.shape[1]
    nt = Pp // tile

    # conservative (tile, chunk) bbox overlap -> per-tile chunk bitmask
    tri_uv = proj[:, faces][..., :2]                   # (B, F, 3, 2)
    fmin = tri_uv.min(2)
    fmax = jnp.where(valid[..., None], tri_uv.max(2), -4e9)
    fmin = jnp.where(valid[..., None], fmin, 4e9)
    if pad_f:
        fmin = jnp.pad(fmin, ((0, 0), (0, pad_f), (0, 0)),
                       constant_values=4e9)
        fmax = jnp.pad(fmax, ((0, 0), (0, pad_f), (0, 0)),
                       constant_values=-4e9)
    cmn = fmin.reshape(B, nc, fc, 2).min(2)            # (B, nc, 2)
    cmx = fmax.reshape(B, nc, fc, 2).max(2)
    tuv = pix_uv.reshape(B, nt, tile, 2)
    tmn = tuv.min(2)                                   # (B, nt, 2)
    tmx = tuv.max(2)
    ov = ((cmn[:, None, :, 0] <= tmx[:, :, None, 0])
          & (cmx[:, None, :, 0] >= tmn[:, :, None, 0])
          & (cmn[:, None, :, 1] <= tmx[:, :, None, 1])
          & (cmx[:, None, :, 1] >= tmn[:, :, None, 1]))   # (B, nt, nc)
    flags = (ov.astype(jnp.int32)
             << jnp.arange(nc, dtype=jnp.int32)[None, None]).sum(-1)

    pix_t = pix_uv.transpose(0, 2, 1)                  # (B, 2, Pp)
    # rows [u, v, 1, 0]: the MXU path contracts these against the
    # (a, b, c, 0) coefficient rows; the VPU path reads rows 0:1 / 1:2
    pix_t = jnp.concatenate(
        [pix_t, jnp.ones((B, 1, Pp), jnp.float32),
         jnp.zeros((B, 1, Pp), jnp.float32)], axis=1)  # (B, 4, Pp)
    if use_mxu:
        nc = Fp // fc
        fields = jnp.stack(
            [ke[..., 0:3], ke[..., 3:6], ke[..., 6:9], ke[..., 9:12]],
            axis=1).transpose(0, 1, 3, 2)              # (B, 4f, 3, Fp)
        fields = jnp.concatenate(
            [fields, jnp.zeros((B, 4, 1, Fp), jnp.float32)], axis=2)
        wmat = (fields.reshape(B, 4, 4, nc, fc)
                .transpose(0, 2, 3, 1, 4).reshape(B, 4, 4 * Fp))
    else:
        wmat = jnp.zeros((B, 4, 4 * fc), jnp.float32)  # token
    WN = wmat.shape[2]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 4, Pp), lambda bi, f: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fp, 16), lambda bi, f: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, WN), lambda bi, f: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, Pp), lambda bi, f: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Pp), lambda bi, f: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            # broadcast scratch only used by the VPU path; keep a token
            # row in MXU mode so the kernel arity stays fixed
            pltpu.VMEM((12, fc, tile) if not use_mxu else (1, 8, 128),
                       jnp.float32),
            pltpu.VMEM((1, Pp), jnp.float32),
            pltpu.VMEM((1, Pp), jnp.int32),
        ],
    )
    zbuf, idx = pl.pallas_call(
        functools.partial(_kernel_skip_impl, tile, fc, use_mxu),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((B, 1, Pp), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, Pp), jnp.int32)),
    )(flags, pix_t.astype(jnp.float32), ke, wmat)
    zbuf, idx = zbuf[:, 0, :P], idx[:, 0, :P]
    idx = jnp.where(idx >= F, -1, idx)
    if retile is not None:
        zbuf = _untile_major(zbuf, *retile)
        idx = _untile_major(idx, *retile)
    return zbuf, idx


def _rows16(a, b, c, az, bz, cz):
    """(B, F, 16) coefficient rows [a0,b0,c0,a1,b1,c1,a2,b2,c2,
    az,bz,cz,0,0,0,0] as ONE fused output write.

    A 16-way jnp.stack lowers to a minor-dim-16 concat of (B,1,F)
    slices that XLA lays out 16-in-lanes and runs at ~14 GB/s (2×
    ~0.9 ms/step in the round-5 trace, quantity-major stacking
    included); placing each quantity through an exact one-hot basis
    contraction (values multiplied by 1.0, everything else +0.0)
    lets XLA emit a single (B, F, 16) fusion instead."""
    dt = a.dtype
    Ba = jnp.zeros((3, 16), dt).at[jnp.arange(3), jnp.arange(3) * 3].set(1.0)
    Bb = jnp.zeros((3, 16), dt).at[jnp.arange(3),
                                   jnp.arange(3) * 3 + 1].set(1.0)
    Bc = jnp.zeros((3, 16), dt).at[jnp.arange(3),
                                   jnp.arange(3) * 3 + 2].set(1.0)
    e9 = jnp.zeros((16,), dt).at[9].set(1.0)
    e10 = jnp.zeros((16,), dt).at[10].set(1.0)
    e11 = jnp.zeros((16,), dt).at[11].set(1.0)
    hi = jax.lax.Precision.HIGHEST
    return (jnp.einsum("bfi,im->bfm", a, Ba, precision=hi)
            + jnp.einsum("bfi,im->bfm", b, Bb, precision=hi)
            + jnp.einsum("bfi,im->bfm", c, Bc, precision=hi)
            + az[..., None] * e9 + bz[..., None] * e10
            + cz[..., None] * e11)


def raster_pallas(proj, pix_uv, faces):
    """Rasterize with the Pallas kernel.  proj (B, V, 3); pix_uv
    (B, P, 2); faces (F, 3).  Returns (zbuf (B, P), idx (B, P))."""
    from dsf_tpu.ops.rasterize import _face_coeffs

    B, P = pix_uv.shape[0], pix_uv.shape[1]
    a, b, c, az, bz, cz, valid, _sgn = _face_coeffs(proj, faces)
    # disable invalid faces via c0 = -inf (their e0 is always negative)
    c = c.at[..., 0].set(jnp.where(valid, c[..., 0], -_INF))

    ke = _rows16(a, b, c, az, bz, cz)                     # (B, F, 16)
    F = faces.shape[0]
    pad_f = (-F) % FACE_CHUNK
    if pad_f:
        ke = jnp.pad(ke, ((0, 0), (0, pad_f), (0, 0)))
        far = (jnp.arange(F + pad_f) >= F)[None, :]
        ke = ke.at[:, :, 2].set(jnp.where(far, -_INF, ke[:, :, 2]))
    Fp = ke.shape[1]

    P_pad = ((P + TILE - 1) // TILE) * TILE
    if P_pad != P:
        pix_uv = jnp.pad(pix_uv, ((0, 0), (0, P_pad - P), (0, 0)))
    pix_t = pix_uv.transpose(0, 2, 1)                     # (B, 2, P_pad)

    zbuf, idx = pl.pallas_call(
        _kernel,
        out_shape=(jax.ShapeDtypeStruct((B, 1, P_pad), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, P_pad), jnp.int32)),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 2, P_pad), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fp, 16), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, P_pad), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P_pad), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(pix_t.astype(jnp.float32), ke)
    zbuf, idx = zbuf[:, 0], idx[:, 0]
    idx = jnp.where(idx >= F, -1, idx)
    return zbuf[:, :P], idx[:, :P]
