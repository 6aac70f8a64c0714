"""Exact point -> triangle squared distances, TPU-shaped.

Replaces the pytorch3d `_C.point_face_dist_forward/backward` CUDA kernels
the reference wraps (metric/meshLoss.py:21-223).  Two-pass design:

1. argmin pass (no gradient): finds, per point, the nearest face —
   optionally under a FACTORIZED admissibility mask: a static
   (T, K) face-to-part table plus a per-point part id, so the part-aware
   losses (JointICPLoss) reuse the SAME pass without ever materializing
   a (P x T) mask.  Runs as a Pallas kernel on TPU (see
   pallas_point_mesh.py) or a chunked XLA scan elsewhere.
2. differentiable pass: gather the 1 winning triangle per point and
   evaluate the exact point-triangle distance; gradients flow through
   the closest face only — exactly the semantics of pytorch3d's hard
   backward.

Distances are SQUARED and returned PER-POINT (the reference's
point_mesh_face_distance early-returns per-point squared distances,
meshLoss.py:266-269 — a known quirk that must be preserved).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_INF = 1e10
_CHUNK = 128


def point_tri_sqdist(p, tri):
    """Exact squared distance from points to triangles (elementwise pair).

    p: (..., 3); tri: (..., 3, 3).  Ericson/Eberly closest-point region
    analysis, fully vectorized with where().
    """
    a, b, c = tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]
    ab = b - a
    ac = c - a
    ap = p - a

    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)

    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)

    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    vc = d1 * d4 - d3 * d2
    vb = d5 * d2 - d1 * d6
    va = d3 * d6 - d5 * d4

    denom_uv = va + vb + vc

    eps = 1e-12
    v_ab = d1 / jnp.where(jnp.abs(d1 - d3) < eps, eps, d1 - d3)
    v_ac = d2 / jnp.where(jnp.abs(d2 - d6) < eps, eps, d2 - d6)
    v_bc = (d4 - d3) / jnp.where(
        jnp.abs((d4 - d3) + (d5 - d6)) < eps, eps, (d4 - d3) + (d5 - d6))

    denom = jnp.where(jnp.abs(denom_uv) < eps, eps, denom_uv)
    v_f = vb / denom
    w_f = vc / denom

    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    q = a + v_f[..., None] * ab + w_f[..., None] * ac
    q = jnp.where(on_bc[..., None], b + jnp.clip(v_bc, 0, 1)[..., None] * (c - b), q)
    q = jnp.where(on_ac[..., None], a + jnp.clip(v_ac, 0, 1)[..., None] * ac, q)
    q = jnp.where(on_ab[..., None], a + jnp.clip(v_ab, 0, 1)[..., None] * ab, q)
    q = jnp.where(in_c[..., None], c, q)
    q = jnp.where(in_b[..., None], b, q)
    q = jnp.where(in_a[..., None], a, q)

    diff = p - q
    return jnp.sum(diff * diff, -1)


def _extend_part_tables(part_mask, point_part):
    """Append an all-False part row so out-of-range point parts select
    nothing.  part_mask (T, K) bool; point_part (B, P) int (may contain
    values outside [0, K) meaning 'no part')."""
    T, K = part_mask.shape
    ext = jnp.concatenate([part_mask, jnp.zeros((T, 1), bool)], axis=1)
    pp = jnp.where((point_part >= 0) & (point_part < K), point_part, K)
    return ext, pp.astype(jnp.int32)


def _argmin_faces(points, tris, part_mask=None, point_part=None):
    """Per-point nearest-face index, chunked over faces, no gradients.

    points (B, P, 3), tris (B, T, 3, 3); optional factorized mask:
    part_mask (T, K) bool + point_part (B, P) int — face t is admissible
    for point p iff part_mask[t, point_part[p]].
    """
    B, P, _ = points.shape
    T = tris.shape[1]
    pad = (-T) % _CHUNK
    if pad:
        tris = jnp.pad(tris, ((0, 0), (0, pad), (0, 0), (0, 0)),
                       constant_values=_INF)
    Tp = tris.shape[1]
    nc = Tp // _CHUNK
    tris_c = jnp.moveaxis(tris.reshape(B, nc, _CHUNK, 3, 3), 1, 0)

    points = jax.lax.stop_gradient(points)
    tris_c = jax.lax.stop_gradient(tris_c)

    masked = part_mask is not None
    if masked:
        ext, pp = _extend_part_tables(part_mask, point_part)
        ext = jnp.pad(ext, ((0, pad), (0, 0)))          # (Tp, K+1)
        mask_c = jnp.moveaxis(ext.reshape(nc, _CHUNK, -1), 0, 0)

    def body(carry, xs):
        dmin, imin, off = carry
        if masked:
            tri_chunk, mchunk = xs                      # mchunk (CHUNK, K+1)
            allowed = mchunk.T[pp]                      # (B, P, CHUNK)
        else:
            tri_chunk = xs
            allowed = None
        d = point_tri_sqdist(points[:, :, None, :], tri_chunk[:, None, :, :, :])
        if allowed is not None:
            d = jnp.where(allowed, d, _INF)
        cmin = jnp.min(d, -1)
        carg = jnp.argmin(d, -1).astype(jnp.int32) + off
        better = cmin < dmin
        return (jnp.where(better, cmin, dmin),
                jnp.where(better, carg, imin),
                off + _CHUNK), None

    init = (jnp.full((B, P), _INF, points.dtype),
            jnp.zeros((B, P), jnp.int32), jnp.int32(0))
    xs = (tris_c, mask_c) if masked else tris_c
    (dmin, imin, _), _ = jax.lax.scan(body, init, xs)
    return dmin, imin


_SEL_CHUNK = 512


_FWD_ONEHOT = os.environ.get("DSF_SELECT_FWD", "onehot") == "onehot"
# The FORWARD gather lowers to a kCustom gather fusion that the round-5
# trace measured at 2.22 ms / ~1% HBM ([128x2048] rows of 9 floats from
# [128,1554,3,3] — TPU gathers are element-serial).  The same chunked
# one-hot MXU contraction the backward already uses selects the rows
# exactly (1.0/0.0 multiplies, zero additions) at matmul speed.
# DSF_SELECT_FWD=gather restores the plain take_along_axis.


@jax.custom_vjp
def _select_tris(tris, imin):
    """Differentiable winning-triangle selection: (B, T, 3, 3) gathered
    at (B, P) indices -> (B, P, 3, 3).

    Both directions run as chunked one-hot matmuls on the MXU instead of
    gather/scatter: measured on v5e the (B,P)->(B,T,...) scatter-add in
    the gather's transpose costs ~8ms at these shapes while the one-hot
    einsum is ~1ms (HIGHEST precision; selection of one term is exact,
    accumulation matches f32 summation order to ~2e-7).  The forward's
    one-hot selection is exact up to -0.0 -> +0.0 (value-equal)."""
    if not _FWD_ONEHOT:
        return jnp.take_along_axis(
            tris, imin[..., None, None].astype(jnp.int32), axis=1)
    B, T = tris.shape[0], tris.shape[1]
    P = imin.shape[1]
    # coordinate index m (=9) in SUBLANES, points in LANES (->bmp): a
    # ->bpm output puts m minor and XLA's dot lowering degrades the
    # same way the raster moment einsum did (dilated conv, ~1% HBM)
    tm_t = tris.reshape(B, T, 9).transpose(0, 2, 1)          # (B, 9, T)
    out = jnp.zeros((B, 9, P), tris.dtype)
    for c in range(0, T, _SEL_CHUNK):
        width = min(_SEL_CHUNK, T - c)
        onehot = (imin[:, :, None]
                  == (c + jnp.arange(width))[None, None]).astype(tris.dtype)
        out = out + jnp.einsum("bpt,bmt->bmp", onehot, tm_t[:, :, c:c + width],
                               precision=jax.lax.Precision.HIGHEST)
    return out.transpose(0, 2, 1).reshape(B, P, 3, 3)


def _select_tris_fwd(tris, imin):
    return _select_tris(tris, imin), (imin, tris.shape[1])


def _select_tris_bwd(res, g):
    imin, T = res
    B, P = imin.shape
    gm = g.reshape(B, P, 9)
    chunks = []
    for c in range(0, T, _SEL_CHUNK):
        width = min(_SEL_CHUNK, T - c)
        onehot = (imin[:, :, None]
                  == (c + jnp.arange(width))[None, None]).astype(g.dtype)
        # m (=9) in sublanes, faces in lanes (see forward)
        chunks.append(jnp.einsum("bpt,bpm->bmt", onehot, gm,
                                 precision=jax.lax.Precision.HIGHEST))
    d_tris = (jnp.concatenate(chunks, axis=2)
              .transpose(0, 2, 1).reshape(B, T, 3, 3))
    return d_tris, np.zeros(imin.shape, dtype=jax.dtypes.float0)


_select_tris.defvjp(_select_tris_fwd, _select_tris_bwd)


USE_V2_KERNEL = os.environ.get("DSF_ICP_KERNEL", "v1") == "v2"
# v2 = MXU dot products + admissibility chunk-skip bitmask over
# part-sorted faces (pallas_point_mesh.argmin_faces_pallas_v2).
# MEASURED on v5e (scripts/bench_icp.py, interleaved repeats): v1 dense
# 7.49 ms vs v2 8.25+ (7.60 with points also part-sorted — a tie at
# best; rationale in the v2 docstring).  v1 stays the default; v2
# remains for meshes where chunks outnumber parts.


def _static_part_perm(faces, part_mask):
    """Static part-sorted face permutation, or None when the mask/faces
    are traced (can't be sorted at trace time).  Sorting faces by their
    first admissible part makes the v2 kernel's chunks one-ish part
    each, which is what lets its admissibility bitmask clear bits.
    Permuting `faces` (not tris) is free: the tris gather that follows
    costs the same for any static row order."""
    try:
        m = np.asarray(part_mask)
        f = np.asarray(faces)
    except Exception:
        return None, None
    part_of_face = np.where(m.any(1), m.argmax(1), m.shape[1])
    perm = np.argsort(part_of_face, kind="stable")
    return f[perm], m[perm]


USE_CULLED_KERNEL = False  # part-sorted + sphere-bound chunk culling.
# MEASURED on v5e (2026-08-17, chained fused-ICP harness, B=32 step
# shapes): culled 43.5ms vs baseline 31.4ms — outputs match exactly,
# but the MANO chunks' bounding spheres are too fat (r_g ~0.8 in
# normalized units) so the tile-level run fraction only drops to 0.73
# (0.57 at TILE=128), and the bound/sort/gather setup plus per-chunk
# lax.cond overhead exceed the saved work.  Kept (exact, tested) for
# denser meshes where chunks are tight; off for MANO-scale ICP.


def point_face_distance(points, verts, faces, part_mask=None,
                        point_part=None, use_pallas="auto"):
    """Per-point SQUARED distance to the nearest (admissible) face.

    points (B, P, 3); verts (B, V, 3); faces (T, 3) int.
    Optional factorized admissibility: part_mask (T, K) bool +
    point_part (B, P) int.  Differentiable wrt points and verts through
    the winning face only.  use_pallas: "auto" = Pallas kernel on
    non-CPU backends, XLA scan otherwise.
    """
    if USE_V2_KERNEL and part_mask is not None:
        f2, m2 = _static_part_perm(faces, part_mask)
        if f2 is not None:
            faces, part_mask = f2, m2
    tris = verts[:, faces]                     # (B, T, 3, 3)
    imin = None
    if use_pallas in ("auto", True) and jax.default_backend() != "cpu":
        try:
            from dsf_tpu.ops import pallas_point_mesh as PPM
            fn = (PPM.argmin_faces_pallas_v2 if USE_V2_KERNEL
                  else PPM.argmin_faces_pallas_culled if USE_CULLED_KERNEL
                  else PPM.argmin_faces_pallas)
            _, imin = fn(points, tris, part_mask, point_part)
        except Exception:
            if use_pallas is True:
                raise
            imin = None
    if imin is None:
        _, imin = _argmin_faces(points, tris, part_mask, point_part)
    win = _select_tris(tris, imin.astype(jnp.int32))        # (B, P, 3, 3)
    return point_tri_sqdist(points, win)
