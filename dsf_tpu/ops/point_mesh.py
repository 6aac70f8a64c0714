"""Exact point -> triangle squared distances, TPU-shaped.

Replaces the pytorch3d `_C.point_face_dist_forward/backward` CUDA kernels
the reference wraps (metric/meshLoss.py:21-223).  Two-pass design:

1. argmin pass (no gradient): chunked scan over faces computing, per
   point, the nearest face — optionally under a per-(face, part) mask so
   the part-aware losses (JointICPLoss) reuse the SAME pass with the
   point's segment selecting admissible faces.  Never materializes the
   full (P x T) tensor in autodiff.
2. differentiable pass: gather the 1 winning triangle per point and
   evaluate the exact point-triangle distance; gradients flow through
   the closest face only — exactly the semantics of pytorch3d's hard
   backward.

Distances are SQUARED and returned PER-POINT (the reference's
point_mesh_face_distance early-returns per-point squared distances,
meshLoss.py:266-269 — a known quirk that must be preserved).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

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

    # candidate closest points per region
    eps = 1e-12
    v_ab = d1 / jnp.where(jnp.abs(d1 - d3) < eps, eps, d1 - d3)
    v_ac = d2 / jnp.where(jnp.abs(d2 - d6) < eps, eps, d2 - d6)
    v_bc = (d4 - d3) / jnp.where(
        jnp.abs((d4 - d3) + (d5 - d6)) < eps, eps, (d4 - d3) + (d5 - d6))

    # face region barycentric
    denom = jnp.where(jnp.abs(denom_uv) < eps, eps, denom_uv)
    v_f = vb / denom
    w_f = vc / denom

    # region conditions (evaluated in order as in the scalar algorithm)
    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    q_face = a + v_f[..., None] * ab + w_f[..., None] * ac
    q = q_face
    q = jnp.where(on_bc[..., None], b + jnp.clip(v_bc, 0, 1)[..., None] * (c - b), q)
    q = jnp.where(on_ac[..., None], a + jnp.clip(v_ac, 0, 1)[..., None] * ac, q)
    q = jnp.where(on_ab[..., None], a + jnp.clip(v_ab, 0, 1)[..., None] * ab, q)
    q = jnp.where(in_c[..., None], c, q)
    q = jnp.where(in_b[..., None], b, q)
    q = jnp.where(in_a[..., None], a, q)

    diff = p - q
    return jnp.sum(diff * diff, -1)


def _argmin_faces(points, tris, face_allowed=None):
    """Per-point nearest-face index, chunked over faces, no gradients.

    points (B, P, 3), tris (B, T, 3, 3);
    face_allowed: optional (B, P, chunk-broadcastable) mask via callback —
    here simplified: (T,)-indexed bool per point computed from
    face_part_mask + point segment, passed as (B, P, T) would be too big,
    so we accept `face_mask_fn(face_slice) -> (B, P, Fc)` or None.
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

    def body(carry, xs):
        dmin, imin, off = carry
        if face_allowed is None:
            tri_chunk = xs
            allowed = None
        else:
            tri_chunk, allowed = xs            # allowed: (B, P, Fc)
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
    if face_allowed is None:
        (dmin, imin, _), _ = jax.lax.scan(body, init, tris_c)
    else:
        fa = jnp.moveaxis(
            jnp.pad(face_allowed, ((0, 0), (0, 0), (0, pad)))
            .reshape(B, P, nc, _CHUNK), 2, 0)
        (dmin, imin, _), _ = jax.lax.scan(body, init, (tris_c, fa))
    return dmin, imin


def _argmin_faces_pruned(points, tris, k, face_allowed=None):
    """Candidate-pruned nearest-face search.

    Exact point-triangle distance costs ~100 VPU flops/pair; the
    face-centroid distance is matmul-shaped (p.c on the MXU).  We rank
    faces by the LOWER BOUND (centroid distance - face radius), take the
    top-k candidates per point, and run the exact distance only on those.
    The bound makes this exact whenever the true nearest face's lower
    bound ranks within the top k — guaranteed in practice for hand
    meshes whose face radii are tiny relative to spacing; validated
    against the dense path in tests.
    """
    points = jax.lax.stop_gradient(points)
    tris = jax.lax.stop_gradient(tris)
    cent = tris.mean(axis=-2)                              # (B, T, 3)
    rad2 = jnp.max(jnp.sum((tris - cent[..., None, :]) ** 2, -1), -1)
    rad = jnp.sqrt(rad2)                                   # (B, T)

    # ||p - c||^2 = ||p||^2 - 2 p.c + ||c||^2 ; p.c on the MXU
    pc = jnp.einsum("bpk,btk->bpt", points, cent,
                    preferred_element_type=jnp.float32)
    d2 = (jnp.sum(points ** 2, -1)[..., None]
          - 2.0 * pc + jnp.sum(cent ** 2, -1)[:, None, :])
    lower = jnp.sqrt(jnp.maximum(d2, 0.0)) - rad[:, None, :]
    if face_allowed is not None:
        lower = jnp.where(face_allowed, lower, _INF)
    _, idx = jax.lax.top_k(-lower, k)                      # (B, P, k)
    cand = jnp.take_along_axis(tris[:, None], idx[..., None, None],
                               axis=2)                     # (B, P, k, 3, 3)
    d = point_tri_sqdist(points[:, :, None, :], cand)
    which = jnp.argmin(d, -1)
    return (jnp.min(d, -1),
            jnp.take_along_axis(idx, which[..., None], -1)[..., 0])


def point_face_distance(points, verts, faces, face_allowed=None,
                        prune_k: int | None = 64):
    """Per-point SQUARED distance to the nearest (allowed) face.

    points (B, P, 3); verts (B, V, 3); faces (T, 3) int;
    face_allowed: optional (B, P, T) bool of admissible faces per point.
    prune_k: use the MXU centroid-pruned search with k candidates
    (None = dense chunked scan).  Differentiable wrt points and verts
    through the winning face only.
    """
    tris = verts[:, faces]                     # (B, T, 3, 3)
    if prune_k is not None and prune_k < faces.shape[0]:
        _, imin = _argmin_faces_pruned(points, tris, prune_k, face_allowed)
    else:
        _, imin = _argmin_faces(points, tris, face_allowed)
    win = jnp.take_along_axis(
        tris, imin[..., None, None].astype(jnp.int32), axis=1)  # (B,P,3,3)
    return point_tri_sqdist(points, win)
