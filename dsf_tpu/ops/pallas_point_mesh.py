"""Pallas TPU kernel: nearest-face argmin for point->mesh distances.

Exact point-triangle distance via a restructured closest-point region
analysis that needs only THREE per-pair dot products (s1 = ab.p,
s2 = ac.p, pa = a.p); all other Ericson terms are per-face constants
(d3 = d1 - ab.ab etc.), precomputed once in XLA and kept VMEM-resident:

    16 floats/face: a(3) ab(3) ac(3) ab.a ac.a ab.b ac.b ab.c ac.c a.a
(single-subtraction Ericson terms d_k = s_i - const: avoids the
catastrophic cancellation a chained d3 = d1 - ab.ab form would have)

The kernel streams face chunks against point tiles on the VPU and keeps
the running (min, argmin) in registers/VMEM — the XLA scan path spills
the carry to HBM each chunk.  The part-admissibility mask is factorized:
a per-point one-hot (K+1) times a (K+1, T) face-part table — an (8,128)
matmul per block instead of a (P, T) mask in memory.

Returns the argmin only (stop-gradient); the differentiable distance is
re-evaluated on the winning face outside (see point_mesh.py).

Precondition: faces must be non-degenerate (distinct vertices, nonzero
area), as in any real MANO mesh.  For exactly-degenerate faces the FMA
residue of the region determinants (d1*d4 - d3*d2 with d1==d2, d3==d4)
can flip a region test and misclassify the closest point; well-formed
faces only see this at region boundaries where the distance field is
continuous, so the argmin error is O(eps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e10
TILE = 512           # points per inner tile
FACE_CHUNK = 128     # faces per inner step
_EPS = 1e-12


MASK_W = 32          # one-hot width for the part table (<=31 parts)


def _region_sqdist(fc, s1, s2, pa, pn, pp):
    """Divide-free per-region squared distance given the three per-pair
    dot products (s1 = ab.p, s2 = ac.p, pa = a.p), the plane dot
    pn = n.p, the per-point squared norm pp = p.p, and the 27-row
    per-face constant block ``fc`` (see _face_constants27).  Shared by
    the dense and skip kernels — the math is the body documented on
    _kernel."""
    ab_a, ac_a = fc[12:13], fc[13:14]
    ab_b, ac_b = fc[14:15], fc[15:16]
    ab_c, ac_c = fc[16:17], fc[17:18]
    aa, bb, cc = fc[18:19], fc[19:20], fc[20:21]
    inv_abab, inv_acac, inv_bcbc = fc[21:22], fc[22:23], fc[23:24]
    bc_b, n_a, inv_nn = fc[24:25], fc[25:26], fc[26:27]

    d1 = s1 - ab_a
    d2 = s2 - ac_a
    d3 = s1 - ab_b
    d4 = s2 - ac_b
    d5 = s1 - ab_c
    d6 = s2 - ac_c

    vc = d1 * d4 - d3 * d2
    vb = d5 * d2 - d1 * d6
    va = d3 * d6 - d5 * d4

    dA = pp - 2.0 * pa + aa
    dB = pp - 2.0 * (pa + s1) + bb               # p.b = p.a + ab.p
    dC = pp - 2.0 * (pa + s2) + cc
    e_bc = (s2 - s1) - bc_b                      # bc.(p - b)

    dpn = pn - n_a
    d = dpn * dpn * inv_nn                       # face interior
    d = jnp.where((va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0),
                  dB - e_bc * e_bc * inv_bcbc, d)
    d = jnp.where((vb <= 0) & (d2 >= 0) & (d6 <= 0),
                  dA - d2 * d2 * inv_acac, d)
    d = jnp.where((vc <= 0) & (d1 >= 0) & (d3 <= 0),
                  dA - d1 * d1 * inv_abab, d)
    d = jnp.where((d6 >= 0) & (d5 <= d6), dC, d)
    d = jnp.where((d3 >= 0) & (d4 <= d3), dB, d)
    d = jnp.where((d1 <= 0) & (d2 <= 0), dA, d)
    return jnp.maximum(d, 0.0)


def _kernel(masked, p_ref, fc_ref, oh_ref, pm_ref, dmin_ref, imin_ref):
    """Divide-free distance evaluation.

    p (1, P, 4) = [x y z p.p]; fc (1, 27, Tp) per-face constants (see
    _face_constants27); oh (1, P, MASK_W) one-hot; pm (MASK_W, Tp)
    face-part table; out dmin/imin (1, 1, P).

    Instead of solving for the barycentric closest point (the Ericson
    form needs ~5 VPU divides + clips per pair — divides are the
    per-pair cost ceiling), each Voronoi region's squared distance has
    a closed divide-free form given per-face reciprocals precomputed in
    XLA:
      vertex  A/B/C:  p.p - 2 p.v + v.v
      edge    e=(u,v): |p-u|^2 - (e.(p-u))^2 / |e|^2   (region keeps the
              projection parameter in [0,1], so no clamp is needed)
      face    : (n.(p-a))^2 / |n|^2
    The region tests are the same sign tests as the Ericson form."""
    P = p_ref.shape[1]
    Tp = fc_ref.shape[2]
    n_pt = P // TILE
    n_fc = Tp // FACE_CHUNK

    def pix_tile(ti, _):
        sl = pl.ds(ti * TILE, TILE)
        px = p_ref[0, sl, 0:1]                  # (TILE, 1)
        py = p_ref[0, sl, 1:2]
        pz = p_ref[0, sl, 2:3]
        pp = p_ref[0, sl, 3:4]
        if masked:
            oh = oh_ref[0, sl, :]               # (TILE, MASK_W)

        def face_chunk(ci, carry):
            dmin, imin = carry
            s = ci * FACE_CHUNK
            fc = fc_ref[0, :, pl.ds(s, FACE_CHUNK)]     # (27, FC)
            ax, ay, az = fc[0:1], fc[1:2], fc[2:3]
            abx, aby, abz = fc[3:4], fc[4:5], fc[5:6]
            acx, acy, acz = fc[6:7], fc[7:8], fc[8:9]
            nx, ny, nz = fc[9:10], fc[10:11], fc[11:12]

            s1 = px * abx + py * aby + pz * abz          # ab . p
            s2 = px * acx + py * acy + pz * acz          # ac . p
            pa = px * ax + py * ay + pz * az             # a . p
            pn = px * nx + py * ny + pz * nz             # n . p

            d = _region_sqdist(fc, s1, s2, pa, pn, pp)
            if masked:
                allowed = jax.lax.dot_general(
                    oh, pm_ref[:, pl.ds(s, FACE_CHUNK)],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (TILE, FC)
                d = jnp.where(allowed > 0.5, d, _INF)

            cmin = jnp.min(d, axis=1, keepdims=True)
            carg = jnp.argmin(d, axis=1).reshape(-1, 1).astype(jnp.int32) + s
            better = cmin < dmin
            return (jnp.where(better, cmin, dmin),
                    jnp.where(better, carg, imin))

        d0 = jnp.full((TILE, 1), _INF, jnp.float32)
        i0 = jnp.zeros((TILE, 1), jnp.int32)
        dmin, imin = jax.lax.fori_loop(0, n_fc, face_chunk, (d0, i0))
        dmin_ref[0, 0, sl] = dmin[:, 0]
        imin_ref[0, 0, sl] = imin[:, 0]
        return 0

    jax.lax.fori_loop(0, n_pt, pix_tile, 0)


def _face_constants(tris):
    """(B, T, 3, 3) -> (B, 16, T) constants for the culled kernel."""
    a = tris[..., 0, :]
    b = tris[..., 1, :]
    c = tris[..., 2, :]
    ab = b - a
    ac = c - a
    rows = [a[..., 0], a[..., 1], a[..., 2],
            ab[..., 0], ab[..., 1], ab[..., 2],
            ac[..., 0], ac[..., 1], ac[..., 2],
            jnp.sum(ab * a, -1), jnp.sum(ac * a, -1),
            jnp.sum(ab * b, -1), jnp.sum(ac * b, -1),
            jnp.sum(ab * c, -1), jnp.sum(ac * c, -1),
            jnp.sum(a * a, -1)]
    return jnp.stack(rows, axis=1)                      # (B, 16, T)


def _face_constants27(tris):
    """(B, T, 3, 3) -> (B, 27, T) constants for the divide-free kernel.

    Rows: a(3) ab(3) ac(3) n(3) | ab.a ac.a ab.b ac.b ab.c ac.c |
    a.a b.b c.c | 1/ab.ab 1/ac.ac 1/bc.bc | bc.b n.a 1/n.n.
    Requires non-degenerate faces (nonzero edge lengths and area)."""
    a = tris[..., 0, :]
    b = tris[..., 1, :]
    c = tris[..., 2, :]
    ab = b - a
    ac = c - a
    bc = c - b
    n = jnp.cross(ab, ac)
    rows = [a[..., 0], a[..., 1], a[..., 2],
            ab[..., 0], ab[..., 1], ab[..., 2],
            ac[..., 0], ac[..., 1], ac[..., 2],
            n[..., 0], n[..., 1], n[..., 2],
            jnp.sum(ab * a, -1), jnp.sum(ac * a, -1),
            jnp.sum(ab * b, -1), jnp.sum(ac * b, -1),
            jnp.sum(ab * c, -1), jnp.sum(ac * c, -1),
            jnp.sum(a * a, -1), jnp.sum(b * b, -1), jnp.sum(c * c, -1),
            1.0 / jnp.sum(ab * ab, -1), 1.0 / jnp.sum(ac * ac, -1),
            1.0 / jnp.sum(bc * bc, -1),
            jnp.sum(bc * b, -1), jnp.sum(n * a, -1),
            1.0 / jnp.maximum(jnp.sum(n * n, -1), _EPS)]
    return jnp.stack(rows, axis=1)                      # (B, 27, T)


def _kernel_culled(masked, p_ref, fc_ref, oh_ref, pm_ref, run_ref,
                   dmin_ref, imin_ref):
    """Like _kernel, but skips (point-tile, face-chunk) pairs whose
    run_ref entry is 0 — the caller proves (admissibility + triangle
    distance bounds) that no point in the tile can have its nearest
    admissible face there, so the skip is exact."""
    P = p_ref.shape[1]
    Tp = fc_ref.shape[2]
    n_pt = P // TILE
    n_fc = Tp // FACE_CHUNK

    def pix_tile(ti, _):
        sl = pl.ds(ti * TILE, TILE)
        px = p_ref[0, sl, 0:1]
        py = p_ref[0, sl, 1:2]
        pz = p_ref[0, sl, 2:3]
        pp = p_ref[0, sl, 3:4]
        if masked:
            oh = oh_ref[0, sl, :]

        def face_chunk(ci, carry):
            def do(carry):
                dmin, imin = carry
                s = ci * FACE_CHUNK
                fc = fc_ref[0, :, pl.ds(s, FACE_CHUNK)]
                ax, ay, az = fc[0:1], fc[1:2], fc[2:3]
                abx, aby, abz = fc[3:4], fc[4:5], fc[5:6]
                acx, acy, acz = fc[6:7], fc[7:8], fc[8:9]
                ab_a, ac_a = fc[9:10], fc[10:11]
                ab_b, ac_b = fc[11:12], fc[12:13]
                ab_c, ac_c = fc[13:14], fc[14:15]
                aa = fc[15:16]
                abab = ab_b - ab_a
                acac = ac_c - ac_a
                abac = ac_b - ac_a

                s1 = px * abx + py * aby + pz * abz
                s2 = px * acx + py * acy + pz * acz
                pa = px * ax + py * ay + pz * az

                d1 = s1 - ab_a
                d2 = s2 - ac_a
                d3 = s1 - ab_b
                d4 = s2 - ac_b
                d5 = s1 - ab_c
                d6 = s2 - ac_c

                vc = d1 * d4 - d3 * d2
                vb = d5 * d2 - d1 * d6
                va = d3 * d6 - d5 * d4
                den = va + vb + vc

                def safe_div(n, d):
                    return n / jnp.where(jnp.abs(d) < _EPS, _EPS, d)

                v = safe_div(vb, den)
                w = safe_div(vc, den)
                t_bc = jnp.clip(safe_div(d4 - d3, (d4 - d3) + (d5 - d6)),
                                0., 1.)
                on_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)
                v = jnp.where(on_bc, 1.0 - t_bc, v)
                w = jnp.where(on_bc, t_bc, w)
                on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
                v = jnp.where(on_ac, 0.0, v)
                w = jnp.where(on_ac, jnp.clip(safe_div(d2, d2 - d6), 0., 1.),
                              w)
                on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
                v = jnp.where(on_ab, jnp.clip(safe_div(d1, d1 - d3), 0., 1.),
                              v)
                w = jnp.where(on_ab, 0.0, w)
                in_c = (d6 >= 0) & (d5 <= d6)
                v = jnp.where(in_c, 0.0, v)
                w = jnp.where(in_c, 1.0, w)
                in_b = (d3 >= 0) & (d4 <= d3)
                v = jnp.where(in_b, 1.0, v)
                w = jnp.where(in_b, 0.0, w)
                in_a = (d1 <= 0) & (d2 <= 0)
                v = jnp.where(in_a, 0.0, v)
                w = jnp.where(in_a, 0.0, w)

                qq = (aa + v * (2.0 * ab_a + v * abab)
                      + w * (2.0 * ac_a + w * acac) + 2.0 * v * w * abac)
                d = pp - 2.0 * (pa + v * s1 + w * s2) + qq
                d = jnp.maximum(d, 0.0)
                if masked:
                    allowed = jax.lax.dot_general(
                        oh, pm_ref[:, pl.ds(s, FACE_CHUNK)],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    d = jnp.where(allowed > 0.5, d, _INF)

                cmin = jnp.min(d, axis=1, keepdims=True)
                carg = jnp.argmin(d, axis=1).reshape(-1, 1).astype(
                    jnp.int32) + s
                better = cmin < dmin
                return (jnp.where(better, cmin, dmin),
                        jnp.where(better, carg, imin))

            return jax.lax.cond(run_ref[0, ti, ci] > 0, do,
                                lambda c: c, carry)

        d0 = jnp.full((TILE, 1), _INF, jnp.float32)
        i0 = jnp.zeros((TILE, 1), jnp.int32)
        dmin, imin = jax.lax.fori_loop(0, n_fc, face_chunk, (d0, i0))
        dmin_ref[0, 0, sl] = dmin[:, 0]
        imin_ref[0, 0, sl] = imin[:, 0]
        return 0

    jax.lax.fori_loop(0, n_pt, pix_tile, 0)


def argmin_faces_pallas(points, tris, part_mask=None, point_part=None):
    """points (B, P, 3); tris (B, T, 3, 3); optional factorized mask.
    Returns (dmin (B, P), imin (B, P)) with gradients stopped."""
    points = jax.lax.stop_gradient(points)
    tris = jax.lax.stop_gradient(tris)
    B, P, _ = points.shape
    T = tris.shape[1]

    pad_f = (-T) % FACE_CHUNK
    if pad_f:
        # pad with real far-away tiny triangles so every divide-free
        # constant stays finite; at 1e4 units out they can never win
        far_tri = jnp.asarray(
            [[1e4, 1e4, 1e4], [1e4 + 1, 1e4, 1e4], [1e4, 1e4 + 1, 1e4]],
            tris.dtype)
        tris = jnp.concatenate(
            [tris, jnp.broadcast_to(far_tri, (B, pad_f, 3, 3))], axis=1)
    fc = _face_constants27(tris)
    Tp = fc.shape[2]

    pp = jnp.sum(points * points, -1, keepdims=True)
    p4 = jnp.concatenate([points, pp], axis=-1)         # (B, P, 4)
    pad_p = (-P) % TILE
    if pad_p:
        p4 = jnp.pad(p4, ((0, 0), (0, pad_p), (0, 0)))
    Pp = p4.shape[1]

    masked = part_mask is not None
    if masked:
        K = part_mask.shape[1]
        assert K <= MASK_W - 1, f"at most {MASK_W - 1} parts supported"
        ext = jnp.concatenate(
            [part_mask.astype(jnp.float32),
             jnp.zeros((T, MASK_W - K), jnp.float32)], axis=1)  # (T, MASK_W)
        pm = jnp.pad(ext, ((0, pad_f), (0, 0))).T            # (MASK_W, Tp)
        ppart = jnp.where((point_part >= 0) & (point_part < K),
                          point_part, K).astype(jnp.int32)
        oh = jax.nn.one_hot(ppart, MASK_W, dtype=jnp.float32)
        if pad_p:
            oh = jnp.pad(oh, ((0, 0), (0, pad_p), (0, 0)))
    else:
        pm = jnp.zeros((MASK_W, Tp), jnp.float32)
        oh = jnp.zeros((B, 1, MASK_W), jnp.float32)          # dummy

    oh_P = oh.shape[1]
    kernel = functools.partial(_kernel, masked)
    dmin, imin = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((B, 1, Pp), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, Pp), jnp.int32)),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Pp, 4), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 27, Tp), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, oh_P, MASK_W), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MASK_W, Tp), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, Pp), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Pp), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(p4.astype(jnp.float32), fc.astype(jnp.float32), oh, pm)
    dmin, imin = dmin[:, 0], imin[:, 0]
    imin = jnp.clip(imin, 0, T - 1)
    return dmin[:, :P], imin[:, :P]


# ---------------------------------------------------------------------------
# v2: MXU dot products + admissibility chunk-skip bitmask
# ---------------------------------------------------------------------------


def _kernel_v2(masked, use_mxu, fc_n, tile_n, flags_ref, p_ref, fc_ref,
               wm_ref, oh_ref, pm_ref, dmin_ref, imin_ref):
    """Skip-kernel body (the skip-raster pattern applied to ICP).

    flags (B, NT) int32 in SMEM: bit ci of word [b, ti] says some point
    in tile ti admits a face of chunk ci — clear bits are whole
    (tile, chunk) blocks of provably-_INF pairs (every pair in them is
    masked inadmissible), so skipping is exact.  With part-sorted faces
    (argmin_faces_pallas_v2 permutes chunks one-ish part each) the
    joint-cloud rows of the fused ICP skip ~2/3 of their chunks.

    use_mxu: compute the four per-pair dot products (s1, s2, pa, pn) as
    ONE (TILE, 4) x (4, 4*FC) MXU matmul instead of 12 VPU
    broadcast-multiplies — the VPU is this kernel's critical resource,
    the MXU is idle.  f32 via Precision.HIGHEST; distances are
    re-evaluated exactly on the winning face outside, so ulp-level dot
    differences only perturb near-tie argmins.
    """
    b = pl.program_id(0)
    P = p_ref.shape[1]
    Tp = fc_ref.shape[2]
    n_pt = P // tile_n
    n_fc = Tp // fc_n

    def pix_tile(ti, _):
        sl = pl.ds(ti * tile_n, tile_n)
        p4 = p_ref[0, sl, :]                     # (TILE, 4) [x y z p.p]
        px, py, pz = p4[:, 0:1], p4[:, 1:2], p4[:, 2:3]
        pp = p4[:, 3:4]
        if masked:
            oh = oh_ref[0, sl, :]                # (TILE, MASK_W)
        word = flags_ref[b, ti]

        def face_chunk(ci, carry):
            def do(carry):
                dmin, imin = carry
                s = ci * fc_n
                fc = fc_ref[0, :, pl.ds(s, fc_n)]        # (27, FC)
                if use_mxu:
                    # (4, 4FC) [xyz0-row x (ab|ac|a|n)-field] block,
                    # pre-assembled in XLA (Mosaic can't concat slices
                    # with mismatched non-concat offsets in-kernel)
                    w = wm_ref[0, :, pl.ds(4 * s, 4 * fc_n)]
                    dots = jax.lax.dot_general(
                        p4, w, (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)  # (TILE, 4FC)
                    s1 = dots[:, 0:fc_n]
                    s2 = dots[:, fc_n:2 * fc_n]
                    pa = dots[:, 2 * fc_n:3 * fc_n]
                    pn = dots[:, 3 * fc_n:4 * fc_n]
                else:
                    s1 = px * fc[3:4] + py * fc[4:5] + pz * fc[5:6]
                    s2 = px * fc[6:7] + py * fc[7:8] + pz * fc[8:9]
                    pa = px * fc[0:1] + py * fc[1:2] + pz * fc[2:3]
                    pn = px * fc[9:10] + py * fc[10:11] + pz * fc[11:12]

                d = _region_sqdist(fc, s1, s2, pa, pn, pp)
                if masked:
                    allowed = jax.lax.dot_general(
                        oh, pm_ref[:, pl.ds(s, fc_n)],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    d = jnp.where(allowed > 0.5, d, _INF)

                cmin = jnp.min(d, axis=1, keepdims=True)
                carg = (jnp.argmin(d, axis=1)
                        .reshape(-1, 1).astype(jnp.int32) + s)
                better = cmin < dmin
                return (jnp.where(better, cmin, dmin),
                        jnp.where(better, carg, imin))

            return jax.lax.cond((word >> ci) & 1 != 0, do,
                                lambda c: c, carry)

        d0 = jnp.full((tile_n, 1), _INF, jnp.float32)
        i0 = jnp.zeros((tile_n, 1), jnp.int32)
        dmin, imin = jax.lax.fori_loop(0, n_fc, face_chunk, (d0, i0))
        dmin_ref[0, 0, sl] = dmin[:, 0]
        imin_ref[0, 0, sl] = imin[:, 0]
        return 0

    jax.lax.fori_loop(0, n_pt, pix_tile, 0)


def argmin_faces_pallas_v2(points, tris, part_mask=None, point_part=None,
                           fc_n=FACE_CHUNK, tile_n=TILE, use_mxu=False):
    """v2 of argmin_faces_pallas: same exact results, less work tried.

    1. use_mxu: the four per-pair dot products run on the (otherwise
       idle) MXU as one (TILE,4)x(4,4FC) matmul.
    2. (point-tile x face-chunk) blocks where NO point in the tile
       admits ANY face in the chunk are skipped via an SMEM bitmask —
       pure admissibility, no geometry bounds (those were a measured
       dead end: sphere radii at MANO chunk scale are too fat), so no
       per-step bound math and the skip is trivially exact.

    MEASURED on v5e (2026-08-19, interleaved chained harness,
    scripts/bench_icp.py, fused-ICP step shapes 2B=64/P=2048/T=1554,
    15-part mask): v1 dense 7.49 ms; v2 skip 8.25-8.80 ms across
    tile/chunk configs; v2 with points ALSO part-sorted (tile-coherent
    unions, the skip's best case) 7.60 ms at 256/128 — a tie with v1 at
    best.  Half the fused rows admit every face (full-cloud ICP) so at
    most ~0.45 of the work is skippable, and the per-(tile,chunk)
    lax.cond + SMEM flag reads eat exactly that margin at MANO's 13
    chunks.  The earlier non-interleaved 9.33-vs-11.89 reading was
    tunnel/host noise.  KEPT OFF (point_mesh.USE_V2_KERNEL) — v1 dense
    stays the production kernel; this stays for denser meshes where
    chunks outnumber parts.  The MXU dot variant loses on top of that
    (HIGHEST-precision f32 dots cost 3 MXU passes): 11.89 ms.
    """
    # the kernel slices the face table's lane axis at offsets ci*fc_n;
    # Mosaic requires provably 128-aligned lane offsets (fc_n=64 fails
    # to compile with "cannot statically prove ... multiple of 128")
    assert fc_n % 128 == 0, fc_n
    assert tile_n % 8 == 0, tile_n
    points = jax.lax.stop_gradient(points)
    tris = jax.lax.stop_gradient(tris)
    B, P, _ = points.shape
    T = tris.shape[1]

    pad_f = (-T) % fc_n
    if pad_f:
        far_tri = jnp.asarray(
            [[1e4, 1e4, 1e4], [1e4 + 1, 1e4, 1e4], [1e4, 1e4 + 1, 1e4]],
            tris.dtype)
        tris = jnp.concatenate(
            [tris, jnp.broadcast_to(far_tri, (B, pad_f, 3, 3))], axis=1)
    fc = _face_constants27(tris)
    Tp = fc.shape[2]
    nc = Tp // fc_n
    assert nc <= 31, (Tp, fc_n)

    # (B, 4, 4*Tp) MXU coefficient matrix: per chunk, columns are the
    # [ab | ac | a | n] field blocks; rows are (x, y, z, 0) so the
    # kernel can contract the stored (TILE, 4) [x y z p.p] point block
    # against it directly (the zero row kills the p.p column)
    fields = jnp.stack([fc[:, 3:6], fc[:, 6:9], fc[:, 0:3], fc[:, 9:12]],
                       axis=1)                           # (B, 4f, 3, Tp)
    fields = jnp.concatenate(
        [fields, jnp.zeros((B, 4, 1, Tp), fc.dtype)], axis=2)
    wmat = (fields.reshape(B, 4, 4, nc, fc_n)
            .transpose(0, 2, 3, 1, 4).reshape(B, 4, 4 * Tp))

    pp = jnp.sum(points * points, -1, keepdims=True)
    p4 = jnp.concatenate([points, pp], axis=-1)          # (B, P, 4)
    pad_p = (-P) % tile_n
    if pad_p:
        p4 = jnp.pad(p4, ((0, 0), (0, pad_p), (0, 0)))
    Pp = p4.shape[1]
    NT = Pp // tile_n

    masked = part_mask is not None
    if masked:
        K = part_mask.shape[1]
        assert K <= MASK_W - 1, f"at most {MASK_W - 1} parts supported"
        ext = jnp.concatenate(
            [part_mask.astype(jnp.float32),
             jnp.zeros((T, MASK_W - K), jnp.float32)], axis=1)
        pm = jnp.pad(ext, ((0, pad_f), (0, 0))).T        # (MASK_W, Tp)
        ppart = jnp.where((point_part >= 0) & (point_part < K),
                          point_part, K).astype(jnp.int32)
        oh = jax.nn.one_hot(ppart, MASK_W, dtype=jnp.float32)
        if pad_p:
            oh = jnp.pad(oh, ((0, 0), (0, pad_p), (0, 0)))
        # per-(tile, chunk) admissibility union -> int32 bitmask.
        # pad points one-hot to zero (admit nothing), pad faces' pm
        # columns are zero (admitted by nothing) — both conservative.
        tile_u = oh.reshape(B, NT, tile_n, MASK_W).max(2)   # (B, NT, MW)
        chunk_u = pm.reshape(MASK_W, nc, fc_n).max(2).T   # (nc, MW)
        need = jnp.einsum("btk,ck->btc", tile_u, chunk_u) > 0.5
        flags = (need.astype(jnp.int32)
                 << jnp.arange(nc, dtype=jnp.int32)[None, None]).sum(-1)
    else:
        pm = jnp.zeros((MASK_W, Tp), jnp.float32)
        oh = jnp.zeros((B, 1, MASK_W), jnp.float32)
        flags = jnp.full((B, NT), (1 << nc) - 1, jnp.int32)

    oh_P = oh.shape[1]
    kernel = functools.partial(_kernel_v2, masked, use_mxu, fc_n, tile_n)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Pp, 4), lambda bi, f: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 27, Tp), lambda bi, f: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 4 * Tp), lambda bi, f: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, oh_P, MASK_W), lambda bi, f: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MASK_W, Tp), lambda bi, f: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, Pp), lambda bi, f: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Pp), lambda bi, f: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    dmin, imin = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((B, 1, Pp), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, Pp), jnp.int32)),
        grid_spec=grid_spec,
    )(flags, p4.astype(jnp.float32), fc.astype(jnp.float32),
      wmat.astype(jnp.float32), oh, pm)
    dmin, imin = dmin[:, 0], imin[:, 0]
    imin = jnp.clip(imin, 0, T - 1)
    return dmin[:, :P], imin[:, :P]


# ---------------------------------------------------------------------------
# culled variant: part-sorted faces + spatially-sorted points + exact
# (admissibility AND distance-bound) chunk skipping
# ---------------------------------------------------------------------------

_CULL_MARGIN = 1e-4   # absolute slack on the sphere bounds (units of the
                      # caller's space; ~0.01mm at cube 200) — guards the
                      # sqrt rounding of the bound math, costs ~nothing


def _face_part_perm(part_mask, T):
    """Static permutation grouping faces by (first) part, so face chunks
    are spatially tight.  Returns None when the mask is traced (can't
    sort at trace time) or absent."""
    if part_mask is None:
        return None
    try:
        import numpy as np
        m = np.asarray(part_mask)
    except Exception:
        return None
    part_of_face = np.where(m.any(1), m.argmax(1), m.shape[1])
    return np.argsort(part_of_face, kind="stable").astype(np.int32)


def argmin_faces_pallas_culled(points, tris, part_mask=None,
                               point_part=None):
    """Exact nearest-admissible-face argmin with (tile, chunk) culling.

    Work reduction vs argmin_faces_pallas (which always evaluates all
    P x T pairs):
    1. faces are permuted so chunks hold one-ish skinning part each;
    2. points are sorted per row by (part, nearest-chunk) so point
       tiles are admissibility- and space-coherent;
    3. a (tile, chunk) pair is skipped iff NO point in the tile can
       have its nearest admissible face there, proven by chunk bounding
       spheres: needed(p, g) = admissible(p, g) AND
       lb_g(p) <= ub(p), with lb_g = (max(0, |p-c_g| - r_g) - eps)^2 a
       lower bound on any distance into chunk g and
       ub = min over admissible g of (|p-c_g| + r_g + eps)^2 an upper
       bound on p's true minimum.  Exact by construction — the chunk
       holding the argmin face always survives.
    """
    points = jax.lax.stop_gradient(points)
    tris = jax.lax.stop_gradient(tris)
    B, P, _ = points.shape
    T = tris.shape[1]

    perm = _face_part_perm(part_mask, T)
    if perm is not None:
        tris = tris[:, perm]
        part_mask = part_mask[jnp.asarray(perm)]

    fc = _face_constants(tris)
    pad_f = (-T) % FACE_CHUNK
    if pad_f:
        fc = jnp.pad(fc, ((0, 0), (0, 0), (0, pad_f)))
        far = jnp.arange(T + pad_f) >= T
        fc = fc.at[:, 15, :].set(jnp.where(far, _INF, fc[:, 15, :]))
    Tp = fc.shape[2]
    G = Tp // FACE_CHUNK

    # chunk bounding spheres from the (padded) triangles
    cent = tris.mean(2)                                     # (B, T, 3)
    face_r = jnp.sqrt(jnp.max(jnp.sum(
        (tris - cent[:, :, None]) ** 2, -1), -1) + 1e-20)   # (B, T)
    if pad_f:
        cent = jnp.pad(cent, ((0, 0), (0, pad_f), (0, 0)))
        face_r = jnp.pad(face_r, ((0, 0), (0, pad_f)),
                         constant_values=-_INF)
    cent_g = cent.reshape(B, G, FACE_CHUNK, 3)
    # chunk center = mean of REAL faces only (pads sit at origin; use
    # masked mean so they don't drag the sphere)
    real = (face_r.reshape(B, G, FACE_CHUNK) > -_INF / 2)
    denom = jnp.maximum(real.sum(-1, keepdims=True), 1)
    c_g = (cent_g * real[..., None]).sum(2) / denom         # (B, G, 3)
    r_g = jnp.max(jnp.where(
        real,
        jnp.sqrt(jnp.sum((cent_g - c_g[:, :, None]) ** 2, -1) + 1e-20)
        + face_r.reshape(B, G, FACE_CHUNK),
        0.0), -1)                                            # (B, G)

    # per-point chunk admissibility
    masked = part_mask is not None
    if masked:
        K = part_mask.shape[1]
        ppart = jnp.where((point_part >= 0) & (point_part < K),
                          point_part, K).astype(jnp.int32)
        ext = jnp.concatenate([part_mask.astype(jnp.float32),
                               jnp.zeros((T, 1), jnp.float32)], 1)
        ext = jnp.pad(ext, ((0, pad_f), (0, 0)))            # (Tp, K+1)
        chunk_part = ext.reshape(G, FACE_CHUNK, K + 1).max(1)  # (G, K+1)
        oh_pt = jax.nn.one_hot(ppart, K + 1, dtype=jnp.float32)
        adm = jnp.einsum("bpk,gk->bpg", oh_pt, chunk_part) > 0.5
    else:
        adm = jnp.ones((B, P, G), bool)

    # distance bounds
    dpc = jnp.sqrt(jnp.sum(
        (points[:, :, None] - c_g[:, None]) ** 2, -1) + 1e-20)  # (B, P, G)
    lb = jnp.maximum(dpc - r_g[:, None] - _CULL_MARGIN, 0.0) ** 2
    ub_g = (dpc + r_g[:, None] + _CULL_MARGIN) ** 2
    ub = jnp.min(jnp.where(adm, ub_g, _INF), -1)            # (B, P)
    needed = adm & (lb <= ub[..., None])                    # (B, P, G)

    # sort points so tiles are coherent: key = (part, nearest chunk)
    near_g = jnp.argmin(jnp.where(adm, dpc, _INF), -1)      # (B, P)
    key = (ppart * G + near_g) if masked else near_g
    order = jnp.argsort(key, axis=-1)
    inv = jnp.argsort(order, axis=-1)

    def take(x, o):
        return jnp.take_along_axis(x, o.reshape(o.shape + (1,) * (x.ndim - 2)),
                                   axis=1)

    pts_s = take(points, order)
    needed_s = take(needed, order)

    pp_s = jnp.sum(pts_s * pts_s, -1, keepdims=True)
    p4 = jnp.concatenate([pts_s, pp_s], -1)
    pad_p = (-P) % TILE
    if pad_p:
        p4 = jnp.pad(p4, ((0, 0), (0, pad_p), (0, 0)))
        needed_s = jnp.pad(needed_s, ((0, 0), (0, pad_p), (0, 0)))
    Pp = p4.shape[1]
    NT = Pp // TILE
    run = needed_s.reshape(B, NT, TILE, G).any(2).astype(jnp.int32)

    if masked:
        pm = jnp.concatenate(
            [part_mask.astype(jnp.float32),
             jnp.zeros((T, MASK_W - K), jnp.float32)], 1)
        pm = jnp.pad(pm, ((0, pad_f), (0, 0))).T            # (MASK_W, Tp)
        oh = jax.nn.one_hot(ppart, MASK_W, dtype=jnp.float32)
        oh = take(oh, order)
        if pad_p:
            oh = jnp.pad(oh, ((0, 0), (0, pad_p), (0, 0)))
    else:
        pm = jnp.zeros((MASK_W, Tp), jnp.float32)
        oh = jnp.zeros((B, 1, MASK_W), jnp.float32)

    oh_P = oh.shape[1]
    kernel = functools.partial(_kernel_culled, masked)
    dmin, imin = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((B, 1, Pp), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, Pp), jnp.int32)),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Pp, 4), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, Tp), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, oh_P, MASK_W), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MASK_W, Tp), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NT, G), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, Pp), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Pp), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(p4.astype(jnp.float32), fc.astype(jnp.float32), oh, pm, run)
    dmin, imin = dmin[:, 0, :P], imin[:, 0, :P]
    # unsort back to caller point order, then unpermute face ids
    dmin = jnp.take_along_axis(dmin, inv, axis=1)
    imin = jnp.take_along_axis(imin, inv, axis=1)
    imin = jnp.clip(imin, 0, Tp - 1)
    if perm is not None:
        imin = jnp.asarray(perm)[jnp.clip(imin, 0, T - 1)]
    return dmin, jnp.clip(imin, 0, T - 1)
