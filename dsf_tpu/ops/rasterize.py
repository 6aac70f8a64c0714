"""Differentiable depth rasterizer (blur=0, faces_per_pixel=1 semantics).

TPU-first redesign of the reference render path.  The reference
(render_model/mano_layer.py:946-952, 1021-1030) rasterizes a 640x640
NDC square with pytorch3d, identity-resizes to 640x480, then warps to
the 128x128 crop with nearest-neighbor grid_sample.  Here we rasterize
*directly at the crop pixels*: each crop pixel (i, j) is mapped through
M^-1 to its continuous full-frame position (exactly the sample position
the reference's warp uses — its grid is built from integer crop coords,
mano_layer.py:1244-1255) and the triangle coverage test happens there.
One pass, ~19x fewer pixels than the 640x640 raster, no resampling
aliasing, and labels (JointTrans) share the same projection by
construction.

Depth interpolation is screen-space barycentric (pytorch3d 0.4.0
default perspective_correct=False), and the gradient flows to vertex
positions through the hit face's interpolation only — matching
pytorch3d's hard (blur=0) backward, NOT a soft rasterizer.

The inner loop is matmul-shaped: per-face edge functions are linear in
(u, v), so coverage+depth for a pixel block is [u v 1] @ coeffs — MXU
food — followed by a masked min over faces.  The XLA path scans over
face chunks so the (pixels x faces) tensor is never materialized.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from dsf_tpu import geometry as geo

_INF = 1e10
_FACE_CHUNK = 256


def project_verts(verts, paras, flip=1.0):
    """World mm -> continuous pixel coords (u, v) + depth z.

    Same pinhole as geometry.xyz_to_uvd (ref: points3DToImg,
    mano_layer.py:1318-1324).
    """
    return geo.xyz_to_uvd(verts, paras, flip)


def full_frame_pixel_rays(img_size):
    """Integer pixel grid (u, v) of a (W, H) full frame -> (H*W, 2)."""
    W, H = img_size
    u, v = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32), indexing="xy")
    return jnp.stack([u.ravel(), v.ravel()], axis=-1)


def crop_pixel_rays(M, crop_size, stride=1):
    """Map integer crop-pixel coords through M^-1 to full-frame positions.

    M: (..., 3, 3) crop matrices.  Returns (..., crop*crop, 2) sample
    positions — the exact positions the reference's warpPerspective
    samples (mano_layer.py:1244-1255 builds its grid from integer crop
    coords, no half-pixel shift).

    ``stride`` > 1 keeps every stride-th crop pixel (coords 0, s, 2s,
    ...) — exactly the pixels F.interpolate-nearest keeps when the
    stride-1 image is downscaled by ``stride`` (src = floor(dst*s) =
    dst*s), so rastering at stride s is bitwise-identical to rastering
    at stride 1 then resize_nearest, at 1/s^2 the pixels.
    """
    cw, ch = crop_size[0] // stride, crop_size[1] // stride
    u, v = jnp.meshgrid(jnp.arange(cw, dtype=jnp.float32) * stride,
                        jnp.arange(ch, dtype=jnp.float32) * stride,
                        indexing="xy")
    pix = jnp.stack([u.ravel(), v.ravel(), jnp.ones(cw * ch, jnp.float32)], axis=-1)
    Minv = geo.inv_3x3(M)
    uv = geo.transform_points_2d(
        jnp.broadcast_to(pix, M.shape[:-2] + pix.shape), Minv)[..., :2]
    return uv


def _face_coeffs(proj, faces):
    """Per-face linear coefficients of the 3 edge functions and depth,
    preconditioned for the inner loop: the area sign is folded into the
    edge coefficients (inside test becomes plain >= 0) and 1/A into the
    depth line (z = az u + bz v + cz, no division per pixel).

    proj: (B, V, 3) projected verts; faces: (F, 3) int.
    Returns a, b, c: (B, F, 3); az, bz, cz: (B, F); valid: (B, F).
    """
    tri = proj[:, faces]                       # (B, F, 3, 3)
    u0, v0, z0 = tri[..., 0, 0], tri[..., 0, 1], tri[..., 0, 2]
    u1, v1, z1 = tri[..., 1, 0], tri[..., 1, 1], tri[..., 1, 2]
    u2, v2, z2 = tri[..., 2, 0], tri[..., 2, 1], tri[..., 2, 2]
    a = jnp.stack([v1 - v2, v2 - v0, v0 - v1], axis=-1)
    b = jnp.stack([u2 - u1, u0 - u2, u1 - u0], axis=-1)
    c = jnp.stack([u1 * v2 - u2 * v1, u2 * v0 - u0 * v2, u0 * v1 - u1 * v0],
                  axis=-1)
    A = c.sum(-1)                               # (B, F), 2x signed area
    valid = jnp.abs(A) > 1e-9
    sgn = jnp.sign(A)[..., None]
    a, b, c = a * sgn, b * sgn, c * sgn         # inside test: all >= 0
    z = jnp.stack([z0, z1, z2], axis=-1)        # (B, F, 3)
    Ainv = jnp.where(valid, 1.0 / jnp.where(valid, A, 1.0), 0.0)
    az = (a * z).sum(-1) * (sgn[..., 0] * Ainv)
    bz = (b * z).sum(-1) * (sgn[..., 0] * Ainv)
    cz = (c * z).sum(-1) * (sgn[..., 0] * Ainv)
    return a, b, c, az, bz, cz, valid, sgn[..., 0]


def _pad_to_multiple(x, axis, m, value):
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


# Backface culling for CLOSED, consistently-wound meshes (e.g. the
# wrist-capped MANO): the nearest hit along any ray is front-facing, so
# testing only front faces is exact (validated bit-exact in
# tests/test_rasterize.py).  Front faces are packed first by a stable
# argsort on the projected-area sign and the scan runs over a bounded
# window.  0 disables; +1/-1 selects the winding sign meaning "front"
# for the asset.  MEASURED on v5e at MANO scale (1566 faces, B=32,
# 128^2): culled 15.3ms vs full 10.5ms — the argsort + coefficient
# gathers outweigh the 25% chunk savings, so this stays OFF; it pays
# only for much larger face counts or if the packing moves into the
# coefficient computation itself.
BACKFACE_CULL_SIGN = 0
CULL_KEEP_FRAC = 0.75


def _scan_minz(a, b, c, az, bz, cz, valid, pix_uv, chunk=_FACE_CHUNK):
    """Masked depth-min scan: linear edge/depth coeffs (N, F[, 3]) vs
    pixel positions (N, P, 2) -> (zmin (N, P), local argmin (N, P)).
    Scans over F in chunks so the (P x F) tensor never materializes."""
    N, P = pix_uv.shape[0], pix_uv.shape[1]

    def padf(x):
        return _pad_to_multiple(x, 1, chunk, 0.0)

    a, b, c = padf(a), padf(b), padf(c)
    az, bz, cz = padf(az), padf(bz), padf(cz)
    valid = _pad_to_multiple(valid, 1, chunk, False)
    Fp = az.shape[1]
    nc = Fp // chunk

    def reshape_chunks(x):
        return jnp.moveaxis(x.reshape(N, nc, chunk, *x.shape[2:]), 1, 0)

    xs = tuple(reshape_chunks(x) for x in (a, b, c, az, bz, cz, valid))

    u = pix_uv[..., 0:1]                        # (N, P, 1)
    v = pix_uv[..., 1:2]

    def body(carry, ch):
        zmin, idx, offset = carry
        ca, cb, cc, caz, cbz, ccz, cval = ch     # (N, Fc, ...)
        e0 = (u * ca[:, None, :, 0] + v * cb[:, None, :, 0] + cc[:, None, :, 0])
        e1 = (u * ca[:, None, :, 1] + v * cb[:, None, :, 1] + cc[:, None, :, 1])
        e2 = (u * ca[:, None, :, 2] + v * cb[:, None, :, 2] + cc[:, None, :, 2])
        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & cval[:, None, :]
        z = u * caz[:, None, :] + v * cbz[:, None, :] + ccz[:, None, :]
        z = jnp.where(inside & (z > 0), z, _INF)
        cmin = jnp.min(z, axis=-1)              # (N, P)
        # NOTE: measured on v5e (2026-08-17, 4-raster chained harness):
        # the variadic min/argmin reduce is 35ms vs 55ms for a min +
        # masked-index-min two-reduce rewrite — keep the variadic form
        carg = jnp.argmin(z, axis=-1) + offset
        better = cmin < zmin
        return (jnp.where(better, cmin, zmin),
                jnp.where(better, carg, idx),
                offset + chunk), None

    # Anti-peel init: with a compile-time-constant INF carry, XLA peels
    # iteration 0 of the while into a standalone variadic min/argmin
    # fusion that costs as much as the whole remaining loop (v5e trace:
    # 8.7ms peeled chunk + 8.7ms six-chunk while per raster).  The init
    # below equals INF at runtime (pixel coords are << _INF) but XLA
    # cannot fold it, so all chunks run at loop-body speed.  (An earlier
    # `+ u*0.0` attempt was algebraically simplified away — the max form
    # survives.)  Rewriting argmin as two vectorized reduces was also
    # tried: 1.6x slower, keep the variadic form.
    init = (jnp.maximum(jnp.float32(_INF),
                        jax.lax.stop_gradient(pix_uv[..., 0])),
            jnp.full((N, P), -1, jnp.int32),
            jnp.int32(0))
    (zmin, idx, _), _ = jax.lax.scan(body, init, xs)
    return zmin, idx


def _raster_scan(proj, pix_uv, faces, cull_sign=None):
    """XLA fallback: scan over face chunks, carry running (zmin, argmin).

    proj (B,V,3), pix_uv (B,P,2), faces (F,3) -> zbuf (B,P), idx (B,P).
    """
    if cull_sign is None:
        cull_sign = BACKFACE_CULL_SIGN
    B = pix_uv.shape[0]
    a, b, c, az, bz, cz, valid, sgn = _face_coeffs(proj, faces)
    F = faces.shape[0]

    face_map = None
    if cull_sign:
        front = valid & (sgn == cull_sign)
        order = jnp.argsort(~front, axis=1, stable=True)   # fronts first
        K = int(-(-int(F * CULL_KEEP_FRAC) // _FACE_CHUNK) * _FACE_CHUNK)
        K = min(K, F)
        face_map = order[:, :K]                             # (B, K)

        def takef(x):
            idxs = face_map
            if x.ndim == 3:
                idxs = idxs[..., None]
            return jnp.take_along_axis(x, idxs, axis=1)

        a, b, c = takef(a), takef(b), takef(c)
        az, bz, cz = takef(az), takef(bz), takef(cz)
        valid = jnp.take_along_axis(front, face_map, axis=1)

    zmin, idx = _scan_minz(a, b, c, az, bz, cz, valid, pix_uv)
    zbuf = jnp.where(zmin >= _INF, 0.0, zmin)   # background -> 0 (ref maps
    hit = zmin < _INF                           # zbuf<=0 to 0 right after)
    if face_map is not None:
        # remap window-local argmin back to original face ids
        safe = jnp.clip(idx, 0, face_map.shape[1] - 1)
        idx = jnp.take_along_axis(face_map, safe, axis=1)
    idx = jnp.where(hit & (idx < F) & (idx >= 0), idx, -1)
    return zbuf, idx


# Tile-binned forward: the classic binned-raster work reduction.  Each
# TILE x TILE pixel block only tests the faces whose projected bbox
# intersects the block's bbox (derived from the actual sample positions,
# so any crop matrix works); bin selection is a cheap top_k (~0.02ms
# measured).  Faces are capped at BIN_CAP per tile; a tile exceeding the
# cap flips a scalar overflow flag and lax.cond falls back to the dense
# scan for the whole call — binned is an optimization, the result is
# ALWAYS exact (pytorch3d's binned rasterizer, by contrast, silently
# truncates at max_faces_per_bin).
#
# MEASURED at MANO scale (v5e, B=32, 128^2 crops, 1554 faces, bins
# mean 38 / p99 297 faces at t=16): dense scan 8.9ms; binned-XLA
# 9.1-22ms (the work saving is lost to unfused gathered-coefficient
# intermediates); binned-Pallas 14.5ms (small (cap, tsq) blocks pay
# more Mosaic per-block overhead than they save).  The dense scan stays
# the production path (renderer._raster_crop passes no tile_hw); the
# binned machinery is kept — exact and tested — because it wins for
# face counts >> 1554 (denser meshes, full-frame rasters).
BIN_TILE = 16        # t*t = 256 pixels = 2 full lane groups
BIN_CAP = 512        # multiple of 128 (kernel sublane chunking)


def _raster_binned(proj, pix_uv, faces, tile_hw):
    B, P = pix_uv.shape[0], pix_uv.shape[1]
    H, W = tile_hw
    assert P == H * W, (P, tile_hw)
    t = BIN_TILE
    F = faces.shape[0]
    if H % t or W % t or F <= BIN_CAP:
        return _raster_scan(proj, pix_uv, faces)
    gh, gw = H // t, W // t
    G = gh * gw
    cap = BIN_CAP

    a, b, c, az, bz, cz, valid, _ = _face_coeffs(proj, faces)

    # pixel tiles + their bboxes (from the actual sample positions)
    puv = (pix_uv.reshape(B, gh, t, gw, t, 2)
           .transpose(0, 1, 3, 2, 4, 5).reshape(B, G, t * t, 2))
    tmin = puv.min(2)                                  # (B, G, 2)
    tmax = puv.max(2)

    # face bboxes
    tri_uv = proj[:, faces][..., :2]                   # (B, F, 3, 2)
    fmin = tri_uv.min(2)                               # (B, F, 2)
    fmax = tri_uv.max(2)

    inter = ((fmin[:, None, :, 0] <= tmax[:, :, None, 0])
             & (fmax[:, None, :, 0] >= tmin[:, :, None, 0])
             & (fmin[:, None, :, 1] <= tmax[:, :, None, 1])
             & (fmax[:, None, :, 1] >= tmin[:, :, None, 1])
             & valid[:, None, :])                      # (B, G, F)
    overflow = inter.sum(-1).max() > cap

    use_pallas = jax.default_backend() != "cpu"

    def binned(_):
        score, fid = jax.lax.top_k(inter.astype(jnp.float32), cap)  # (B,G,cap)
        sel = score > 0.5
        NG = B * G
        if use_pallas:
            from dsf_tpu.ops import pallas_raster as PR
            ke = PR.face_coeff_rows(proj, faces)       # (B, F, 16)
            gat = jnp.take_along_axis(ke[:, None], fid[..., None], axis=2)
            # disable non-selected rows via c0 = -inf (e0 always < 0)
            gat = gat.at[..., 2].set(
                jnp.where(sel, gat[..., 2], -_INF))
            zmin, lidx = PR.raster_pallas_tiles(
                puv.reshape(B, G * t * t, 2).transpose(0, 2, 1),
                gat.reshape(B, G * cap, 16), t * t, cap)
            zmin = zmin.reshape(NG, t * t)
            lidx = lidx.reshape(NG, t * t)
            hit = lidx >= 0
            zbuf = zmin                                # kernel maps bg -> 0
        else:
            coeffs = jnp.concatenate(
                [a, b, c, az[..., None], bz[..., None], cz[..., None]],
                axis=-1)
            gat = jnp.take_along_axis(coeffs[:, None], fid[..., None],
                                      axis=2)          # (B, G, cap, 12)
            zmin, lidx = _scan_minz(
                gat[..., 0:3].reshape(NG, cap, 3),
                gat[..., 3:6].reshape(NG, cap, 3),
                gat[..., 6:9].reshape(NG, cap, 3),
                gat[..., 9].reshape(NG, cap),
                gat[..., 10].reshape(NG, cap),
                gat[..., 11].reshape(NG, cap),
                sel.reshape(NG, cap),
                puv.reshape(NG, t * t, 2),
                chunk=min(cap, _FACE_CHUNK))
            hit = zmin < _INF
            zbuf = jnp.where(hit, zmin, 0.0)
        safe = jnp.clip(lidx, 0, cap - 1)
        gidx = jnp.take_along_axis(fid.reshape(NG, cap), safe, axis=1)
        gidx = jnp.where(hit, gidx, -1)

        def untile(x):
            return (x.reshape(B, gh, gw, t, t)
                    .transpose(0, 1, 3, 2, 4).reshape(B, P))

        return untile(zbuf), untile(gidx)

    def dense(_):
        zmin, idx = _scan_minz(a, b, c, az, bz, cz, valid, pix_uv)
        zbuf = jnp.where(zmin >= _INF, 0.0, zmin)
        idx = jnp.where(zmin < _INF, idx, -1)
        return zbuf, idx

    return jax.lax.cond(overflow, dense, binned, operand=None)


def _z_of_tri(tri, uv):
    """Depth of the ray through pixel ``uv`` on triangle ``tri`` (3,3)
    via screen-space barycentric interpolation.  Used only to derive the
    backward pass (gradient wrt tri)."""
    u, v = uv[0], uv[1]
    u0, v0, z0 = tri[0]
    u1, v1, z1 = tri[1]
    u2, v2, z2 = tri[2]
    w0 = (v1 - v2) * u + (u2 - u1) * v + (u1 * v2 - u2 * v1)
    w1 = (v2 - v0) * u + (u0 - u2) * v + (u2 * v0 - u0 * v2)
    w2 = (v0 - v1) * u + (u1 - u0) * v + (u0 * v1 - u1 * v0)
    A = w0 + w1 + w2
    return (w0 * z0 + w1 * z1 + w2 * z2) / A


_grad_z_tri = jax.vmap(jax.vmap(jax.grad(_z_of_tri, argnums=0)))


USE_PALLAS_MOMENTS = False  # measured on v5e (B=64, 128^2, 1554f,
                            # trace-exclusive): Pallas one-hot-dot
                            # moments 3.15ms/iter vs the XLA chunked
                            # einsum's 3.25ms — a wash (the kernel's
                            # 2.3ms dot win is eaten by the (B,8,P)
                            # relayout copy; an m=3 variant with the
                            # rows built in one fusion and the iota
                            # hoisted to scratch also measured 3.2ms).
                            # The big per-iter raster cost is the
                            # FORWARD argmin scan (17.4ms at that
                            # shape), not this contraction.  Kernel
                            # kept (pallas_raster.face_moments_pallas,
                            # exact to 1.5e-7 vs f64) for future
                            # fused-backward work.

USE_PALLAS_RASTER = False   # measured on v5e: isolated scan 11.2ms vs
                            # pallas 12.6ms (B=32/128^2/1554f), and in
                            # the FULL FinetuneStage step the kernel is
                            # also slower end-to-end: 199.4 fps vs the
                            # scan's 213.2 (2026-08-17) — kept for
                            # future binned/culled variants

# Skip-raster (pallas_raster.raster_pallas_skip): bbox-predicated
# (16x16 pixel tile) x (64-face chunk) kernel, dense-exact zbuf.
# Measured on v5e (B=64, 128^2, 1554f, chained harness, 2026-08-19):
# dense scan 16.2ms; dense pallas 12.4 (1-D 512px tiles, density 0.42);
# 2-D tile sweep: 16x16/fc64 8.9ms, 16x32/fc64 9.4, 16x32/fc128 11.0,
# 32x32/fc64 11.3 -> 16x16/fc64 production (1.8x the scan).  zbuf is
# bitwise-equal; winning-face ids differ on ~0.1% of pixels where two
# faces tie to the exact same f32 depth (Mosaic's in-chunk argmin
# breaks exact ties differently) — the hard-raster gradient at such
# pixels is attributed to the coplanar-at-that-pixel twin face, an
# equally valid blur=0 subgradient (pytorch3d makes its own arbitrary
# choice there).
USE_PALLAS_SKIP = True
SKIP_BLOCK = (16, 16)
SKIP_FC = 64
# DSF_RASTER_MXU=1: evaluate the four edge/depth fields as one in-VMEM
# MXU matmul per (chunk, tile) instead of 8 VPU broadcast-FMAs.  Changes
# edge-pixel coverage by ulps (HIGHEST-precision MXU f32 vs VPU FMA), so
# zbuf is no longer bitwise-equal to the scan.  MEASURED on v5e
# (scripts/bench_raster.py, 2B=64/128^2/1554 faces, interleaved): MXU
# 66-82 ms vs VPU 17 ms — a 4x LOSS (contraction depth 4 wastes the
# 128-deep systolic array; HIGHEST f32 costs 3 passes on top).  OFF.
SKIP_USE_MXU = os.environ.get("DSF_RASTER_MXU", "0") == "1"


def _skip_eligible(layout_hw, faces):
    if layout_hw is None or not USE_PALLAS_SKIP:
        return False
    H, W = layout_hw
    bh, bw = SKIP_BLOCK
    return (-(-faces.shape[0] // SKIP_FC) <= 31 and H % bh == 0
            and W % bw == 0 and jax.default_backend() != "cpu")


def _raster_forward(tile_hw, proj, pix_uv, faces, layout_hw=None):
    """Backend dispatch: the Pallas skip-raster on TPU when the pixel
    layout is known (layout_hw), the exact binned XLA path when
    explicitly requested (tile_hw), dense scan otherwise."""
    if layout_hw is None:
        layout_hw = tile_hw
    if _skip_eligible(layout_hw, faces):
        from dsf_tpu.ops.pallas_raster import raster_pallas_skip
        return raster_pallas_skip(proj, pix_uv, faces, fc=SKIP_FC,
                                  tile_hw=layout_hw, block=SKIP_BLOCK,
                                  use_mxu=SKIP_USE_MXU)
    if tile_hw is not None:
        return _raster_binned(proj, pix_uv, faces, tile_hw)
    if USE_PALLAS_RASTER and jax.default_backend() != "cpu":
        try:
            from dsf_tpu.ops.pallas_raster import raster_pallas
            return raster_pallas(proj, pix_uv, faces)
        except Exception:
            pass
    return _raster_scan(proj, pix_uv, faces)


@jax.custom_vjp
def _attach_raster_grad(proj, pix_uv, zbuf, idx, faces):
    """Identity on ``zbuf`` that ATTACHES the rasterizer's gradient wrt
    ``proj`` (hard blur=0: through the hit face's depth plane only).

    The scan that produced (zbuf, idx) lives OUTSIDE this custom_vjp
    with its inputs gradient-stopped, so it appears exactly once in the
    autodiff graph; the fwd here is free.  Earlier designs measured on
    v5e (B=32, 128^2, 1554f): scan inside a custom_vjp fwd — grad
    re-ran it (fwd 8.8ms, grad 18.1ms); plain two-pass re-evaluation —
    the per-pixel coefficient gathers cost 4.5-17ms.  This form: fwd
    9.8ms (scan only), bwd +0.02ms (moment scatter)."""
    return zbuf


def _attach_fwd(proj, pix_uv, zbuf, idx, faces):
    return zbuf, (proj, pix_uv, idx, faces)


def _attach_bwd(res, g):
    """Backward via per-face MOMENTS.

    For a fixed face, the interpolated depth z(u, v) = (az u + bz v +
    cz)/A is linear in the pixel position, so the cotangent reaching a
    face is fully captured by three moments of its covering pixels:
    S1 = sum g, Su = sum g u, Sv = sum g v.  Then

        sum_p g_p z_p = sum_t (az_t Su_t + bz_t Sv_t + cz_t S1_t) / A_t

    and the vertex gradient is plain autodiff of that tiny dense (B, T)
    expression — one (B, P, 3) scatter-add keyed by hit-face id.  The
    pixel->face assignment stays detached — hard blur=0 semantics."""
    proj, pix_uv, idx, faces = res
    B, P = idx.shape
    hit = (idx >= 0).astype(g.dtype)
    gm = g * hit
    T = faces.shape[0]

    # moments via one-hot matmul on the MXU (measured 11.8ms for
    # scan+moments vs 17.9ms with a (B,P)->(T,3) scatter-add at B=32,
    # P=128^2, T=1554 on v5e).  The chunked einsum is the production
    # path: the Pallas kernel alternative (see USE_PALLAS_MOMENTS)
    # measured equal end-to-end on TPU (3.15 vs 3.25 ms/iter at B=64).
    # HIGHEST precision keeps it exact to f32 summation order (2e-7
    # rel vs the scatter).  Misses contribute zeros via gm, so no
    # index masking.
    if USE_PALLAS_MOMENTS and jax.default_backend() != "cpu":
        from dsf_tpu.ops.pallas_raster import face_moments_pallas
        upd = jnp.stack([gm, gm * pix_uv[..., 0], gm * pix_uv[..., 1]],
                        axis=-1)
        mom = face_moments_pallas(idx, upd.astype(jnp.float32), T)
        mom = mom.astype(g.dtype)
    else:
        # quantity-major (B, 3, P): a (B, P, 3) minor-axis stack gets
        # re-split by XLA into [B,P,1] T(1,128) slabs whose reads run
        # the fused one-hot dot at 2% HBM (round-5 trace, ~1.1 ms per
        # chunk either output orientation)
        upd_t = jnp.stack([gm, gm * pix_uv[..., 0], gm * pix_uv[..., 1]],
                          axis=1)
        chunks = []
        for c in range(0, T, 512):
            width = min(512, T - c)
            onehot = (idx[:, :, None]
                      == (c + jnp.arange(width))[None, None]).astype(g.dtype)
            # moment-index m (=3) in SUBLANES, faces in LANES: ->bcm
            # puts m minor and XLA lowers the dot to a dilated conv
            chunks.append(jnp.einsum("bpc,bmp->bmc", onehot, upd_t,
                                     precision=jax.lax.Precision.HIGHEST))
        mom_t = jnp.concatenate(chunks, axis=2)  # (B, 3, T): S1, Su, Sv
        mom = mom_t.transpose(0, 2, 1)           # (B, T, 3)

    def face_sum(p):
        tri = p[:, faces]
        u0, v0, z0 = tri[..., 0, 0], tri[..., 0, 1], tri[..., 0, 2]
        u1, v1, z1 = tri[..., 1, 0], tri[..., 1, 1], tri[..., 1, 2]
        u2, v2, z2 = tri[..., 2, 0], tri[..., 2, 1], tri[..., 2, 2]
        a = jnp.stack([v1 - v2, v2 - v0, v0 - v1], axis=-1)
        b = jnp.stack([u2 - u1, u0 - u2, u1 - u0], axis=-1)
        c = jnp.stack([u1 * v2 - u2 * v1, u2 * v0 - u0 * v2,
                       u0 * v1 - u1 * v0], axis=-1)
        A = c.sum(-1)
        z = jnp.stack([z0, z1, z2], axis=-1)
        az = (a * z).sum(-1)
        bz = (b * z).sum(-1)
        cz = (c * z).sum(-1)
        Asafe = jnp.where(jnp.abs(A) < 1e-9, 1.0, A)
        per_face = (az * mom[..., 1] + bz * mom[..., 2]
                    + cz * mom[..., 0]) / Asafe
        return jnp.sum(jnp.where(jnp.abs(A) < 1e-9, 0.0, per_face))

    dproj = jax.grad(face_sum)(proj)
    zero_idx = np.zeros(idx.shape, dtype=jax.dtypes.float0)
    zero_faces = np.zeros(faces.shape, dtype=jax.dtypes.float0)
    return (dproj, jnp.zeros_like(pix_uv), jnp.zeros_like(g), zero_idx,
            zero_faces)


_attach_raster_grad.defvjp(_attach_fwd, _attach_bwd)


def _raster(tile_hw, proj, pix_uv, faces, layout_hw=None):
    """Differentiable zbuf: stop-gradient argmin scan + attached hard
    gradient (see _attach_raster_grad)."""
    zbuf, idx = _raster_forward(tile_hw, jax.lax.stop_gradient(proj),
                                jax.lax.stop_gradient(pix_uv), faces,
                                layout_hw=layout_hw)
    return _attach_raster_grad(proj, pix_uv, zbuf, idx, faces)


def rasterize_depth(verts, faces, pix_uv, paras, flip=1.0, return_idx=False,
                    tile_hw=None, layout_hw=None):
    """Rasterize (B, V, 3) world-mm verts into depth at sample positions.

    pix_uv: (B, P, 2) or (P, 2) continuous full-frame pixel positions
    (see crop_pixel_rays / full_frame_pixel_rays).  tile_hw: (H, W) pixel
    layout of pix_uv (row-major), which enables the exact tile-binned
    fast path.  layout_hw: same layout information WITHOUT opting into
    the binned path — on TPU it routes to the Pallas skip-raster, on
    CPU the dense scan (the production renderer passes this).  Returns
    zbuf (B, P): depth in mm of the nearest face along each ray, 0
    where no face covers the pixel.  Differentiable wrt ``verts`` with
    the hard (blur=0, fpp=1) gradient through the hit face only.
    """
    proj = project_verts(verts, paras, flip)
    if pix_uv.ndim == 2:
        pix_uv = jnp.broadcast_to(pix_uv, (verts.shape[0],) + pix_uv.shape)
    if return_idx:
        if _skip_eligible(layout_hw, faces):
            from dsf_tpu.ops.pallas_raster import raster_pallas_skip
            return raster_pallas_skip(proj, pix_uv, faces, fc=SKIP_FC,
                                      tile_hw=layout_hw, block=SKIP_BLOCK,
                                      use_mxu=SKIP_USE_MXU)
        if tile_hw is not None:
            return _raster_binned(proj, pix_uv, faces, tile_hw)
        return _raster_scan(proj, pix_uv, faces)
    return _raster(tile_hw, proj, pix_uv, faces, layout_hw=layout_hw)


# ---------------------------------------------------------------------------
# point splatting (scatter-min depth), ref: PCLToDepth / pcl2Img
# (render_loader.py:1015-1033, 1158-1171)
# ---------------------------------------------------------------------------

def splat_points_min(uvd, img_size, background=0.0):
    """Scatter points into a (img_size, img_size) depth image keeping the
    nearest depth per pixel.  uvd: (B, N, 3) in pixel coords.
    """
    B, N, _ = uvd.shape
    u = jnp.clip(uvd[..., 0], 0, img_size - 0.5)
    v = jnp.clip(uvd[..., 1], 0, img_size - 0.5)
    lin = (jnp.floor(v) * img_size + jnp.floor(u)).astype(jnp.int32)

    def one(lin_i, z_i):
        img = jnp.full((img_size * img_size,), _INF, uvd.dtype)
        img = img.at[lin_i].min(z_i)
        return jnp.where(img >= _INF, background, img)

    out = jax.vmap(one)(lin, uvd[..., 2])
    return out.reshape(B, img_size, img_size)
