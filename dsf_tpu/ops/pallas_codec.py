"""Pallas TPU kernel: fused offset-codec decode (offset2joint_softmax).

The XLA lowering of the decode (ops/offset_codec.py:offset2joint_softmax)
materializes a chain of (B, 4J, S, S) f32 intermediates — masked unit
field, masked heatmap, softmax weights, votes — and their backward
mirrors; at B=64/J=21/S=64 that is ~88 MB per tensor and the codec
cluster measured ~9 ms/step in the round-3 trace (fusion.351/355/357,
pad_add/multiply_multiply families).  The bandwidth floor is ONE read
of the feature per pass: this kernel computes joints in a single fused
pass per batch row (fwd), and the custom VJP emits d_offset/d_depth in
a single recompute pass (bwd).

Semantics are exactly the jnp path's (same masked-softmax-vote math,
including background pixels keeping exp(0) softmax mass):

    hm   = heat * mask,  mask = depth < 0.99
    w    = softmax(scale * hm)          over all S*S pixels
    dist = k - k * hm
    out[j, c] = sum_p (unit[j,c,p] * mask_p * dist[j,p]
                       + coords[c,p]) * w[j,p]

All per-(joint, channel) row bookkeeping is done with tiny 0/1
expansion/summing matrices on the MXU (E3: (3J, J), S3 = E3^T), so the
kernel never reshapes across sublanes.

Gradients flow to BOTH inputs: d_offset (unit rows get g*mask*dist*w,
heat rows get the dist + softmax terms) and d_depth (the coords z
channel; the mask comparison is non-differentiable, matching jnp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_maps(J):
    """E3 (3J, J): E3[3j+c, j] = 1;  C3sel (3J, 3): [r, r%3] = 1."""
    r = jax.lax.broadcasted_iota(jnp.int32, (3 * J, J), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (3 * J, J), 1)
    E3 = (r // 3 == jj).astype(jnp.float32)
    rc = jax.lax.broadcasted_iota(jnp.int32, (3 * J, 3), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (3 * J, 3), 1)
    C3sel = (rc % 3 == cc).astype(jnp.float32)
    return E3, C3sel


def _dot(a, b):
    # HIGHEST: these dots carry f32 codec values through 0/1
    # expansion/summing matrices — default (bf16-input) MXU passes would
    # round the values to ~1e-3 rel; exact f32 keeps the kernel within
    # reduction-order noise of the jnp path (measured 3e-4 -> 8e-8 max
    # fwd diff on the B=64/J=21/S=64 production shape)
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _common(x, depth, J, S, kernel_size, scale):
    """Shared fwd/bwd recompute: mask, softmax weights, dist, coords."""
    P = S * S
    mask = (depth < 0.99).astype(jnp.float32)            # (1, P)
    heat = x[3 * J:4 * J, :]                             # (J, P)
    hm = heat * mask
    sh = hm * scale
    m = jnp.max(sh, axis=1, keepdims=True)
    e = jnp.exp(sh - m)
    w = e / jnp.sum(e, axis=1, keepdims=True)            # (J, P)
    dist = kernel_size - hm * kernel_size                # (J, P)
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    u = ((pidx % S).astype(jnp.float32) + 0.5) / S * 2.0 - 1.0
    v = ((pidx // S).astype(jnp.float32) + 0.5) / S * 2.0 - 1.0
    coords = jnp.concatenate([u, v, depth], axis=0)      # (3, P)
    return mask, w, dist, coords


def _fwd_kernel(J, S, kernel_size, scale, x_ref, d_ref, out_ref):
    x = x_ref[0]                                         # (4J, P)
    depth = d_ref[0]                                     # (1, P)
    mask, w, dist, coords = _common(x, depth, J, S, kernel_size, scale)
    E3, C3sel = _row_maps(J)
    t3 = _dot(E3, mask * dist * w)                       # (3J, P)
    C3 = _dot(C3sel, coords)                             # (3J, P)
    w3 = _dot(E3, w)
    out_ref[0] = jnp.sum(x[0:3 * J, :] * t3 + C3 * w3, axis=1,
                         keepdims=True)                  # (3J, 1)


def _bwd_kernel(J, S, kernel_size, scale, x_ref, d_ref, g_ref,
                dx_ref, dd_ref):
    x = x_ref[0]
    depth = d_ref[0]
    g3 = g_ref[0]                                        # (3J, 1)
    mask, w, dist, coords = _common(x, depth, J, S, kernel_size, scale)
    E3, C3sel = _row_maps(J)
    S3 = E3.T                                            # (J, 3J)
    C3 = _dot(C3sel, coords)                             # (3J, P)
    U = _dot(S3, x[0:3 * J, :] * g3) * mask              # (J, P)
    V = dist * U + _dot(S3, g3 * C3)                     # (J, P)
    A = jnp.sum(V * w, axis=1, keepdims=True)            # (J, 1)
    d_heat = mask * w * (scale * (V - A) - kernel_size * U)
    d_unit3 = (g3 * mask) * _dot(E3, dist * w)           # (3J, P)
    dx_ref[0, 0:3 * J, :] = d_unit3
    dx_ref[0, 3 * J:4 * J, :] = d_heat
    w3 = _dot(E3, w)
    rz = jax.lax.broadcasted_iota(jnp.int32, (3 * J, 1), 0)
    gz3 = jnp.where(rz % 3 == 2, g3, 0.0)                # (3J, 1)
    dd_ref[0] = jnp.sum(w3 * gz3, axis=0, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def decode_pallas(offset, depth_s, kernel_size, scale):
    """offset (B, 4J, S, S) f32 + depth_s (B, 1, S, S) f32 -> (B, J, 3).

    Fused Pallas equivalent of offset2joint_softmax AFTER the depth has
    been resized to the feature size (resize stays in XLA so its
    nearest-neighbor gradient scatter is handled there)."""
    return _decode_fwd_call(offset, depth_s, kernel_size, scale)


def _decode_fwd_call(offset, depth_s, kernel_size, scale):
    B, C, S, _ = offset.shape
    J = C // 4
    P = S * S
    x = offset.reshape(B, C, P)
    d = depth_s.reshape(B, 1, P)
    kern = functools.partial(_fwd_kernel, J, S,
                             float(kernel_size), float(scale))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, 3 * J, 1), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, C, P), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3 * J, 1), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x.astype(jnp.float32), d.astype(jnp.float32))
    return out.reshape(B, J, 3)


def _decode_fwd(offset, depth_s, kernel_size, scale):
    return (_decode_fwd_call(offset, depth_s, kernel_size, scale),
            (offset, depth_s))


def _decode_bwd(kernel_size, scale, res, g):
    offset, depth_s = res
    B, C, S, _ = offset.shape
    J = C // 4
    P = S * S
    x = offset.reshape(B, C, P)
    d = depth_s.reshape(B, 1, P)
    g3 = g.reshape(B, 3 * J, 1)
    kern = functools.partial(_bwd_kernel, J, S,
                             float(kernel_size), float(scale))
    dx, dd = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((B, C, P), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, P), jnp.float32)),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, C, P), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * J, 1), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, C, P), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(x.astype(jnp.float32), d.astype(jnp.float32),
      g3.astype(jnp.float32))
    return (dx.reshape(offset.shape).astype(offset.dtype),
            dd.reshape(depth_s.shape).astype(depth_s.dtype))


decode_pallas.defvjp(_decode_fwd, _decode_bwd)


# ---------------------------------------------------------------------------
# encode: joint2offset (joints -> offset field + cone heatmap)
# ---------------------------------------------------------------------------

def _enc_common(j3, img, J, S, kernel_size):
    """Shared fwd/bwd: offsets, distances, heat, mask."""
    P = S * S
    E3, C3sel = _row_maps(J)
    S3 = E3.T
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    u = ((pidx % S).astype(jnp.float32) + 0.5) / S * 2.0 - 1.0
    v = ((pidx // S).astype(jnp.float32) + 0.5) / S * 2.0 - 1.0
    coords = jnp.concatenate([u, v, img], axis=0)        # (3, P)
    C3 = _dot(C3sel, coords)                             # (3J, P)
    off3 = j3 - C3                                       # (3J, P)
    dist = jnp.sqrt(_dot(S3, off3 * off3) + 1e-8)        # (J, P)
    heat = (kernel_size - dist) / kernel_size
    fg = (img < 0.99).astype(jnp.float32)                # (1, P)
    m = (heat >= 0).astype(jnp.float32) * fg             # (J, P)
    return E3, S3, off3, dist, heat, m


def _enc_fwd_kernel(J, S, kernel_size, j_ref, d_ref, out_ref):
    j3 = j_ref[0]                                        # (3J, 1)
    img = d_ref[0]                                       # (1, P)
    E3, S3, off3, dist, heat, m = _enc_common(j3, img, J, S, kernel_size)
    out_ref[0, 0:3 * J, :] = off3 / _dot(E3, dist) * _dot(E3, m)
    out_ref[0, 3 * J:4 * J, :] = heat * m


def _enc_bwd_kernel(J, S, kernel_size, j_ref, d_ref, g_ref,
                    dj_ref, dd_ref):
    j3 = j_ref[0]
    img = d_ref[0]
    E3, S3, off3, dist, heat, m = _enc_common(j3, img, J, S, kernel_size)
    gu = g_ref[0, 0:3 * J, :]                            # (3J, P)
    gh = g_ref[0, 3 * J:4 * J, :]                        # (J, P)
    rd = 1.0 / dist                                      # (J, P)
    # d(out_unit)/d(dist) = -m * off3 * rd^2 summed over the joint's
    # 3 rows; d(out_heat)/d(dist) = -m / k
    Su = _dot(S3, gu * off3)                             # (J, P)
    ddist = -m * (rd * rd * Su + gh / kernel_size)       # (J, P)
    # d dist / d off3 = off3 * rd
    d_off3 = (gu * _dot(E3, m * rd)
              + off3 * _dot(E3, rd * ddist))             # (3J, P)
    dj_ref[0] = jnp.sum(d_off3, axis=1, keepdims=True)   # (3J, 1)
    rz = jax.lax.broadcasted_iota(jnp.int32, (3 * J, 1), 0)
    mz = (rz % 3 == 2).astype(jnp.float32)
    dd_ref[0] = -jnp.sum(d_off3 * mz, axis=0, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def encode_pallas(joint, img_s, kernel_size):
    """joint (B, J, 3) normalized uvd + img_s (B, 1, S, S) f32 (already
    at the feature size) -> (B, 4J, S, S) f32.

    Fused Pallas equivalent of joint2offset; gradients flow to the
    joints and (through the depth coordinate) to the image."""
    return _encode_fwd_call(joint, img_s, kernel_size)


def _encode_fwd_call(joint, img_s, kernel_size):
    B, J, _ = joint.shape
    S = img_s.shape[-1]
    P = S * S
    j3 = joint.reshape(B, 3 * J, 1)
    d = img_s.reshape(B, 1, P)
    kern = functools.partial(_enc_fwd_kernel, J, S, float(kernel_size))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, 4 * J, P), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3 * J, 1), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4 * J, P), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
    )(j3.astype(jnp.float32), d.astype(jnp.float32))
    return out.reshape(B, 4 * J, S, S)


def _encode_fwd(joint, img_s, kernel_size):
    return _encode_fwd_call(joint, img_s, kernel_size), (joint, img_s)


def _encode_bwd(kernel_size, res, g):
    joint, img_s = res
    B, J, _ = joint.shape
    S = img_s.shape[-1]
    P = S * S
    j3 = joint.reshape(B, 3 * J, 1)
    d = img_s.reshape(B, 1, P)
    gp = g.reshape(B, 4 * J, P)
    kern = functools.partial(_enc_bwd_kernel, J, S, float(kernel_size))
    dj, dd = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((B, 3 * J, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, P), jnp.float32)),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3 * J, 1), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * J, P), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 3 * J, 1), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(j3.astype(jnp.float32), d.astype(jnp.float32),
      gp.astype(jnp.float32))
    return (dj.reshape(joint.shape).astype(joint.dtype),
            dd.reshape(img_s.shape).astype(img_s.dtype))


encode_pallas.defvjp(_encode_fwd, _encode_bwd)
