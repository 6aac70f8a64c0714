"""Pallas TPU kernel: taps-as-channels tail convolution (C_out=1).

XLA lowers a C_out=1 convolution (the CycleGAN generator's 7x7 64->1
head, ref transfer.py:446-449) to a VPU loop fusion: with one output
channel the MXU would use 1 of 128 result lanes, so the compiler never
tiles it onto the systolic array.  Measured in the round-5 step trace:
2.26 ms at ~1% MXU for B=32/128^2 — the single worst-roofline kernel
of the CycleGAN pass (docs/PERFORMANCE.md).

The fix splits the conv into two parts that each map onto the hardware:

  1. taps-as-channels contraction (MXU): t[k, b, y, x] =
     sum_c W[ky, kx, c] * X[b, y, x, c]   — one dot_general with
     49 output rows, contraction depth C (=64): a real matmul.
  2. shift-sum (VPU, this kernel): out[b, i, j] =
     sum_k t[k, b, i+ky(k), j+kx(k)]      — 49 statically-shifted
     [H, W] slice-adds per image, with t laid out TAP-major so each
     slice is a plain (sublane, lane) window load.

The same reformulation expressed in pure XLA was measured 4x WORSE
(8.7 ms: the 49-way shift-sum materializes as a pad/add fusion chain,
round-3 dead-end ledger) — the trick only wins when the shift-sum is a
single VMEM-resident kernel, which is exactly what this file provides.

The jnp reference path (`_reference_tail`) reproduces flax nn.Conv's
semantics exactly and serves CPU, parity tests, and the backward pass
(the VJP recomputes through the reference implementation — the hot
training step never differentiates the frozen generator, and the
CycleGAN trainer that does is not throughput-critical).

MEASURED (v5e, B=32, 134x134x64 head input, bf16, round 5) — a WASH:

  * isolated op: fused 1.71 ms vs XLA conv 2.26 ms (-0.55 ms), but the
    tap contraction + f32 t-buffer traffic eats most of the VPU-loop
    saving (t is [49, B, 136, 136] f32 = 145 MB of HBM round-trip;
    VMEM limits force 4 tap-chunked pallas_calls whose partials sum
    in XLA).
  * full generator graph A/B (interleaved, same process): OFF
    10.06 ms vs ON 10.03 ms — no in-graph win; XLA overlaps the VPU
    loop fusion with neighboring MXU work, so the isolated saving
    does not compose.

Kept OFF by default (DSF_FUSED_TAIL=1 to enable) per the dead-end
ledger convention: a neutral lever with extra moving parts is a loser.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _reference_tail(x, w, b, dtype):
    """Exactly flax nn.Conv(features=1, kernel=(K,K), VALID) + bias,
    then tanh; NHWC/HWIO."""
    if dtype is not None:
        x, w, b = x.astype(dtype), w.astype(dtype), b.astype(dtype)
    y = lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.tanh(y + b)


def _shift_sum_kernel(K, H, W, k_lo, k_hi, t_ref, o_ref):
    acc = jnp.zeros((H, W), jnp.float32)
    for k in range(k_lo, k_hi):
        ky, kx = k // K, k % K
        acc = acc + t_ref[k - k_lo, 0,
                          ky:ky + H, kx:kx + W].astype(jnp.float32)
    o_ref[0] = acc


def _tap_chunks(K, Hp, Wp, budget_bytes=12 * 1024 * 1024):
    """Split the K*K taps into chunks whose double-buffered VMEM blocks
    fit the ~16 MB scoped-vmem limit (Mosaic pads blocks to (8, 128)
    tiles; a single 49x134x134 f32 block is 17 MB and fails to
    allocate — measured on v5e)."""
    hp = -(-Hp // 8) * 8
    wp = -(-Wp // 128) * 128
    per_tap = hp * wp * 4 * 2          # f32, double-buffered
    per_call = max(1, budget_bytes // per_tap)
    edges = list(range(0, K * K, per_call)) + [K * K]
    return list(zip(edges[:-1], edges[1:]))


def _fast_tail(x, w, b, dtype, interpret=False):
    """x (B, H+K-1, W+K-1, C) already padded; w (K, K, C, 1); b (1,)."""
    B, Hp, Wp, C = x.shape
    K = w.shape[0]
    H, W = Hp - K + 1, Wp - K + 1
    cdt = dtype if dtype is not None else x.dtype
    xk = x.astype(cdt)
    wk = w[..., 0].reshape(K * K, C).astype(cdt)
    # (K*K, C) x (B, Hp, Wp, C) -> (K*K, B, Hp, Wp): tap-major layout so
    # the kernel's shifted loads are plain 2-D windows
    # t stays f32: rounding the per-tap partial sums to bf16 before the
    # 49-way add costs ~0.03 abs on the tanh output (measured) while the
    # extra f32 traffic is ~0.07 ms — the reference conv accumulates all
    # 3136 terms in f32, so the shift-sum must too
    t = lax.dot_general(wk, xk, (((1,), (3,)), ((), ())),
                        preferred_element_type=jnp.float32)
    acc = None
    for k_lo, k_hi in _tap_chunks(K, Hp, Wp):
        part = pl.pallas_call(
            functools.partial(_shift_sum_kernel, K, H, W, k_lo, k_hi),
            grid=(B,),
            in_specs=[pl.BlockSpec((k_hi - k_lo, 1, Hp, Wp),
                                   lambda bi: (0, bi, 0, 0))],
            out_specs=pl.BlockSpec((1, H, W), lambda bi: (bi, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
            interpret=interpret,
        )(lax.slice_in_dim(t, k_lo, k_hi, axis=0))
        acc = part if acc is None else acc + part
    return jnp.tanh(acc.astype(cdt) + b.astype(cdt))[..., None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def tail_conv_tanh(x, w, b, dtype=None):
    """tanh(conv_{C_out=1}(x, w) + b) on NHWC, VALID padding.

    On TPU, runs the MXU-contraction + Pallas shift-sum formulation;
    elsewhere (and for the backward) the exact nn.Conv reference path.
    """
    if jax.default_backend() == "cpu":
        return _reference_tail(x, w, b, dtype)
    return _fast_tail(x, w, b, dtype)


def _tail_fwd(x, w, b, dtype):
    return tail_conv_tanh(x, w, b, dtype), (x, w, b)


def _tail_bwd(dtype, res, g):
    x, w, b = res
    _, vjp = jax.vjp(lambda *a: _reference_tail(*a, dtype), x, w, b)
    return vjp(g)


tail_conv_tanh.defvjp(_tail_fwd, _tail_bwd)
