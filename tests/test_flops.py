"""MXU FLOP walker (dsf_tpu/training/flops.py): exact counts on known
shapes, recursion through jit/scan, and the mfu helper."""

import jax
import jax.numpy as jnp

from dsf_tpu.training import flops as F


def test_conv_and_dot_exact():
    def f(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.reshape(y.shape[0], -1) @ jnp.ones((8 * 8 * 16, 7))

    x = jnp.zeros((2, 8, 8, 3))
    w = jnp.zeros((3, 3, 3, 16))
    r = F.mxu_flops(f, x, w)
    assert r["n_convs"] == 1 and r["n_dots"] == 1
    assert abs(r["conv_tflops"] * 1e12 - 2 * 2 * 8 * 8 * 16 * 3 * 3 * 3) < 1
    assert abs(r["dot_tflops"] * 1e12 - 2 * 2 * (8 * 8 * 16) * 7) < 1


def test_grouped_conv():
    # feature_group_count=4: per-group C_in is rhs's I dim already
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", feature_group_count=4,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x = jnp.zeros((1, 4, 4, 8))
    w = jnp.zeros((3, 3, 2, 8))      # I=8/4=2 per group, O=8
    r = F.mxu_flops(f, x, w)
    assert abs(r["conv_tflops"] * 1e12 - 2 * (1 * 4 * 4 * 8) * 3 * 3 * 2) < 1


def test_scan_multiplier_and_jit_recursion():
    def g(x):
        def body(c, _):
            return c @ jnp.ones((4, 4)), None
        return jax.lax.scan(body, x, None, length=5)[0]

    r = F.mxu_flops(jax.jit(g), jnp.zeros((4, 4)))
    assert abs(r["dot_tflops"] * 1e12 - 5 * 2 * 4 * 4 * 4) < 1


def test_batched_dot_general():
    def f(a, b):
        return jnp.einsum("bij,bjk->bik", a, b)

    r = F.mxu_flops(f, jnp.zeros((3, 5, 6)), jnp.zeros((3, 6, 7)))
    assert abs(r["dot_tflops"] * 1e12 - 2 * 3 * 5 * 7 * 6) < 1


def test_mfu():
    # 1 TFLOP in 10 ms = 100 TFLOP/s; peak 200 -> 0.5
    assert abs(F.mfu(1.0, 0.010, peak_tflops=200.0) - 0.5) < 1e-9
