"""Fused C_out=1 tail convolution (ops/pallas_tapsum.py).

The op replaces the CycleGAN generator's 7x7 64->1 head conv + tanh
(ref transfer.py:446-449) with an MXU taps-as-channels contraction +
Pallas shift-sum on TPU.  These tests pin:
  * kernel parity vs the exact nn.Conv reference path (interpret mode)
  * flax integration: identical param tree, init values, and outputs
    with the fused head on/off
  * the custom-VJP backward against autodiff of the reference impl
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsf_tpu.ops import pallas_tapsum as pt


def _data(B=2, S=70, C=64, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, S, S, C).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, C, 1).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(1).astype(np.float32))
    return x, w, b


@pytest.mark.parametrize("dtype,tol", [(None, 1e-5), (jnp.bfloat16, 1e-5)])
def test_fast_path_matches_reference(dtype, tol):
    x, w, b = _data()
    ref = pt._reference_tail(x, w, b, dtype).astype(jnp.float32)
    fast = pt._fast_tail(x, w, b, dtype, interpret=True).astype(jnp.float32)
    assert ref.shape == fast.shape == (2, 64, 64, 1)
    # t is accumulated in f32 either way; only reduction order differs
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=tol)


def test_backward_matches_reference_grad():
    x, w, b = _data(B=1, S=16, C=8)
    g_op = jax.grad(lambda *a: pt.tail_conv_tanh(*a, None).sum(),
                    argnums=(0, 1, 2))(x, w, b)
    g_ref = jax.grad(lambda *a: pt._reference_tail(*a, None).sum(),
                     argnums=(0, 1, 2))(x, w, b)
    for a, b_ in zip(g_op, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)


def test_generator_fused_head_flag_equivalence(monkeypatch):
    """DSF_FUSED_TAIL on/off: same param tree (names, shapes, values —
    the RNG fold is by param path) and same outputs on CPU."""
    from dsf_tpu.models.cyclegan import ResnetGenerator
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(2, 1, 64, 64).astype(np.float32))

    def build(flag):
        monkeypatch.setenv("DSF_FUSED_TAIL", flag)
        g = ResnetGenerator()
        v = g.init(jax.random.PRNGKey(0), img)
        return v, g.apply(v, img)

    v1, o1 = build("1")
    v0, o0 = build("0")
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v0)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: bool((a == b).all()), v1, v0))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o0))
