"""Smoke test: the Consis-CycleGAN trainer steps and losses are finite,
and the exported generator plugs into the transfer-net slot."""

import numpy as np
import jax
import jax.numpy as jnp

from dsf_tpu.training.cyclegan_trainer import CycleGANTrainer


def test_cyclegan_step_and_export():
    tr = CycleGANTrainer(ngf=8, n_blocks=2)
    state = tr.init_state(jax.random.PRNGKey(0), (2, 1, 64, 64))
    step = tr.train_step_fn()
    rng = np.random.RandomState(0)
    synth = jnp.asarray(rng.uniform(-1, 1, (2, 1, 64, 64)).astype(np.float32))
    real = jnp.asarray(rng.uniform(-1, 1, (2, 1, 64, 64)).astype(np.float32))
    losses = []
    for i in range(3):
        state, m = step(state, synth, real)
        losses.append({k: float(v) for k, v in m.items()})
    for m in losses:
        assert all(np.isfinite(v) for v in m.values()), m
    assert int(state.step) == 3

    # exported generator applies as the transfer net
    variables = tr.export_transfer_variables(state)
    out = tr.G_A.apply(variables, synth)
    assert out.shape == synth.shape
    assert float(jnp.abs(out).max()) <= 1.0
