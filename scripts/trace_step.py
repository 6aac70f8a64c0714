"""Capture an xplane trace of the FinetuneStage train step on the TPU.

Writes the trace under /tmp/dsf_trace/<ts>/ and prints the directory.
Analyze with scripts/trace_report.py (kernel time breakdown).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("DSF_COMPUTE_DTYPE", "bfloat16")
    import jax
    import jax.numpy as jnp
    from dsf_tpu import geometry as geo
    import __graft_entry__ as ge

    tr = ge._build(batch=32)
    state = tr.init_state()
    step = tr.train_step_fn(os.environ.get("TRACE_PHASE", "FinetuneStage"))

    rng = np.random.RandomState(0)
    B = 32
    paras = tr.renderer.paras
    center = jnp.asarray(
        rng.uniform([-50, -50, 700], [50, 50, 900], (B, 3)).astype(np.float32))
    cube = jnp.full((B, 3), 250.0)
    com = geo.xyz_to_uvd(center, paras)
    M = geo.crop_matrix(com, cube, paras, (128, 128))
    batch = {
        "model_para": jnp.asarray(np.concatenate(
            [rng.uniform(-1, 1, (B, 3)), rng.randn(B, 45) * 0.5,
             rng.randn(B, 10) * 0.5, np.ones((B, 1)), np.zeros((B, 3))],
            axis=1).astype(np.float32)),
        "cube_synth": jnp.full((B, 3), 250.0),
        "img": jnp.asarray(rng.uniform(-1, 1, (B, 1, 128, 128)).astype(np.float32)),
        "xyz_gt": jnp.asarray(rng.uniform(-1, 1, (B, 14, 3)).astype(np.float32)),
        "center": center, "M": M, "cube": cube,
    }

    key = jax.random.PRNGKey(0)
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sub, batch)
    jax.block_until_ready(metrics["loss"])

    out = "/tmp/dsf_trace/%d" % int(time.time())
    jax.profiler.start_trace(out)
    for _ in range(int(os.environ.get("TRACE_ITERS", "3"))):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sub, batch)
    jax.block_until_ready(metrics["loss"])
    jax.profiler.stop_trace()
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
