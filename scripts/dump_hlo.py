"""Dump the compiled HLO of the FinetuneStage train step.

Writes <out>/step_hlo.txt (compiled, post-fusion names match xplane
kernel names) so hot fusions from trace_report can be mapped to ops.

Usage: python scripts/dump_hlo.py [outdir=/tmp/dsf_hlo]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("DSF_COMPUTE_DTYPE", "bfloat16")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dsf_jax_cache")
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dsf_hlo"
    os.makedirs(out, exist_ok=True)

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
    lowered = jax.jit(step).lower(state, key, batch)
    compiled = lowered.compile()
    txt = compiled.as_text()
    path = os.path.join(out, "step_hlo.txt")
    with open(path, "w") as f:
        f.write(txt)
    print(path, len(txt))


if __name__ == "__main__":
    main()
