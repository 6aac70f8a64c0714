"""Standalone bench of the frozen CycleGAN generator pass (the
in-step domain-transfer cost, ref transfer.py:393-449 ResnetGenerator:
9 blocks, reflect pads, thin-channel head/tail convs).

The full step runs G once per iteration on the synth image
(train_render.py:639).  This isolates its device cost so the
remaining-119-ms budget in docs/PERFORMANCE.md can attribute it.

Chained-scan harness (tunnel-RTT-immune, the repo's standard): one jit
of lax.scan(length=ITERS) over the generator, time / ITERS.

Run on the TPU:  python scripts/bench_cyclegan.py
Optional: DSF_CG_SIZE=128 DSF_CG_BATCH=32 CG_ITERS=20
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("DSF_COMPUTE_DTYPE", "bfloat16")
    import jax
    import jax.numpy as jnp
    from dsf_tpu.models.cyclegan import ResnetGenerator

    B = int(os.environ.get("DSF_CG_BATCH", "32"))
    S = int(os.environ.get("DSF_CG_SIZE", "128"))
    iters = int(os.environ.get("CG_ITERS", "20"))
    dtype = jnp.bfloat16 if os.environ["DSF_COMPUTE_DTYPE"] == "bfloat16" \
        else jnp.float32

    G = ResnetGenerator(dtype=dtype)
    params = G.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 1, S, S), dtype))["params"]

    @jax.jit
    def chained(x):
        def body(c, _):
            y = G.apply({"params": params}, c)
            # feed the output back in (same shape) so scan can't hoist
            return y.astype(c.dtype), None
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    x = jnp.asarray(np.random.RandomState(0)
                    .uniform(-1, 1, (B, 1, S, S)).astype(np.float32),
                    dtype=dtype)
    out = chained(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chained(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    # MXU work of ONE generator pass for the roofline line
    from dsf_tpu.training import flops as F
    fl = F.mxu_flops(lambda x: G.apply({"params": params}, x), x)
    mfu = F.mfu(fl["tflops"], dt)
    print(json.dumps({
        "metric": "cyclegan_g_fwd_ms", "value": round(dt * 1e3, 2),
        "unit": "ms", "batch": B, "size": S,
        "tflop_per_pass": round(fl["tflops"], 3),
        "n_convs": fl["n_convs"],
        "mfu": round(mfu, 3),
    }))


if __name__ == "__main__":
    main()
