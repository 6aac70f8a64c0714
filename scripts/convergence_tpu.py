"""On-TPU Pretrain convergence run: evidence the full synthetic
training vertical (MANO LBS -> raster -> CycleGAN -> net -> losses ->
AdamW) optimizes on the real chip, not just compiles.

Runs N Pretrain steps (fresh random 61-D MANO params each step, the
hands20 distribution shape — SURVEY §2.2 workload 1) and records the
per-stage pixel/MANO mm-error curves.  Prints a JSON summary and writes
the full curve to --out (default /tmp/dsf_convergence.json).

Pass criterion printed in the summary: tail-mean error < 0.5x
head-mean error for both branches (random-init errors start ~100mm on
synthetic data; any real optimization collapses them quickly).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("DSF_COMPUTE_DTYPE", "bfloat16")
    steps = int(os.environ.get("CONV_STEPS", "1500"))
    every = int(os.environ.get("CONV_LOG_EVERY", "25"))
    out_path = os.environ.get("CONV_OUT", "/tmp/dsf_convergence.json")

    import jax
    import jax.numpy as jnp
    import __graft_entry__ as ge

    tr = ge._build(batch=32)
    state = tr.init_state()
    step = tr.train_step_fn("Pretrain")
    B = 32

    rng = np.random.RandomState(0)

    def synth_batch():
        return {
            "model_para": jnp.asarray(np.concatenate(
                [rng.uniform(-1, 1, (B, 3)), rng.randn(B, 45) * 0.5,
                 rng.randn(B, 10) * 0.5, np.ones((B, 1)),
                 np.zeros((B, 3))], axis=1).astype(np.float32)),
            "cube_synth": jnp.full((B, 3), 250.0),
        }

    key = jax.random.PRNGKey(0)
    curve = []
    t0 = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sub, synth_batch())
        if i % every == 0 or i == steps - 1:
            m = {k: float(v) for k, v in metrics.items()
                 if k.startswith(("pixel_error", "mano_error")) or k == "loss"}
            m["step"] = i
            curve.append(m)
            print(json.dumps(m), flush=True)
    jax.block_until_ready(state.params)
    wall = time.perf_counter() - t0

    def mean_of(key_, pts):
        vals = [p[key_] for p in pts if key_ in p]
        return float(np.mean(vals)) if vals else float("nan")

    head, tail = curve[:1], curve[-3:]    # step 0 = random-init errors
    summary = {"steps": steps, "wall_s": round(wall, 1),
               "fps": round(steps * B / wall, 1), "ok": True}
    for k in sorted(curve[-1]):
        if not k.startswith(("pixel_error", "mano_error")):
            continue
        h, t = mean_of(k, head), mean_of(k, tail)
        summary[k] = {"init_mm": round(h, 2), "tail_mm": round(t, 2)}
        if not (np.isfinite(t) and t < 0.6 * h):
            summary["ok"] = False

    with open(out_path, "w") as f:
        json.dump({"summary": summary, "curve": curve}, f)
    print(json.dumps(summary))
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
