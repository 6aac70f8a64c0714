"""Bound DP-vs-DPxFSDP training drift (VERDICT r4 weak-#3).

Round 4 characterized the mechanism: with ZeRO-3 parameter sharding,
GSPMD's layout reassociation flips a handful of hard gates (argmin
ties, mask thresholds) in the loss, so DP and DPxFSDP gradients differ
~5.6% L2 on step one even though a replicated-param control on the
same 2-D mesh is bitwise-equal to DP.  The open question was whether
that per-step difference ACCUMULATES into a training-relevant
divergence or stays inside run-to-run noise.

Protocol (8 virtual CPU devices, tiny 64^2 FinetuneStage — the dryrun
configuration):
  * A: pure-DP run, seed-0 PRNG stream          (the anchor)
  * B: pure-DP run, seed-1 PRNG stream          (run-to-run noise ref —
        identical init + identical data, only the per-step stochastic
        keys differ)
  * F: DPxFSDP (4x2) run, seed-0 PRNG stream    (identical init + data
        + keys as A; differs ONLY in sharding)
Every EVAL_EVERY steps, each state is evaluated on a fixed held-out
batch (per-stage pixel/MANO mm).  PASS iff at every checkpoint
|F - A| <= max(|B - A|, NOISE_FLOOR) per metric, i.e. the sharding
perturbs training no more than re-keying the same run does.

Writes docs/fsdp_drift_r5.json.  Run:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/fsdp_drift.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(os.environ.get("DRIFT_STEPS", "200"))
EVAL_EVERY = int(os.environ.get("DRIFT_EVAL_EVERY", "25"))
# mm floor under which differences are regarded as numerically silent
# regardless of the noise reference (the eval batch is B=8; one flipped
# hard gate moves a per-stage mean by ~1e-2 mm there)
NOISE_FLOOR = float(os.environ.get("DRIFT_NOISE_FLOOR", "0.05"))


def main():
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", "tests", ".jax_cache"))
    import jax.numpy as jnp
    import __graft_entry__ as ge
    from dsf_tpu import geometry as geo
    from dsf_tpu.parallel import mesh as pmesh

    n_dev = 8
    assert len(jax.devices()) >= n_dev

    def build(n_fsdp):
        mesh = pmesh.make_mesh(n_dev, jax.devices()[:n_dev], n_fsdp=n_fsdp)
        tr = ge._build(batch=n_dev, mesh=mesh, input_size=64)
        return tr

    def fixed_batch(tr, seed, B):
        rng = np.random.RandomState(seed)
        paras = tr.renderer.paras
        center = jnp.asarray(rng.uniform([-50, -50, 700], [50, 50, 900],
                                         (B, 3)).astype(np.float32))
        cube = jnp.full((B, 3), 250.0)
        M = geo.crop_matrix(geo.xyz_to_uvd(center, paras), cube, paras,
                            (64, 64))
        return {
            "model_para": jnp.asarray(np.concatenate(
                [rng.uniform(-1, 1, (B, 3)), rng.randn(B, 45) * 0.5,
                 rng.randn(B, 10) * 0.5, np.ones((B, 1)),
                 np.zeros((B, 3))], axis=1).astype(np.float32)),
            "cube_synth": jnp.full((B, 3), 250.0),
            "img": jnp.asarray(
                rng.uniform(-1, 1, (B, 1, 64, 64)).astype(np.float32)),
            "xyz_gt": jnp.asarray(
                rng.uniform(-1, 1, (B, 14, 3)).astype(np.float32)),
            "center": center, "M": M, "cube": cube,
        }

    # 4 distinct train batches cycled identically in every run + one
    # held-out eval batch
    def run(n_fsdp, key_seed, label):
        tr = build(n_fsdp)
        state = tr.init_state(seed=0)          # identical init everywhere
        step = tr.train_step_fn("FinetuneStage")
        eval_step = tr.eval_step_fn()
        train_batches = [pmesh.shard_batch(tr.mesh, fixed_batch(tr, s, n_dev))
                         for s in range(4)]
        ev = pmesh.shard_batch(tr.mesh, fixed_batch(tr, 99, n_dev))
        key = jax.random.PRNGKey(key_seed)
        curve = []
        t0 = time.time()
        for i in range(STEPS):
            key, sub = jax.random.split(key)
            state, metrics = step(state, sub, train_batches[i % 4])
            if (i + 1) % EVAL_EVERY == 0:
                errors, _ = eval_step(state.params, state.batch_stats, ev)
                e = np.asarray(errors).mean(axis=1)
                curve.append([round(float(x), 4) for x in e])
                print(json.dumps({"run": label, "step": i + 1,
                                  "pix_s1": curve[-1][0],
                                  "mano_s1": curve[-1][1],
                                  "pix_s2": curve[-1][2],
                                  "mano_s2": curve[-1][3],
                                  "loss": float(metrics["loss"])}),
                      flush=True)
        print(f"{label}: {STEPS} steps in {time.time() - t0:.0f}s",
              flush=True)
        return np.asarray(curve)                # (n_ckpts, 4)

    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "fsdp_drift_r5.json")
    out = {
        "steps": STEPS, "eval_every": EVAL_EVERY,
        "metrics": ["pix_s1", "mano_s1", "pix_s2", "mano_s2"],
        "noise_floor_mm": NOISE_FLOOR,
    }

    def dump():
        with open(path, "w") as fp:
            json.dump(out, fp, indent=1)

    # critical pair (DP vs FSDP, same seed) FIRST so a wall-clock cut
    # still yields the drift curve; partial results dump after each run
    a = run(1, 0, "DP_seed0")
    out["dp_seed0"] = a.tolist(); dump()
    f = run(2, 0, "FSDP_seed0")
    out["fsdp_seed0"] = f.tolist()
    drift = np.abs(f - a)
    out["abs_drift_fsdp_vs_dp"] = drift.tolist(); dump()
    b = run(1, 1, "DP_seed1")
    out["dp_seed1"] = b.tolist()
    noise = np.abs(b - a)
    bound = np.maximum(noise, NOISE_FLOOR)
    ok = bool((drift <= bound).all())
    out["abs_noise_dp_vs_dp"] = noise.tolist()
    out["ok"] = ok
    dump()
    print(json.dumps({"ok": ok, "max_drift": float(drift.max()),
                      "max_noise": float(noise.max())}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
