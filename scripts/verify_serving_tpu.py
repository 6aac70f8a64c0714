"""On-TPU drive of the serving engine (dsf_tpu/serving.py).

Exercises the production inference surface on the real chip:
bucketed jit predict at the production 128^2 input size, the raw-depth
path (host crop + CoM fallback), bucket-padding invariance, the
jax.export artifact round trip, and latency/throughput numbers.

Prints one JSON line with the measurements; exits non-zero on any
contract violation.  Run with the TPU idle (one program at a time
through the axon tunnel).
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
    from dsf_tpu import geometry as geo
    from dsf_tpu.config import Config
    from dsf_tpu.mano import synthetic
    from dsf_tpu.serving import InferenceEngine, load_exported

    assert jax.devices()[0].platform != "cpu", jax.devices()
    S = 128
    mano_path = "/tmp/dsf_serve_syn_mano.npz"
    if not os.path.exists(mano_path):
        synthetic.save_synthetic_mano(mano_path)
    cfg = Config(dataset="nyu", stage_num=2, input_size=S,
                 mano_model_path=mano_path,
                 compute_dtype=os.environ["DSF_COMPUTE_DTYPE"])
    eng = InferenceEngine(cfg, None, buckets=(1, 4, 32))
    key = jax.random.PRNGKey(0)
    img0 = jnp.zeros((1, 1, S, S))
    center0 = jnp.asarray([[0.0, 0.0, 750.0]])
    cube0 = jnp.full((1, 3), 250.0)
    eng.variables = eng.net.init(key, img0, eng.renderer, center0, cube0,
                                 train=False)

    t0 = time.perf_counter()
    eng.warmup()
    warmup_s = time.perf_counter() - t0

    rng = np.random.RandomState(0)

    def inputs(B, seed=0):
        r = np.random.RandomState(seed)
        img = r.uniform(-1, 1, (B, 1, S, S)).astype(np.float32)
        center = r.uniform([-40, -40, 650], [40, 40, 900],
                           (B, 3)).astype(np.float32)
        cube = np.full((B, 3), 250.0, np.float32)
        com = geo.xyz_to_uvd(center, eng.paras)
        M = np.asarray(geo.crop_matrix(com, cube, eng.paras, (S, S)))
        return img, center, M, cube

    # ---- contract: shapes / finiteness / world frame -------------------
    img, center, M, cube = inputs(4)
    out = eng.predict(img, center, M, cube)
    for idx in (0, 1):
        assert out[f"joint_xyz_mm_{idx}"].shape == (4, 21, 3)
        assert np.isfinite(out[f"joint_xyz_mm_{idx}"]).all()
        assert out[f"mano_mesh_mm_{idx}"].shape == (4, 779, 3)
    d = np.linalg.norm(out["joint_xyz_mm_1"] - center[:, None], axis=-1)
    assert (d < 500).all(), d.max()

    # ---- contract: bucket padding is invisible -------------------------
    i3, c3, m3, q3 = (x[:3] for x in inputs(4, seed=7))
    out3 = eng.predict(i3, c3, m3, q3)        # pads into the 4-bucket
    i4, c4, m4, q4 = inputs(4, seed=7)
    out4 = eng.predict(i4, c4, m4, q4)
    np.testing.assert_allclose(out3["joint_xyz_mm_1"],
                               out4["joint_xyz_mm_1"][:3], rtol=0, atol=0)

    # ---- contract: raw-depth path (host crop + CoM fallback) -----------
    depth = np.zeros((480, 640), np.float32)
    depth[200:280, 280:360] = 750.0 + rng.uniform(-20, 20, (80, 80))
    outr = eng.predict_from_depth(depth)
    assert np.isfinite(outr["joint_xyz_mm"]).all()
    dd = np.linalg.norm(outr["joint_xyz_mm"].mean(axis=(0, 1))
                        - np.array([0, 0, 750.0]))
    assert dd < 400, dd

    # ---- latency / throughput ------------------------------------------
    def bench(B, iters=100):
        im, ce, mm, cu = inputs(B)
        # one call to settle transfers
        eng.predict(im, ce, mm, cu)
        ts = []
        for _ in range(iters):
            t = time.perf_counter()
            eng.predict(im, ce, mm, cu)
            ts.append(time.perf_counter() - t)
        ts = np.sort(np.asarray(ts))
        return dict(p50_ms=1e3 * float(np.percentile(ts, 50)),
                    p99_ms=1e3 * float(np.percentile(ts, 99)),
                    fps=B / float(ts.mean()))

    lat1 = bench(1)
    lat32 = bench(32)

    # pipelined throughput: async dispatch (as_numpy=False), one sync at
    # the end — the steady-state serving rate, free of per-call RTT
    # (which dominates p50 on a remote-attached chip)
    def bench_pipelined(B, iters=60):
        im, ce, mm, cu = inputs(B)
        outs = eng.predict(im, ce, mm, cu, as_numpy=False)
        jax.block_until_ready(outs["joint_xyz_mm"])
        t = time.perf_counter()
        for _ in range(iters):
            outs = eng.predict(im, ce, mm, cu, as_numpy=False)
        jax.block_until_ready(outs["joint_xyz_mm"])
        return dict(fps=B * iters / (time.perf_counter() - t))

    pipe32 = bench_pipelined(32)

    # async output rows must equal the sync path's
    outs_async = eng.predict(img, center, M, cube, as_numpy=False)
    np.testing.assert_allclose(np.asarray(outs_async["joint_xyz_mm_1"]),
                               out["joint_xyz_mm_1"], rtol=0, atol=0)

    # ---- jax.export artifact round trip --------------------------------
    art = "/tmp/dsf_serve_export.bin"
    eng.export(art, bucket=4)
    fn = load_exported(art)
    oute = fn(*(jnp.asarray(x) for x in inputs(4, seed=7)))
    key_e = ("joint_xyz_mm_1" if isinstance(oute, dict)
             and "joint_xyz_mm_1" in oute else None)
    if key_e:
        np.testing.assert_allclose(np.asarray(oute[key_e]),
                                   out4["joint_xyz_mm_1"], rtol=1e-5,
                                   atol=1e-3)

    print(json.dumps({
        "platform": str(jax.devices()[0]),
        "input_size": S, "buckets": [1, 4, 32],
        "warmup_s": round(warmup_s, 1),
        "batch1": {k: round(v, 2) for k, v in lat1.items()},
        "batch32": {k: round(v, 2) for k, v in lat32.items()},
        "batch32_pipelined": {k: round(v, 2) for k, v in pipe32.items()},
        "export_roundtrip": bool(key_e) or "no-dict-output",
        "ok": True,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
