"""Standalone TPU bench of the ICP nearest-face kernels.

Chained harness (output feeds next input) so tunnel RTT amortizes —
isolated timeit through the axon tunnel is unreliable (PERFORMANCE.md).
Shapes mirror the fused in-step ICP call: 2B rows where B rows admit
every face (full-cloud ICP) and B rows carry the 15-part joint mask.

Usage: python scripts/bench_icp.py [iters=30]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dsf_jax_cache")

import jax              # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dsf_tpu.ops import point_mesh as pm                     # noqa: E402
from dsf_tpu.ops import pallas_point_mesh as PPM             # noqa: E402


def make_inputs(B=32, P=2048, V=779, F=1554, seed=0):
    rng = np.random.RandomState(seed)
    verts = (rng.randn(2 * B, V, 3) * 0.3).astype(np.float32)
    faces = np.stack([rng.choice(V, 3, replace=False)
                      for _ in range(F)]).astype(np.int32)
    pts = (rng.randn(2 * B, P, 3) * 0.5).astype(np.float32)
    # 15-part skinning-style mask: contiguous vertex bands per part,
    # faces admitted by the parts of their vertices (tight, like MANO)
    vpart = np.minimum(np.arange(V) * 15 // V, 14)
    mask = np.zeros((F, 15), bool)
    for k in range(3):
        mask[np.arange(F), vpart[faces[:, k]]] = True
    table = np.concatenate([mask, np.ones((F, 1), bool)], axis=1)
    ppart_joint = rng.randint(0, 15, (B, P)).astype(np.int32)
    ppart = np.concatenate(
        [np.full((B, P), 15, np.int32), ppart_joint], axis=0)
    return (jnp.asarray(pts), jnp.asarray(verts), jnp.asarray(faces),
            table, jnp.asarray(ppart))


def bench(fn, pts, tris, table, ppart, iters):
    @jax.jit
    def chained(pts):
        def body(p, _):
            d, _i = fn(p, tris, jnp.asarray(table), ppart)
            # feed the distance back so iterations serialize
            return p + 1e-12 * d[..., None], None
        p, _ = jax.lax.scan(body, pts, None, length=iters)
        return p

    out = chained(pts)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chained(pts)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    pts, verts, faces, table, ppart = make_inputs()

    # production-path face permutation for v2
    f2, m2 = pm._static_part_perm(np.asarray(faces), table)
    tris = verts[:, faces]
    tris2 = verts[:, jnp.asarray(f2)]

    def v2(fc_n, tile_n, use_mxu=False):
        return lambda p, t, m, q: PPM.argmin_faces_pallas_v2(
            p, tris2, jnp.asarray(m2), q, fc_n=fc_n, tile_n=tile_n,
            use_mxu=use_mxu)

    # point-sorted variant: order each joint row's points by part so
    # tiles are part-coherent and the tile-union bitmask can clear.
    # (Random-part tiles admit every chunk — the skip never fires.)
    psort = np.argsort(np.asarray(ppart), axis=1, kind="stable")
    pts_s = jnp.take_along_axis(pts, jnp.asarray(psort)[..., None], 1)
    ppart_s = jnp.take_along_axis(jnp.asarray(ppart),
                                  jnp.asarray(psort), 1)

    def v2s(fc_n, tile_n):
        return lambda p, t, m, q: PPM.argmin_faces_pallas_v2(
            pts_s, tris2, jnp.asarray(m2), ppart_s, fc_n=fc_n,
            tile_n=tile_n)

    # fc_n must be a multiple of 128: the kernel slices the face table's
    # lane axis at offsets ci*fc_n and Mosaic requires provable 128-
    # alignment (fc_n=64 fails to compile).
    cfgs = [
        ("v1 dense", lambda p, t, m, q: PPM.argmin_faces_pallas(p, tris, m, q)),
        ("v2 skip 512/128", v2(128, 512)),
        ("v2 skip 256/128", v2(128, 256)),
        ("v2 sorted 512/128", v2s(128, 512)),
        ("v2 sorted 256/128", v2s(128, 256)),
        ("v2 sorted 128/128", v2s(128, 128)),
    ]
    inv = np.argsort(psort, axis=1, kind="stable")
    ref_d = None
    for name, fn in cfgs:
        d, _ = fn(pts, None, jnp.asarray(table), ppart)
        d = np.asarray(d)
        if "sorted" in name:          # undo the point permutation
            d = np.take_along_axis(d, inv, axis=1)
        if ref_d is None:
            ref_d = d
        else:
            err = np.abs(d - ref_d).max()
            assert err < 1e-4, (name, err)
    # interleaved repeats: tunnel/host noise hits every config equally
    times = {name: [] for name, _ in cfgs}
    for _rep in range(3):
        for name, fn in cfgs:
            times[name].append(bench(fn, pts, None, table, ppart, iters))
    for name, _ in cfgs:
        ts = times[name]
        print(f"{name:26s} min {min(ts):7.2f} ms   all "
              + " ".join(f"{t:.2f}" for t in ts))


if __name__ == "__main__":
    main()
