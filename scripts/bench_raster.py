"""Standalone TPU bench of the skip-raster kernel variants.

Chained harness (zbuf feeds the next iteration's verts) so tunnel RTT
amortizes — isolated timeit through the axon tunnel is unreliable
(docs/PERFORMANCE.md).  Shapes mirror the in-step loss render: 2B=64
rows, 128^2 crop, 1554 MANO-scale faces with face-order locality
(vertex bands, like a real mesh), which is what the bbox skip exploits.

Usage: python scripts/bench_raster.py [iters=30]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dsf_jax_cache")

import jax              # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dsf_tpu.ops import rasterize as R                 # noqa: E402
from dsf_tpu.ops.pallas_raster import raster_pallas_skip  # noqa: E402

HW = (128, 128)
PARAS = (588.0, 587.0, 64.0, 64.0)


def make_inputs(B=64, V=779, F=1554, seed=0):
    rng = np.random.RandomState(seed)
    # MANO-like: vertices on a blob, faces joining NEARBY vertex ids so
    # consecutive faces project nearby (the locality the skip uses)
    verts = (rng.randn(B, V, 3) * 30 + [0, 0, 400]).astype(np.float32)
    base = rng.randint(0, V - 8, F)
    offs = np.stack([np.zeros(F, int),
                     1 + rng.randint(0, 7, F),
                     1 + rng.randint(0, 7, F)], axis=1)
    faces = ((base[:, None] + offs) % V).astype(np.int32)
    bad = ((faces[:, 0] == faces[:, 1]) | (faces[:, 1] == faces[:, 2])
           | (faces[:, 0] == faces[:, 2]))
    faces[bad] = [[0, 1, 2]]
    pix = np.broadcast_to(np.asarray(R.full_frame_pixel_rays(HW)),
                          (B, HW[0] * HW[1], 2)).astype(np.float32)
    return jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(pix)


def bench(fn, verts, faces, pix, iters):
    @jax.jit
    def chained(verts):
        def body(v, _):
            proj = R.project_verts(v, PARAS)
            z, _i = fn(proj, pix, faces)
            # feed the zbuf back so iterations serialize
            return v + 1e-12 * z.mean(), None
        v, _ = jax.lax.scan(body, verts, None, length=iters)
        return v

    out = chained(verts)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chained(verts)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    verts, faces, pix = make_inputs()

    def skip(use_mxu, fc=64, block=(16, 16)):
        return lambda p, x, f: raster_pallas_skip(
            p, x, f, fc=fc, tile_hw=HW, block=block, use_mxu=use_mxu)

    cfgs = [
        ("scan", lambda p, x, f: R._raster_scan(p, x, f)),
        ("skip vpu 16x16/fc64", skip(False)),
        ("skip mxu 16x16/fc64", skip(True)),
        ("skip mxu 16x16/fc128", skip(True, fc=128)),
        ("skip mxu 16x32/fc128", skip(True, fc=128, block=(16, 32))),
    ]
    proj = R.project_verts(verts, PARAS)
    ref_z = None
    for name, fn in cfgs:
        z, _ = fn(proj, pix, faces)
        z = np.asarray(z)
        if ref_z is None:
            ref_z = z
        else:
            err = np.abs(z - ref_z).max()
            # mxu reassociates the edge dot -> ulp-level coverage flips
            assert err < 1.0, (name, err)
    # interleaved repeats: tunnel/host noise hits every config equally
    times = {name: [] for name, _ in cfgs}
    for _rep in range(3):
        for name, fn in cfgs:
            times[name].append(bench(fn, verts, faces, pix, iters))
    for name, _ in cfgs:
        ts = times[name]
        print(f"{name:24s} min {min(ts):7.2f} ms   all "
              + " ".join(f"{t:.2f}" for t in ts))


if __name__ == "__main__":
    main()
