"""Aggregate device-kernel time from an xplane trace directory.

Usage: python scripts/trace_report.py /tmp/dsf_trace/<ts> [top_n]

Finds the .xplane.pb under the dir, converts it with
tensorboard_plugin_profile, and prints a per-kernel exclusive-time
table (summed over trace iterations, so divide by TRACE_ITERS for
per-step numbers) plus a bucketed summary (conv/dot/fusion/raster/...).
"""

import glob
import json
import os
import sys
from collections import defaultdict


def load_trace_events(path):
    if path.endswith(".trace.json.gz"):
        import gzip
        with gzip.open(path, "rt") as f:
            return json.load(f)
    # xplane fallback (needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python
    # with the old generated protos in this image)
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([path], "trace_viewer", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    return json.loads(data)


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = (glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                       recursive=True)
             or glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                          recursive=True))
    assert paths, f"no trace under {trace_dir}"
    ev = load_trace_events(paths[0])

    # TPU device lanes: pid whose process name mentions TPU/device
    pid_names = {}
    for e in ev.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}

    per_kernel = defaultdict(float)
    total = 0.0
    for e in ev.get("traceEvents", []):
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        # module-level envelope rows (jit_<fn>(fingerprint) and bare
        # per-launch module ids like "2") double-count their kernels
        if name.startswith("jit_") or name.isdigit():
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        per_kernel[name] += dur
        total += dur

    iters = int(os.environ.get("TRACE_ITERS", "3"))
    rows = sorted(per_kernel.items(), key=lambda kv: -kv[1])
    print(f"device lanes: {[pid_names[p] for p in dev_pids]}")
    print(f"total device time: {total/1e3:.2f} ms (all trace iters); "
          f"{total/1e3/iters:.2f} ms/step at TRACE_ITERS={iters}")
    print(f"{'us':>12}  {'%':>5}  kernel")
    for name, dur in rows[:top_n]:
        print(f"{dur:12.0f}  {100*dur/max(total,1e-9):5.1f}  {name[:140]}")

    buckets = defaultdict(float)
    for name, dur in rows:
        n = name.lower()
        if "conv" in n:
            b = "conv"
        elif "dot" in n or "einsum" in n:
            b = "dot"
        elif "scan" in n or "while" in n:
            b = "scan/while"
        elif "copy" in n or "transpose" in n:
            b = "copy/transpose"
        elif "fusion" in n:
            b = "fusion"
        elif "dynamic" in n or "gather" in n or "scatter" in n:
            b = "gather/scatter"
        else:
            b = "other"
        buckets[b] += dur
    print("\nbuckets (ms, all iters):")
    for b, d in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {b:15s} {d/1e3:8.2f}")


if __name__ == "__main__":
    main()
