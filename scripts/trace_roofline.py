"""Per-kernel roofline attribution from an xplane/trace.json.gz trace.

For every device kernel above a time threshold, reports ms/step,
achieved HBM bandwidth (bytes_accessed / time), and — for convolution
fusions whose result + weight shapes are parseable from the HLO
long_name — achieved MXU TFLOP/s and % of the v5e bf16 peak.  This is
the "each remaining ms is roofline-bound" evidence table VERDICT r4
asked for (docs/PERFORMANCE.md cites the output).

Usage: python scripts/trace_roofline.py /tmp/dsf_trace/<ts> [iters]
"""

import glob
import gzip
import json
import math
import re
import sys
from collections import defaultdict

V5E_PEAK_TFLOPS = 197.0
V5E_HBM_GBS = 819.0

_SHAPE = re.compile(r"(?:bf16|f32|s32|u8|pred|s8)\[([0-9,]*)\]")


def conv_flops(long_name):
    """FLOPs of a conv fusion: 2 * prod(conv result NHWC) * KH*KW*I,
    taking the conv weight [KH,KW,I,O] from the operands and the
    largest 4-D result as the conv output.  Returns None if shapes
    don't look like a conv."""
    try:
        lhs, rhs = long_name.split(" = ", 1)
    except ValueError:
        return None
    # operands appear after "fusion(" — weights are 4-D [kh,kw,I,O]
    # with small kh/kw; results are before "fusion("
    head, _, operands = rhs.partition("fusion(")
    res_shapes = [tuple(int(x) for x in m.split(",") if x)
                  for m in _SHAPE.findall(head)]
    op_shapes = [tuple(int(x) for x in m.split(",") if x)
                 for m in _SHAPE.findall(operands)]
    weights = [s for s in op_shapes
               if len(s) == 4 and s[0] <= 7 and s[1] <= 7 and s[2] > 7]
    outs = [s for s in res_shapes if len(s) == 4 and s[0] > 7]
    if not weights or not outs:
        return None
    w = max(weights, key=math.prod)
    # conv result: 4-D whose channel dim == weight O
    cand = [s for s in outs if w[3] in s]
    if not cand:
        return None
    out = max(cand, key=math.prod)
    return 2.0 * math.prod(out) * w[0] * w[1] * w[2]


def main():
    trace_dir, iters = sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 3
    f = glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz")[0]
    with gzip.open(f, "rt") as fp:
        data = json.load(fp)
    events = data["traceEvents"] if isinstance(data, dict) else data

    agg = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        args = e.get("args") or {}
        if "device_duration_ps" not in args:
            continue
        n = e["name"]
        a = agg.setdefault(n, {"us": 0.0, "bytes": 0, "cat": "",
                               "long": ""})
        a["us"] += e["dur"]
        a["bytes"] += int(args.get("bytes_accessed", 0))
        a["cat"] = args.get("hlo_category", "")
        if not a["long"]:
            a["long"] = args.get("long_name", "")

    rows = []
    total_us = sum(a["us"] for a in agg.values())
    for n, a in agg.items():
        ms = a["us"] / iters / 1e3
        if ms < 0.15:
            continue
        gbs = (a["bytes"] / iters) / (a["us"] / iters / 1e6) / 1e9 \
            if a["bytes"] else 0.0
        fl = conv_flops(a["long"]) if "conv" in a["cat"] else None
        tfs = (fl / (a["us"] / iters / 1e6)) / 1e12 if fl else None
        bound = ""
        if tfs is not None:
            bound = f"{tfs:6.1f} TF/s ({100 * tfs / V5E_PEAK_TFLOPS:3.0f}% MXU)"
        elif gbs:
            bound = f"{gbs:6.0f} GB/s ({100 * gbs / V5E_HBM_GBS:3.0f}% HBM)"
        rows.append((ms, n, a["cat"], bound))
    rows.sort(reverse=True)
    print(f"total device: {total_us / iters / 1e3:.1f} ms/step; "
          f"kernels >= 0.15 ms: {len(rows)} "
          f"({sum(r[0] for r in rows):.1f} ms)")
    print(f"{'ms/step':>8}  {'kernel':<32} {'category':<22} bound")
    for ms, n, cat, bound in rows:
        print(f"{ms:8.2f}  {n:<32.32} {cat:<22.22} {bound}")

    # category totals
    cat_ms = defaultdict(float)
    for a in agg.values():
        cat_ms[a["cat"]] += a["us"] / iters / 1e3
    print("\ncategory totals (ms/step):")
    for c, ms in sorted(cat_ms.items(), key=lambda kv: -kv[1]):
        print(f"  {ms:7.2f}  {c or '(uncategorized)'}")


if __name__ == "__main__":
    main()
