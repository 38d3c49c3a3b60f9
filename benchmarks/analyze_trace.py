#!/usr/bin/env python
"""Roofline analysis of a jax.profiler trace (perfetto trace.json.gz).

Aggregates per-(module, hlo_category) device time, model FLOPs and bytes
accessed from the XLA-op track and prints achieved TFLOP/s and GB/s — the
data source for BASELINE.md's attainability proof.

    python benchmarks/analyze_trace.py <trace_dir_or_json.gz> [--ops MODULE]

With --ops MODULE also prints the top individual ops of that module.
Capture a trace with `perf.trace_dir=...` on a training run, or
jax.profiler.trace(...) around jitted steps (see the usage in
BASELINE.md round 2 notes).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re


def load_events(path: str):
    if os.path.isdir(path):
        hits = sorted(glob.glob(os.path.join(path, "**", "*.trace.json.gz"),
                                recursive=True))
        if not hits:
            raise FileNotFoundError(f"no *.trace.json.gz under {path}")
        path = hits[-1]
    with gzip.open(path) as f:
        return json.load(f)["traceEvents"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace")
    p.add_argument("--ops", default=None,
                   help="also list top ops of this module (name prefix)")
    p.add_argument("--top", type=int, default=20)
    args = p.parse_args()

    events = load_events(args.trace)
    # device pid: the process named /device:TPU:N (falls back to any
    # pid that has an 'XLA Ops' thread)
    dev_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    tids = {(e["pid"], e["tid"]): e["args"].get("name") for e in events
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    mod_tids = {k for k, v in tids.items() if v == "XLA Modules"
                and k[0] in dev_pids}
    op_tids = {k for k, v in tids.items() if v == "XLA Ops"
               and k[0] in dev_pids}

    xs = [e for e in events if e.get("ph") == "X"]
    mods = sorted((e for e in xs if (e["pid"], e["tid"]) in mod_tids),
                  key=lambda e: e["ts"])
    ops = [e for e in xs if (e["pid"], e["tid"]) in op_tids
           and e.get("args", {}).get("hlo_category") not in (None, "while")]

    mod_count = collections.Counter(
        re.sub(r"\(.*", "", m["name"]) for m in mods)

    def modname(ts):
        for m in mods:
            if m["ts"] <= ts < m["ts"] + m["dur"]:
                return re.sub(r"\(.*", "", m["name"])
        return "?"

    agg = collections.defaultdict(lambda: [0.0, 0, 0])
    opagg = collections.defaultdict(lambda: [0.0, 0, 0, 0])
    for e in ops:
        a = e["args"]
        d = int(a.get("device_duration_ps", 0))
        fl = int(a.get("model_flops", 0) or 0)
        by = int(a.get("bytes_accessed", 0) or 0)
        m = modname(e["ts"])
        row = agg[(m, a.get("hlo_category", "?"))]
        row[0] += d
        row[1] += fl
        row[2] += by
        if args.ops and m.startswith(args.ops):
            base = re.sub(r"[.\d]+$", "", e["name"])
            r = opagg[(base, a.get("shape_with_layout", "")[:60])]
            r[0] += d
            r[1] += fl
            r[2] += by
            r[3] += 1

    print("module executions:", dict(mod_count))
    print(f"{'module':24s} {'hlo_category':22s} {'ms/exec':>9s} "
          f"{'TF/s':>7s} {'GB/s':>8s}")
    for (m, cat), (d, fl, by) in sorted(agg.items(),
                                        key=lambda x: -x[1][0])[:args.top]:
        sec = d / 1e12
        n = max(1, mod_count.get(m, 1))
        print(f"{m:24s} {cat:22s} {sec * 1e3 / n:9.2f} "
              f"{fl / sec / 1e12 if sec else 0:7.1f} "
              f"{by / sec / 1e9 if sec else 0:8.1f}")

    if args.ops:
        print(f"\ntop ops of {args.ops}:")
        for (base, shape), (d, fl, by, n) in sorted(
                opagg.items(), key=lambda x: -x[1][0])[:args.top]:
            sec = d / 1e12
            print(f"  {sec*1e3:8.2f} ms x{n:5d} {base[:28]:28s} {shape}")


if __name__ == "__main__":
    main()
