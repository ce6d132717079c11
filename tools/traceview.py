"""Summarize a jax.profiler trace.json.gz: top HLO ops by total device time.

Usage: python tools/traceview.py <trace.json.gz|tracedir> [top_n]
Uses the event args (hlo_category, shape_with_layout, model_flops,
bytes_accessed) to print per-op achieved TFLOP/s and GB/s.
"""

import gzip
import json
import re
import sys
from collections import defaultdict
from pathlib import Path


def find_trace(path):
    p = Path(path)
    if p.is_file():
        return p
    cands = sorted(p.glob("**/*.trace.json.gz"))
    assert cands, f"no trace.json.gz under {path}"
    return cands[-1]


WRAPPERS = re.compile(r"^(\d+|while|conditional|fusion_computation|region)")


def main():
    trace_path = find_trace(sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace_r2")
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    with gzip.open(trace_path, "rt") as f:
        data = json.load(f)

    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {pid for pid, name in pid_names.items() if "TPU" in name}
    assert device_pids, f"no TPU pid in {pid_names}"

    # per unique HLO op (name with SSA id), summed over repeats
    rows = {}
    cat_time = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e["pid"] not in device_pids:
            continue
        args = e.get("args") or {}
        cat = args.get("hlo_category")
        if cat is None:
            continue  # wrapper lanes (step markers, while) carry no category
        name = e["name"]
        if WRAPPERS.match(name) and "fusion" not in name:
            continue
        dur = float(e.get("dur", 0.0))
        total += dur
        cat_time[cat] += dur
        r = rows.get(name)
        if r is None:
            long = args.get("long_name", "")
            shape = args.get("shape_with_layout", "")
            rows[name] = r = {
                "dur": 0.0, "n": 0, "cat": cat,
                "flops": float(args.get("model_flops", 0) or 0),
                "bytes": float(args.get("bytes_accessed", 0) or 0),
                "shape": shape[:48],
                "kind": re.search(r"kind=(\w+)", long).group(1) if "kind=" in long else "",
                "calls": (re.search(r"calls=%?([\w.]+)", long) or [None, ""])[1][:40],
            }
        r["dur"] += dur
        r["n"] += 1

    print(f"trace: {trace_path}")
    print(f"total device op time: {total/1e3:.2f} ms")
    print("\n-- category rollup --")
    for cat, dur in sorted(cat_time.items(), key=lambda kv: -kv[1]):
        print(f"{dur/1e3:10.2f} ms  {100*dur/total:5.1f}%  {cat}")
    print(f"\n-- top {top_n} unique ops (dur summed over repeats) --")
    print(f"{'ms':>9} {'%':>5} {'x':>4} {'TF/s':>6} {'GB/s':>6}  name | cat | shape")
    for name, r in sorted(rows.items(), key=lambda kv: -kv[1]["dur"])[:top_n]:
        tf = r["flops"] * r["n"] / (r["dur"] * 1e6) if r["dur"] else 0  # flops per exec
        gb = r["bytes"] * r["n"] / (r["dur"] * 1e3) if r["dur"] else 0
        print(f"{r['dur']/1e3:9.2f} {100*r['dur']/total:5.1f} {r['n']:>4} {tf:6.1f} {gb:6.0f}  "
              f"{name[:28]} | {r['cat'][:14]} | {r['shape']}")


if __name__ == "__main__":
    main()
