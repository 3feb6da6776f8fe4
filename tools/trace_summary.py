"""Summarize a jax.profiler trace directory into an op-time breakdown.

jax.profiler.trace(outdir) writes, per capture, a Chrome-trace JSON
(`plugins/profile/<run>/*.trace.json.gz`) whose complete events ('X') on
the device "XLA Ops" track carry per-op wall time plus XLA metadata
(`hlo_category`, `bytes_accessed`). This tool aggregates those into
categories with achieved bandwidth and prints totals + the top-N ops, so
a capture turns into the PERF.md attribution table without TensorBoard.

On TPU, XLA lowers dot_general to "convolution fusion" — that category
IS the MXU matmul work. Container ops (the jit module, `while` loop
bodies) double-count their children and are excluded from totals.

Usage: python tools/trace_summary.py <trace_dir> [--top 25]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

# fallback classification when the capture has no hlo_category args
NAME_CATEGORIES = [
    (r"^(dot|convolution)", "convolution fusion"),
    (r"^(copy|transpose|bitcast|reshape)", "data formatting"),
    (r"^sort", "sort"),
    (r"^(all-reduce|all-gather|reduce-scatter|collective)", "collective"),
    (r"^(reduce-window|reduce|cumsum)", "reduce/cumsum"),
    (r"^(gather|scatter|dynamic-slice|dynamic-update-slice)",
     "gather/scatter"),
    (r"^fusion", "loop fusion"),
]
CONTAINERS = re.compile(r"^(while|conditional-body|jit_|\d+$)")


def categorize(name, args_dict):
    cat = args_dict.get("hlo_category", "")
    if cat:
        return cat
    base = name.split("%")[-1].strip()
    for pat, c in NAME_CATEGORIES:
        if re.match(pat, base):
            return c
    return "other"


def load_events(trace_dir):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        sys.exit(f"no *.trace.json.gz under {trace_dir}")
    path = paths[-1]  # newest capture
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return path, data.get("traceEvents", [])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    path, events = load_events(args.trace_dir)
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pnames[e["pid"]] = e.get("args", {}).get("name", "")
        elif e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e.get("args", {}).get(
                "name", "")
    device_pids = {p for p, n in pnames.items()
                   if re.search(r"tpu|gpu|/device", n, re.I)}
    xs = [e for e in events if e.get("ph") == "X" and "dur" in e
          and (not device_pids or e["pid"] in device_pids)
          and tnames.get((e["pid"], e.get("tid")), "XLA Ops") == "XLA Ops"]
    if not xs:
        xs = [e for e in events if e.get("ph") == "X" and "dur" in e]

    cat_t, cat_b = collections.Counter(), collections.Counter()
    op_t, op_b, op_cat, calls = (collections.Counter(), {}, {},
                                 collections.Counter())
    skipped_container_ms = 0.0
    for e in xs:
        name, a, dur = e["name"], e.get("args", {}), float(e["dur"])
        cat = categorize(name, a)
        if CONTAINERS.match(name) or cat in ("while", "conditional"):
            skipped_container_ms += dur
            continue
        b = int(a.get("bytes_accessed", 0) or 0)
        cat_t[cat] += dur
        cat_b[cat] += b
        op_t[name] += dur
        op_b[name] = op_b.get(name, 0) + b
        op_cat[name] = cat
        calls[name] += 1
    total = sum(cat_t.values())
    total_b = sum(cat_b.values())
    if not total:
        sys.exit("no leaf ops found in capture")

    print(f"trace: {path}")
    print(f"device tracks: {sorted(pnames[p] for p in device_pids)}"
          if device_pids else "tracks: ALL")
    print(f"leaf device-op time: {total / 1e3:.2f} ms | bytes moved: "
          f"{total_b / 1e9:.1f} GB | sustained {total_b / total / 1e3:.0f} "
          f"GB/s (containers excluded: {skipped_container_ms / 1e3:.1f} ms)\n")
    print(f"{'category':<26}{'ms':>10}{'%':>8}{'GB':>9}{'GB/s':>7}")
    for cat, dur in cat_t.most_common():
        gbs = cat_b[cat] / dur / 1e3 if dur else 0.0
        print(f"{cat:<26}{dur / 1e3:>10.2f}{100 * dur / total:>7.1f}%"
              f"{cat_b[cat] / 1e9:>9.1f}{gbs:>7.0f}")
    print(f"\ntop {args.top} ops:")
    print(f"{'op':<30}{'category':<22}{'ms':>9}{'%':>7}{'calls':>7}")
    for name, dur in op_t.most_common(args.top):
        print(f"{name[:29]:<30}{op_cat[name][:21]:<22}{dur / 1e3:>9.2f}"
              f"{100 * dur / total:>6.1f}%{calls[name]:>7}")


if __name__ == "__main__":
    main()
