"""Summarize a jax.profiler trace directory into an op-time breakdown.

jax.profiler.trace(outdir) writes, per capture, a Chrome-trace JSON
(`plugins/profile/<run>/*.trace.json.gz`) whose complete events ('X')
on the device tracks carry per-op wall time. This tool aggregates those
events into categories (MXU matmul, fusion, copy/layout, sort, scan,
host<->device, ...) and prints totals + the top-N ops, so a capture can
be turned into the PERF.md attribution table without TensorBoard.

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

CATEGORIES = [
    # (regex on event name, category) — first match wins. HLO op names
    # keep their opcode as a prefix ("dot.42", "fusion.7", "copy.3").
    (r"^(dot|convolution)", "matmul (MXU)"),
    (r"^(copy|transpose|bitcast|reshape)", "copy/layout"),
    (r"^sort", "sort"),
    (r"^(while|conditional)", "control-flow body"),
    (r"^(all-reduce|all-gather|reduce-scatter|collective)", "collective"),
    (r"^(reduce-window|reduce|cumsum)", "reduce/cumsum"),
    (r"^(gather|scatter|dynamic-slice|dynamic-update-slice)",
     "gather/scatter"),
    (r"^fusion", "fusion (elementwise/VPU)"),
    (r"^(infeed|outfeed|MemcpyD2H|MemcpyH2D|transfer)", "host<->device"),
]


def categorize(name):
    base = name.split("%")[-1].strip()
    for pat, cat in CATEGORIES:
        if re.match(pat, base):
            return cat
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
    ap.add_argument("--pid-filter", type=str, default="",
                    help="substring of the process/track name to keep "
                         "(default: tracks whose name mentions TPU/device"
                         ", falling back to all X events)")
    args = ap.parse_args()

    path, events = load_events(args.trace_dir)
    # map pid -> process name from metadata events
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e.get("args", {}).get("name", "")
    want = args.pid_filter.lower()
    if want:
        keep_pids = {p for p, n in pnames.items() if want in n.lower()}
    else:
        keep_pids = {p for p, n in pnames.items()
                     if re.search(r"tpu|device|/device", n, re.I)}
    xs = [e for e in events if e.get("ph") == "X" and "dur" in e
          and (not keep_pids or e["pid"] in keep_pids)]
    if not xs:  # fall back to everything
        xs = [e for e in events if e.get("ph") == "X" and "dur" in e]

    by_name = collections.Counter()
    by_cat = collections.Counter()
    calls = collections.Counter()
    for e in xs:
        name = e["name"]
        dur = float(e["dur"])  # microseconds
        by_name[name] += dur
        by_cat[categorize(name)] += dur
        calls[name] += 1
    total = sum(by_cat.values())

    print(f"trace: {path}")
    print(f"tracks kept: "
          f"{sorted(pnames[p] for p in keep_pids) if keep_pids else 'ALL'}")
    print(f"total device-op time in capture: {total / 1e3:.2f} ms\n")
    print(f"{'category':<28}{'ms':>10}{'%':>8}")
    for cat, dur in by_cat.most_common():
        print(f"{cat:<28}{dur / 1e3:>10.2f}{100 * dur / total:>7.1f}%")
    print(f"\ntop {args.top} ops:")
    print(f"{'op':<56}{'ms':>9}{'%':>7}{'calls':>7}")
    for name, dur in by_name.most_common(args.top):
        print(f"{name[:55]:<56}{dur / 1e3:>9.2f}"
              f"{100 * dur / total:>6.1f}%{calls[name]:>7}")


if __name__ == "__main__":
    main()
