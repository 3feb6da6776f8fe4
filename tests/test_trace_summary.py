"""tools/trace_summary.py parses a Chrome-trace capture into the
category/op breakdown (the round-5 profiler workflow's offline half)."""
import gzip
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_trace_summary_categories(tmp_path):
    run = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    run.mkdir(parents=True)
    events = [
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "python host"}},
        # device ops (kept): 600us matmul, 300us fusion, 100us sort
        {"ph": "X", "pid": 7, "tid": 1, "ts": 0, "dur": 600,
         "name": "dot.42"},
        {"ph": "X", "pid": 7, "tid": 1, "ts": 600, "dur": 300,
         "name": "fusion.7"},
        {"ph": "X", "pid": 7, "tid": 1, "ts": 900, "dur": 100,
         "name": "sort.1"},
        # host op (dropped by the device-track filter)
        {"ph": "X", "pid": 1, "tid": 1, "ts": 0, "dur": 9999,
         "name": "$python junk"},
    ]
    with gzip.open(run / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "trace_summary.py"),
         str(tmp_path), "--top", "5"],
        capture_output=True, text=True, check=True).stdout
    assert "convolution fusion" in out and "60.0%" in out
    assert "loop fusion" in out and "30.0%" in out
    assert "sort" in out and "10.0%" in out
    assert "junk" not in out  # host track filtered out
    assert "1.00 ms" in out  # total = 600+300+100 us
