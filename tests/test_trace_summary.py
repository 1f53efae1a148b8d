"""tools/trace_summary.py: exclusive self-times from a profiler trace.

The XLA Ops lane nests control ops around their bodies (a `while` event
spans every op inside it); the summary must subtract child durations or
container ops dominate the table (observed: `while` at 49.8% inclusive vs
0.1% exclusive on a real train-step trace).
"""

import gzip
import json
import os
import subprocess
import sys


def _make_trace(tmp_path):
    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    ev = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        # parent `while` [0, 100) wrapping a child fusion [10, 60):
        # exclusive self-time must be 100 - 50 = 50 us
        {"ph": "X", "pid": 3, "tid": 3, "ts": 0, "dur": 100, "name": "while"},
        {"ph": "X", "pid": 3, "tid": 3, "ts": 10, "dur": 50, "name": "fusion.1",
         "args": {"long_name":
                  "%fusion.1 = bf16[8,60,60,64]{3,2,1,0:T(8,128)} fusion(...)"}},
        {"ph": "X", "pid": 3, "tid": 3, "ts": 200, "dur": 30, "name": "fusion.2",
         "args": {"long_name":
                  "%fusion.2 = bf16[8,60,60,64]{3,2,1,0:T(8,128)} fusion(...)"}},
    ]
    with gzip.open(d / "vm.trace.json.gz", "wt") as fh:
        json.dump({"traceEvents": ev}, fh)


def test_exclusive_self_times_and_hlo_grouping(tmp_path):
    _make_trace(tmp_path)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "trace_summary.py"),
         str(tmp_path), "--hlo"],
        capture_output=True, text=True, check=True,
    ).stdout
    # the two fusion instances group into one row by output shape
    frow = [l for l in out.splitlines() if "fusion -> bf16[8,60,60,64]" in l][0]
    assert float(frow.split()[0]) == 0.08 and int(frow.split()[2]) == 2, frow
    # the while's 50 us of child time is excluded
    wrow = [l for l in out.splitlines() if l.strip().endswith("while")][0]
    assert float(wrow.split()[0]) == 0.05, wrow
