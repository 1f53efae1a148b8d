"""Summarize a jax.profiler trace (the Chrome-format trace.json.gz) into
op-level device self-times.

Usage:
    python tools/trace_summary.py <trace_dir_or_json.gz> [--top N] [--group]

<trace_dir> is the directory passed to jax.profiler.trace(); the newest
plugins/profile/*/ *.trace.json.gz inside it is picked. Events on the
"XLA Ops" lane of the TPU device track are aggregated by op name (these
are non-overlapping per lane, so summed durations are exclusive
self-times). --group folds fusion instances (name suffixes .N / digits)
into one row per op family for a stage-level view.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    cands = sorted(
        glob.glob(os.path.join(path, "plugins", "profile", "*", "*.trace.json.gz"))
    )
    if not cands:
        raise SystemExit(f"no trace.json.gz under {path}")
    return cands[-1]


def load_events(trace_file: str):
    with gzip.open(trace_file) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    # find the (pid, tid) of the device "XLA Ops" lane(s)
    dev_pids = set()
    op_lanes = set()
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in (e["args"].get("name") or ""):
                dev_pids.add(e.get("pid"))
    for e in ev:
        if (
            e.get("ph") == "M"
            and e.get("name") == "thread_name"
            and e.get("pid") in dev_pids
            and e["args"].get("name") == "XLA Ops"
        ):
            op_lanes.add((e.get("pid"), e.get("tid")))
    return [
        e
        for e in ev
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_lanes
    ]


_GROUP_RE = re.compile(r"\.\d+$|_\d+$|\d+$")


def group_name(name: str) -> str:
    # fusion.123 -> fusion; loop_convolution_fusion.5 -> loop_convolution_fusion
    return _GROUP_RE.sub("", name)


_SIG_RE = re.compile(r"^%[\w.-]+ = ")
_LAYOUT_RE = re.compile(r"\{[^}]*\}")


def hlo_sig(e: dict) -> str:
    """Aggregate key from the HLO expression: op family + output shape
    (layouts and instruction ids stripped) — fusions with the same compute
    shape collapse to one row."""
    ln = (e.get("args") or {}).get("long_name")
    if not ln:
        return group_name(e.get("name", "?"))
    ln = _LAYOUT_RE.sub("", _SIG_RE.sub("", ln))
    return f"{group_name(e.get('name', '?'))} -> {ln.split(' ')[0]}"


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 40
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
        args = [a for a in args if a != str(top)]
    group = "--group" in sys.argv
    hlo = "--hlo" in sys.argv
    trace_file = find_trace(args[0] if args else "/tmp/serve_trace")

    events = load_events(trace_file)
    if not events:
        raise SystemExit("no XLA Ops events found (CPU-only trace?)")
    # events on one lane nest (control ops like `while` wrap their bodies):
    # compute EXCLUSIVE self-time by subtracting each event's children via
    # a stack sweep per lane
    tot = collections.Counter()
    cnt = collections.Counter()
    by_lane = collections.defaultdict(list)
    for e in events:
        by_lane[(e["pid"], e["tid"])].append(e)
    for lane in by_lane.values():
        # sort by start asc, then duration desc so parents precede children
        lane.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # each entry: [end_ts, name, child_time]
        def close(upto):
            while stack and stack[-1][0] <= upto:
                end, name, child, dur = stack.pop()
                tot[name] += dur - child
                if stack:
                    stack[-1][2] += dur
        for e in lane:
            ts, dur = e["ts"], e.get("dur", 0)
            close(ts)
            if hlo:
                name = hlo_sig(e)
            elif group:
                name = group_name(e.get("name", "?"))
            else:
                name = e.get("name", "?")
            cnt[name] += 1
            stack.append([ts + dur, name, 0, dur])
        close(float("inf"))
    grand = sum(tot.values())
    span = max(e["ts"] + e.get("dur", 0) for e in events) - min(
        e["ts"] for e in events
    )
    print(f"{trace_file}")
    print(
        f"device busy {grand / 1e3:.2f} ms over {span / 1e3:.2f} ms span "
        f"({100 * grand / max(span, 1):.0f}% util), {len(events)} op events"
    )
    print(f"{'self ms':>9} {'%':>5} {'count':>6}  op")
    for name, d in tot.most_common(top):
        print(f"{d / 1e3:9.2f} {100 * d / grand:5.1f} {cnt[name]:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
