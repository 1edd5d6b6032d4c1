"""Aggregate device-op durations from a jax.profiler trace directory.

Usage: python tools/trace_ops.py TRACE_DIR [--top 30] [--pid-filter tpu]

Parses the chrome-trace json.gz that jax.profiler.trace writes under
``TRACE_DIR/plugins/profile/<ts>/*.trace.json.gz`` and prints the top op
groups by total device time. Op names are grouped by their fusion/kernel
name with the trailing instance counters stripped, so repeated launches of
the same program aggregate into one row. This is the same aggregation the
r3-r5 PERF.md trace readings used, packaged as a tool.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace_file(trace_dir: str) -> str:
    pats = [
        os.path.join(trace_dir, "**", "*.trace.json.gz"),
        os.path.join(trace_dir, "**", "*.trace.json"),
    ]
    hits: list[str] = []
    for p in pats:
        hits.extend(glob.glob(p, recursive=True))
    if not hits:
        raise SystemExit(f"no trace.json(.gz) under {trace_dir}")
    return max(hits, key=os.path.getmtime)


def load_events(path: str):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


_STRIP = re.compile(r"\.\d+$")


def group_name(name: str) -> str:
    # "fusion.123" / "copy.4" -> "fusion" family + keep the base op kind
    return _STRIP.sub("", name)


def aggregate(events, pid_filter: str | None):
    # map pid -> process name to find device lanes
    pid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
    device_pids = {
        pid for pid, name in pid_names.items()
        if pid_filter is None or pid_filter.lower() in name.lower()
    }
    totals: dict[str, float] = collections.defaultdict(float)
    counts: dict[str, int] = collections.defaultdict(int)
    span_lo, span_hi = float("inf"), 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        dur = ev.get("dur", 0) / 1e6  # us -> s
        name = group_name(ev.get("name", "?"))
        totals[name] += dur
        counts[name] += 1
        ts = ev.get("ts", 0) / 1e6
        span_lo = min(span_lo, ts)
        span_hi = max(span_hi, ts + dur)
    span = (span_hi - span_lo) if span_hi > span_lo else 0.0
    return totals, counts, span, pid_names


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--pid-filter", default="tpu",
                    help="substring of the process lane to keep "
                         "(default 'tpu'; use '' for all lanes)")
    args = ap.parse_args()

    path = find_trace_file(args.trace_dir)
    events = load_events(path)
    pf = args.pid_filter or None
    totals, counts, span, pid_names = aggregate(events, pf)
    if not totals and pf:
        print(f"(no events on '{pf}' lanes; lanes seen: "
              f"{sorted(set(pid_names.values()))}; retrying with all lanes)",
              file=sys.stderr)
        totals, counts, span, _ = aggregate(events, None)

    busy = sum(totals.values())
    print(f"trace: {path}")
    print(f"device-lane span {span:.3f}s, summed op time {busy:.3f}s")
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[: args.top]
    width = max((len(n) for n, _ in rows), default=4)
    print(f"{'op group':<{width}}  {'total_s':>8}  {'%':>5}  {'count':>6}")
    for name, tot in rows:
        pct = 100.0 * tot / busy if busy else 0.0
        print(f"{name:<{width}}  {tot:8.4f}  {pct:5.1f}  {counts[name]:6d}")


if __name__ == "__main__":
    main()
