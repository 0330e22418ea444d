"""Aggregate device-op durations from a jax.profiler trace.json.gz.

Companion to tools/trace_render.py / tools/profile_train.py: the trace-first
optimization workflow here (remote TPU compiles cost ~25 min, so variants are
never compiled speculatively) needs per-op time splits from the one compiled
program. Reads the perfetto JSON trace, keeps events on TPU/device tracks,
groups by op name, and prints total micros per op across the traced calls.

Usage: python tools/parse_trace.py /tmp/trace_dir [top_n] [--per-call N]
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import sys


def load_events(trace_dir: str) -> tuple[list, dict]:
    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True))
    if not files:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # pid/tid metadata -> track names
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    return events, names


def device_op_totals(trace_dir: str):
    """Per-op device-time totals (us) and counts from a trace directory.

    NOTE: summing these double-counts jit umbrella ops + their children —
    read the ``jit_*`` row for a program's true device time per call."""
    events, names = load_events(trace_dir)
    device_pids = {
        pid
        for pid, name in names.items()
        if "TPU" in name or "/device:" in name or "XLA" in name.upper()
    }
    totals: dict[str, float] = collections.defaultdict(float)
    counts: dict[str, int] = collections.defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        totals[name] += e.get("dur", 0)
        counts[name] += 1
    return totals, counts, {pid: names[pid] for pid in device_pids}


def main() -> None:
    trace_dir = sys.argv[1]
    top_n = 25
    per_call = 1
    args = sys.argv[2:]
    if args and not args[0].startswith("--"):
        top_n = int(args[0])
        args = args[1:]
    if args and args[0] == "--per-call":
        per_call = int(args[1])

    totals, counts, device_pids = device_op_totals(trace_dir)
    grand = sum(totals.values())
    print(f"tracks: {device_pids}")
    print(f"total device time: {grand / 1e3:.2f} ms over {len(totals)} ops")
    print(f"{'op':60s} {'count':>6s} {'total ms':>9s} {'ms/call':>8s}")
    for name, dur in sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]:
        print(
            f"{name[:60]:60s} {counts[name]:6d} {dur / 1e3:9.2f}"
            f" {dur / 1e3 / per_call:8.3f}"
        )


if __name__ == "__main__":
    main()
