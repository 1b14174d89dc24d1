#!/usr/bin/env python
"""Summarize a jax.profiler trace: top device ops by total time.

Reads the Chrome-trace JSON that `jax.profiler.trace` writes (the
`*.trace.json.gz` under <logdir>/plugins/profile/<ts>/) and prints the
top-N device-side ops by accumulated duration, with call counts and the
share of total device time. This is the tool that attributed the decode
loop's time to the 12 cross-attention fusions (57% of the loop, ~2.2x off
the DMA roofline) — see CLAUDE.md's perf ledger.

Usage: python tools/trace_summary.py <trace_dir_or_file> [--top 30]
       [--filter while]     # only ops nested under a name substring
"""
import argparse
import collections
import glob
import gzip
import json
import os


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(
        os.path.join(path, "**", "*.trace.json.gz"), recursive=True))
    if not hits:
        raise SystemExit(f"no *.trace.json.gz under {path}")
    return hits[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--min-count", type=int, default=1)
    args = ap.parse_args()

    tf = find_trace(args.path)
    with gzip.open(tf) as f:
        tr = json.load(f)
    ev = tr.get("traceEvents", [])

    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")

    durs = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            if "TPU" in pids.get(e.get("pid"), ""):
                name = e.get("name", "?")
                durs[name] += e["dur"]
                cnt[name] += 1

    # the outermost jit event double-counts everything nested under it;
    # report it separately as the wall reference
    total_candidates = [(n, d) for n, d in durs.items()
                        if n.startswith("jit") or n.startswith("pjit")]
    wall = max((d for _, d in total_candidates), default=sum(durs.values()))

    print(f"trace: {tf}")
    print(f"device wall (outermost jit): {wall/1e3:.2f} ms\n")
    print(f"{'total ms':>10} {'count':>7} {'%wall':>6}  op")
    shown = 0
    for name, d in durs.most_common():
        if cnt[name] < args.min_count:
            continue
        if name.startswith(("jit", "pjit")):
            continue
        print(f"{d/1e3:10.2f} {cnt[name]:7d} {100*d/wall:6.1f}  {name[:90]}")
        shown += 1
        if shown >= args.top:
            break


if __name__ == "__main__":
    main()
