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
       [--gaps]             # device busy/idle analysis: merged-interval
                            # busy fraction + the largest schedule gaps.
                            # This is the number that decides whether a
                            # persistent kernel has overhead to reclaim
                            # (idle high) or the program is DMA/compute
                            # saturated (idle low).
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


def gap_report(ev, pids, top_gaps: int = 15):
    """Busy/idle analysis of the TPU op timeline: merge leaf-op intervals,
    report the busy fraction of the trace span and the largest gaps."""
    iv = []
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            if "TPU" in pids.get(e.get("pid"), ""):
                name = e.get("name", "?")
                if name.startswith(("jit", "pjit")):
                    continue
                iv.append((e["ts"], e["ts"] + e["dur"], name))
    if not iv:
        print("no device op events")
        return
    iv.sort()
    merged = [[iv[0][0], iv[0][1]]]
    gaps = []  # (gap_us, end_of_prev, name_before, name_after)
    prev_name = iv[0][2]
    for ts, te, name in iv[1:]:
        if ts <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], te)
        else:
            gaps.append((ts - merged[-1][1], merged[-1][1], prev_name, name))
            merged.append([ts, te])
        if te >= merged[-1][1]:
            prev_name = name
    busy = sum(e - s for s, e in merged)
    span = merged[-1][1] - merged[0][0]
    print(f"device span {span/1e3:.2f} ms, busy {busy/1e3:.2f} ms "
          f"({100*busy/span:.1f}%), idle {100*(1-busy/span):.1f}% "
          f"over {len(gaps)} gaps")
    print(f"\n{'gap us':>8}  after op -> before op")
    for g, _, a, b in sorted(gaps, reverse=True)[:top_gaps]:
        print(f"{g:8.1f}  {a[:40]} -> {b[:40]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--min-count", type=int, default=1)
    ap.add_argument("--gaps", action="store_true")
    args = ap.parse_args()

    tf = find_trace(args.path)
    with gzip.open(tf) as f:
        tr = json.load(f)
    ev = tr.get("traceEvents", [])

    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")

    if args.gaps:
        gap_report(ev, pids)
        return

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
