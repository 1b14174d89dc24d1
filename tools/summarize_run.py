#!/usr/bin/env python
"""Summarize a run's metrics.jsonl: validation curve + throughput stats.

Usage: python tools/summarize_run.py <run_dir> [<run_dir> ...]
"""
import json
import sys


def summarize(run_dir: str):
    vals = []
    sps = []
    rss = []
    with open(f"{run_dir}/metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if "val/fmeasure" in rec:
                vals.append((rec.get("epoch", -1), rec["step"],
                             rec["val/precision"], rec["val/recall"],
                             rec["val/fmeasure"]))
            if "train/steps_per_sec" in rec:
                sps.append(rec["train/steps_per_sec"])
            if "host_rss_mb" in rec:
                rss.append(rec["host_rss_mb"])
    print(f"== {run_dir}")
    for epoch, step, p, r, f1 in vals:
        print(f"  epoch {epoch:>4} step {step:>7}  "
              f"P={p:.4f} R={r:.4f} F1={f1:.4f}")
    if sps:
        mid = sorted(sps)[len(sps) // 2]
        print(f"  steps/s median {mid:.2f}  "
              f"rss {rss[0] if rss else '-'} -> {rss[-1] if rss else '-'} MB")


if __name__ == "__main__":
    for d in sys.argv[1:]:
        summarize(d)
