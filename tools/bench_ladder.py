#!/usr/bin/env python
"""Split-scale bucket-ladder serving benchmark (VERDICT r4 weak #5 / next #4).

Round-4 measured the motivation: a single fixed bucket-512 program crops
33% of the synthetic test split (max input 1121 tokens) and costs F1
0.9779 -> 0.9390, while the ladder router (`serving.BucketRouter`) has
token-parity tests but no split-scale evidence. This tool closes the loop:
it routes EVERY request of the test split through a live bucket ladder —
the production serving path (BatchingServer dynamic batching + smallest-
fitting-bucket routing) — and reports F1, per-request latency percentiles,
routing counts, and end-to-end throughput.

Each sample is submitted as an independent single-sample request from a
bounded client pool (arrival order shuffled by default — the router's win
must not depend on length-sorted traffic the way the eval loop's per-batch
bucketing does). Predictions are scored with the same in-loop Hungarian
`metric_sums` as the eval loop, so the F1 is directly comparable to the
per-batch-bucket 0.9779 (r4) on the same checkpoint.

Usage:
  python tools/bench_ladder.py --ckpt checkpoints/gqa_complete_ep181.npz \
      [--buckets 512,768,1024,1280] [--batch 256] [--concurrency 256] \
      [--max_wait_ms 25] [--limit N] [--cpu] [--order shuffle|sorted]
"""
import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/gqa_complete_ep181.npz")
    ap.add_argument("--buckets", default="512,768,1024,1280")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--concurrency", type=int, default=256)
    ap.add_argument("--max_wait_ms", type=float, default=25.0)
    ap.add_argument("--limit", type=int, default=0,
                    help="cap the number of requests (0 = whole split)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--order", default="shuffle",
                    choices=("shuffle", "sorted"),
                    help="request arrival order: shuffled (seed 0, the "
                    "realistic case) or ascending-length (best case for "
                    "batch homogeneity)")
    ap.add_argument("--split", default=None)
    ap.add_argument("--root", default=None)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    from plankassembly_tpu.data.line_data import LineDataset
    from plankassembly_tpu.metrics import metric_sums
    from plankassembly_tpu.models.model import ModelDims
    from plankassembly_tpu.serving import (BatchingServer, BucketRouter,
                                           make_live_backend)
    from tools.predict import load_params_and_config

    params, cfg = load_params_and_config(args.ckpt)
    dims = ModelDims.from_config(cfg)
    split = args.split or cfg.DATASETS_TEST
    root = args.root or cfg.ROOT
    with open(split) as f:
        names = [l.strip() for l in f if l.strip()]
    ds = LineDataset(root, names, cfg, augmentation=False)

    buckets = [int(b) for b in args.buckets.split(",")]
    servers = []
    for w in buckets:
        backend, meta = make_live_backend(params, cfg, batch=args.batch,
                                          bucket=w)
        servers.append(BatchingServer(backend, meta,
                                      max_wait_ms=args.max_wait_ms))
    router = BucketRouter(servers)
    input_keys = servers[0].meta["input_keys"]

    # Pack every request up front so client threads only submit (the
    # pack cost is the offline loader's job, not serving latency).
    n = min(len(ds), args.limit) if args.limit else len(ds)
    rows = [ds[i] for i in range(n)]
    order = np.arange(n)
    lengths = np.array([int((~np.asarray(r["input_mask"], bool)).sum())
                        for r in rows])
    if args.order == "shuffle":
        order = np.random.RandomState(0).permutation(n)
    else:
        order = np.argsort(lengths, kind="stable")

    # Warm each rung (first call pays the compile; keep it out of the
    # latency distribution, report it separately).
    compile_s = {}
    for server in router.servers:
        w = server.meta["bucket"]
        i = int(np.argmax(lengths <= w)) if (lengths <= w).any() else 0
        req = {k: np.asarray(rows[i][k]) for k in input_keys}
        t0 = time.perf_counter()
        server.submit(req)
        compile_s[w] = round(time.perf_counter() - t0, 1)

    results: list = [None] * n
    latency = np.zeros(n)
    it = iter(order.tolist())
    it_lock = threading.Lock()

    def client():
        while True:
            with it_lock:
                i = next(it, None)
            if i is None:
                return
            req = {k: np.asarray(rows[i][k]) for k in input_keys}
            t0 = time.perf_counter()
            out = router.submit(req)
            latency[i] = time.perf_counter() - t0
            results[i] = out

    t_all = time.perf_counter()
    threads = [threading.Thread(target=client)
               for _ in range(min(args.concurrency, n))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_all

    # Score exactly like the eval loop (chunked to bound host memory).
    sums = np.zeros(4)
    chunk = 256
    for i in range(0, n, chunk):
        js = range(i, min(i + chunk, n))
        samples = np.stack([results[j]["samples"] for j in js])
        gt = np.stack([np.asarray(rows[j]["output_value"]) for j in js])
        s = metric_sums(samples, gt, np.ones(len(js), bool),
                        end=cfg.TOKEN.END, dof=dims.num_output_dof,
                        threshold=cfg.THRESHOLD)
        sums += np.array([float(x) for x in s])

    routed = {w: 0 for w in buckets}
    for r in results:
        routed[r["bucket"]] += 1
    lat_by_bucket = {
        w: [latency[i] for i in range(n) if results[i]["bucket"] == w]
        for w in buckets}

    def pct(a, q):
        return round(float(np.percentile(np.asarray(a), q)) * 1e3, 1)

    per_server = {s.meta["bucket"]: {"batches": s.batches_run,
                                     "rows": s.rows_served}
                  for s in router.servers}
    print(json.dumps({
        "buckets": buckets, "batch": args.batch,
        "concurrency": args.concurrency, "order": args.order,
        "requests": n,
        "programs_per_sec_serving": round(n / wall, 1),
        "wall_s": round(wall, 1),
        "precision": round(sums[0] / max(sums[3], 1), 4),
        "recall": round(sums[1] / max(sums[3], 1), 4),
        "fmeasure": round(sums[2] / max(sums[3], 1), 4),
        "routing": routed,
        "mean_rows_per_call": {
            w: round(v["rows"] / max(v["batches"], 1), 1)
            for w, v in per_server.items()},
        "latency_ms": {"p50": pct(latency, 50), "p95": pct(latency, 95),
                       "p99": pct(latency, 99),
                       "mean": round(float(latency.mean()) * 1e3, 1)},
        "latency_ms_by_bucket": {
            w: {"p50": pct(v, 50), "p99": pct(v, 99)}
            for w, v in lat_by_bucket.items() if v},
        "compile_s": compile_s,
    }), flush=True)
    router.close()


if __name__ == "__main__":
    main()
