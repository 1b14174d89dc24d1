#!/usr/bin/env python
"""Trained-checkpoint serving benchmark: persistent kernel vs XLA mxu at
REALISTIC early exits, plus the F1 delta between the two impls.

VERDICT r3 missing #3 / next-round item 2: the 2.07x persistent-kernel
headline was measured at the full 128-step bound with random weights,
but a trained model early-exits at ~20-40 steps — the reference's
serving behavior (`plankassembly/models.py:306-307`). With the r4
in-launch early exit (SMEM done flag, ops/persistent_decode.py) the
persistent kernel can finally be compared on the workload that matters:
a real checkpoint over the real test split, length-sorted batches,
early_exit=True on both paths. The same decode outputs feed
`metric_sums`, so the F1 impact of the kernel's bf16/int8 semantics is
measured on the same bar as the int8-KV deviation (2e-4, DEVIATIONS.md).

Prints one JSON line per (impl, batch) with serving programs/s, mean
executed steps, and macro P/R/F1 over the split.

Usage:
  python tools/bench_trained_serving.py \
      --ckpt checkpoints/gqa_complete_ep181.npz \
      [--impls mxu,persistent] [--batch 256] [--bucket 512]
      [--split /root/data/splits/test.txt] [--root /root/data/data/complete/infos]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/gqa_complete_ep181.npz")
    ap.add_argument("--impls", default="mxu,persistent")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--bucket", type=int, default=512,
                    help="fixed kv bucket (one compile variant per impl; "
                    "batches whose max real length exceeds it are cropped "
                    "— with the default 512 none are on this dataset)")
    ap.add_argument("--split", default=None,
                    help="split file (default: the ckpt's DATASETS_TEST)")
    ap.add_argument("--root", default=None,
                    help="info dir (default: the ckpt's ROOT)")
    ap.add_argument("--limit", type=int, default=0,
                    help="cap the number of batches (0 = whole split)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke runs)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    import jax.numpy as jnp

    from plankassembly_tpu.data.line_data import LineDataset
    from plankassembly_tpu.data.loader import DataLoader
    from plankassembly_tpu.decode import greedy_decode
    from plankassembly_tpu.metrics import metric_sums
    from plankassembly_tpu.models.model import ModelDims
    from tools.predict import load_params_and_config

    params, cfg = load_params_and_config(args.ckpt)
    dims = ModelDims.from_config(cfg)
    args.split = args.split or cfg.DATASETS_TEST
    args.root = args.root or cfg.ROOT

    with open(args.split) as f:
        names = [l.strip() for l in f if l.strip()]
    ds = LineDataset(args.root, names, cfg, augmentation=False)

    # length-sorted order (the eval loop's batching policy): batches of
    # similar length early-exit together instead of being gated by one
    # long program
    keys = []
    for name in ds.info_files:
        with open(os.path.join(ds.root, name)) as f:
            info = json.load(f)
        keys.append((len(info.get("coords", [])), len(info.get("lines", []))))
    order = np.lexsort(([k[1] for k in keys], [k[0] for k in keys]))

    loader = DataLoader(ds, batch_size=args.batch, order=order,
                        pad_to_batch=True)

    impls = args.impls.split(",")
    known = ("auto", "xla", "mxu", "persistent", "persistent-interpret")
    bad = [i for i in impls if i not in known]
    if bad:
        sys.exit(f"unknown --impls {bad}; choose from {known}")
    if len(ds) == 0:
        sys.exit(f"empty split: {args.split}")

    for impl in impls:
        fn = jax.jit(lambda p, b: greedy_decode(
            p, b, dims, compute_dtype=jnp.bfloat16, early_exit=True,
            kv_bucket=args.bucket, kv_quant=True, cross_impl=impl))
        tot_prog = 0
        tot_time = 0.0
        steps_hist = []
        sums = np.zeros(4)
        compile_t = None
        for bi, batch in enumerate(loader):
            if args.limit and bi >= args.limit:
                break
            arrays = {k: jnp.asarray(v) for k, v in batch.items()
                      if hasattr(v, "shape")}
            inputs = {k: v for k, v in arrays.items()
                      if k.startswith("input")}
            if compile_t is None:  # first batch pays the compile; time it
                t0 = time.perf_counter()
                fn(params, inputs)["samples"].block_until_ready()
                compile_t = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = fn(params, inputs)
            np.asarray(out["samples"])  # host sync
            dt = time.perf_counter() - t0
            nv = int(np.asarray(arrays["sample_valid"]).sum())
            tot_prog += nv
            tot_time += dt
            steps_hist.append(int(np.asarray(out["num_steps"])))
            s = metric_sums(out["samples"], arrays["output_value"],
                            arrays["sample_valid"], end=cfg.TOKEN.END,
                            dof=dims.num_output_dof,
                            threshold=cfg.THRESHOLD)
            sums += np.array([float(x) for x in s])
            print(f"#   batch {bi}: {nv} valid, {dt * 1e3:.1f} ms, "
                  f"steps={steps_hist[-1]}", file=sys.stderr, flush=True)
        n = max(sums[3], 1.0)
        print(json.dumps({
            "impl": impl, "batch": args.batch, "bucket": args.bucket,
            "programs_per_sec_serving": round(tot_prog / tot_time, 1),
            "mean_steps": round(float(np.mean(steps_hist)), 1),
            "steps_hist": steps_hist,
            "precision": round(sums[0] / n, 4),
            "recall": round(sums[1] / n, 4),
            "fmeasure": round(sums[2] / n, 4),
            "samples": int(sums[3]),
            "compile_s": round(compile_t, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
