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
      [--impls mxu,persistent,beam4,mxu-wq8] [--batch 256] [--bucket 0|512]
      [--reverse --limit 5]   # benchmark the hard tail of the split
      [--split /root/data/splits/test.txt] [--root /root/data/data/complete/infos]
"""
import argparse
import functools
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
    ap.add_argument("--bucket", type=int, default=0,
                    help="0 (default) = per-batch pick_kv_bucket like the "
                    "eval loop: exact, but one compile variant per distinct "
                    "bucket (length-sorted batches keep that to a handful). "
                    "A fixed N bounds compiles to one variant per impl but "
                    "CROPS encoder memory for samples longer than N input "
                    "tokens — on the synthetic 26k test split 33%% exceed "
                    "512 (max 1121), which costs ~0.04 F1")
    ap.add_argument("--quantum", type=int, default=128,
                    help="bucket rounding for --bucket 0 (pick_kv_bucket "
                    "quantum). 128 matches the eval loop exactly; 256 "
                    "halves the number of compiled variants on a cold "
                    "compile cache at the cost of up to 128 extra padded "
                    "KV columns per batch (F1-neutral: padding is masked)")
    ap.add_argument("--split", default=None,
                    help="split file (default: the ckpt's DATASETS_TEST)")
    ap.add_argument("--root", default=None,
                    help="info dir (default: the ckpt's ROOT)")
    ap.add_argument("--limit", type=int, default=0,
                    help="cap the number of batches (0 = whole split)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke runs)")
    ap.add_argument("--alpha", type=float, default=0.0,
                    help="length-normalization exponent for beam<K> impls")
    ap.add_argument("--modality", default="line",
                    choices=("line", "sideface"),
                    help="dataset family: 'line' (complete/visible info "
                    "roots) or 'sideface' (side-face extraction, no-type "
                    "packing — use with the sideface checkpoint)")
    ap.add_argument("--reverse", action="store_true",
                    help="serve longest programs first (with --limit: "
                    "benchmark the hard tail of the split)")
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
    if args.modality == "sideface":
        from plankassembly_tpu.data.sideface_data import SidefaceDataset
        ds = SidefaceDataset(args.root, names, cfg, augmentation=False)
    else:
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
    if args.reverse:
        order = order[::-1]

    loader = DataLoader(ds, batch_size=args.batch, order=order,
                        pad_to_batch=True)

    impls = args.impls.split(",")
    known = ("auto", "xla", "mxu", "persistent", "persistent-interpret")
    wq8_ok = ("auto", "xla", "mxu")  # the Pallas impls ignore weight_quant
    bad = [i for i in impls
           if (i.removesuffix("-wq8") not in
               (wq8_ok if i.endswith("-wq8") else known))
           and not (i.startswith("beam") and i[4:].isdigit())]
    if bad:
        sys.exit(f"unknown --impls {bad}; choose from {known} "
                 f"({'/'.join(wq8_ok)} also take a -wq8 suffix = int8 "
                 "weight quantization) or beam<K> (beam-search decode, "
                 "plankassembly_tpu/beam.py)")
    if len(ds) == 0:
        sys.exit(f"empty split: {args.split}")

    from plankassembly_tpu.decode import pick_kv_bucket

    for impl in impls:
        if impl.startswith("beam"):
            from plankassembly_tpu.beam import beam_decode
            n_beams = int(impl[4:])

            def fn(p, b, bucket, _k=n_beams):
                return beam_decode(p, b, dims, num_beams=_k,
                                   compute_dtype=jnp.bfloat16,
                                   alpha=args.alpha, kv_bucket=bucket)
        else:
            wq = impl.endswith("-wq8")

            def fn(p, b, bucket, _impl=impl.removesuffix("-wq8"), _wq=wq):
                return _jitted(p, b, bucket, _impl, _wq)

            @functools.partial(jax.jit,
                               static_argnames=("bucket", "impl", "wq"))
            def _jitted(p, b, bucket, impl, wq):
                return greedy_decode(
                    p, b, dims, compute_dtype=jnp.bfloat16, early_exit=True,
                    kv_bucket=bucket, kv_quant=True, cross_impl=impl,
                    weight_quant=wq)

        tot_prog = 0
        tot_time = 0.0
        steps_hist = []
        sums = np.zeros(4)
        compile_t = 0.0
        seen_buckets = set()
        for bi, batch in enumerate(loader):
            if args.limit and bi >= args.limit:
                break
            arrays = {k: jnp.asarray(v) for k, v in batch.items()
                      if hasattr(v, "shape")}
            inputs = {k: v for k, v in arrays.items()
                      if k.startswith("input")}
            bucket = args.bucket or pick_kv_bucket(batch["input_mask"],
                                                   quantum=args.quantum)
            if bucket not in seen_buckets:  # new variant pays a compile
                seen_buckets.add(bucket)
                t0 = time.perf_counter()
                # sync via host transfer, NOT block_until_ready: on the
                # axon remote-TPU backend block_until_ready returns before
                # the server-side compile+execution finishes, which would
                # push the entire first compile wait into the first TIMED
                # batch (measured: 56-61 s landing in batch 0, CLAUDE.md
                # async-dispatch gotcha).
                np.asarray(fn(params, inputs, bucket)["samples"])
                compile_t += time.perf_counter() - t0
            t0 = time.perf_counter()
            out = fn(params, inputs, bucket)
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
            "impl": impl, "batch": args.batch,
            "buckets": sorted(seen_buckets),
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
