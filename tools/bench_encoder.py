#!/usr/bin/env python
"""Encoder wall-time attribution at serving shape (round 5).

bench.py's encoder-share measurement (encoder_ms 192 of a 422 ms
whole-program wall at B=512, bucket 512) showed the ENCODER — not the
decode loop (util_decode 0.476) — is where the remaining whole-program
headroom lives: 6 pre-norm layers at B=512, L=512, d=512 is ~6.6 TFLOP
of matmul + ~1.6 TFLOP of attention, i.e. ~45 ms at v5e bf16 peak, so
192 ms is ~25% MXU utilization.

Variants timed (one JSON line each):
  flash      the Pallas fused pad-masked attention (`ops/attention.py`,
             the training default; encode(flash=True))
  xla        plain XLA attention (encode(flash=False))

Usage: python tools/bench_encoder.py [--batch 512] [--bucket 512] [--iters 5]
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
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--bucket", type=int, default=512)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--kv_head", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    import dataclasses

    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from plankassembly_tpu.config import Config
    from plankassembly_tpu.models.model import ModelDims, encode, init_params

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, MODEL=dataclasses.replace(cfg.MODEL, NUM_KV_HEAD=args.kv_head))
    dims = ModelDims.from_config(cfg)
    params = init_params(jax.random.PRNGKey(0), dims)
    batch_np = _example_batch(cfg, args.batch)
    inputs = {k: jnp.asarray(v[:, :args.bucket])
              for k, v in batch_np.items() if k.startswith("input")}

    def timed(name, fn):
        jitted = jax.jit(fn)
        compiled = jitted.lower(params, inputs).compile()
        np.asarray(compiled(params, inputs))  # warm + sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            np.asarray(compiled(params, inputs))
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({"variant": name, "batch": args.batch,
                          "bucket": args.bucket,
                          "wall_ms": round(dt * 1e3, 2)}), flush=True)
        return dt

    # sync via a scalar so the tunnel transfer isn't what's timed
    timed("flash", lambda p, b: encode(
        p, b, dims, deterministic=True, compute_dtype=jnp.bfloat16,
        flash=True).sum())
    timed("xla", lambda p, b: encode(
        p, b, dims, deterministic=True, compute_dtype=jnp.bfloat16,
        flash=False).sum())


if __name__ == "__main__":
    main()
