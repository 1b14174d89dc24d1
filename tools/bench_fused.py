#!/usr/bin/env python
"""Bench the fused decoder-layer kernel path against the XLA mxu path.

Times `decode_from_memory` (the shared production decode loop) at flagship
shapes with early_exit=False so both run the full 128-step bound. Prints one
JSON line per impl with ms/step and programs/s.

Usage: python tools/bench_fused.py [--batch 256] [--li 512] [--kv-head 0]
       [--iters 3] [--impls mxu,fused]
"""
import argparse
import dataclasses
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--li", type=int, default=512)
    ap.add_argument("--kv-head", type=int, default=0)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--impls", default="mxu,fused")
    ap.add_argument("--block-rows", type=int, default=8)
    ap.add_argument("--gqa-self", default="grouped",
                    help="grouped | expand (GQA self-attention einsum form)")
    ap.add_argument("--self-quant", default="auto",
                    choices=("auto", "on", "off"),
                    help="int8 self-KV cache (auto = follow kv_quant)")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of one timed decode "
                         "into DIR (feed to tools/trace_summary.py --gaps)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from plankassembly_tpu.config import Config
    from plankassembly_tpu.decode import decode_from_memory
    from plankassembly_tpu.models.model import ModelDims, init_params

    cfg = Config()
    if args.kv_head:
        cfg = dataclasses.replace(
            cfg, MODEL=dataclasses.replace(cfg.MODEL,
                                           NUM_KV_HEAD=args.kv_head))
    dims = ModelDims.from_config(cfg)
    params = init_params(jax.random.PRNGKey(0), dims)

    B, Li, D = args.batch, args.li, dims.num_model
    key = jax.random.PRNGKey(1)
    memory = jax.random.normal(key, (B, Li, D), jnp.float32)
    mask = jnp.zeros((B, Li), bool)
    S = dims.max_output_length

    for impl in args.impls.split(","):
        sq = {"auto": None, "on": True, "off": False}[args.self_quant]
        kw = (dict(cross_impl="fused")
              if impl == "fused" else dict(cross_impl=impl, kv_quant=True,
                                           gqa_self_impl=args.gqa_self,
                                           self_quant=sq))
        # decode_from_memory is not itself jitted: wrap it, or every timed
        # call pays a full retrace+lower (~1.5 s)
        jitted = jax.jit(lambda p, m, k: decode_from_memory(
            p, m, k, dims, compute_dtype=jnp.bfloat16,
            early_exit=False, **kw))
        fn = lambda: jitted(params, memory, mask)
        t0 = time.perf_counter()
        out = fn()
        steps = int(np.asarray(out["num_steps"]))
        compile_s = time.perf_counter() - t0
        assert steps == S, steps
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn()
            np.asarray(out["samples"])  # host sync
        dt = (time.perf_counter() - t0) / args.iters
        if args.trace:
            with jax.profiler.trace(args.trace):
                np.asarray(fn()["samples"])
        print(json.dumps({
            "impl": impl, "batch": B, "li": Li, "kv_head": dims.kv_heads,
            "ms_per_decode": round(dt * 1e3, 2),
            "ms_per_step": round(dt * 1e3 / S, 3),
            "programs_per_sec": round(B / dt, 1),
            "compile_s": round(compile_s, 1),
        }))


if __name__ == "__main__":
    main()
