"""Compile-check (and optionally run) the persistent decode kernel at
flagship dims on the TPU backend. Compile is server-side and safe while
another job owns the chip; pass --run only on a free chip."""
import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from plankassembly_tpu.config import Config
from plankassembly_tpu.models.model import ModelDims, init_params
from plankassembly_tpu.ops.persistent_decode import persistent_greedy_decode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--li", type=int, default=512)
    ap.add_argument("--kv-head", type=int, default=2)
    ap.add_argument("--block-rows", type=int, default=8)
    ap.add_argument("--run", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--parity", action="store_true",
                    help="also run the XLA mxu decode path on the same "
                         "inputs and report token agreement")
    ap.add_argument("--early-exit", action="store_true",
                    help="build the r4 early-exit variant (SMEM done "
                         "flag; num_steps reports the true trip count)")
    args = ap.parse_args()

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, MODEL=dataclasses.replace(cfg.MODEL, NUM_KV_HEAD=args.kv_head))
    dims = ModelDims.from_config(cfg)
    params = init_params(jax.random.PRNGKey(0), dims)

    B, Li, D = args.batch, args.li, dims.num_model
    memory = jax.ShapeDtypeStruct((B, Li, D), jnp.float32)
    mask = jax.ShapeDtypeStruct((B, Li), jnp.bool_)

    fn = lambda p, m, mm: persistent_greedy_decode(
        p, m, mm, dims, block_rows=args.block_rows,
        compute_dtype=jnp.bfloat16, early_exit=args.early_exit)
    t0 = time.time()
    compiled = jax.jit(fn).lower(params, memory, mask).compile()
    print(f"COMPILE OK in {time.time() - t0:.1f}s "
          f"(B={B} Li={Li} kv={args.kv_head} rb={args.block_rows} "
          f"early_exit={args.early_exit})", flush=True)
    mem = compiled.memory_analysis()
    if mem is not None:
        print(f"  hbm: args {mem.argument_size_in_bytes / 1e6:.0f} MB, "
              f"temp {mem.temp_size_in_bytes / 1e6:.0f} MB", flush=True)

    if args.run:
        rng = np.random.default_rng(0)
        mem_v = jnp.asarray(rng.normal(size=(B, Li, D)), jnp.float32)
        mask_v = jnp.asarray(np.zeros((B, Li), bool))
        out = compiled(params, mem_v, mask_v)
        np.asarray(out["samples"])   # sync
        times = []
        for _ in range(args.iters):
            t0 = time.time()
            out = compiled(params, mem_v, mask_v)
            np.asarray(out["samples"])
            times.append(time.time() - t0)
        dt = min(times)
        S = dims.max_output_length
        nsteps = int(np.asarray(out["num_steps"]))
        print(f"RUN: {dt * 1e3:.1f} ms total, {dt / S * 1e3:.3f} ms/step, "
              f"{B / dt:.1f} prog/s (decode-only, num_steps={nsteps} of "
              f"bound {S})", flush=True)

        if args.parity:
            from plankassembly_tpu.decode import decode_from_memory
            ref = jax.jit(lambda p, m, mm: decode_from_memory(
                p, m, mm, dims, compute_dtype=jnp.bfloat16, kv_quant=True,
                self_quant=False, early_exit=False, cross_impl="mxu"))(
                    params, mem_v, mask_v)
            a = np.asarray(out["samples"])
            b = np.asarray(ref["samples"])
            agree = float((a == b).mean())
            rows = float((a == b).all(axis=-1).mean())
            print(f"PARITY vs mxu: token agree {agree:.4f}, "
                  f"identical rows {rows:.3f}", flush=True)


if __name__ == "__main__":
    main()
