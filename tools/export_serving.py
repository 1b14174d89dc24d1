#!/usr/bin/env python
"""Export a trained checkpoint as a self-contained AOT serving artifact.

    python tools/export_serving.py --ckpt checkpoints/gqa_complete_ep181.npz \
        --batch 16 --bucket 512 --platforms cpu,tpu \
        --out serving/complete_b16_k512.psrv [--beam 4] [--verify]

The artifact (see `plankassembly_tpu/export.py`) embeds the weights as
StableHLO constants; a serving host loads it with `load_artifact(path)`
and needs no model code, checkpoint, or config. `--verify` deserializes
the fresh artifact and checks its tokens bit-exactly against the live
decode path on a synthetic batch before writing.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="orbax checkpoint dir or released .npz")
    ap.add_argument("--hparams", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--bucket", default="512",
                    help="compiled input width (multiple of 128); a comma "
                    "list (e.g. 512,768,1152) exports a BUCKET LADDER — "
                    "one artifact per width, '.k<bucket>' inserted before "
                    "the --out extension — for tools/serve.py routing")
    ap.add_argument("--beam", type=int, default=0,
                    help=">=2 exports the beam-search decoder")
    ap.add_argument("--platforms", default="cpu,tpu")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--weight_quant", action="store_true",
                    help="bake decoder/head weights as int8 constants "
                    "(~2x smaller artifact, ~2x less per-step weight HBM)")
    ap.add_argument("--data_parallel", type=int, default=1,
                    help="export an SPMD program sharding the batch over "
                    "N devices (requires N visible devices to trace/load)")
    ap.add_argument("--no_input_type", action="store_true",
                    help="sideface-modality input contract: no line-type "
                    "stream (data/sideface_data.py packs with_type=False)")
    ap.add_argument("--verify", action="store_true",
                    help="round-trip the artifact vs the live decode path")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend for tracing/verification")
    args = ap.parse_args()

    if args.cpu:
        os.environ["PLANK_FORCE_CPU"] = "1"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from plankassembly_tpu.export import (
        export_serving, load_artifact, save_artifact,
    )
    from tools.predict import load_params_and_config

    params, cfg = load_params_and_config(args.ckpt, args.hparams)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    buckets = [int(b) for b in str(args.bucket).split(",") if b.strip()]
    outs = ([args.out] if len(buckets) == 1 else
            [f"{os.path.splitext(args.out)[0]}.k{b}"
             f"{os.path.splitext(args.out)[1]}" for b in buckets])
    for bucket, out in zip(buckets, outs):
        blob, meta = export_serving(
            params, cfg, batch=args.batch, bucket=bucket, beam=args.beam,
            platforms=[p.strip() for p in args.platforms.split(",")
                       if p.strip()],
            compute_dtype=dtype, weight_quant=args.weight_quant,
            data_parallel=args.data_parallel,
            with_type=not args.no_input_type)
        meta["checkpoint"] = os.path.basename(args.ckpt)
        os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
        save_artifact(out, blob, meta)
        print(f"wrote {out}: {os.path.getsize(out) / 1e6:.1f} MB, "
              f"batch={meta['batch']} bucket={meta['bucket']} "
              f"beam={meta['beam']} platforms={meta['platforms']}")
    args.bucket = buckets[-1]
    args.out = outs[-1]  # --verify checks the widest rung

    if args.verify:
        from plankassembly_tpu.models.model import ModelDims
        from tests.tiny import random_batch
        import dataclasses

        dims = ModelDims.from_config(cfg)
        vcfg = dataclasses.replace(
            cfg, DATA=dataclasses.replace(
                cfg.DATA, MAX_INPUT_LENGTH=args.bucket + 1))
        batch = random_batch(vcfg, batch_size=args.batch, seed=7,
                             with_type=not args.no_input_type)
        prog = load_artifact(args.out)
        got = prog({k: v for k, v in batch.items()
                    if k.startswith("input")})
        if args.weight_quant:
            # compare against the same out-of-trace quantization the
            # artifact baked in (in-trace weight_quant=True quantizes
            # inside the jitted program, where XLA's algebraic
            # rearrangement of the quantize ops can flip a handful of
            # int8 levels — a different, equally valid quantization)
            from plankassembly_tpu.decode import quantize_decoder_weights
            params = quantize_decoder_weights(params)
        if args.beam >= 2:
            from plankassembly_tpu.beam import beam_decode
            want = beam_decode(params,
                               {k: jnp.asarray(v) for k, v in batch.items()
                                if k.startswith("input")},
                               dims, num_beams=args.beam,
                               compute_dtype=dtype)
        else:
            from plankassembly_tpu.decode import greedy_decode
            want = greedy_decode(params,
                                 {k: jnp.asarray(v) for k, v in batch.items()
                                  if k.startswith("input")},
                                 dims, compute_dtype=dtype,
                                 kv_bucket=args.bucket, kv_quant=True,
                                 cross_impl="mxu")
        np.testing.assert_array_equal(got["samples"],
                                      np.asarray(want["samples"]))
        np.testing.assert_array_equal(got["attach"],
                                      np.asarray(want["attach"]))
        print("verify: artifact tokens bit-exact vs live decode")


if __name__ == "__main__":
    main()
