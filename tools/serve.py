#!/usr/bin/env python
"""Online reconstruction service with dynamic batching.

    # from an AOT artifact (no checkpoint/model plumbing on the host):
    python tools/serve.py --artifact serving/complete_b16_k512.psrv --port 8713

    # or live from a checkpoint:
    python tools/serve.py --ckpt checkpoints/gqa_complete_ep181.npz \
        --batch 16 --bucket 512 [--beam 4] [--cpu] --port 8713

    curl -s localhost:8713/v1/reconstruct -d @info.json   # prepare_info contract
    curl -s localhost:8713/healthz

Concurrent requests are multiplexed onto the one compiled batch
(`plankassembly_tpu/serving.py`): up to --batch rows share a single
program call after at most --max_wait_ms of queueing, so throughput
scales with concurrency while shapes (and therefore compiles) stay fixed.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--artifact", action="append",
                     help="PSRV1 file from tools/export_serving.py; "
                     "repeat to serve a BUCKET LADDER (requests route to "
                     "the smallest bucket that fits their real tokens)")
    src.add_argument("--ckpt", help="orbax checkpoint dir or released .npz")
    ap.add_argument("--hparams", default=None,
                    help="hparams.yaml (required with --artifact for "
                    "request packing; default: next to --ckpt)")
    ap.add_argument("--port", type=int, default=8713)
    ap.add_argument("--batch", type=int, default=None,
                    help="live backend only (default 16); an --artifact "
                    "carries its own compiled batch")
    ap.add_argument("--bucket", type=int, default=None,
                    help="live backend only (default 512)")
    ap.add_argument("--beam", type=int, default=None,
                    help="live backend only (default 0 = greedy)")
    ap.add_argument("--max_wait_ms", type=float, default=10.0)
    ap.add_argument("--no_input_type", action="store_true",
                    help="live backend only: sideface input contract "
                    "(requests' SVGs run the side-face extractor; an "
                    "--artifact records this in its header)")
    ap.add_argument("--weight_quant", action="store_true",
                    help="live backend only: int8-quantize the decode "
                    "weights out-of-trace (the artifact-canonical form)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["PLANK_FORCE_CPU"] = "1"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from plankassembly_tpu.config import config_from_hparams_file
    from plankassembly_tpu.models.model import ModelDims
    from plankassembly_tpu.serving import (
        BatchingServer, BucketRouter, make_http_server, make_live_backend,
    )

    if args.artifact:
        if ((args.batch, args.bucket, args.beam) != (None, None, None)
                or args.weight_quant or args.no_input_type):
            raise SystemExit("--batch/--bucket/--beam/--weight_quant/"
                             "--no_input_type are compiled into an "
                             "--artifact (see its header via /meta); they "
                             "only apply to --ckpt live backends")
        from plankassembly_tpu.export import load_artifact
        backends = [load_artifact(a) for a in args.artifact]
        if not args.hparams:
            raise SystemExit("--artifact needs --hparams (for the request "
                             "packer's DATA/TOKEN contract)")
        cfg = config_from_hparams_file(args.hparams)
        servers = [BatchingServer(b, b.meta, max_wait_ms=args.max_wait_ms)
                   for b in backends]
        server = (servers[0] if len(servers) == 1
                  else BucketRouter(servers))
    else:
        from tools.predict import load_params_and_config
        params, cfg = load_params_and_config(args.ckpt, args.hparams)
        if args.weight_quant:
            from plankassembly_tpu.decode import quantize_decoder_weights
            params = quantize_decoder_weights(params)
        backend, meta = make_live_backend(
            params, cfg, batch=args.batch or 16, bucket=args.bucket or 512,
            beam=args.beam or 0, with_type=not args.no_input_type)
        server = BatchingServer(backend, meta, max_wait_ms=args.max_wait_ms)
    dims = ModelDims.from_config(cfg)

    meta = server.meta
    httpd = make_http_server(server, cfg, dims, port=args.port)
    print(f"serving on http://127.0.0.1:{httpd.server_address[1]} "
          f"(batch={meta['batch']} "
          f"bucket={meta.get('buckets', meta['bucket'])} "
          f"beam={meta['beam']} backend="
          f"{'artifact' if args.artifact else 'live'})", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.close()


if __name__ == "__main__":
    main()
