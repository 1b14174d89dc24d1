#!/usr/bin/env python
"""One-command inference: info JSONs or raw view SVGs -> predicted shape
programs (+ optional meshes). No ground truth required.

The reference's only inference surface is `trainer_*.py test` over a full
dataset with GT present (`trainer_complete.py:83-118`); serving a single
drawing means hand-building a dataset directory first. This CLI is the
missing serving entry point: it accepts either per-sample info JSONs (the
`prepare_info` contract, `dataset/prepare_info.py:59-70`) or the three raw
view SVGs of one sample, runs the KV-cached batched decode, and writes one
prediction JSON per sample (the `pred_jsons` schema minus the GT fields)
plus optional STL/GLB meshes.

Checkpoints: an orbax directory (next to its run's hparams.yaml) or a
released bf16 npz from tools/export_checkpoint.py (reads the sidecar
.hparams.yaml). Model hyperparameters always come from the checkpoint's
hparams, so GQA/MHA layouts load transparently.

Usage:
  python tools/predict.py --ckpt checkpoints/gqa_complete_ep99.npz \
      --info /root/data/data/complete/infos/0000.json --out /tmp/preds
  python tools/predict.py --ckpt <run>/checkpoints/best \
      --svg front.svg top.svg side.svg --out /tmp/preds --mesh glb
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load_params_and_config(ckpt_path, hparams_path=None):
    """Returns (params pytree of f32 jnp arrays, Config)."""
    import jax.numpy as jnp
    import ml_dtypes

    from plankassembly_tpu.config import config_from_hparams_file
    from tools.export_checkpoint import _unflatten

    ckpt_path = os.path.abspath(ckpt_path)
    if ckpt_path.endswith(".npz"):
        hp = hparams_path or os.path.splitext(ckpt_path)[0] + ".hparams.yaml"

        def _as_f32(a):
            if a.dtype.kind == "V" and a.dtype.itemsize == 2:
                a = a.view(ml_dtypes.bfloat16)  # npz stores bf16 as |V2
            return jnp.asarray(a, jnp.float32)

        with np.load(ckpt_path, allow_pickle=False) as z:
            flat = {k: _as_f32(z[k]) for k in z.files if k != "__step__"}
        params = _unflatten(flat)
    else:
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(ckpt_path)
        params = restored["params"] if "params" in restored else restored
        params = {k: v for k, v in params.items()}
        run_dir = os.path.dirname(os.path.dirname(ckpt_path))
        hp = hparams_path or os.path.join(run_dir, "hparams.yaml")
        import jax
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    if not os.path.exists(hp):
        raise SystemExit(f"hparams file not found: {hp} (pass --hparams)")
    return params, config_from_hparams_file(hp)


def sample_from_info(path, cfg):
    """Pack one info JSON's input streams (no GT keys required)."""
    from plankassembly_tpu.serving import pack_info_dict

    with open(path) as f:
        info = json.load(f)
    name = info.get("name", os.path.splitext(os.path.basename(path))[0])
    return name, pack_info_dict(info, cfg)


def sample_from_svgs(paths, cfg, name="sample"):
    """Pack one sample from its three view SVGs (front, top, side)."""
    from plankassembly_tpu.data import geometry as geo
    from plankassembly_tpu.data.packing import pack_input_sequence
    from plankassembly_tpu.io.svg import parse_svg

    assert len(paths) == cfg.DATA.NUM_VIEW, \
        f"need {cfg.DATA.NUM_VIEW} view SVGs, got {len(paths)}"
    lines, views, types = [], [], []
    for v_i, p in enumerate(paths):
        ls, ts = parse_svg(p)
        lines.extend(ls)
        types.extend(ts)
        views.extend([v_i] * len(ls))
    bounds = geo.bounds_many(lines)
    return name, pack_input_sequence(
        bounds, np.asarray(views), np.asarray(types),
        cfg.DATA, cfg.TOKEN, with_type=True)


def main():
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--ckpt",
                     help="orbax checkpoint dir or released .npz")
    src.add_argument("--artifact",
                     help="PSRV1 serving artifact (tools/export_serving.py) "
                     "— no checkpoint/model plumbing; needs --hparams; "
                     "--batch/--beam/--decode_impl are compiled in")
    ap.add_argument("--hparams", default=None,
                    help="hparams.yaml override (default: next to ckpt; "
                    "required with --artifact)")
    ap.add_argument("--info", nargs="*", action="append", default=[],
                    help="info JSON files (prepare_info contract); "
                    "repeatable, each occurrence takes one or more paths")
    ap.add_argument("--info_dir", default=None,
                    help="directory of info JSONs (all *.json)")
    ap.add_argument("--svg", nargs="*", default=[],
                    help="three view SVGs of ONE sample (front top side)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--mesh", choices=("stl", "glb"), default=None,
                    help="also export a mesh per prediction")
    ap.add_argument("--batch", type=int, default=32,
                    help="max decode batch (each distinct size jits once)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    ap.add_argument("--decode_impl", default="auto",
                    choices=("auto", "mxu", "persistent", "xla"),
                    help="decode schedule: 'persistent' = single-launch "
                    "Pallas kernel (GQA serving path; early-exits in-launch "
                    "since r4); 'auto' = XLA mxu path on TPU")
    ap.add_argument("--beam", type=int, default=1,
                    help="beam width (>1 switches to beam-search decode, "
                    "plankassembly_tpu/beam.py — beyond-reference; the "
                    "reference decodes greedily)")
    ap.add_argument("--alpha", type=float, default=0.0,
                    help="GNMT length-normalization exponent for --beam>1")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    import jax.numpy as jnp

    from plankassembly_tpu.decode import greedy_decode, pick_kv_bucket
    from plankassembly_tpu.models.model import ModelDims

    if args.artifact:
        if not args.hparams:
            raise SystemExit("--artifact needs --hparams (for the input "
                             "packer's DATA/TOKEN contract)")
        from plankassembly_tpu.config import config_from_hparams_file
        from plankassembly_tpu.export import load_artifact
        prog = load_artifact(args.artifact)
        cfg = config_from_hparams_file(args.hparams)
        args.batch = prog.meta["batch"]  # the compiled request size
        params = None
    else:
        prog = None
        params, cfg = load_params_and_config(args.ckpt, args.hparams)
    dims = ModelDims.from_config(cfg)

    samples = []
    infos = [p for group in args.info for p in group]
    if args.info_dir:
        infos += sorted(
            os.path.join(args.info_dir, f)
            for f in os.listdir(args.info_dir) if f.endswith(".json"))
    for p in infos:
        samples.append(sample_from_info(p, cfg))
    if args.svg:
        samples.append(sample_from_svgs(args.svg, cfg))
    if not samples:
        raise SystemExit("no inputs: pass --info/--info_dir and/or --svg")

    os.makedirs(args.out, exist_ok=True)
    # length-sorted batching (the eval loop's policy): programs of similar
    # input length share a batch, so each batch early-exits together and
    # picks the smallest kv bucket — outputs are per-name files, so the
    # serve order is free to choose
    samples.sort(key=lambda s: int((~s[1]["input_mask"]).sum()))
    n_done = 0
    for lo in range(0, len(samples), args.batch):
        chunk = samples[lo:lo + args.batch]
        if prog is not None:
            out = prog({k: np.stack([s[1][k] for s in chunk])
                        for k in chunk[0][1] if k.startswith("input")})
            out_samples = np.asarray(out["samples"])
            out_attach = np.asarray(out["attach"])
            for i, (name, _) in enumerate(chunk):
                _write_pred(args, name, out_samples[i], out_attach[i], dims)
                n_done += 1
            continue
        batch = {k: jnp.asarray(np.stack([s[1][k] for s in chunk]))
                 for k in chunk[0][1]}
        bucket = pick_kv_bucket(np.stack([s[1]["input_mask"]
                                          for s in chunk]))
        if args.beam > 1:
            from plankassembly_tpu.beam import beam_decode
            out = beam_decode(params, batch, dims, num_beams=args.beam,
                              compute_dtype=jnp.bfloat16,
                              alpha=args.alpha, kv_bucket=bucket)
        else:
            out = greedy_decode(params, batch, dims,
                                compute_dtype=jnp.bfloat16,
                                kv_bucket=bucket, kv_quant=True,
                                cross_impl=args.decode_impl)
        out_samples = np.asarray(out["samples"])
        out_attach = np.asarray(out["attach"])
        for i, (name, _) in enumerate(chunk):
            _write_pred(args, name, out_samples[i], out_attach[i], dims)
            n_done += 1
    print(f"predicted {n_done} samples -> {args.out}")


def _write_pred(args, name, sample_row, attach_row, dims):
    from plankassembly_tpu.serving import postprocess_prediction
    from plankassembly_tpu.tokens import dequantize_values

    pred, attach = postprocess_prediction(sample_row, attach_row, dims)
    with open(os.path.join(args.out, f"{name}.json"), "w") as f:
        json.dump({"prediction": pred.tolist(), "attach": attach},
                  f, indent=4, separators=(", ", ": "))
    if args.mesh and len(pred) > 1:
        from plankassembly_tpu.io.mesh import (
            build_mesh, export_glb, export_stl,
        )
        verts, faces = build_mesh(dequantize_values(pred))
        mp = os.path.join(args.out, f"{name}.{args.mesh}")
        if args.mesh == "stl":
            export_stl(mp, verts, faces)
        else:
            export_glb(mp, verts, faces)


if __name__ == "__main__":
    main()
