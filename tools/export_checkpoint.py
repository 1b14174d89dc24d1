#!/usr/bin/env python
"""Export / import released checkpoints as a single compressed npz.

The reference publishes trained checkpoints on HuggingFace
(`/root/reference/README.md:152-156`); this is our equivalent release
format: parameters cast to bfloat16 (training/eval here run bf16 compute
anyway) in one flat npz next to the run's hparams.yaml, ~51 MB for the
d=512 flagship — small enough to version inside the repo, so trained
models survive environment resets.

Export:  python tools/export_checkpoint.py export \
             --ckpt <run>/checkpoints/best --out checkpoints/name.npz
         (copies <run>/hparams.yaml to checkpoints/name.hparams.yaml)
Import:  python tools/export_checkpoint.py import \
             --npz checkpoints/name.npz --out /tmp/run_ckpt
         (writes a full orbax checkpoint with a fresh Adam state — a
         warm-start: resuming training re-estimates moments, inference
         and evaluation are exact)
"""
import argparse
import json
import os
import shutil


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _unflatten(flat):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def do_export(args):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    ckpt = os.path.abspath(args.ckpt)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(ckpt)
    params = restored["params"]
    step = int(np.asarray(restored.get("step", 0)))
    flat = {k: np.asarray(jnp.asarray(v).astype(jnp.bfloat16))
            for k, v in _flatten(params).items()}
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez_compressed(args.out, __step__=np.asarray(step), **flat)

    run_dir = os.path.dirname(os.path.dirname(ckpt))
    hp = os.path.join(run_dir, "hparams.yaml")
    if os.path.exists(hp):
        shutil.copy(hp, os.path.splitext(args.out)[0] + ".hparams.yaml")
    meta = os.path.join(run_dir, "checkpoints",
                        os.path.basename(ckpt) + ".meta.json")
    if os.path.exists(meta):
        shutil.copy(meta, os.path.splitext(args.out)[0] + ".meta.json")
    n = sum(v.size for v in flat.values())
    print(f"exported {n/1e6:.1f}M params (step {step}) -> {args.out} "
          f"({os.path.getsize(args.out)/1e6:.1f} MB)")


def do_import(args):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from plankassembly_tpu.train.state import make_optimizer

    import ml_dtypes

    def _as_f32(a):
        if a.dtype.kind == "V" and a.dtype.itemsize == 2:
            a = a.view(ml_dtypes.bfloat16)   # npz round-trips bf16 as |V2
        return jnp.asarray(a).astype(jnp.float32)

    with np.load(args.npz, allow_pickle=False) as z:
        flat = {k: _as_f32(z[k]) for k in z.files if k != "__step__"}
        step = int(z["__step__"]) if "__step__" in z.files else 0
    params = _unflatten(flat)
    optimizer = make_optimizer(args.lr)
    opt_state = optimizer.init(params)
    out = os.path.abspath(args.out)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(out, {"params": params, "opt_state": opt_state,
                         "step": step}, force=True)
    hp_src = os.path.splitext(args.npz)[0] + ".hparams.yaml"
    if os.path.exists(hp_src):
        shutil.copy(hp_src, os.path.join(os.path.dirname(out),
                                         "hparams.yaml"))
    print(f"imported step-{step} params -> orbax checkpoint {out} "
          "(fresh optimizer state: warm start)")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    ex = sub.add_parser("export")
    ex.add_argument("--ckpt", required=True)
    ex.add_argument("--out", required=True)
    im = sub.add_parser("import")
    im.add_argument("--npz", required=True)
    im.add_argument("--out", required=True)
    im.add_argument("--lr", type=float, default=1e-4)
    args = ap.parse_args()
    if args.cmd == "export":
        do_export(args)
    else:
        do_import(args)


if __name__ == "__main__":
    main()
