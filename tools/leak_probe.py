#!/usr/bin/env python
"""RSS leak attribution for the raster training path (VERDICT r1 #3).

Stages isolate the suspects; each loops N iterations and reports RSS slope
in KB/iter (one JSON line per stage):

  dataset  : RasterDataset __getitem__ + collate only (pure host)
  put      : + jax.device_put of the collated batch
  step     : jitted raster train step on a FIXED device batch
  full     : loader -> device_put -> train step (the real loop)

Run with PYTHONPATH=/root/repo:/root/.axon_site; stages with jax use the
default backend (TPU under axon) unless --cpu.
"""
import argparse
import json
import os


def rss_kb() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1])
    return -1


def slope(samples):
    """KB/iter over the last 80% (skip warmup allocations)."""
    import numpy as np
    xs = np.arange(len(samples))
    cut = len(samples) // 5
    xs, ys = xs[cut:], np.asarray(samples[cut:], dtype=np.float64)
    return float(np.polyfit(xs, ys, 1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="dataset,put,step,full")
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--data-root", default="/root/data")
    args = ap.parse_args()

    import numpy as np

    from plankassembly_tpu.config import Config
    from plankassembly_tpu.data.loader import collate, parse_splits_list
    from plankassembly_tpu.data.raster import RasterDataset

    cfg = Config()
    root = os.path.join(args.data_root, "data/complete/infos")
    names = parse_splits_list(os.path.join(args.data_root, "splits/train.txt"))
    ds = RasterDataset(root, names, cfg, augmentation=True,
                       image_size=args.image_size)

    stages = args.stages.split(",")

    def batch_at(i):
        idx = [(i * args.batch + j) % len(ds) for j in range(args.batch)]
        return collate([ds[k] for k in idx])

    if "dataset" in stages:
        rs = []
        for i in range(args.iters):
            batch_at(i)
            rs.append(rss_kb())
        print(json.dumps({"stage": "dataset", "kb_per_iter":
                          round(slope(rs), 2), "rss_mb": rs[-1] // 1024}),
              flush=True)

    if not ({"put", "step", "full"} & set(stages)):
        return

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from functools import partial
    from plankassembly_tpu.models.model import ModelDims
    from plankassembly_tpu.models.vit import (
        VitDims, init_vit_params, train_step_loss_raster,
    )
    from plankassembly_tpu.train.state import (
        init_state, make_optimizer, make_train_step,
    )

    dims = ModelDims.from_config(cfg)
    vit = VitDims(image_size=args.image_size, patch_size=32)

    if "put" in stages:
        rs = []
        for i in range(args.iters):
            b = batch_at(i)
            arrs = {k: jax.device_put(v) for k, v in b.items()
                    if isinstance(v, np.ndarray)}
            jax.block_until_ready(arrs["input_image"])
            del arrs
            rs.append(rss_kb())
        print(json.dumps({"stage": "put", "kb_per_iter":
                          round(slope(rs), 2), "rss_mb": rs[-1] // 1024}),
              flush=True)

    params = init_vit_params(jax.random.PRNGKey(0), dims, vit)
    opt = make_optimizer(1e-4)
    state = init_state(params, opt)
    step = make_train_step(opt, dims, compute_dtype=jnp.bfloat16,
                           loss_impl=partial(train_step_loss_raster, vit=vit))

    if "step" in stages:
        b = batch_at(0)
        arrs = {k: jnp.asarray(v) for k, v in b.items()
                if isinstance(v, np.ndarray)}
        rs = []
        for i in range(args.iters):
            state, mets = step(state, arrs, jax.random.PRNGKey(i))
            float(mets["loss"])
            rs.append(rss_kb())
        print(json.dumps({"stage": "step", "kb_per_iter":
                          round(slope(rs), 2), "rss_mb": rs[-1] // 1024}),
              flush=True)

    if "full" in stages:
        rs = []
        for i in range(args.iters):
            b = batch_at(i)
            arrs = {k: jnp.asarray(v) for k, v in b.items()
                    if isinstance(v, np.ndarray)}
            state, mets = step(state, arrs, jax.random.PRNGKey(i))
            float(mets["loss"])
            rs.append(rss_kb())
        print(json.dumps({"stage": "full", "kb_per_iter":
                          round(slope(rs), 2), "rss_mb": rs[-1] // 1024}),
              flush=True)


if __name__ == "__main__":
    main()
