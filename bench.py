#!/usr/bin/env python
"""Headline benchmark: autoregressive shape-program decode throughput.

Decoding is the hot loop of the whole system (SURVEY.md §3.2): the reference
re-runs the full decoder over the growing prefix every step with no KV cache
(`plankassembly/models.py:284-307`, O(T^3)). Our KV-cached `lax.while_loop`
decode (+ static length-bucketing of cross-attention K/V) is the headline
win, so the benchmark measures:

    value       = shape programs decoded / second / chip (flagship model,
                  d=512, 6+6 layers, realistic ~400-token inputs,
                  full 128-step decode — no early exit, B=256: the
                  throughput-optimal batch after the MXU cross-attention
                  rework amortizes the per-step weight reads)
    vs_baseline = speedup over the reference-faithful no-cache decode
                  algorithm on the SAME chip, same batch/weights/steps
                  (the baseline, like the reference, processes the full
                  padded input — the reference publishes no throughput
                  numbers of its own, see BASELINE.md).

Random weights never emit END, so both variants run all 128 steps — the
conservative worst case (trained models early-exit at ~20-40 tokens, which
only helps the cached path). Timing syncs via a device->host transfer and
asserts the step count, so async dispatch can't fake the numbers.

Prints ONE JSON line.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from plankassembly_tpu.config import Config
    from plankassembly_tpu.decode import (
        greedy_decode, greedy_decode_nocache, pick_kv_bucket,
    )
    from plankassembly_tpu.models.model import ModelDims, init_params

    cfg = Config()

    # Optional: BENCH_CKPT=<orbax dir> benchmarks a trained checkpoint with
    # realistic early-exit decoding instead of random weights at the full
    # 128-step bound (used for reporting; the driver runs the default).
    # Model hyperparameters (e.g. a GQA NUM_KV_HEAD) are taken from the
    # run's hparams.yaml when it sits next to the checkpoint dir.
    import os
    ckpt = os.environ.get("BENCH_CKPT")
    if ckpt:
        run_dir = os.path.dirname(os.path.dirname(os.path.abspath(ckpt)))
        hp = os.path.join(run_dir, "hparams.yaml")
        if os.path.exists(hp):
            from plankassembly_tpu.config import config_from_hparams_file
            cfg = config_from_hparams_file(hp)
    dims = ModelDims.from_config(cfg)
    params = init_params(jax.random.PRNGKey(0), dims)
    if ckpt:
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(ckpt))
        params = jax.tree.map(jnp.asarray, restored["params"])

    # B=512 is the measured amortization ceiling for per-step weight reads
    # (921 prog/s decode-only vs 893 at B=256, tools/bench_fused.py r2)
    batch_size = int(os.environ.get("BENCH_BATCH", "512"))
    batch_np = _example_batch(cfg, batch_size)
    inputs = {k: jnp.asarray(v) for k, v in batch_np.items()
              if k.startswith("input")}
    bucket = pick_kv_bucket(batch_np["input_mask"])

    def run(fn, iters, **kw):
        """Compile via an explicit lower/compile so XLA's own cost analysis
        (FLOPs + bytes accessed) is available for the roofline fraction."""
        wrapped = jax.jit(lambda p, b: fn(
            p, b, dims, compute_dtype=jnp.bfloat16, early_exit=False, **kw))
        compiled = wrapped.lower(params, inputs).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        out = compiled(params, inputs)
        steps = int(np.asarray(out["num_steps"]))  # host sync + sanity
        assert steps == dims.max_output_length, steps
        t0 = time.perf_counter()
        for _ in range(iters):
            out = compiled(params, inputs)
            np.asarray(out["samples"])  # true host sync
        dt = (time.perf_counter() - t0) / iters
        return batch_size / dt, dt, cost

    # int8 cross-K/V halves the decode loop's dominant HBM traffic;
    # measured F1 impact on a trained model is 2e-4 (see DEVIATIONS.md)
    cached_pps, cached_dt, cost = run(greedy_decode, iters=3,
                                      kv_bucket=bucket, kv_quant=True)
    baseline_pps, _, _ = run(greedy_decode_nocache, iters=1)

    # Roofline fraction from XLA's cost analysis against v5e public peaks
    # (197 bf16 TFLOP/s, 819 GB/s HBM). Decode is bandwidth-bound, so the
    # binding constraint — max of the two fractions — is the utilization.
    peak_flops, peak_bw = 197e12, 819e9
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))
    util = max(flops / cached_dt / peak_flops,
               bytes_accessed / cached_dt / peak_bw)

    print(json.dumps({
        "metric": "shape_programs_per_sec_per_chip",
        "value": round(cached_pps, 2),
        "unit": "programs/s",
        "vs_baseline": round(cached_pps / baseline_pps, 2),
        "batch": batch_size,
        "util_frac": round(util, 3),
    }))


if __name__ == "__main__":
    main()
