#!/usr/bin/env python
"""Bisect the persistent-kernel B=1024 hang (VERDICT r4 weak #4).

r3 observed: at B=1024 the persistent decode kernel "hung pre-first-run"
for >15 min and killing it wedged the device ~25 min. That observation
conflates two distinct stages with very different risk profiles:

  compile   client lowers StableHLO, the axon server runs XLA+Mosaic.
            The device is IDLE during compilation — killing a hung
            compile cannot wedge it (CLAUDE.md: "killing at idle is
            fine").
  execute   the first run of the compiled kernel. Killing mid-execution
            is what wedges the chip.

This probe separates them. Each stage runs in a SUBPROCESS with a
timeout so a hang is bounded and attributable:

    python tools/probe_b1024.py --stage compile --batch 1024 --rb 16
    python tools/probe_b1024.py --stage execute --batch 1024 --rb 16
    python tools/probe_b1024.py --sweep        # compile-stage bisection

--sweep compiles B in {512 (control), 640, 768, 1024} x rb {8, 16, 32}
and prints one JSON line per point with the outcome + wall time, giving
the Mosaic-level boundary for the kernel docstring. Execute-stage points
should only be run when a ~25 min device wedge is acceptable.

The B>512 dispatch guard stays in production; the probe lifts it with
PLANK_PERSISTENT_UNSAFE_LARGE_B=1 (see ops/persistent_decode.py).
"""
import argparse
import json
import os
import subprocess
import sys
import time

_CHILD = """
import os, time, sys
os.environ["PLANK_PERSISTENT_UNSAFE_LARGE_B"] = "1"
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
from plankassembly_tpu.config import Config
from plankassembly_tpu.models.model import ModelDims, init_params
from plankassembly_tpu.models.model import encode
from plankassembly_tpu.ops.persistent_decode import persistent_greedy_decode
import dataclasses

B = int(os.environ["PROBE_B"]); RB = int(os.environ["PROBE_RB"])
LI = int(os.environ["PROBE_LI"]); STAGE = os.environ["PROBE_STAGE"]
cfg = Config()
cfg = dataclasses.replace(cfg, MODEL=dataclasses.replace(cfg.MODEL,
                                                         NUM_KV_HEAD=2))
dims = ModelDims.from_config(cfg)
params = init_params(jax.random.PRNGKey(0), dims)
rng = np.random.RandomState(0)
memory = jnp.asarray(rng.randn(B, LI, dims.num_model), jnp.bfloat16)
memory_mask = jnp.zeros((B, LI), bool)

t0 = time.time()
lowered = persistent_greedy_decode.lower(
    params, memory, memory_mask, dims, block_rows=RB,
    compute_dtype=jnp.bfloat16, early_exit=False)
print(f"LOWERED {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
compiled = lowered.compile()
print(f"COMPILED {time.time()-t0:.1f}s", flush=True)
if STAGE == "execute":
    t0 = time.time()
    out = compiled(params, memory, memory_mask)
    steps = int(np.asarray(out["num_steps"]))
    dt = time.time() - t0
    print(f"EXECUTED {dt:.1f}s steps={steps}", flush=True)
    t0 = time.time()
    np.asarray(compiled(params, memory, memory_mask)["samples"])
    dt = time.time() - t0
    print(f"TIMED {dt*1e3:.1f}ms = {B/dt:.1f} prog/s decode-only",
          flush=True)
"""


def run_point(stage: str, b: int, rb: int, li: int, timeout: float) -> dict:
    env = dict(os.environ)
    env.update(PROBE_B=str(b), PROBE_RB=str(rb), PROBE_LI=str(li),
               PROBE_STAGE=stage)
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                           capture_output=True, text=True, timeout=timeout)
        out = r.stdout
        outcome = ("ok" if r.returncode == 0 else "error")
        tail = (r.stderr or out)[-1500:] if outcome == "error" else ""
    except subprocess.TimeoutExpired as e:
        out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) \
            else (e.stdout or "")
        outcome = "timeout"
        tail = ""
    rec = {"stage": stage, "B": b, "rb": rb, "Li": li,
           "outcome": outcome, "wall_s": round(time.time() - t0, 1),
           "progress": [l for l in out.splitlines()
                        if l.split(" ")[0] in
                        ("LOWERED", "COMPILED", "EXECUTED", "TIMED")]}
    if tail:
        rec["tail"] = tail
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=("compile", "execute"),
                    default="compile")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--rb", type=int, default=16)
    ap.add_argument("--li", type=int, default=512)
    ap.add_argument("--timeout", type=float, default=900)
    ap.add_argument("--sweep", action="store_true",
                    help="compile-stage bisection over B x rb")
    args = ap.parse_args()
    if args.sweep:
        for b in (512, 640, 768, 1024):
            for rb in (8, 16, 32):
                if b % rb:
                    continue
                run_point("compile", b, rb, args.li, args.timeout)
    else:
        run_point(args.stage, args.batch, args.rb, args.li, args.timeout)


if __name__ == "__main__":
    main()
