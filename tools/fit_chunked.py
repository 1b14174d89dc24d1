#!/usr/bin/env python
"""Chunked training driver: run `fit` in bounded-lifetime subprocesses.

Why: on hosts whose TPU transfer path leaks host memory per device_put
(this container's remote-PJRT bug, CLAUDE.md — ~0.9 MB/step at B=64), a
single long `fit` process grows tens of GB of RSS over a 65k-step run. The
leak is in the closed PJRT plugin, not reclaimable in-process. The bounded
fix: run N epochs per OS process, resume from the `last` orbax checkpoint
in a fresh process, repeat — RSS is capped at one chunk's growth while the
training trajectory is identical to a monolithic run up to the documented
resume semantics (epoch counter restarts per chunk; keep
--epochs-per-chunk a multiple of check_val_every_n_epoch so the val/
checkpoint cadence is preserved).

Usage:
    python tools/fit_chunked.py --trainer trainer_complete.py \
        --config configs/train_synthetic_gqa.yaml \
        --total-epochs 200 --epochs-per-chunk 20 \
        --root-dir /root/runs [--ckpt_path <resume from>] [-- extra args...]

Extra args after `--` pass through to the trainer CLI verbatim.
"""
import argparse
import glob
import os
import subprocess
import sys


def newest_run_dir(root: str, after: float) -> str | None:
    dirs = [d for d in glob.glob(os.path.join(root, "version_*"))
            if os.path.isdir(d) and os.path.getmtime(d) >= after]
    return max(dirs, key=os.path.getmtime) if dirs else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trainer", default="trainer_complete.py",
                    help="trainer entry point script")
    ap.add_argument("--config", required=True)
    ap.add_argument("--total-epochs", type=int, required=True)
    ap.add_argument("--epochs-per-chunk", type=int, default=20)
    ap.add_argument("--root-dir", required=True,
                    help="--trainer.default_root_dir for every chunk")
    ap.add_argument("--ckpt_path", default=None,
                    help="optional checkpoint to warm-start the first chunk")
    ap.add_argument("extra", nargs="*",
                    help="extra trainer CLI args (after --)")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    trainer = os.path.join(repo, args.trainer)
    ckpt = args.ckpt_path
    done = 0
    chunk_idx = 0
    while done < args.total_epochs:
        n = min(args.epochs_per_chunk, args.total_epochs - done)
        cmd = [sys.executable, trainer, "fit", "--config", args.config,
               "--trainer.default_root_dir", args.root_dir,
               "--trainer.max_epochs", str(n)]
        if ckpt:
            cmd += ["--ckpt_path", ckpt]
        cmd += args.extra
        import time
        t0 = time.time()
        print(f"[fit_chunked] chunk {chunk_idx}: epochs {done}..{done + n} "
              f"(resume={ckpt})", flush=True)
        rc = subprocess.call(cmd, cwd=repo)
        if rc != 0:
            raise SystemExit(f"chunk {chunk_idx} failed with rc={rc}")
        run_dir = newest_run_dir(args.root_dir, after=t0 - 1)
        if run_dir is None:
            raise SystemExit("no run dir produced by chunk")
        ckpt = os.path.join(run_dir, "checkpoints", "last")
        if not os.path.isdir(ckpt):
            raise SystemExit(f"chunk wrote no 'last' checkpoint at {ckpt}")
        done += n
        chunk_idx += 1
    print(f"[fit_chunked] done: {done} epochs over {chunk_idx} processes; "
          f"final checkpoint {ckpt}", flush=True)


if __name__ == "__main__":
    main()
