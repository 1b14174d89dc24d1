#!/usr/bin/env python
"""Noisy-input robustness sweep: evaluate one checkpoint across the clean and
noise_05/noise_10 test sets (the paper's robustness experiment,
`README.md:88`, `dataset/render_noisy_svg.py:140-145`).

Usage:
    python tools/robustness_sweep.py --config configs/train_complete.yaml \
        --ckpt_path <ckpt dir> --data_root data \
        [--variants complete noise_05 noise_10]

Prints one table row per variant and writes sweep.json next to the ckpt.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(args):
    import dataclasses

    from plankassembly_tpu.config import load_config
    from plankassembly_tpu.train import Trainer

    results = {}
    for variant in args.variants:
        cfg = load_config(args.config)
        root = os.path.join(args.data_root, "data", variant, "infos")
        cfg = dataclasses.replace(cfg, ROOT=root)
        trainer = Trainer(cfg, log_dir=os.path.join(
            os.path.dirname(args.ckpt_path), f"sweep_{variant}"))
        state = trainer.load_checkpoint(args.ckpt_path)
        prec, rec, f1 = trainer.test(state)
        results[variant] = {"precision": prec, "recall": rec, "fmeasure": f1}
        print(f"{variant:>10s}  prec={prec:.4f} rec={rec:.4f} f1={f1:.4f}",
              flush=True)

    out = os.path.join(os.path.dirname(args.ckpt_path), "sweep.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt_path", required=True)
    parser.add_argument("--data_root", default="data")
    parser.add_argument("--variants", nargs="+",
                        default=["complete", "noise_05", "noise_10"])
    main(parser.parse_args())
