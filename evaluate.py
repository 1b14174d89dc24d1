#!/usr/bin/env python
"""Offline metric recomputation from dumped prediction JSONs.

Bit-parity port of the reference `evaluate.py:15-75`: dequantize predictions,
Hungarian-match against the continuous GT coords from the info JSONs
(dropping the bbox row from both), write per-sample `metrics.json`, print
macro-averaged precision/recall/F1 x100.
"""
import argparse
import json
import os

import numpy as np

from plankassembly_tpu.metrics import build_criterion, hungarian_match_host
from plankassembly_tpu.tokens import dequantize_values


def main(args):
    filenames = os.listdir(os.path.join(args.exp_path, "pred_jsons"))

    criterion = build_criterion()
    metrics = {}

    for filename in sorted(filenames):
        if not filename.endswith(".json"):
            continue
        name = filename.split(".")[0]

        with open(os.path.join(args.exp_path, "pred_jsons", filename)) as f:
            pred_data = json.load(f)
        with open(os.path.join(args.data_path, "infos", filename)) as f:
            gt_data = json.load(f)

        pred = np.array(pred_data["prediction"])

        if len(pred) == 0:
            # empty predictions are skipped entirely (`evaluate.py:34-35`)
            continue

        pred = dequantize_values(pred, args.num_bits)
        gt = np.array(gt_data["coords"])
        prec, rec, f1 = hungarian_match_host(pred[1:], gt[1:], args.threshold)

        criterion.update(prec, rec, f1)
        metrics[name] = {"precision": prec, "recall": rec, "fmeasure": f1}

    with open(os.path.join(args.exp_path, "metrics.json"), "w") as f:
        json.dump(metrics, f)

    prec, rec, f1 = criterion.compute()
    print("%10s %0.3f" % ("prec", prec * 100))
    print("%10s %0.3f" % ("rec", rec * 100))
    print("%10s %0.3f" % ("f1", f1 * 100))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", metavar="DIR",
                        default="data/data/complete",
                        help="dataset source root.")
    parser.add_argument("--exp_path", type=str,
                        default="lightning_logs/version_X", help="log path.")
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--num_bits", type=int, default=9)
    main(parser.parse_args())
