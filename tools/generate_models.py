#!/usr/bin/env python
"""Generate a synthetic cabinet dataset: shape-program model JSONs + splits.

Stands in for the reference's proprietary 26k-cabinet source data; emits the
same `data/model/{name}.json` contract ({"planks", "attach"}) consumed by the
render tools (`dataset/render_complete_svg.py:27-30`).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from plankassembly_tpu.factory.synthetic import generate_cabinet, validate_program


def main(args):
    os.makedirs(os.path.join(args.root, "model"), exist_ok=True)
    os.makedirs(os.path.join(args.root, "splits"), exist_ok=True)

    names = []
    for i in range(args.count):
        planks, attach = generate_cabinet(seed=args.seed + i)
        validate_program(planks, attach)
        name = f"syn{args.seed + i:06d}"
        with open(os.path.join(args.root, "model", f"{name}.json"), "w") as f:
            json.dump({"planks": planks.tolist(),
                       "attach": attach.tolist()}, f)
        names.append(name)

    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(names))
    n_test = max(1, int(len(names) * args.test_frac))
    n_valid = max(1, int(len(names) * args.valid_frac))
    test = [names[i] for i in order[:n_test]]
    valid = [names[i] for i in order[n_test:n_test + n_valid]]
    train = [names[i] for i in order[n_test + n_valid:]]

    for split, items in (("train", train), ("valid", valid), ("test", test),
                         ("train_sideface", train)):
        with open(os.path.join(args.root, "splits", f"{split}.txt"), "w") as f:
            f.write("".join(f"{n}.json\n" for n in items))
    print(f"wrote {len(names)} models: {len(train)} train / "
          f"{len(valid)} valid / {len(test)} test")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="data", help="dataset root")
    parser.add_argument("--count", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--test_frac", type=float, default=0.1)
    parser.add_argument("--valid_frac", type=float, default=0.1)
    main(parser.parse_args())
