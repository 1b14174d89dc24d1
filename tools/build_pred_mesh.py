#!/usr/bin/env python
"""Export predicted STL meshes from dumped prediction JSONs
(port of `misc/build_pred_mesh.py`: dequantize then mesh)."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from plankassembly_tpu.io.mesh import build_mesh, export_stl
from plankassembly_tpu.tokens import dequantize_values


def main(args):
    filenames = os.listdir(os.path.join(args.exp_path, "pred_jsons"))
    count = 0
    for filename in filenames:
        if not filename.endswith(".json"):
            continue
        with open(os.path.join(args.exp_path, "pred_jsons", filename)) as f:
            infos = json.load(f)
        coords = dequantize_values(np.array(infos["prediction"]))
        verts, faces = build_mesh(coords)
        export_stl(os.path.join(args.exp_path, "pred_meshes",
                                filename.replace(".json", ".stl")),
                   verts, faces)
        count += 1
    print(f"exported {count} predicted meshes")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp_path", type=str,
                        default="lightning_logs/version_X")
    args = parser.parse_args()
    os.makedirs(os.path.join(args.exp_path, "pred_meshes"), exist_ok=True)
    main(args)
