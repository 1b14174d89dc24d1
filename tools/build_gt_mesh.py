#!/usr/bin/env python
"""Export ground-truth STL meshes for the test split
(port of `misc/build_gt_mesh.py`)."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from plankassembly_tpu.io.mesh import build_mesh, export_stl


def main(args):
    with open(os.path.join(args.data_path, "splits", "test.txt")) as f:
        names = [line.rstrip().split(".")[0] for line in f]

    for name in names:
        with open(os.path.join(args.data_path, "data/complete", "infos",
                               f"{name}.json")) as f:
            infos = json.load(f)
        verts, faces = build_mesh(infos["coords"])
        export_stl(os.path.join(args.data_path, "mesh", f"{name}.stl"),
                   verts, faces)
    print(f"exported {len(names)} GT meshes")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", type=str, default="data")
    args = parser.parse_args()
    os.makedirs(os.path.join(args.data_path, "mesh"), exist_ok=True)
    main(args)
