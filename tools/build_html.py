#!/usr/bin/env python
"""Sortable HTML gallery: input SVGs + metrics + pred/GT 3D GLB viewers
(port of `misc/build_html.py`, html4vision replaced by a self-contained
page using <model-viewer>)."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from plankassembly_tpu.io.mesh import build_mesh, export_glb

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>PlankAssembly results</title>
<script type="module" src="https://unpkg.com/@google/model-viewer/dist/model-viewer.min.js"></script>
<style>
table {{border-collapse: collapse; font-family: sans-serif;}}
th, td {{border: 1px solid #ccc; padding: 4px 8px; text-align: center;}}
th {{position: sticky; top: 0; background: #eee; cursor: pointer;}}
img, model-viewer {{width: 256px; height: 256px;}}
</style></head><body>
<table id="t"><thead><tr>
<th>ID</th><th>Front</th><th>Top</th><th>Side</th>
<th>Precision</th><th>Recall</th><th>F1</th><th>Predict</th><th>GT</th>
</tr></thead><tbody>
{rows}
</tbody></table>
<script>
document.querySelectorAll('th').forEach((th, i) => th.addEventListener('click', () => {{
  const tb = document.querySelector('tbody');
  Array.from(tb.rows).sort((a, b) => {{
    const x = a.cells[i].innerText, y = b.cells[i].innerText;
    const nx = parseFloat(x), ny = parseFloat(y);
    return isNaN(nx) ? x.localeCompare(y) : nx - ny;
  }}).forEach(r => tb.appendChild(r));
}}));
</script></body></html>
"""

_ROW = """<tr><td>{name}</td>
<td><img src="svgs/{name}_f.svg"></td>
<td><img src="svgs/{name}_t.svg"></td>
<td><img src="svgs/{name}_s.svg"></td>
<td>{prec:.2f}</td><td>{rec:.2f}</td><td>{f1:.2f}</td>
<td><model-viewer src="pred_mesh/{name}.glb" camera-controls></model-viewer></td>
<td><model-viewer src="gt_mesh/{name}.glb" camera-controls></model-viewer></td>
</tr>"""


def main(args):
    with open(os.path.join(args.data_path, "splits", "test.txt")) as f:
        test_names = [line.rstrip().split(".")[0] for line in f]
    np.random.shuffle(test_names)

    with open(os.path.join(args.exp_path, "metrics.json")) as f:
        metrics = json.load(f)

    rows = []
    for name in test_names[:300]:
        pred_json = os.path.join(args.exp_path, "pred_jsons", f"{name}.json")
        if not os.path.exists(pred_json) or name not in metrics:
            continue
        with open(pred_json) as f:
            results = json.load(f)
        for key, folder in (("prediction", "pred_mesh"),
                            ("groundtruth", "gt_mesh")):
            verts, faces = build_mesh(results[key]) if results[key] else \
                (np.zeros((0, 3)), np.zeros((0, 3), np.int64))
            export_glb(os.path.join(args.exp_path, folder, f"{name}.glb"),
                       verts, faces)
        rows.append(_ROW.format(
            name=name,
            prec=round(metrics[name]["precision"], 4) * 100,
            rec=round(metrics[name]["recall"], 4) * 100,
            f1=round(metrics[name]["fmeasure"], 4) * 100))

    with open(os.path.join(args.exp_path, "index.html"), "w") as f:
        f.write(_PAGE.format(rows="\n".join(rows)))
    print(f"wrote gallery with {len(rows)} rows -> index.html")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", metavar="DIR", default="data")
    parser.add_argument("--exp_path", type=str,
                        default="lightning_logs/version_X")
    args = parser.parse_args()
    os.makedirs(os.path.join(args.exp_path, "pred_mesh"), exist_ok=True)
    os.makedirs(os.path.join(args.exp_path, "gt_mesh"), exist_ok=True)
    main(args)
