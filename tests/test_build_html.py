"""Smoke test for the HTML gallery tool (`tools/build_html.py`, port of
`misc/build_html.py`): a 2-sample gallery must parse as HTML and reference
the pred/GT GLB viewers it wrote."""
import html.parser
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from plankassembly_tpu.factory.synthetic import generate_cabinet


@pytest.fixture()
def exp_layout(tmp_path):
    """Minimal data_path (splits/test.txt) + exp_path (metrics.json,
    pred_jsons/) the tool consumes."""
    data_path = tmp_path / "data"
    exp_path = tmp_path / "exp"
    os.makedirs(data_path / "splits")
    os.makedirs(exp_path / "pred_jsons")

    names = ["g000", "g001"]
    with open(data_path / "splits" / "test.txt", "w") as f:
        f.write("".join(f"{n}.json\n" for n in names))

    metrics = {}
    for i, name in enumerate(names):
        planks, _ = generate_cabinet(i, max_planks=4)
        quant = np.clip((planks / 1280.0 + 1.0) / 2.0 * 511, 0,
                        511).astype(int)
        with open(exp_path / "pred_jsons" / f"{name}.json", "w") as f:
            json.dump({"prediction": quant.tolist(),
                       "groundtruth": quant.tolist(),
                       "precision": 1.0, "recall": 1.0, "fmeasure": 1.0}, f)
        metrics[name] = {"precision": 1.0, "recall": 1.0, "fmeasure": 1.0}
    with open(exp_path / "metrics.json", "w") as f:
        json.dump(metrics, f)
    return data_path, exp_path, names


class _GalleryParser(html.parser.HTMLParser):
    def __init__(self):
        super().__init__()
        self.model_srcs = []
        self.errors = []

    def handle_starttag(self, tag, attrs):
        if tag == "model-viewer":
            self.model_srcs.append(dict(attrs).get("src"))


def test_build_html_gallery(exp_layout):
    data_path, exp_path, names = exp_layout
    result = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "tools",
                      "build_html.py"),
         "--data_path", str(data_path), "--exp_path", str(exp_path)],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert result.returncode == 0, result.stderr

    index = exp_path / "index.html"
    assert index.exists()
    text = index.read_text()
    parser = _GalleryParser()
    parser.feed(text)  # raises nothing on well-formed HTML

    # every sample contributes a pred + GT viewer, and the GLBs exist
    assert sorted(parser.model_srcs) == sorted(
        [f"pred_mesh/{n}.glb" for n in names]
        + [f"gt_mesh/{n}.glb" for n in names])
    for n in names:
        for folder in ("pred_mesh", "gt_mesh"):
            glb = exp_path / folder / f"{n}.glb"
            assert glb.exists() and glb.stat().st_size > 0
    for n in names:
        assert f"svgs/{n}_f.svg" in text  # input SVG cells referenced
