"""Data factory tests: HLR projection correctness + synthetic generation."""
import numpy as np

from plankassembly_tpu.factory.projection import (
    postprocess_complete, postprocess_visible, project_boxes,
)
from plankassembly_tpu.factory.synthetic import generate_cabinet, validate_program


def test_single_box_projection_all_visible():
    box = np.array([[-0.4, -0.3, -0.2, 0.4, 0.3, 0.2]])
    for view in ("f", "t", "s"):
        lines, types = project_boxes(box, view)
        lines, types = postprocess_complete(lines, types)
        assert sum(types) == 0, f"single box should have no hidden lines ({view})"
        # outline must form the 4 sides of the silhouette rectangle
        pts = np.concatenate([np.asarray(l).reshape(-1, 2) for l in lines])
        if view == "f":  # (x, -z)
            np.testing.assert_allclose(pts[:, 0].min(), -0.4)
            np.testing.assert_allclose(pts[:, 1].max(), 0.2)


def test_box_behind_box_is_hidden():
    # small box strictly behind a big box in the front view (depth=y, near=min)
    big = [-0.5, -0.1, -0.5, 0.5, 0.0, 0.5]
    small = [-0.2, 0.3, -0.2, 0.2, 0.4, 0.2]  # larger y = farther
    lines, types = project_boxes(np.array([big, small]), "f")
    lines, types = postprocess_complete(lines, types)
    # all 4 sides of the small box's silhouette must be hidden
    hidden = [l for l, t in zip(lines, types) if t == 1]
    visible = [l for l, t in zip(lines, types) if t == 0]
    assert len(hidden) == 4
    for l in hidden:
        pts = np.asarray(l)
        assert (np.abs(pts) <= 0.2 + 1e-9).all()
    # the big box outline is fully visible
    assert len(visible) == 4


def test_partial_occlusion_splits_lines():
    # occluder covers only the middle of the far box's top edge
    far = [-0.5, 0.5, 0.0, 0.5, 0.6, 0.1]      # y large = far
    near = [-0.2, -0.5, -0.3, 0.2, -0.4, 0.4]  # y small = near, overlaps middle
    lines, types = project_boxes(np.array([far, near]), "f")
    lines, types = postprocess_complete(lines, types)
    # far box's top edge (v = -0.0 .. actually z=0.1 -> v=-0.1) must split
    # into visible outer parts + hidden middle
    segs_on_top = [(np.asarray(l), t) for l, t in zip(lines, types)
                   if np.allclose(np.asarray(l)[:, 1], -0.1)]
    assert len(segs_on_top) >= 3
    ts = sorted(t for _, t in segs_on_top)
    assert 1 in ts and 0 in ts


def test_visible_postprocess_merges_chains():
    box = np.array([[-0.4, -0.3, -0.2, 0.4, 0.3, 0.2],
                    [-0.4, 0.3, -0.2, 0.4, 0.35, 0.2]])  # stacked on top
    lines, types = project_boxes(box, "f")
    vis_lines, vis_types = postprocess_visible(lines, types)
    assert all(t == 0 for t in vis_types)
    # shared edge at the stack interface remains a single segment
    keys = set()
    for l in vis_lines:
        l = np.asarray(l)
        key = tuple(np.round(np.sort(l, axis=0).flatten(), 6))
        assert key not in keys, "duplicate line after dedupe"
        keys.add(key)


def test_synthetic_programs_are_valid():
    for seed in range(30):
        planks, attach = generate_cabinet(seed)
        validate_program(planks, attach)
        assert 5 <= len(planks) <= 21


def test_synthetic_attachments_exist():
    planks, attach = generate_cabinet(0)
    assert (attach >= 0).sum() >= 10  # cabinets are attachment-rich


def test_factory_to_dataset_roundtrip(tmp_path):
    """models -> svgs -> infos -> packed batch, full pipeline."""
    import json
    import os
    from plankassembly_tpu.config import Config
    from plankassembly_tpu.data import LineDataset
    from plankassembly_tpu.factory.projection import VIEWS
    from plankassembly_tpu.io.svg import parse_svg, render_svg
    from plankassembly_tpu.data import geometry as geo

    planks, attach = generate_cabinet(3)
    boxes = planks[1:] / 1280.0
    os.makedirs(tmp_path / "infos")

    svgs, views, types_all = [], [], []
    for v_i, view in enumerate(VIEWS):
        lines, types = project_boxes(boxes, view)
        lines, types = postprocess_complete(lines, types)
        path = str(tmp_path / f"m_{view}.svg")
        render_svg(path, lines, types)
        plines, ptypes = parse_svg(path)
        svgs.extend(geo.to_geojson(l) for l in plines)
        types_all.extend(ptypes)
        views.extend([v_i] * len(plines))

    info = {
        "name": "m",
        "lines": [geo.bounds(geo.from_geojson(s)).tolist() for s in svgs],
        "views": views, "types": types_all, "svgs": svgs,
        "coords": np.round(planks / 1280.0, 3).tolist(),
        "attach": attach.tolist(),
    }
    with open(tmp_path / "infos" / "m.json", "w") as f:
        json.dump(info, f)

    cfg = Config()
    ds = LineDataset(str(tmp_path / "infos"), ["m.json"], cfg)
    sample = ds[0]
    assert sample["input_value"].shape == (1199,)
    n_ptr = int((sample["output_label"] >= cfg.DATA.VOCAB_SIZE).sum())
    assert n_ptr == int((attach >= 0).sum())


def test_noisy_render_deterministic_per_index(tmp_path):
    """Per-sample seeding makes noisy test sets reproducible
    (`render_noisy_svg.py:106`: np.random.seed(index))."""
    import json
    import os
    import subprocess
    import sys

    root = tmp_path / "data"
    os.makedirs(root / "model")
    os.makedirs(root / "splits")
    planks, attach = generate_cabinet(1)
    with open(root / "model" / "m.json", "w") as f:
        json.dump({"planks": planks.tolist(), "attach": attach.tolist()}, f)
    with open(root / "splits" / "test.txt", "w") as f:
        f.write("m.json\n")

    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "render_svgs.py")
    def run():
        subprocess.run([sys.executable, tool, "--root", str(root),
                        "--data_type", "noise_10"], check=True,
                       capture_output=True)
        with open(root / "data" / "noise_10" / "svgs" / "m_f.svg") as f:
            return f.read()

    first = run()
    second = run()
    assert first == second
    assert 'stroke="red"' in first or 'stroke="blue"' in first
