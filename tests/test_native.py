"""Native (C++) geometry core vs pure-numpy reference parity + speed."""
import time

import numpy as np
import pytest

from plankassembly_tpu.factory import native
from plankassembly_tpu.factory.projection import (
    project_boxes, remove_overlapping_lines,
)
from plankassembly_tpu.factory.synthetic import generate_cabinet

needs_native = pytest.mark.skipif(
    not native.available(),
    reason="native lib not built (python tools/build_native.py)")


def _canon(lines, types):
    rows = []
    for l, t in zip(lines, types):
        l = np.asarray(l).reshape(4)
        a, b = sorted([tuple(l[:2]), tuple(l[2:])])
        rows.append((*np.round(a, 9), *np.round(b, 9), int(t)))
    return sorted(rows)


@needs_native
def test_project_native_matches_numpy():
    for seed in range(8):
        planks, _ = generate_cabinet(seed)
        boxes = planks[1:] / 1280.0
        for view in ("f", "t", "s"):
            ln, tn = project_boxes(boxes, view, use_native=True)
            lp, tp_ = project_boxes(boxes, view, use_native=False)
            assert _canon(ln, tn) == _canon(lp, tp_), (seed, view)


@needs_native
def test_dedupe_native_matches_numpy():
    for seed in range(8):
        planks, _ = generate_cabinet(seed)
        boxes = planks[1:] / 1280.0
        lines, types = project_boxes(boxes, "f", use_native=False)
        kn = remove_overlapping_lines(lines, types, use_native=True)
        kp = remove_overlapping_lines(lines, types, use_native=False)
        assert _canon(*kn) == _canon(*kp), seed


@needs_native
def test_native_is_faster():
    planks, _ = generate_cabinet(1, max_planks=20)
    boxes = planks[1:] / 1280.0

    def run(use_native, iters=5):
        t0 = time.perf_counter()
        for _ in range(iters):
            for view in ("f", "t", "s"):
                project_boxes(boxes, view, use_native=use_native)
        return (time.perf_counter() - t0) / iters

    t_native = run(True)
    t_numpy = run(False)
    assert t_native < t_numpy, (t_native, t_numpy)


@needs_native
def test_rasterize_native_matches_numpy():
    import plankassembly_tpu.data.raster as R
    import plankassembly_tpu.factory.native as nat

    rng = np.random.default_rng(3)
    lines = [rng.uniform(-1, 1, (2, 2)) for _ in range(25)]
    types = [int(rng.random() > 0.5) for _ in range(25)]
    fast = R.rasterize_lines(lines, types, 128)
    orig = nat.available
    nat.available = lambda: False
    try:
        slow = R.rasterize_lines(lines, types, 128)
    finally:
        nat.available = orig
    np.testing.assert_array_equal(fast, slow)
    assert fast.max() == 1.0
