"""Unit tests for static-shape sequence packing against hand-computed
expectations (reference semantics: `plankassembly/datasets/line_data.py`)."""
import dataclasses

import numpy as np

from plankassembly_tpu.config import Config
from plankassembly_tpu.data.packing import pack_input_sequence, pack_output_sequence
from plankassembly_tpu.tokens import quantize_values


def small_cfg():
    cfg = Config()
    return dataclasses.replace(
        cfg, DATA=dataclasses.replace(cfg.DATA, MAX_INPUT_LENGTH=40,
                                      MAX_OUTPUT_LENGTH=32))


def test_input_packing_basic():
    cfg = small_cfg()
    # two lines in view 1, one in view 0 — expect sort by (view, xmin, ...)
    lines = np.array([
        [0.5, 0.5, 0.9, 0.9],   # view 1, xmin large
        [-1.0, -1.0, 1.0, 1.0],  # view 0
        [0.1, 0.1, 0.2, 0.2],   # view 1, xmin small
    ])
    views = np.array([1, 0, 1])
    types = np.array([1, 0, 1])

    out = pack_input_sequence(lines, views, types, cfg.DATA, cfg.TOKEN)

    q = quantize_values(lines)
    expected_order = [1, 2, 0]  # view 0 first, then view 1 by xmin
    expected_values = q[expected_order].flatten().tolist() + [cfg.TOKEN.END]
    got = out["input_value"][: len(expected_values)].tolist()
    assert got == expected_values

    # per-view positions restart at 0 (line_data.py:49-50), repeated x4
    assert out["input_pos"][:12].tolist() == [0] * 4 + [0] * 4 + [1] * 4
    assert out["input_view"][:12].tolist() == [0] * 4 + [1] * 8
    assert out["input_type"][:12].tolist() == [0] * 4 + [1] * 8
    assert out["input_coord"][:12].tolist() == [0, 1, 2, 3] * 3

    # static length quirk: MAX_INPUT_LENGTH - 1 (line_data.py:67)
    assert out["input_value"].shape == (39,)
    assert out["input_value"][13] == cfg.TOKEN.PAD
    assert not out["input_mask"][12] and out["input_mask"][13]


def test_input_packing_empty():
    cfg = small_cfg()
    out = pack_input_sequence(np.zeros((0, 4)), np.zeros(0, int), None,
                              cfg.DATA, cfg.TOKEN, with_type=False)
    assert out["input_value"].shape == (39,)
    assert out["input_value"][0] == cfg.TOKEN.END
    assert (out["input_value"][1:] == cfg.TOKEN.PAD).all()
    assert not out["input_mask"][0] and out["input_mask"][1:].all()
    assert "input_type" not in out


def test_output_packing_pointer_labels():
    cfg = small_cfg()
    planks = np.linspace(-1, 1, 12)  # bbox row + one plank
    attach = np.array([-1, -1, -1, -1, -1, -1,  # bbox never attaches
                       0, -1, -1, 3, -1, -1])   # coords 6 and 9 attach

    out = pack_output_sequence(planks, attach, cfg.DATA, cfg.TOKEN)
    value = out["output_value"]
    label = out["output_label"]

    q = quantize_values(planks)
    assert value[:12].tolist() == q.tolist()
    assert value[12] == cfg.TOKEN.END
    assert (value[13:] == cfg.TOKEN.PAD).all()

    # attached coords get pointer ids offset by VOCAB_SIZE (line_data.py:98-101)
    assert label[6] == cfg.DATA.VOCAB_SIZE + 0
    assert label[9] == cfg.DATA.VOCAB_SIZE + 3
    # unattached coords keep their token value; END/PADs flow through
    assert label[0] == q[0] and label[7] == q[7]
    assert label[12] == cfg.TOKEN.END
    assert (label[13:] == cfg.TOKEN.PAD).all()
    assert out["output_mask"][13:].all() and not out["output_mask"][:13].any()
