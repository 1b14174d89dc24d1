import numpy as np

from plankassembly_tpu.tokens import (
    END, PAD, VOCAB_SIZE, dequantize_values, quantize_values,
)


def test_constants():
    assert VOCAB_SIZE == 514 and END == 512 and PAD == 513


def test_quantize_known_values():
    # [-1, 1] -> [0, 511] (reference datasets/data_utils.py:6-12)
    vals = np.array([-1.0, 0.0, 1.0])
    q = quantize_values(vals)
    assert q.tolist() == [0, 255, 511]  # 0.0 -> 255.5 truncates to 255
    assert q.dtype == np.int64


def test_dequantize_endpoints():
    d = dequantize_values(np.array([0, 511]))
    np.testing.assert_allclose(d, [-1.0, 1.0])


def test_round_trip_within_one_bin():
    rng = np.random.default_rng(0)
    vals = rng.uniform(-1, 1, 1000)
    rt = dequantize_values(quantize_values(vals))
    assert np.max(np.abs(rt - vals)) <= 2.0 / 511 + 1e-12


def test_quantized_ints_round_trip_exactly():
    # int -> float -> int must be the identity (evaluate.py depends on it)
    q = np.arange(512)
    assert np.array_equal(quantize_values(dequantize_values(q)), q)
