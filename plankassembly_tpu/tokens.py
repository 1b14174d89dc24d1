"""Token contract: coordinate quantization and special tokens.

Numeric contract mirrors the reference implementation
(`/root/reference/plankassembly/datasets/data_utils.py:6-21`,
`/root/reference/configs/train_complete.yaml:38,43,52-54`):

- Coordinates live in [-1, 1] and quantize to ``2**num_bits`` integer bins
  (num_bits=9 -> values in [0, 511]).
- ``END = 2**num_bits`` (512) terminates a sequence.
- ``PAD = END + 1`` (513) fills to the static max length; ignored by the loss.
- ``VOCAB_SIZE = 2**num_bits + 2`` (514).
- Output labels >= VOCAB_SIZE are *attachment pointers*: label
  ``VOCAB_SIZE + j`` means "copy output token j".
"""
from __future__ import annotations

import numpy as np

NUM_BITS = 9
NUM_BINS = 2**NUM_BITS  # 512 coordinate bins
END = NUM_BINS  # 512
PAD = NUM_BINS + 1  # 513
VOCAB_SIZE = NUM_BINS + 2  # 514


def quantize_values(verts: np.ndarray, n_bits: int = NUM_BITS) -> np.ndarray:
    """Map continuous coords in [-1, 1] to integers in [0, 2**n_bits - 1].

    Matches reference `datasets/data_utils.py:6-12` (including its
    truncation-toward-zero via int cast rather than rounding).
    """
    min_range, max_range = -1.0, 1.0
    range_quantize = 2**n_bits - 1
    verts = np.asarray(verts, dtype=np.float64)
    quantized = (verts - min_range) * range_quantize / (max_range - min_range)
    return quantized.astype(np.int64)


def dequantize_values(quantized: np.ndarray, n_bits: int = NUM_BITS) -> np.ndarray:
    """Map integers in [0, 2**n_bits - 1] back to continuous [-1, 1].

    Matches reference `datasets/data_utils.py:15-21`.
    """
    min_range, max_range = -1.0, 1.0
    range_quantize = 2**n_bits - 1
    quantized = np.asarray(quantized, dtype=np.float64)
    verts = quantized * (max_range - min_range) / range_quantize + min_range
    return verts.astype(np.float64)
