"""DataLoader: threaded sample packing (NUM_WORKERS) semantics + overlap.

Reference anchor: `trainer_complete.py:39-42` uses 4 dataloader worker
processes; our loader uses threads (GIL-releasing IO/numpy/ctypes hot path)
so one JAX process keeps owning the TPU client.
"""
import time

import numpy as np

from plankassembly_tpu.data.loader import DataLoader


class _ArrayDataset:
    def __init__(self, n=32, delay=0.0):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.delay:
            time.sleep(self.delay)
        return {"x": np.full((3,), i, dtype=np.int64), "name": f"s{i}"}


def _collect(loader):
    return [np.asarray(b["x"]).copy() for b in loader]


def test_workers_preserve_batches():
    ds = _ArrayDataset(32)
    serial = _collect(DataLoader(ds, batch_size=8, num_workers=0,
                                 prefetch=False))
    threaded = _collect(DataLoader(ds, batch_size=8, num_workers=4,
                                   prefetch=False))
    assert len(serial) == len(threaded) == 4
    for a, b in zip(serial, threaded):
        np.testing.assert_array_equal(a, b)


def test_workers_overlap_slow_getitem():
    """4 workers on a sleep-bound __getitem__ must cut wall time ~4x —
    the single-core stand-in for 'packing no longer bounds steps/s'."""
    ds = _ArrayDataset(32, delay=0.02)

    t0 = time.perf_counter()
    _collect(DataLoader(ds, batch_size=8, num_workers=0, prefetch=False))
    serial = time.perf_counter() - t0

    t0 = time.perf_counter()
    _collect(DataLoader(ds, batch_size=8, num_workers=4, prefetch=False))
    threaded = time.perf_counter() - t0

    assert threaded < serial / 2, (serial, threaded)
