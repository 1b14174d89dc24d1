"""Host-side batching + double-buffered device prefetch.

Replaces the reference's torch DataLoader with worker processes
(`trainer_complete.py:39-42`) with a TPU-idiomatic pipeline: numpy collation
on host, `jax.device_put` with an explicit `NamedSharding` for the batch
axis, and a one-deep prefetch queue so host packing overlaps device compute.
"""
from __future__ import annotations

import os
import queue
import threading

import numpy as np

import jax


def parse_splits_list(splits) -> list[str]:
    """Expand .txt split files into a list of info-JSON names
    (`dataset/data_utils.py:28-46`)."""
    if isinstance(splits, str):
        splits = splits.split()
    info_files: list[str] = []
    for split in splits:
        ext = os.path.splitext(split)[1]
        if ext == ".json":
            info_files.append(split)
        elif ext == ".txt":
            with open(split) as f:
                info_files += [line.rstrip() for line in f]
        else:
            raise NotImplementedError(f"{split} not a valid info_file type")
    return info_files


def collate(samples: list[dict]) -> dict:
    """Stack a list of per-sample dicts into a batch dict.

    Array fields stack along a new leading axis; 'name' stays a list.
    """
    batch: dict = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            batch[key] = np.stack(vals)
        else:
            batch[key] = vals
    return batch


class DataLoader:
    """Minimal batched loader: shuffling, drop_last, optional device prefetch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 sharding=None, prefetch: bool = True, order=None,
                 num_workers: int = 0, pad_to_batch: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.sharding = sharding
        self.prefetch = prefetch
        # pad_to_batch: short final batches are padded by repeating row 0 so
        # jit shapes stay static; a 'sample_valid' bool field marks real rows.
        self.pad_to_batch = pad_to_batch
        # Multi-host: every process iterates the same global batch order
        # (identical seed), but loads/collates only the rows whose shards it
        # owns under `sharding`, then assembles the global array via
        # jax.make_array_from_process_local_data (parallel/multihost.py).
        if sharding is not None and jax.process_count() > 1:
            from plankassembly_tpu.parallel import multihost
            self.local_rows = multihost.owned_row_range(sharding, batch_size)
        else:
            self.local_rows = (0, batch_size)
        # fixed iteration order (e.g. length-sorted eval batching so batched
        # early-exit decoding isn't gated by one long program per batch)
        self.order = None if order is None else np.asarray(order)
        # NUM_WORKERS (reference `configs/train_complete.yaml:31`): threaded
        # sample packing. Threads — not processes — because the hot parts of
        # __getitem__ release the GIL (file IO, numpy, the ctypes C++
        # rasterizer), and a single JAX process must own the TPU client.
        self.num_workers = int(num_workers)
        self._pool = None

    def _get_samples(self, idx) -> list[dict]:
        if self.num_workers > 1:
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor
                self._pool = ThreadPoolExecutor(
                    max_workers=self.num_workers,
                    thread_name_prefix="loader-worker")
            return list(self._pool.map(self.dataset.__getitem__,
                                       [int(i) for i in idx]))
        return [self.dataset[int(i)] for i in idx]

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self):
        if self.order is not None:
            order = self.order
        else:
            order = np.arange(len(self.dataset))
        if self.shuffle:
            order = order.copy()
            self.rng.shuffle(order)
        lo, hi = self.local_rows
        for start in range(0, len(order), self.batch_size):
            idx = order[start:start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            valid = None
            if self.pad_to_batch and len(idx) < self.batch_size:
                valid = np.zeros(self.batch_size, dtype=bool)
                valid[: len(idx)] = True
                idx = np.concatenate(
                    [idx, np.repeat(idx[:1], self.batch_size - len(idx))])
            elif self.pad_to_batch:
                valid = np.ones(self.batch_size, dtype=bool)
            # load only this process's rows (full range on single host)
            local_hi = min(hi, len(idx))
            batch = collate(self._get_samples(idx[lo:local_hi]))
            if valid is not None:
                batch["sample_valid"] = valid[lo:local_hi]
                batch["_local_valid"] = valid[lo:local_hi]
            batch["_rows"] = (lo, local_hi)
            yield batch

    # Token streams whose values are bounded by the vocab contract
    # (VOCAB_SIZE + MAX_OUTPUT_LENGTH = 642 < 2^15): ship them as int16.
    # Host->device bytes are the loader's cost model on this container —
    # the remote-TPU transfer path leaks its staging buffer (~1x the
    # device bytes per put, see CLAUDE.md), and halving the transfer also
    # halves PCIe/tunnel time on any host. On device int16 gathers/compares
    # are free.
    _INT16_KEYS = frozenset((
        "input_value", "input_pos", "input_coord", "input_view", "input_type",
        "output_value", "output_label",
    ))

    def _narrow(self, key: str, value: np.ndarray) -> np.ndarray:
        if key in self._INT16_KEYS and value.dtype in (np.int64, np.int32):
            return value.astype(np.int16)
        if value.dtype == np.int64:  # x64 is disabled; don't ship dead bytes
            return value.astype(np.int32)
        return value

    def _put(self, batch: dict) -> dict:
        if self.sharding is None:
            return batch
        multiproc = jax.process_count() > 1
        if multiproc:
            from plankassembly_tpu.parallel.multihost import make_global
        out = {}
        for key, value in batch.items():
            if isinstance(value, np.ndarray) and not key.startswith("_"):
                value = self._narrow(key, value)
                if multiproc:
                    out[key] = make_global(self.sharding, value,
                                           self.batch_size)
                else:
                    out[key] = jax.device_put(value, self.sharding)
            else:
                out[key] = value
        return out

    def __iter__(self):
        if not self.prefetch:
            for batch in self._batches():
                yield self._put(batch)
            return

        # One-deep producer thread: packs + transfers the next batch while
        # the consumer computes on the current one. Producer exceptions are
        # captured and re-raised in the consumer (never swallowed).
        q: queue.Queue = queue.Queue(maxsize=2)
        sentinel = object()

        def producer():
            try:
                for batch in self._batches():
                    q.put(self._put(batch))
                q.put(sentinel)
            except BaseException as exc:  # noqa: BLE001
                q.put(exc)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                thread.join()
                raise item
            yield item
        thread.join()


def pad_batch_to(batch: dict, batch_size: int) -> tuple[dict, np.ndarray]:
    """Pad a short final batch up to `batch_size` by repeating row 0.

    Returns (padded_batch, valid_mask). Keeps shapes static for jit while the
    valid mask lets metric code ignore the filler rows.
    """
    some = next(v for v in batch.values() if isinstance(v, np.ndarray))
    n = some.shape[0]
    valid = np.zeros(batch_size, dtype=bool)
    valid[:n] = True
    if n == batch_size:
        return batch, valid
    out = {}
    for key, value in batch.items():
        if isinstance(value, np.ndarray):
            reps = np.concatenate(
                [value, np.repeat(value[:1], batch_size - n, axis=0)])
            out[key] = reps
        else:
            out[key] = value
    return out, valid
