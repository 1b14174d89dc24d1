"""Device-resident training data: the packed split lives in HBM, batches
assemble on device from an index vector.

The token datasets are small by accelerator standards (26k samples x ~13 KB
packed = ~350 MB as int16), so the TPU-native layout is to park the WHOLE
split in HBM once and make each training step's host->device traffic ONE
flat int16 buffer

    [idx (B,) int32 as int16 pairs | aug positions (K,) | K freshly-
     augmented rows (K = max_aug_rows, ~AUG_RATIO*B in expectation)]

instead of re-shipping ~1 MB of packed tokens every step (and instead of
~11 separate small puts, each paying a transport round trip). That removes the
host from the steady-state loop (no JSON, no packing, no big transfers —
also sidestepping this container's remote-TPU transfer leak, CLAUDE.md) and
makes epochs device-bound.

Augmentation semantics match the map-style path: each (step, row) draws
Bernoulli(AUG_RATIO); chosen rows are packed fresh with noise on the host
and scattered over the gathered batch on device. At most `max_aug_rows`
rows per batch augment (P(Binomial(64, 0.1) > 16) ~ 1e-7 — overflow rows
stay clean; documented in DEVIATIONS.md).

Training-loop only (shuffle + drop_last); eval keeps the standard
`DataLoader` (padding/valid-mask contract, and eval is a sliver of time).
Single-process only — multi-host falls back to the standard loader.
"""
from __future__ import annotations

import math
import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from plankassembly_tpu.data.loader import DataLoader


def _narrow(key: str, value: np.ndarray) -> np.ndarray:
    if key in DataLoader._INT16_KEYS and value.dtype in (np.int64, np.int32):
        return value.astype(np.int16)
    if value.dtype == np.int64:
        return value.astype(np.int32)
    return value


def _field_i16_elems(shape: tuple, dtype: str) -> int:
    """int16 elements one aug row of this field occupies in the flat buffer
    (bool widens to 1 int16; wider dtypes split into itemsize/2 int16s)."""
    n = math.prod(shape)
    itemsize = np.dtype(dtype).itemsize
    return n if itemsize == 1 else n * (itemsize // 2)


def unpack_flat(buf, layout, batch_size: int, max_aug_rows: int):
    """Invert the producer's single-buffer packing (jit-safe, static slices).

    Buffer layout (int16): [idx as int16 pairs (2B)] [pos (K)] [per-field aug
    rows, row-major]. Returns (idx int32 (B,), pos int32 (K,), aug dict with
    each field restored to its resident-store dtype/shape).
    """
    B, K = batch_size, max_aug_rows
    idx = lax.bitcast_convert_type(buf[: 2 * B].reshape(B, 2), jnp.int32)
    pos = buf[2 * B: 2 * B + K].astype(jnp.int32)
    off = 2 * B + K
    aug = {}
    for key, shape, dtype in layout:
        n = _field_i16_elems(shape, dtype)
        seg = buf[off: off + n * K]
        off += n * K
        itemsize = np.dtype(dtype).itemsize
        if itemsize == 1:
            aug[key] = seg.reshape((K, *shape)).astype(jnp.dtype(dtype))
        elif itemsize == 2:
            aug[key] = lax.bitcast_convert_type(
                seg.reshape((K, *shape)), jnp.dtype(dtype))
        else:
            pairs = seg.reshape((K, *shape, itemsize // 2))
            aug[key] = lax.bitcast_convert_type(pairs, jnp.dtype(dtype))
    return idx, pos, aug


@partial(jax.jit, static_argnames=("sharding",), donate_argnums=())
def _assemble(fields, idx, aug_fields, aug_pos, sharding=None):
    """Gather rows `idx` from the resident split, then scatter the augmented
    replacement rows at positions `aug_pos` (== batch_size slots drop)."""
    out = {}
    for key, store in fields.items():
        b = store[idx]
        b = b.at[aug_pos].set(aug_fields[key], mode="drop")
        if sharding is not None:
            b = jax.lax.with_sharding_constraint(b, sharding)
        out[key] = b
    return out


class DeviceDataLoader:
    """Iterable of device-assembled training batches.

    dataset: a map-style dataset with `_pack(i, augment=True) -> (name,
    arrays)` (LineDataset/RasterDataset/SidefaceDataset), used ONLY for
    augmented rows; the clean rows come from `cache` (PackedSampleCache).
    """

    def __init__(self, dataset, cache, batch_size: int, seed: int = 0,
                 sharding=None, max_aug_rows: int = 16):
        self.dataset = dataset
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.sharding = sharding
        self.max_aug_rows = max_aug_rows
        self.names = [os.path.splitext(f)[0].split("/")[-1]
                      for f in dataset.info_files]
        # one replicated transfer of the whole split
        self.fields = {}
        for key, arr in cache.fields.items():
            host = _narrow(key, np.asarray(arr))
            self.fields[key] = jax.device_put(host)
        self.aug_ratio = (dataset.cfg.DATA.AUG_RATIO
                          if dataset.augmentation else 0.0)
        # static flat-buffer layout: ONE int16 host->device transfer per
        # step instead of ~11 small ones (idx + pos + 9 aug fields) — on the
        # tunnel transport each small put pays a round trip (CLAUDE.md open
        # thread); hashable so it can be a jit static arg
        self.layout = tuple(
            (key, tuple(store.shape[1:]), str(store.dtype))
            for key, store in self.fields.items())
        self._buf_elems = 2 * batch_size + max_aug_rows + max_aug_rows * sum(
            _field_i16_elems(shape, dtype) for _, shape, dtype in self.layout)

    def __len__(self) -> int:
        return len(self.names) // self.batch_size  # drop_last

    def _aug_rows(self, idx: np.ndarray):
        """Pick and host-pack this batch's augmented rows; pad to a static
        max_aug_rows (position == batch_size means 'unused, drop')."""
        K = self.max_aug_rows
        pos = np.full((K,), self.batch_size, np.int32)
        packed: list[dict] = []
        if self.aug_ratio > 0.0:
            draw = self.rng.random(len(idx)) < self.aug_ratio
            for j in np.flatnonzero(draw)[:K]:
                _, arrays = self.dataset._pack(int(idx[j]), augment=True)
                pos[len(packed)] = j
                packed.append(arrays)
        aug = {}
        for key, store in self.fields.items():
            rows = np.zeros((K, *store.shape[1:]), dtype=store.dtype)
            for r, arrays in enumerate(packed):
                rows[r] = arrays[key]
            aug[key] = rows
        return aug, pos

    def _flat(self, idx: np.ndarray, aug: dict, pos: np.ndarray) -> np.ndarray:
        """Pack idx + pos + aug rows into one contiguous int16 buffer
        (inverse of `unpack_flat`)."""
        buf = np.empty((self._buf_elems,), np.int16)
        B, K = self.batch_size, self.max_aug_rows
        buf[: 2 * B] = idx.astype(np.int32).view(np.int16)
        buf[2 * B: 2 * B + K] = pos.astype(np.int16)  # pos <= batch_size
        off = 2 * B + K
        for key, shape, dtype in self.layout:
            n = _field_i16_elems(shape, dtype) * K
            rows = aug[key]
            if rows.dtype.itemsize == 1:
                seg = rows.astype(np.int16).ravel()
            else:
                seg = np.ascontiguousarray(rows).view(np.int16).ravel()
            buf[off: off + n] = seg
            off += n
        return buf

    def __iter__(self):
        # one-deep producer thread: the host side (aug-row JSON+packing)
        # overlaps device compute, as in DataLoader's prefetch. A stop event
        # (checked around the bounded q.put) unblocks the producer when the
        # consumer abandons iteration early — e.g. a train-step exception —
        # instead of leaking a thread parked on a full queue (advisor
        # finding r2).
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=2)
        sentinel = object()
        stop = threading.Event()

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                order = self.rng.permutation(len(self.names))
                for start in range(0, len(order), self.batch_size):
                    if stop.is_set():
                        return
                    idx = order[start:start + self.batch_size]
                    if len(idx) < self.batch_size:
                        break  # drop_last
                    aug, pos = self._aug_rows(idx)
                    if not _put((idx, self._flat(idx, aug, pos))):
                        return
                _put(sentinel)
            except BaseException as exc:  # noqa: BLE001
                _put(exc)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                idx, buf = item
                yield {
                    "_buf": jnp.asarray(buf),
                    "name": [self.names[i] for i in idx],
                }
        finally:
            stop.set()
            thread.join()

    def materialize(self, batch: dict) -> dict:
        """Assemble a yielded raw batch into device arrays (tests / non-fused
        consumers; the training loop fuses unpack+assembly into its step
        instead — `train.state.make_packed_device_train_step`)."""
        idx, pos, aug = unpack_flat(batch["_buf"], self.layout,
                                    self.batch_size, self.max_aug_rows)
        out = _assemble(self.fields, idx, aug, pos, sharding=self.sharding)
        out["name"] = batch["name"]
        return out
