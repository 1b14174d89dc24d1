"""Multi-host (DCN) support: process-sharded data, rank-0 IO, global metrics.

The reference's distributed story is single-node DDP (Lightning `strategy:
ddp`, `configs/train_complete.yaml:18-21`) with torchmetrics cross-rank
syncing (`plankassembly/metric.py:13-16`). The TPU-native multi-slice
equivalent (SURVEY.md §5.8): one JAX process per host, a global mesh over
ICI+DCN, `jax.make_array_from_process_local_data` to assemble globally
sharded batches from per-process loader shards, replicated-scalar metric
reductions under jit, and `jax.process_index() == 0` guards on file IO.

Launch recipe (2 processes on one machine, virtual CPU devices — the same
shape works across hosts with a reachable coordinator):

    PLANK_NUM_PROCESSES=2 PLANK_COORDINATOR=host0:29400 \
    PLANK_PROCESS_ID=<0|1> python trainer_complete.py fit --config ...

On Cloud TPU pods, omit the PLANK_* variables and call
`jax.distributed.initialize()` with no arguments (auto-detected); set
PLANK_DISTRIBUTED=1 to request that.
"""
from __future__ import annotations

import os

import numpy as np

import jax

_initialized = False


def initialize_from_env() -> bool:
    """Initialize jax.distributed from PLANK_* env vars. Returns True if a
    multi-process runtime was set up; safe to call more than once."""
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    n = int(os.environ.get("PLANK_NUM_PROCESSES", "1"))
    if os.environ.get("PLANK_DISTRIBUTED") == "1":
        jax.distributed.initialize()
        _initialized = True
        return True
    if n <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=os.environ["PLANK_COORDINATOR"],
        num_processes=n,
        process_id=int(os.environ["PLANK_PROCESS_ID"]),
    )
    _initialized = True
    return True


def is_main() -> bool:
    """True on the process that owns checkpoint metadata / logs / JSON dumps
    (the analog of Lightning's rank-zero-only IO)."""
    return jax.process_index() == 0


def owned_row_range(sharding, n_rows: int) -> tuple[int, int]:
    """[start, stop) of the global batch rows whose shards live on this
    process, per the sharding's own device->index map. Requires the per-
    process rows to be contiguous (true for a ('data',) batch axis over a
    process-major mesh)."""
    if jax.process_count() == 1:
        return 0, n_rows
    m = sharding.addressable_devices_indices_map((n_rows,))
    starts = [(0 if s[0].start is None else s[0].start) for s in m.values()]
    stops = [(n_rows if s[0].stop is None else s[0].stop) for s in m.values()]
    start, stop = min(starts), max(stops)
    span = sorted(set(zip(starts, stops)))
    covered = sum(b - a for a, b in span)
    assert covered == stop - start, (
        f"non-contiguous process rows {span}; use a process-major mesh")
    return start, stop


def make_global(sharding, local_array: np.ndarray, global_rows: int):
    """Assemble a globally sharded jax.Array from this process's local rows."""
    if jax.process_count() == 1:
        return jax.device_put(local_array, sharding)
    global_shape = (global_rows,) + tuple(local_array.shape[1:])
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_array), global_shape)


def host_allsum(values) -> np.ndarray:
    """Sum a small host-side float vector across processes (torchmetrics
    `dist_reduce_fx="sum"` analog for host-computed per-sample metrics)."""
    arr = np.asarray(values, dtype=np.float64)
    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(arr.astype(np.float32))
    return np.asarray(gathered, dtype=np.float64).sum(axis=0)


def local_rows(global_array, start: int, stop: int) -> np.ndarray:
    """Materialize rows [start, stop) of a (possibly non-fully-addressable)
    global array on this host. Rows must be owned by this process."""
    if jax.process_count() == 1:
        return np.asarray(global_array)[start:stop]
    parts = {}
    for shard in global_array.addressable_shards:
        idx = shard.index[0]
        s = 0 if idx.start is None else idx.start
        parts[s] = np.asarray(shard.data)
    rows = []
    pos = start
    while pos < stop:
        if pos not in parts:
            raise ValueError(f"row {pos} not addressable on this process")
        block = parts[pos]
        rows.append(block)
        pos += block.shape[0]
    return np.concatenate(rows, axis=0)[: stop - start]
