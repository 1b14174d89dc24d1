"""Parity tests for the persistent decode kernel
(`ops/persistent_decode.py`, interpret mode on CPU).

The kernel reuses the mxu path's int8 cross-KV quantization (scales
folded into query / output) and a bf16 self cache, so with
compute_dtype=f32 greedy decode should agree with the XLA mxu path on
essentially every token; the bf16 test allows the small disagreement
rate that bf16 rounding-point differences cause (same bar as the fused
v2 kernel's test)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plankassembly_tpu.decode import decode_from_memory
from plankassembly_tpu.models.model import ModelDims, encode, init_params
from plankassembly_tpu.ops.persistent_decode import persistent_greedy_decode
from tests.tiny import random_batch, tiny_config

CFG = tiny_config()


def _setup(kv=0, seed=0, batch_size=4):
    cfg = dataclasses.replace(
        CFG, MODEL=dataclasses.replace(CFG.MODEL, NUM_KV_HEAD=kv))
    dims = ModelDims.from_config(cfg)
    params = init_params(jax.random.PRNGKey(seed), dims)
    batch = {k: jnp.asarray(v) for k, v in
             random_batch(CFG, batch_size=batch_size, seed=seed).items()
             if k.startswith("input")}
    memory = encode(params, batch, dims, deterministic=True,
                    compute_dtype=jnp.float32)
    return params, dims, memory, batch["input_mask"]


def _ref(params, dims, memory, mask, cd):
    return decode_from_memory(params, memory, mask, dims,
                              compute_dtype=cd, kv_quant=True,
                              self_quant=False, early_exit=False,
                              cross_impl="mxu")


@pytest.mark.parametrize("kv", [0, 1])
def test_persistent_matches_mxu_f32(kv):
    params, dims, memory, mask = _setup(kv=kv)
    ref = _ref(params, dims, memory, mask, jnp.float32)
    got = persistent_greedy_decode(params, memory, mask, dims,
                                   block_rows=2,
                                   compute_dtype=jnp.float32,
                                   interpret=True)
    a = np.asarray(got["samples"])
    b = np.asarray(ref["samples"])
    agree = float((a == b).mean())
    assert agree >= 0.99, (agree, a, b)
    same = (a == b).all(axis=-1)
    np.testing.assert_array_equal(np.asarray(got["attach"])[same],
                                  np.asarray(ref["attach"])[same])


def test_dispatch_persistent_interpret():
    """decode_from_memory(cross_impl='persistent-interpret') routes to the
    kernel (decode.py dispatch) and matches the mxu reference at f32."""
    params, dims, memory, mask = _setup(kv=1)
    ref = _ref(params, dims, memory, mask, jnp.float32)
    got = decode_from_memory(params, memory, mask, dims,
                             compute_dtype=jnp.float32,
                             early_exit=False,
                             cross_impl="persistent-interpret")
    agree = float((np.asarray(got["samples"])
                   == np.asarray(ref["samples"])).mean())
    assert agree >= 0.99, agree
    assert int(got["num_steps"]) == dims.max_output_length


def test_persistent_early_exit_stops():
    """early_exit=True: with the vocab head biased hard toward END every
    row emits END at t=0, the SMEM done flag trips, and num_steps == 1 —
    matching the XLA while_loop path's early exit on the same params."""
    params, dims, memory, mask = _setup(kv=1)
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    b = np.asarray(params["heads"]["vocab"]["b"]).copy()
    b[dims.end] = 1e4
    params["heads"]["vocab"]["b"] = jnp.asarray(b)
    ref = decode_from_memory(params, memory, mask, dims,
                             compute_dtype=jnp.float32, kv_quant=True,
                             self_quant=False, early_exit=True,
                             cross_impl="mxu")
    got = persistent_greedy_decode(params, memory, mask, dims,
                                   block_rows=2, early_exit=True,
                                   compute_dtype=jnp.float32,
                                   interpret=True)
    assert int(got["num_steps"]) == int(ref["num_steps"]) == 1
    np.testing.assert_array_equal(np.asarray(got["samples"]),
                                  np.asarray(ref["samples"]))
    np.testing.assert_array_equal(np.asarray(got["attach"]),
                                  np.asarray(ref["attach"]))


def test_persistent_early_exit_noop_when_no_end():
    """early_exit=True must be bit-identical to the full bound when no row
    ever emits END (vocab head biased against END; pointers can only copy
    already-emitted tokens, so END can never appear): the predicate
    wrapper may not perturb any step's compute, and num_steps == S."""
    params, dims, memory, mask = _setup(kv=1)
    b = np.asarray(params["heads"]["vocab"]["b"]).copy()
    b[dims.end] = -1e4
    params["heads"]["vocab"]["b"] = jnp.asarray(b)
    full = persistent_greedy_decode(params, memory, mask, dims,
                                    block_rows=2, early_exit=False,
                                    compute_dtype=jnp.float32,
                                    interpret=True)
    ee = persistent_greedy_decode(params, memory, mask, dims,
                                  block_rows=2, early_exit=True,
                                  compute_dtype=jnp.float32,
                                  interpret=True)
    assert int(full["num_steps"]) == dims.max_output_length
    assert int(ee["num_steps"]) == dims.max_output_length
    np.testing.assert_array_equal(np.asarray(ee["samples"]),
                                  np.asarray(full["samples"]))
    np.testing.assert_array_equal(np.asarray(ee["attach"]),
                                  np.asarray(full["attach"]))


def test_persistent_rejects_large_batch():
    """B > 512 must raise (the B=1024 Mosaic hang guard), before any
    device work happens."""
    params, dims, memory, mask = _setup(kv=1)
    big = jnp.zeros((1024, memory.shape[1], memory.shape[2]), memory.dtype)
    bigmask = jnp.zeros((1024, mask.shape[1]), mask.dtype)
    with pytest.raises(ValueError, match="B <= 512"):
        persistent_greedy_decode(params, big, bigmask, dims,
                                 block_rows=2, interpret=True)


def test_persistent_bf16_close():
    params, dims, memory, mask = _setup()
    ref = _ref(params, dims, memory, mask, jnp.bfloat16)
    got = persistent_greedy_decode(params, memory, mask, dims,
                                   block_rows=2,
                                   compute_dtype=jnp.bfloat16,
                                   interpret=True)
    agree = float((np.asarray(got["samples"])
                   == np.asarray(ref["samples"])).mean())
    assert agree >= 0.8, agree
