"""Grouped-query / multi-query attention (MODEL.NUM_KV_HEAD) — an opt-in
extension over the reference MHA (PAPERS.md: Shazeer 2019). The default
(NUM_KV_HEAD = 0 -> NUM_HEAD) keeps the reference layout bit-identical
(covered by test_torch_parity); these tests cover the reduced-KV variants."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plankassembly_tpu.decode import greedy_decode, greedy_decode_nocache
from plankassembly_tpu.models.model import (
    ModelDims, init_params, train_step_loss,
)
from tests.tiny import random_batch, tiny_config

CFG = tiny_config()  # NUM_HEAD=2


def _dims(kv):
    cfg = dataclasses.replace(
        CFG, MODEL=dataclasses.replace(CFG.MODEL, NUM_KV_HEAD=kv))
    return ModelDims.from_config(cfg)


def test_param_shapes_shrink():
    dims = _dims(1)  # MQA: 1 kv head of head_dim 8 (d=16, H=2)
    params = init_params(jax.random.PRNGKey(0), dims)
    d, dh = dims.num_model, dims.head_dim
    assert params["decoder"]["self_attn"]["wk"].shape == (
        dims.num_decoder_layers, d, dh)
    assert params["decoder"]["cross_attn"]["wv"].shape == (
        dims.num_decoder_layers, d, dh)
    assert params["decoder"]["self_attn"]["wq"].shape == (
        dims.num_decoder_layers, d, d)


def test_default_zero_means_mha():
    dims = _dims(0)
    assert dims.kv_heads == dims.num_head
    assert dims.kv_groups == 1


@pytest.mark.parametrize("kv", [1, 2])
def test_train_loss_and_grads(kv):
    dims = _dims(kv)
    params = init_params(jax.random.PRNGKey(0), dims)
    batch = {k: jnp.asarray(v) for k, v in
             random_batch(CFG, batch_size=2, seed=1).items()
             if hasattr(v, "shape")}
    loss, mets = train_step_loss(params, batch, dims, deterministic=True,
                                 compute_dtype=jnp.float32)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: train_step_loss(
        p, batch, dims, deterministic=True, compute_dtype=jnp.float32)[0])(
        params)
    assert float(jnp.linalg.norm(g["decoder"]["self_attn"]["wk"])) > 0


@pytest.mark.parametrize("kv", [1, 2])
def test_cached_decode_matches_nocache_oracle(kv):
    """The KV-cached loop (grouped dots, kv-head-sized caches) must emit the
    same tokens as the full-recompute oracle, which goes through the generic
    attention() repeat path — two independent GQA implementations."""
    dims = _dims(kv)
    params = init_params(jax.random.PRNGKey(0), dims)
    inputs = {k: jnp.asarray(v) for k, v in
              random_batch(CFG, batch_size=2, seed=3).items()
              if k.startswith("input")}
    fast = greedy_decode(params, inputs, dims, compute_dtype=jnp.float32,
                         cross_impl="xla")
    slow = greedy_decode_nocache(params, inputs, dims,
                                 compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(fast["samples"]),
                                  np.asarray(slow["samples"]))
    np.testing.assert_array_equal(np.asarray(fast["attach"]),
                                  np.asarray(slow["attach"]))


@pytest.mark.parametrize("kv", [1, 2])
def test_mxu_cross_impl_matches_xla(kv):
    """Block-diagonal-query MXU cross-attention under GQA (the block map is
    head -> kv-head instead of eye) must match the einsum path exactly."""
    dims = _dims(kv)
    params = init_params(jax.random.PRNGKey(1), dims)
    inputs = {k: jnp.asarray(v) for k, v in
              random_batch(CFG, batch_size=2, seed=5).items()
              if k.startswith("input")}
    a = greedy_decode(params, inputs, dims, compute_dtype=jnp.float32,
                      cross_impl="xla")
    b = greedy_decode(params, inputs, dims, compute_dtype=jnp.float32,
                      cross_impl="mxu")
    np.testing.assert_array_equal(np.asarray(a["samples"]),
                                  np.asarray(b["samples"]))


@pytest.mark.parametrize("kv", [1, 2])
def test_gqa_self_expand_matches_grouped(kv):
    """The 'expand' self-attention form (K/V broadcast to all H query heads
    in-register, MHA-shaped einsums) must emit the same tokens as the
    default 'grouped' 5-D einsum form — same math, different XLA schedule
    (tools/bench_fused.py --gqa-self measures which wins on TPU)."""
    dims = _dims(kv)
    params = init_params(jax.random.PRNGKey(2), dims)
    inputs = {k: jnp.asarray(v) for k, v in
              random_batch(CFG, batch_size=2, seed=7).items()
              if k.startswith("input")}
    a = greedy_decode(params, inputs, dims, compute_dtype=jnp.float32,
                      cross_impl="xla", gqa_self_impl="grouped")
    b = greedy_decode(params, inputs, dims, compute_dtype=jnp.float32,
                      cross_impl="xla", gqa_self_impl="expand")
    np.testing.assert_array_equal(np.asarray(a["samples"]),
                                  np.asarray(b["samples"]))
    np.testing.assert_array_equal(np.asarray(a["attach"]),
                                  np.asarray(b["attach"]))
