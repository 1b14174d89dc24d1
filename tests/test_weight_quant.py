"""int8 weight-quantized decode (`decode_from_memory(weight_quant=True)`).

Semantic anchor: per-output-channel symmetric int8 with the dequant scale
folded into the matmul output is EXACT when every weight column is already
an int8 grid with a power-of-two scale — fp multiplication/addition are
invariant under power-of-two scaling, so `(x @ Q) * s` and `x @ (Q * s)`
are bit-identical. Building such params and asserting token equality
verifies every quantized site's wiring (fused QKV, self/cross output
projections, cross query, both FFN matmuls, vocab + pointer heads) with
zero numeric tolerance; the accuracy impact on a *trained* model is
measured separately (tools/bench_trained_serving.py --weight-quant).
"""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plankassembly_tpu.decode import greedy_decode
from plankassembly_tpu.models.model import ModelDims, init_params
from tests.tiny import random_batch, tiny_config

SCALE = 2.0 ** -9  # power of two -> exact dequant algebra


def _grid(rng, shape):
    """int8-grid weights: integer levels in [-127, 127] * SCALE, with the
    absmax level pinned to 127 per output column so the quantizer's
    per-column scale is exactly SCALE."""
    q = rng.integers(-127, 128, shape)
    q[0] = np.where(rng.integers(0, 2, shape[1:]) > 0, 127, -127)
    return jnp.asarray(q * SCALE, jnp.float32)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    dims = ModelDims.from_config(cfg)
    params = init_params(jax.random.PRNGKey(0), dims)
    rng = np.random.default_rng(3)
    dec = params["decoder"]
    for blk in ("self_attn", "cross_attn"):
        for k in dec[blk]:
            if dec[blk][k].ndim == 3:  # (L, K, N) weight stacks
                dec[blk][k] = _grid(rng, dec[blk][k].shape[1:])[None].repeat(
                    dec[blk][k].shape[0], axis=0)
    for k in ("w1", "w2"):
        dec["ffn"][k] = _grid(rng, dec["ffn"][k].shape[1:])[None].repeat(
            dec["ffn"][k].shape[0], axis=0)
    for h in ("vocab", "pointer"):
        params["heads"][h]["w"] = _grid(rng, params["heads"][h]["w"].shape)
    batch = {k: jnp.asarray(v) for k, v in random_batch(cfg).items()}
    return cfg, dims, params, batch


def test_grid_weights_decode_bit_exact(setup):
    cfg, dims, params, batch = setup
    plain = greedy_decode(params, batch, dims, compute_dtype=jnp.float32,
                          cross_impl="xla")
    quant = greedy_decode(params, batch, dims, compute_dtype=jnp.float32,
                          cross_impl="xla", weight_quant=True)
    np.testing.assert_array_equal(np.asarray(plain["samples"]),
                                  np.asarray(quant["samples"]))
    np.testing.assert_array_equal(np.asarray(plain["attach"]),
                                  np.asarray(quant["attach"]))
    assert int(plain["num_steps"]) == int(quant["num_steps"])


def test_grid_weights_mxu_path_bit_exact(setup):
    cfg, dims, params, batch = setup
    plain = greedy_decode(params, batch, dims, compute_dtype=jnp.float32,
                          cross_impl="mxu", kv_quant=False)
    quant = greedy_decode(params, batch, dims, compute_dtype=jnp.float32,
                          cross_impl="mxu", kv_quant=False,
                          weight_quant=True)
    np.testing.assert_array_equal(np.asarray(plain["samples"]),
                                  np.asarray(quant["samples"]))


def test_natural_weights_close_not_required_but_sane(setup):
    """With natural (non-grid) weights the quantized decode still runs and
    emits structurally valid tokens (dtype/termination contract)."""
    cfg, dims, params, batch = setup
    params = init_params(jax.random.PRNGKey(1), ModelDims.from_config(cfg))
    out = greedy_decode(params, batch, dims, compute_dtype=jnp.float32,
                        cross_impl="xla", weight_quant=True)
    s = np.asarray(out["samples"])
    assert s.dtype == np.int32 and s.shape[1] == dims.max_output_length
    assert (s >= 0).all() and (s < dims.vocab_size).all()


def test_beam_grid_weights_bit_exact(setup):
    """The beam decoder has the same weight-quant wiring (it re-reads the
    same weights every step for K·B rows); grid weights make it exact."""
    from plankassembly_tpu.beam import beam_decode
    cfg, dims, params, batch = setup
    plain = beam_decode(params, batch, dims, num_beams=2,
                        compute_dtype=jnp.float32)
    quant = beam_decode(params, batch, dims, num_beams=2,
                        compute_dtype=jnp.float32, weight_quant=True)
    np.testing.assert_array_equal(np.asarray(plain["samples"]),
                                  np.asarray(quant["samples"]))
    np.testing.assert_array_equal(np.asarray(plain["beam_scores"]),
                                  np.asarray(quant["beam_scores"]))


def test_prequantized_matches_in_trace_quant(setup):
    """quantize_decoder_weights (the export path's out-of-trace quantize)
    reproduces the in-trace weight_quant=True decode bit-exactly on grid
    weights, whose power-of-two scales make the quantize algebra exact
    under any XLA rearrangement. (On natural weights at real scale the
    two are distinct-but-equally-valid quantizations: XLA's algebraic
    simplification of the in-trace quantize ops can flip a handful of
    int8 levels — measured 4/16 rows differing on the d=512 flagship at
    bf16 — which is why export verification compares against the
    prequantized live program, tools/export_serving.py --verify.)"""
    from plankassembly_tpu.decode import quantize_decoder_weights
    cfg, dims, params, batch = setup
    live = greedy_decode(params, batch, dims, compute_dtype=jnp.float32,
                         cross_impl="mxu", kv_quant=True, weight_quant=True)
    pre = greedy_decode(quantize_decoder_weights(params), batch, dims,
                        compute_dtype=jnp.float32, cross_impl="mxu",
                        kv_quant=True)
    np.testing.assert_array_equal(np.asarray(live["samples"]),
                                  np.asarray(pre["samples"]))
    np.testing.assert_array_equal(np.asarray(live["attach"]),
                                  np.asarray(pre["attach"]))


def test_prequantized_rejected_on_pallas_impls(setup):
    from plankassembly_tpu.decode import quantize_decoder_weights
    cfg, dims, params, batch = setup
    with pytest.raises(ValueError, match="pre-quantized"):
        greedy_decode(quantize_decoder_weights(params), batch, dims,
                      compute_dtype=jnp.float32,
                      cross_impl="fused-interpret")


def test_weight_quant_ignored_on_pallas_impls(setup):
    cfg, dims, params, batch = setup
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        greedy_decode(params, batch, dims, compute_dtype=jnp.float32,
                      cross_impl="fused-interpret", weight_quant=True)
    assert any("weight_quant" in str(x.message) for x in w)
