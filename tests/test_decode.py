"""KV-cached decode must reproduce the no-cache reference-style decode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plankassembly_tpu.decode import (
    greedy_decode, greedy_decode_nocache, parse_sequence,
)
from plankassembly_tpu.models.model import ModelDims, init_params
from tests.tiny import random_batch, tiny_config

CFG = tiny_config()
DIMS = ModelDims.from_config(CFG)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), DIMS)


@pytest.fixture(scope="module")
def inputs():
    batch = random_batch(CFG, batch_size=2, seed=3)
    return {k: jnp.asarray(v) for k, v in batch.items()
            if k.startswith("input")}


def test_cached_matches_nocache(params, inputs):
    fast = greedy_decode(params, inputs, DIMS, compute_dtype=jnp.float32)
    slow = greedy_decode_nocache(params, inputs, DIMS, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(fast["samples"]),
                                  np.asarray(slow["samples"]))
    np.testing.assert_array_equal(np.asarray(fast["attach"]),
                                  np.asarray(slow["attach"]))


def test_decode_shapes_and_attach_legality(params, inputs):
    out = greedy_decode(params, inputs, DIMS, compute_dtype=jnp.float32)
    samples = np.asarray(out["samples"])
    attach = np.asarray(out["attach"])
    S = DIMS.max_output_length
    assert samples.shape == attach.shape == (2, S)
    # any attachment must be a legal structural pointer to an earlier token
    for b in range(samples.shape[0]):
        for t in range(S):
            p = attach[b, t]
            if p == -1:
                continue
            assert p < t
            assert t >= 6  # bbox tokens never point
            if p < 6:
                assert p % 6 == t % 6
            else:
                assert p % 6 == (t % 6 + 3) % 6
            # copied value equals the referenced token
            assert samples[b, t] == samples[b, p]


def test_parse_sequence_truncates_at_end():
    seq = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 512, 0, 0])
    boxes = parse_sequence(seq, DIMS)
    assert boxes.shape == (2, 6)
    np.testing.assert_array_equal(boxes[0], [1, 2, 3, 4, 5, 6])

    # partial trailing plank is dropped (len//6*6)
    seq = np.array([1, 2, 3, 4, 5, 6, 7, 8, 512])
    assert parse_sequence(seq, DIMS).shape == (1, 6)

    # no END: everything kept
    seq = np.arange(12)
    assert parse_sequence(seq, DIMS).shape == (2, 6)


def test_kv_bucket_equivalence(params, inputs):
    """Cropping to a bucket that covers all real tokens must not change
    results (real tokens are a packed prefix)."""
    from plankassembly_tpu.decode import pick_kv_bucket
    bucket = pick_kv_bucket(np.asarray(inputs["input_mask"]), quantum=8)
    full = greedy_decode(params, inputs, DIMS, compute_dtype=jnp.float32)
    cropped = greedy_decode(params, inputs, DIMS, compute_dtype=jnp.float32,
                            kv_bucket=bucket)
    np.testing.assert_array_equal(np.asarray(full["samples"]),
                                  np.asarray(cropped["samples"]))


def test_kv_bucket_wider_than_input_pads(params, inputs):
    """A bucket WIDER than the packed input (coarse-quantum ladder rung,
    e.g. 1280 over a 1199-wide dataset) must pad with masked PAD columns
    and reproduce the unbucketed decode exactly — masked positions are
    inert. Regression: this case used to silently skip the crop, handing
    the Pallas kernels an unaligned width that trips Mosaic's lane-tiling
    check (r5)."""
    width = int(inputs["input_value"].shape[1])
    wide = width + 24
    full = greedy_decode(params, inputs, DIMS, compute_dtype=jnp.float32)
    padded = greedy_decode(params, inputs, DIMS, compute_dtype=jnp.float32,
                           kv_bucket=wide)
    np.testing.assert_array_equal(np.asarray(full["samples"]),
                                  np.asarray(padded["samples"]))
    np.testing.assert_array_equal(np.asarray(full["attach"]),
                                  np.asarray(padded["attach"]))


def test_pick_auto_impl_policy():
    """cross_impl='auto' resolves to the persistent kernel exactly in the
    measured-win regime (results/SERVING_r5.md) — TPU + GQA + kv_quant
    opt-in + B <= 512, B % 8 == 0 — and to mxu/xla everywhere else."""
    import dataclasses

    from plankassembly_tpu.decode import _pick_auto_impl

    gqa = ModelDims.from_config(dataclasses.replace(
        CFG, MODEL=dataclasses.replace(CFG.MODEL, NUM_KV_HEAD=1)))
    mha = DIMS  # tiny config is MHA (NUM_KV_HEAD unset)
    kw = dict(kv_quant=True, self_quant=False, weight_quant=False,
              prequantized=False)

    assert _pick_auto_impl("tpu", gqa, 256, **kw) == "persistent"
    assert _pick_auto_impl("tpu", gqa, 512, **kw) == "persistent"
    # outside the regime -> mxu
    assert _pick_auto_impl("tpu", gqa, 1024, **kw) == "mxu"   # B guard
    assert _pick_auto_impl("tpu", gqa, 16, **kw) == "mxu"     # below band
    assert _pick_auto_impl("tpu", gqa, 260, **kw) == "mxu"    # B % 8
    assert _pick_auto_impl("tpu", mha, 256, **kw) == "mxu"    # MHA
    assert _pick_auto_impl(  # eval default: full-precision KV stays mxu
        "tpu", gqa, 256, **{**kw, "kv_quant": False}) == "mxu"
    assert _pick_auto_impl(
        "tpu", gqa, 256, **{**kw, "weight_quant": True}) == "mxu"
    assert _pick_auto_impl(
        "tpu", gqa, 256, **{**kw, "self_quant": True}) == "mxu"
    assert _pick_auto_impl(
        "tpu", gqa, 256, **{**kw, "prequantized": True}) == "mxu"
    assert _pick_auto_impl("cpu", gqa, 256, **kw) == "xla"


def test_pick_kv_bucket():
    from plankassembly_tpu.decode import pick_kv_bucket
    mask = np.ones((2, 600), bool)
    mask[0, :100] = False
    mask[1, :257] = False
    assert pick_kv_bucket(mask) == 384
    assert pick_kv_bucket(mask, quantum=512) == 512
    mask2 = np.zeros((1, 600), bool)  # no padding at all
    assert pick_kv_bucket(mask2) == 600


def test_kv_quant_decode_close(params, inputs):
    """int8 cross-KV decode: tokens may rarely flip near ties, but with
    random weights and tiny scale the streams should match closely."""
    base = greedy_decode(params, inputs, DIMS, compute_dtype=jnp.float32)
    quant = greedy_decode(params, inputs, DIMS, compute_dtype=jnp.float32,
                          kv_quant=True)
    a, b = np.asarray(base["samples"]), np.asarray(quant["samples"])
    assert (a == b).mean() > 0.9, (a == b).mean()


def test_cross_kernel_matches_xla(params, inputs):
    """Pallas fused cross-attention (interpret mode) == einsum path."""
    xla = greedy_decode(params, inputs, DIMS, compute_dtype=jnp.float32,
                        cross_impl="xla")
    ker = greedy_decode(params, inputs, DIMS, compute_dtype=jnp.float32,
                        cross_impl="kernel-interpret")
    np.testing.assert_array_equal(np.asarray(xla["samples"]),
                                  np.asarray(ker["samples"]))
    np.testing.assert_array_equal(np.asarray(xla["attach"]),
                                  np.asarray(ker["attach"]))


def test_cross_kernel_int8_close(params, inputs):
    """Kernel int8 path matches the XLA int8 path's tokens on a tiny model."""
    xla = greedy_decode(params, inputs, DIMS, compute_dtype=jnp.float32,
                        kv_quant=True, cross_impl="xla")
    ker = greedy_decode(params, inputs, DIMS, compute_dtype=jnp.float32,
                        kv_quant=True, cross_impl="kernel-interpret")
    a, b = np.asarray(xla["samples"]), np.asarray(ker["samples"])
    assert (a == b).mean() > 0.95, (a != b).mean()


def test_cross_mxu_matches_xla(params, inputs):
    """Block-diagonal-query MXU path == einsum path (tokens + attach)."""
    xla = greedy_decode(params, inputs, DIMS, compute_dtype=jnp.float32,
                        cross_impl="xla")
    mxu = greedy_decode(params, inputs, DIMS, compute_dtype=jnp.float32,
                        cross_impl="mxu")
    np.testing.assert_array_equal(np.asarray(xla["samples"]),
                                  np.asarray(mxu["samples"]))
    np.testing.assert_array_equal(np.asarray(xla["attach"]),
                                  np.asarray(mxu["attach"]))


def test_cross_mxu_int8_close(params, inputs):
    xla = greedy_decode(params, inputs, DIMS, compute_dtype=jnp.float32,
                        kv_quant=True, cross_impl="xla")
    mxu = greedy_decode(params, inputs, DIMS, compute_dtype=jnp.float32,
                        kv_quant=True, cross_impl="mxu")
    a, b = np.asarray(xla["samples"]), np.asarray(mxu["samples"])
    assert (a == b).mean() > 0.95, (a != b).mean()


def test_self_quant_off_close(params, inputs):
    """self_quant=False keeps the self K/V cache exact while cross stays
    int8 — tokens track the (never-self-quanted) XLA int8 path."""
    xla = greedy_decode(params, inputs, DIMS, compute_dtype=jnp.float32,
                        kv_quant=True, cross_impl="xla")
    mxu = greedy_decode(params, inputs, DIMS, compute_dtype=jnp.float32,
                        kv_quant=True, cross_impl="mxu", self_quant=False)
    a, b = np.asarray(xla["samples"]), np.asarray(mxu["samples"])
    assert (a == b).mean() > 0.95, (a != b).mean()
