"""AOT serving artifacts (`plankassembly_tpu/export.py`).

Semantic anchors:
- a saved+loaded artifact reproduces the live `greedy_decode` (and
  `beam_decode`) tokens bit-exactly — weights baked into StableHLO
  constants survive the round trip;
- request padding is inert: a 1-row request against a 2-row artifact
  returns exactly the 1-row live result (per-row independence of the
  decode program);
- the PSRV1 container round-trips its serving-contract header.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plankassembly_tpu.decode import greedy_decode
from plankassembly_tpu.export import (
    export_serving, load_artifact, save_artifact,
)
from plankassembly_tpu.models.model import ModelDims, init_params
from tests.tiny import random_batch, tiny_config

BUCKET = 31  # tiny MAX_INPUT_LENGTH - 1 (no crop; CPU tests skip the
             # 128-multiple TPU layout rule)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = tiny_config()
    dims = ModelDims.from_config(cfg)
    params = init_params(jax.random.PRNGKey(0), dims)
    batch = random_batch(cfg)
    blob, meta = export_serving(params, cfg, batch=2, bucket=BUCKET,
                                platforms=("cpu",),
                                compute_dtype=jnp.float32)
    path = str(tmp_path_factory.mktemp("psrv") / "tiny.psrv")
    save_artifact(path, blob, meta)
    return cfg, dims, params, batch, path


def test_artifact_matches_live_decode(setup):
    cfg, dims, params, batch, path = setup
    prog = load_artifact(path)
    inputs = {k: v for k, v in batch.items() if k.startswith("input")}
    got = prog(inputs)
    want = greedy_decode(params,
                         {k: jnp.asarray(v) for k, v in inputs.items()},
                         dims, compute_dtype=jnp.float32, kv_bucket=BUCKET,
                         kv_quant=True, cross_impl="mxu")
    np.testing.assert_array_equal(got["samples"], np.asarray(want["samples"]))
    np.testing.assert_array_equal(got["attach"], np.asarray(want["attach"]))
    assert int(got["num_steps"]) == int(want["num_steps"])


def test_header_round_trip(setup):
    cfg, dims, params, batch, path = setup
    prog = load_artifact(path)
    m = prog.meta
    assert m["batch"] == 2 and m["bucket"] == BUCKET and m["beam"] == 0
    assert m["platforms"] == ["cpu"]
    assert m["token_end"] == dims.end and m["token_pad"] == dims.pad
    assert sorted(m["input_keys"]) == sorted(m["input_dtypes"])


def test_row_padding_is_inert(setup):
    cfg, dims, params, batch, path = setup
    prog = load_artifact(path)
    inputs = {k: v for k, v in batch.items() if k.startswith("input")}
    full = prog(inputs)
    one = prog({k: v[:1] for k, v in inputs.items()})
    assert one["samples"].shape[0] == 1
    np.testing.assert_array_equal(one["samples"][0], full["samples"][0])
    np.testing.assert_array_equal(one["attach"][0], full["attach"][0])


def test_oversized_request_rejected(setup):
    cfg, dims, params, batch, path = setup
    prog = load_artifact(path)
    inputs = {k: np.concatenate([v, v], axis=0) for k, v in batch.items()
              if k.startswith("input")}
    with pytest.raises(ValueError, match="rows"):
        prog(inputs)


def test_real_tokens_beyond_bucket_rejected(setup):
    cfg, dims, params, batch, path = setup
    prog = load_artifact(path)
    wide = dataclasses.replace(
        cfg, DATA=dataclasses.replace(cfg.DATA, MAX_INPUT_LENGTH=40))
    inputs = {k: v for k, v in random_batch(wide).items()
              if k.startswith("input")}
    assert inputs["input_value"].shape[1] > BUCKET
    with pytest.raises(ValueError, match="beyond the exported bucket"):
        prog(inputs)


def test_beam_artifact_matches_live_beam(setup, tmp_path):
    cfg, dims, params, batch, _ = setup
    from plankassembly_tpu.beam import beam_decode

    blob, meta = export_serving(params, cfg, batch=2, bucket=BUCKET,
                                beam=2, platforms=("cpu",),
                                compute_dtype=jnp.float32)
    path = str(tmp_path / "beam.psrv")
    save_artifact(path, blob, meta)
    prog = load_artifact(path)
    inputs = {k: v for k, v in batch.items() if k.startswith("input")}
    got = prog(inputs)
    want = beam_decode(params,
                       {k: jnp.asarray(v) for k, v in inputs.items()},
                       dims, num_beams=2, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(got["samples"], np.asarray(want["samples"]))
    np.testing.assert_array_equal(got["attach"], np.asarray(want["attach"]))


def test_weight_quant_artifact(setup, tmp_path):
    """int8-weight artifact: meaningfully smaller, matches the live
    weight_quant decode bit-exactly, and records the flag in its header."""
    cfg, dims, params, batch, _ = setup
    blob8, meta = export_serving(params, cfg, batch=2, bucket=BUCKET,
                                 platforms=("cpu",),
                                 compute_dtype=jnp.float32,
                                 weight_quant=True)
    assert meta["weight_quant"] is True
    # (the size cut only shows at real scale where constants dominate the
    # blob — measured 101.8 -> 60.2 MB on the d=512 flagship (decoder +
    # heads go int8; encoder/embeddings stay f32); at tiny dims the
    # StableHLO text dwarfs the weights, so no size assert here)
    path = str(tmp_path / "wq8.psrv")
    save_artifact(path, blob8, meta)
    prog = load_artifact(path)
    inputs = {k: v for k, v in batch.items() if k.startswith("input")}
    got = prog(inputs)
    want = greedy_decode(params,
                         {k: jnp.asarray(v) for k, v in inputs.items()},
                         dims, compute_dtype=jnp.float32, kv_bucket=BUCKET,
                         kv_quant=True, cross_impl="mxu", weight_quant=True)
    np.testing.assert_array_equal(got["samples"], np.asarray(want["samples"]))


def test_data_parallel_artifact(setup, tmp_path):
    """SPMD artifact: the batch axis shards over an 8-device ('data',)
    mesh (conftest forces 8 virtual CPU devices); tokens must equal the
    single-device artifact's — decode rows are device-placement
    invariant."""
    cfg, dims, params, batch, single_path = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    blob, meta = export_serving(params, cfg, batch=8, bucket=BUCKET,
                                platforms=("cpu",),
                                compute_dtype=jnp.float32, data_parallel=8)
    assert meta["data_parallel"] == 8
    path = str(tmp_path / "dp8.psrv")
    save_artifact(path, blob, meta)
    prog = load_artifact(path)
    inputs = {k: np.concatenate([v] * 4, axis=0)  # 2 rows -> 8
              for k, v in batch.items() if k.startswith("input")}
    got = prog(inputs)
    want = greedy_decode(params,
                         {k: jnp.asarray(v) for k, v in inputs.items()},
                         dims, compute_dtype=jnp.float32, kv_bucket=BUCKET,
                         kv_quant=True, cross_impl="mxu")
    np.testing.assert_array_equal(got["samples"], np.asarray(want["samples"]))
    np.testing.assert_array_equal(got["attach"], np.asarray(want["attach"]))


def test_sideface_contract_no_type_stream(setup, tmp_path):
    """with_type=False (the sideface modality): the artifact's input
    contract omits input_type, and the program matches the live decode on
    a type-less batch."""
    cfg, dims, params, batch, _ = setup
    blob, meta = export_serving(params, cfg, batch=2, bucket=BUCKET,
                                platforms=("cpu",),
                                compute_dtype=jnp.float32, with_type=False)
    assert "input_type" not in meta["input_keys"]
    path = str(tmp_path / "notype.psrv")
    save_artifact(path, blob, meta)
    prog = load_artifact(path)
    nb = random_batch(cfg, with_type=False)
    inputs = {k: v for k, v in nb.items() if k.startswith("input")}
    got = prog(inputs)
    want = greedy_decode(params,
                         {k: jnp.asarray(v) for k, v in inputs.items()},
                         dims, compute_dtype=jnp.float32, kv_bucket=BUCKET,
                         kv_quant=True, cross_impl="mxu")
    np.testing.assert_array_equal(got["samples"], np.asarray(want["samples"]))


def test_unsupported_export_combos_rejected(setup):
    cfg, dims, params, batch, _ = setup
    with pytest.raises(ValueError, match="visible devices"):
        export_serving(params, cfg, batch=32, bucket=BUCKET,
                       platforms=("cpu",), data_parallel=16)


def test_int8_beam_artifact(setup, tmp_path):
    """weight_quant composes with the beam decoder: the artifact matches
    the live pre-quantized beam decode bit-exactly."""
    from plankassembly_tpu.beam import beam_decode
    from plankassembly_tpu.decode import quantize_decoder_weights

    cfg, dims, params, batch, _ = setup
    blob, meta = export_serving(params, cfg, batch=2, bucket=BUCKET,
                                beam=2, platforms=("cpu",),
                                compute_dtype=jnp.float32,
                                weight_quant=True)
    assert meta["weight_quant"] is True and meta["beam"] == 2
    path = str(tmp_path / "beam_wq8.psrv")
    save_artifact(path, blob, meta)
    prog = load_artifact(path)
    inputs = {k: v for k, v in batch.items() if k.startswith("input")}
    got = prog(inputs)
    want = beam_decode(quantize_decoder_weights(params),
                       {k: jnp.asarray(v) for k, v in inputs.items()},
                       dims, num_beams=2, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(got["samples"], np.asarray(want["samples"]))


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "junk.psrv"
    p.write_bytes(b"NOTPSRV" + b"\0" * 64)
    with pytest.raises(ValueError, match="PSRV1"):
        load_artifact(str(p))
