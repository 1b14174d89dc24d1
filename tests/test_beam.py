"""Beam-search decode (`plankassembly_tpu/beam.py`).

Semantic anchors:
- num_beams=1 must reproduce `greedy_decode` token-for-token up to each
  row's END (after END greedy keeps emitting argmax junk while a finished
  beam freezes on PAD — both are ignored by the metrics).
- Widening the beam can never lower the best cumulative log-prob
  (alpha=0): the global top-1 candidate at each step is in every top-K,
  so max-score(K=4) >= max-score(K=1) by induction.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from plankassembly_tpu.beam import beam_decode
from plankassembly_tpu.decode import greedy_decode
from plankassembly_tpu.models.model import ModelDims, init_params
from tests.tiny import random_batch, tiny_config

import jax


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    dims = ModelDims.from_config(cfg)
    params = init_params(jax.random.PRNGKey(0), dims)
    batch = {k: jnp.asarray(v) for k, v in random_batch(cfg).items()}
    return cfg, dims, params, batch


def _crop_at_end(row, end):
    """Tokens up to and including the first END (full row if none)."""
    hits = np.nonzero(row == end)[0]
    return row[: hits[0] + 1] if hits.size else row


def test_beam1_matches_greedy(setup):
    cfg, dims, params, batch = setup
    g = greedy_decode(params, batch, dims, compute_dtype=jnp.float32,
                      cross_impl="xla")
    b = beam_decode(params, batch, dims, num_beams=1,
                    compute_dtype=jnp.float32)
    gs, bs = np.asarray(g["samples"]), np.asarray(b["samples"])
    ga, ba = np.asarray(g["attach"]), np.asarray(b["attach"])
    for i in range(gs.shape[0]):
        gc = _crop_at_end(gs[i], dims.end)
        np.testing.assert_array_equal(gc, bs[i, : len(gc)])
        np.testing.assert_array_equal(ga[i, : len(gc)], ba[i, : len(gc)])


def test_wider_beam_never_scores_worse(setup):
    cfg, dims, params, batch = setup
    s1 = np.asarray(beam_decode(params, batch, dims, num_beams=1,
                                compute_dtype=jnp.float32)["beam_scores"])
    s4 = np.asarray(beam_decode(params, batch, dims, num_beams=4,
                                compute_dtype=jnp.float32)["beam_scores"])
    assert (s4.max(axis=1) >= s1.max(axis=1) - 1e-4).all(), (s1, s4)


def test_beam_outputs_well_formed(setup):
    cfg, dims, params, batch = setup
    out = beam_decode(params, batch, dims, num_beams=4,
                      compute_dtype=jnp.float32, alpha=0.6)
    samples = np.asarray(out["samples"])
    attach = np.asarray(out["attach"])
    assert samples.shape == (2, dims.max_output_length)
    assert out["beam_samples"].shape == (2, 4, dims.max_output_length)
    # attach pointers only reference earlier positions and resolve to the
    # token they point at
    for i in range(samples.shape[0]):
        for t in range(samples.shape[1]):
            j = attach[i, t]
            if j >= 0:
                assert j < t
                assert samples[i, t] == samples[i, j]
    # the returned hypothesis is one of the K beams (selection itself —
    # finished-first + normalization — is exercised by the parity tests)
    beam_samples = np.asarray(out["beam_samples"])
    for i in range(samples.shape[0]):
        assert any((beam_samples[i, k] == samples[i]).all()
                   for k in range(beam_samples.shape[1]))


def test_trainer_decode_impl_beam(setup, tmp_path):
    """cfg.trainer.decode_impl='beam<K>' routes the eval decode through
    beam_decode (config plumb-through used by trainer_*.py test)."""
    import dataclasses
    import types

    from plankassembly_tpu.train.loop import Trainer

    cfg, dims, params, batch = setup
    cfg = dataclasses.replace(
        cfg, trainer=dataclasses.replace(
            cfg.trainer, decode_impl="beam2", accelerator="cpu",
            default_root_dir=str(tmp_path)))
    tr = Trainer(cfg, log_dir=str(tmp_path), compute_dtype=jnp.float32)
    state = types.SimpleNamespace(params=params)
    arrays, out = tr._decode_batch(state, dict(batch))
    assert "beam_scores" in out and out["beam_scores"].shape == (2, 2)
    assert out["samples"].shape == (2, dims.max_output_length)


def test_beam_early_exit_reports_steps(setup):
    cfg, dims, params, batch = setup
    out = beam_decode(params, batch, dims, num_beams=2,
                      compute_dtype=jnp.float32)
    n = int(out["num_steps"])
    assert 1 <= n <= dims.max_output_length
