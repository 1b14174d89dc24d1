"""Model-level tests: shapes, masking/causality, loss structure."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plankassembly_tpu.models.model import (
    ModelDims, encode, init_params, pointer_structure_mask, train_step_loss,
)
from tests.tiny import random_batch, tiny_config

CFG = tiny_config()
DIMS = ModelDims.from_config(CFG)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), DIMS)


@pytest.fixture(scope="module")
def batch():
    return {k: jnp.asarray(v) for k, v in random_batch(CFG).items()}


def test_loss_finite_and_accuracy_range(params, batch):
    loss, mets = train_step_loss(params, batch, DIMS, deterministic=True,
                                 compute_dtype=jnp.float32)
    assert np.isfinite(float(loss))
    assert 0.0 <= float(mets["accuracy"]) <= 1.0


def test_pad_positions_do_not_affect_loss(params, batch):
    """Changing padded-out label/input values must not change the loss."""
    loss0, _ = train_step_loss(params, batch, DIMS, deterministic=True,
                               compute_dtype=jnp.float32)
    mutated = dict(batch)
    ov = np.asarray(batch["output_value"]).copy()
    mask = np.asarray(batch["output_mask"])
    # output_value at padded positions beyond END+1 influences nothing:
    # embeddings of pad keys are masked, labels there are PAD (ignored)
    ov[mask] = 7
    # keep labels = PAD so they remain ignored
    mutated["output_value"] = jnp.asarray(ov)
    loss1, _ = train_step_loss(params, mutated, DIMS, deterministic=True,
                               compute_dtype=jnp.float32)
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-5)


def test_encoder_pad_invariance(params, batch):
    """Encoder outputs at real positions must ignore pad-position values."""
    inputs = {k: v for k, v in batch.items() if k.startswith("input")}
    mem0 = encode(params, inputs, DIMS, deterministic=True,
                  compute_dtype=jnp.float32)
    iv = np.asarray(inputs["input_value"]).copy()
    pad = np.asarray(inputs["input_mask"])
    iv[pad] = 3  # garbage in pads (embedding changes, but keys are masked)
    mutated = dict(inputs)
    mutated["input_value"] = jnp.asarray(iv)
    mem1 = encode(params, mutated, DIMS, deterministic=True,
                  compute_dtype=jnp.float32)
    real = ~pad
    np.testing.assert_allclose(np.asarray(mem0)[real], np.asarray(mem1)[real],
                               atol=1e-5)


def test_decoder_causality(params, batch):
    """Loss contribution at position t must not depend on future tokens.

    Flip a late output token; per-position label log-probs before that
    position must be unchanged.
    """
    from plankassembly_tpu.models.model import (
        decode_stack, embed_output, NEG_INF)

    def hiddens_fn(b):
        inputs = {k: v for k, v in b.items() if k.startswith("input")}
        memory = encode(params, inputs, DIMS, deterministic=True,
                        compute_dtype=jnp.float32)
        x = embed_output(params, b["output_value"][:, :-1], DIMS)
        S = x.shape[1]
        causal = jnp.triu(jnp.full((S, S), NEG_INF), k=1)[None, None]
        tgt_pad = jnp.where(b["output_mask"][:, :S], NEG_INF, 0.0)[:, None, None, :]
        cross = jnp.where(b["input_mask"], NEG_INF, 0.0)[:, None, None, :]
        return decode_stack(params, x, memory, causal + tgt_pad, cross, DIMS,
                            deterministic=True, compute_dtype=jnp.float32)

    h0 = np.asarray(hiddens_fn(batch))
    mutated = dict(batch)
    ov = np.asarray(batch["output_value"]).copy()
    flip_at = 10
    ov[:, flip_at] = (ov[:, flip_at] + 123) % 512
    mutated["output_value"] = jnp.asarray(ov)
    h1 = np.asarray(hiddens_fn(mutated))
    # hidden position j consumes tokens < j, so positions <= flip_at unchanged
    np.testing.assert_allclose(h0[:, : flip_at + 1], h1[:, : flip_at + 1],
                               atol=1e-5)
    assert not np.allclose(h0[:, flip_at + 1:], h1[:, flip_at + 1:])


def test_pointer_structure_mask_matches_reference_rules():
    m = pointer_structure_mask(DIMS)
    S = DIMS.max_output_length
    # bbox tokens (first 6) never point
    assert (m[:6] == 0).all()
    for i in range(6, S):
        for j in range(S):
            if j < 6:
                expected = (j % 6) == (i % 6)
            else:
                expected = (j % 6) == ((i % 6) + 3) % 6
            assert m[i, j] == float(expected), (i, j)


def test_dropout_changes_loss(params, batch):
    l1, _ = train_step_loss(params, batch, DIMS, rng=jax.random.PRNGKey(1),
                            deterministic=False, compute_dtype=jnp.float32)
    l2, _ = train_step_loss(params, batch, DIMS, rng=jax.random.PRNGKey(2),
                            deterministic=False, compute_dtype=jnp.float32)
    assert float(l1) != float(l2)
