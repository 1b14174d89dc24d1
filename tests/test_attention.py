"""Pallas fused attention vs XLA reference (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from plankassembly_tpu.ops.attention import flash_attention, xla_attention


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_xla(causal):
    rng = np.random.default_rng(0)
    B, H, Lq, Lk, Dh = 2, 2, 128, 128, 64
    q = jnp.asarray(rng.standard_normal((B, H, Lq, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Lk, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Lk, Dh)), jnp.float32)
    lengths = jnp.asarray([40, 128], jnp.int32)

    out_f = flash_attention(q, k, v, lengths, causal=causal, interpret=True)
    out_x = xla_attention(q, k, v, lengths, causal=causal)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               atol=1e-5)


def test_flash_pads_ragged_lengths():
    rng = np.random.default_rng(1)
    B, H, Lq, Lk, Dh = 1, 2, 100, 130, 64  # deliberately unaligned
    q = jnp.asarray(rng.standard_normal((B, H, Lq, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Lk, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Lk, Dh)), jnp.float32)
    lengths = jnp.asarray([77], jnp.int32)
    out_f = flash_attention(q, k, v, lengths, interpret=True)
    out_x = xla_attention(q, k, v, lengths)
    assert out_f.shape == (B, H, Lq, Dh)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               atol=1e-5)
