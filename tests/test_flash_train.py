"""Differentiable fused attention: gradient parity + dropout consistency."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plankassembly_tpu.ops.attention import xla_attention
from plankassembly_tpu.ops.flash_train import fused_attention_train


def _inputs(B=2, H=2, Lq=128, Lk=128, Dh=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, Lq, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Lk, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Lk, Dh)), jnp.float32)
    lengths = jnp.asarray(rng.integers(Lk // 2, Lk + 1, (B,)), jnp.int32)
    return q, k, v, lengths


@pytest.mark.parametrize("causal", [False, True])
def test_forward_matches_xla_no_dropout(causal):
    q, k, v, lengths = _inputs()
    out_f = fused_attention_train(q, k, v, lengths, 0, 0.0, causal,
                                  None, 128, True)
    out_x = xla_attention(q, k, v, lengths, causal=causal)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               atol=1e-5)


def test_gradients_match_xla_no_dropout():
    q, k, v, lengths = _inputs()

    def f_fused(q, k, v):
        return jnp.sum(fused_attention_train(q, k, v, lengths, 0, 0.0,
                                             False, None, 128, True) ** 2)

    def f_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v, lengths) ** 2)

    gf = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   err_msg=f"d{name}")


def test_gradients_match_xla_causal():
    q, k, v, lengths = _inputs(seed=3)

    def f_fused(q):
        return jnp.sum(fused_attention_train(q, k, v, lengths, 0, 0.0,
                                             True, None, 128, True) ** 2)

    def f_xla(q):
        return jnp.sum(xla_attention(q, k, v, lengths, causal=True) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(f_fused)(q)),
                               np.asarray(jax.grad(f_xla)(q)), atol=2e-4)


def _dropout_supported():
    try:
        q, k, v, lengths = _inputs(B=1, H=1)
        fused_attention_train(q, k, v, lengths, 7, 0.5, False, None, 128, True)
        return True
    except Exception:
        return False


needs_dropout = pytest.mark.skipif(
    not _dropout_supported(),
    reason="pallas PRNG not supported in interpret mode on this backend")


@needs_dropout
def test_dropout_deterministic_per_seed():
    q, k, v, lengths = _inputs()
    a = fused_attention_train(q, k, v, lengths, 7, 0.5, False, None, 128, True)
    b = fused_attention_train(q, k, v, lengths, 7, 0.5, False, None, 128, True)
    c = fused_attention_train(q, k, v, lengths, 8, 0.5, False, None, 128, True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


@needs_dropout
def test_dropout_mean_preserving():
    # inverted dropout keeps E[W] = A; averaged over many seeds the output
    # approaches the no-dropout output
    q, k, v, lengths = _inputs(B=1, H=1, seed=5)
    base = fused_attention_train(q, k, v, lengths, 0, 0.0, False, None, 128,
                                 True)
    acc = np.zeros_like(np.asarray(base))
    n = 48
    for s in range(n):
        acc += np.asarray(fused_attention_train(
            q, k, v, lengths, 1000 + s, 0.2, False, None, 128, True))
    np.testing.assert_allclose(acc / n, np.asarray(base), atol=0.12)


@needs_dropout
def test_dropout_gradient_finite_difference():
    # with the seed fixed, the function is deterministic and smooth in q:
    # autodiff (which regenerates the same mask in bwd) must match a
    # directional finite difference
    q, k, v, lengths = _inputs(B=1, H=1, seed=9)

    def f(q):
        return jnp.sum(fused_attention_train(q, k, v, lengths, 42, 0.3,
                                             False, None, 128, True) ** 2)

    g = np.asarray(jax.grad(f)(q))
    rng = np.random.default_rng(0)
    d = rng.standard_normal(q.shape).astype(np.float32)
    eps = 1e-3
    fd = (float(f(q + eps * d)) - float(f(q - eps * d))) / (2 * eps)
    ad = float(np.sum(g * d))
    np.testing.assert_allclose(ad, fd, rtol=2e-2)
