"""Parity tests for the fused decoder-layer Pallas kernel
(`ops/fused_decode.py`, run in interpret mode on CPU) against the XLA
block-diagonal MXU decode path it replaces on TPU."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plankassembly_tpu.decode import decode_from_memory
from plankassembly_tpu.models.model import ModelDims, encode, init_params
from tests.tiny import random_batch, tiny_config

CFG = tiny_config()


def _setup(kv=0, seed=0):
    cfg = dataclasses.replace(
        CFG, MODEL=dataclasses.replace(CFG.MODEL, NUM_KV_HEAD=kv))
    dims = ModelDims.from_config(cfg)
    params = init_params(jax.random.PRNGKey(seed), dims)
    batch = {k: jnp.asarray(v) for k, v in
             random_batch(CFG, batch_size=2, seed=seed).items()
             if k.startswith("input")}
    memory = encode(params, batch, dims, deterministic=True,
                    compute_dtype=jnp.float32)
    return params, dims, memory, batch["input_mask"]


def test_fused_matches_mxu_path():
    """Full greedy decode: the fused kernel reproduces the int8 mxu path's
    tokens and pointers (identical quantization, f32 accumulation)."""
    params, dims, memory, mask = _setup()
    ref = decode_from_memory(params, memory, mask, dims,
                             compute_dtype=jnp.float32, kv_quant=True,
                             cross_impl="mxu")
    got = decode_from_memory(params, memory, mask, dims,
                             compute_dtype=jnp.float32,
                             cross_impl="fused-interpret")
    np.testing.assert_array_equal(np.asarray(got["samples"]),
                                  np.asarray(ref["samples"]))
    np.testing.assert_array_equal(np.asarray(got["attach"]),
                                  np.asarray(ref["attach"]))


def test_fused_rejects_gqa():
    params, dims, memory, mask = _setup(kv=1)
    with pytest.raises(ValueError, match="MHA"):
        decode_from_memory(params, memory, mask, dims,
                           compute_dtype=jnp.float32,
                           cross_impl="fused-interpret")


def test_fused_layer_against_reference_math():
    """Single kernel call vs a straight-line numpy reimplementation of one
    decoder layer at a mid-sequence position (flat head-pair layouts)."""
    from plankassembly_tpu.ops.cross_decode import quantize_rows
    from plankassembly_tpu.ops.fused_decode import fused_decoder_layer

    rng = np.random.default_rng(0)
    B, H, Dh, S, Li = 4, 2, 8, 16, 32
    D = H * Dh
    t = 5
    f32 = jnp.float32

    x = jnp.asarray(rng.standard_normal((B, D)), f32)
    wqkv = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.2, f32)
    bqkv = jnp.asarray(rng.standard_normal(3 * D) * 0.1, f32)
    wos = jnp.asarray(rng.standard_normal((D, D)) * 0.2, f32)
    bos = jnp.asarray(rng.standard_normal(D) * 0.1, f32)
    wqc = jnp.asarray(rng.standard_normal((D, D)) * 0.2, f32)
    bqc = jnp.asarray(rng.standard_normal(D) * 0.1, f32)
    woc = jnp.asarray(rng.standard_normal((D, D)) * 0.2, f32)
    boc = jnp.asarray(rng.standard_normal(D) * 0.1, f32)
    w1 = jnp.asarray(rng.standard_normal((D, 2 * D)) * 0.2, f32)
    b1 = jnp.asarray(rng.standard_normal(2 * D) * 0.1, f32)
    w2 = jnp.asarray(rng.standard_normal((2 * D, D)) * 0.2, f32)
    b2 = jnp.asarray(rng.standard_normal(D) * 0.1, f32)
    ln = jnp.asarray(rng.standard_normal((6, D)) * 0.3 + 1.0, f32)

    # prior cache contents for positions < t (already int8-quantized)
    P, W = H // 2, 2 * Dh
    k_prior = rng.standard_normal((B, S, H, Dh)).astype(np.float32)
    v_prior = rng.standard_normal((B, S, H, Dh)).astype(np.float32)
    kq, ks = quantize_rows(jnp.asarray(k_prior), axes=(3,))
    vq, vs = quantize_rows(jnp.asarray(v_prior), axes=(3,))
    k_cache = kq.reshape(B, S, P, W).transpose(0, 2, 1, 3)  # (B, P, S, W)
    v_cache = vq.reshape(B, S, P, W).transpose(0, 2, 1, 3)
    ks_cache = ks.reshape(B, S, H).transpose(2, 0, 1)       # (H, B, S)
    vs_cache = vs.reshape(B, S, H).transpose(2, 0, 1)

    mem = rng.standard_normal((B, Li, H, Dh)).astype(np.float32)
    ckq, cks = quantize_rows(jnp.asarray(mem), axes=(1, 3))
    cv_src = rng.standard_normal((B, Li, H, Dh)).astype(np.float32)
    cvq, cvs = quantize_rows(jnp.asarray(cv_src), axes=(1, 3))
    pm = lambda a: (a.reshape(B, Li, P, W).transpose(0, 2, 1, 3)
                    .reshape(B, P, 1, Li, W))               # NCH=1
    cbias = jnp.zeros((1, B, Li), f32)

    sm = 1.0 / np.sqrt(Dh)
    xo, nk, nv, nks, nvs = fused_decoder_layer(
        x, t, wqkv, bqkv, wos, bos, wqc, bqc, woc, boc, w1, b1, w2, b2, ln,
        k_cache, v_cache, ks_cache, vs_cache,
        pm(ckq), pm(cvq),
        cks.reshape(B, H), cvs.reshape(B, H), cbias,
        H=H, Dh=Dh, sm_scale=sm, cd=jnp.float32, interpret=True,
        block_rows=2)
    nk = jnp.transpose(nk, (1, 0, 2))                       # (B, P, W)

    # ---- straight-line reference ----
    def lnorm(v, s, b):
        m = v.mean(-1, keepdims=True)
        return (v - m) / np.sqrt(v.var(-1, keepdims=True) + 1e-5) * s + b

    xn = np.asarray(x)
    h = lnorm(xn, np.asarray(ln[0]), np.asarray(ln[1]))
    qkv = h @ np.asarray(wqkv) + np.asarray(bqkv)
    q = qkv[:, :D].reshape(B, H, Dh)
    k_t = qkv[:, D:2 * D].reshape(B, H, Dh)
    v_t = qkv[:, 2 * D:].reshape(B, H, Dh)
    k_s = np.maximum(np.abs(k_t).max(-1) / 127.0, 1e-8)
    v_s = np.maximum(np.abs(v_t).max(-1) / 127.0, 1e-8)
    k_i8 = np.asarray(jnp.round(jnp.asarray(k_t / k_s[..., None])), np.int8)
    v_i8 = np.asarray(jnp.round(jnp.asarray(v_t / v_s[..., None])), np.int8)
    np.testing.assert_array_equal(np.asarray(nk).reshape(B, H, Dh), k_i8)
    np.testing.assert_allclose(np.asarray(nks), k_s, rtol=1e-6)

    kc = (np.asarray(k_cache).transpose(0, 2, 1, 3).reshape(B, S, H, Dh)
          .astype(np.float32)
          * np.asarray(ks_cache).transpose(1, 2, 0)[..., None])
    vc = (np.asarray(v_cache).transpose(0, 2, 1, 3).reshape(B, S, H, Dh)
          .astype(np.float32)
          * np.asarray(vs_cache).transpose(1, 2, 0)[..., None])
    kc[:, t] = k_i8 * k_s[..., None]
    vc[:, t] = v_i8 * v_s[..., None]
    att = np.zeros((B, H, Dh), np.float32)
    for h_ in range(H):
        sc = np.einsum("bd,bsd->bs", q[:, h_], kc[:, :, h_]) * sm
        sc[:, t + 1:] = -np.inf
        p = np.exp(sc - sc.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        att[:, h_] = np.einsum("bs,bsd->bd", p, vc[:, :, h_])
    xn = xn + att.reshape(B, D) @ np.asarray(wos) + np.asarray(bos)

    h2 = lnorm(xn, np.asarray(ln[2]), np.asarray(ln[3]))
    q2 = (h2 @ np.asarray(wqc) + np.asarray(bqc)).reshape(B, H, Dh)
    ckf = (np.asarray(ckq).astype(np.float32)
           * np.asarray(cks).reshape(B, 1, H, 1))
    cvf = (np.asarray(cvq).astype(np.float32)
           * np.asarray(cvs).reshape(B, 1, H, 1))
    catt = np.zeros((B, H, Dh), np.float32)
    for h_ in range(H):
        sc = np.einsum("bd,bld->bl", q2[:, h_], ckf[:, :, h_]) * sm
        p = np.exp(sc - sc.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        catt[:, h_] = np.einsum("bl,bld->bd", p, cvf[:, :, h_])
    xn = xn + catt.reshape(B, D) @ np.asarray(woc) + np.asarray(boc)

    h3 = lnorm(xn, np.asarray(ln[4]), np.asarray(ln[5]))
    z = np.maximum(h3 @ np.asarray(w1) + np.asarray(b1), 0.0)
    xn = xn + z @ np.asarray(w2) + np.asarray(b2)

    np.testing.assert_allclose(np.asarray(xo), xn, rtol=2e-4, atol=2e-4)
