"""Parity tests for the fused decoder-layer Pallas kernel
(`ops/fused_decode.py`, run in interpret mode on CPU).

The kernel quantizes the query and probability matrices to int8 for its
MXU dots (the K/V caches are bit-identical with the XLA mxu path), so
greedy decode agrees with the mxu path on almost but not exactly every
token; the single-layer test instead checks EXACT equivalence against a
numpy oracle of the same int8 algorithm."""
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


def test_fused_agrees_with_mxu_path():
    """Full greedy decode: near-total token agreement with the int8 mxu
    path (differences only from the kernel's extra q/p quantization)."""
    params, dims, memory, mask = _setup()
    ref = decode_from_memory(params, memory, mask, dims,
                             compute_dtype=jnp.float32, kv_quant=True,
                             cross_impl="mxu")
    got = decode_from_memory(params, memory, mask, dims,
                             compute_dtype=jnp.float32,
                             cross_impl="fused-interpret")
    a = np.asarray(got["samples"])
    b = np.asarray(ref["samples"])
    agree = float((a == b).mean())
    assert agree >= 0.8, (agree, a, b)


def test_fused_rejects_gqa():
    params, dims, memory, mask = _setup(kv=1)
    with pytest.raises(ValueError, match="MHA"):
        decode_from_memory(params, memory, mask, dims,
                           compute_dtype=jnp.float32,
                           cross_impl="fused-interpret")


def _q_rows(x):
    s = np.maximum(np.abs(x).max(-1, keepdims=True) / 127.0, 1e-8)
    return np.asarray(jnp.round(jnp.asarray(x / s)), np.int8), s


def test_fused_layer_against_int8_oracle():
    """Single kernel call vs a numpy reimplementation of the SAME int8
    block-diagonal algorithm — exact up to f32 rounding."""
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
    k_prior = rng.standard_normal((B, S, H, Dh)).astype(np.float32)
    v_prior = rng.standard_normal((B, S, H, Dh)).astype(np.float32)
    kq, ks = quantize_rows(jnp.asarray(k_prior), axes=(3,))
    vq, vs = quantize_rows(jnp.asarray(v_prior), axes=(3,))
    kt_cache = kq.reshape(B, S, D).transpose(0, 2, 1)       # (B, D, S)
    v_cache = vq.reshape(B, S, D)
    ks_cache = ks.reshape(B, S, H).transpose(0, 2, 1)       # (B, H, S)
    vs_cache = vs.reshape(B, S, H).transpose(0, 2, 1)

    mem = rng.standard_normal((B, Li, H, Dh)).astype(np.float32)
    ckq, cks = quantize_rows(jnp.asarray(mem), axes=(1, 3))
    cv_src = rng.standard_normal((B, Li, H, Dh)).astype(np.float32)
    cvq, cvs = quantize_rows(jnp.asarray(cv_src), axes=(1, 3))
    ck = (ckq.reshape(B, Li, D).transpose(0, 2, 1)
          .reshape(B, D, 1, Li).transpose(0, 2, 1, 3))      # (B, 1, D, Li)
    cv = cvq.reshape(B, 1, Li, D)
    cbias = jnp.zeros((1, B, Li), f32)

    sm = 1.0 / np.sqrt(Dh)
    xo, nk, nv, nks, nvs = fused_decoder_layer(
        x, t, wqkv, bqkv, wos, bos, wqc, bqc, woc, boc, w1, b1, w2, b2, ln,
        kt_cache, v_cache, ks_cache, vs_cache,
        ck, cv, cks.reshape(B, H), cvs.reshape(B, H), cbias,
        H=H, Dh=Dh, sm_scale=sm, cd=jnp.float32, interpret=True,
        block_rows=2)

    # ---- numpy oracle of the same int8 algorithm ----
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

    # int8 caches incl. the appended token (dequantized forms)
    kc_i8 = np.asarray(kq)                        # (B, S, H, Dh)
    vc_i8 = np.asarray(vq)
    ksc = np.asarray(ks_cache)                    # (B, H, S)
    vsc = np.asarray(vs_cache)

    def self_att(qv):
        # per (r, h): int8-quantize the query row, dot vs int8 K cache
        att = np.zeros((B, H, D), np.float32)
        for r in range(B):
            for h_ in range(H):
                qrow = qv[r, h_]
                qs = np.maximum(np.abs(qrow).max() / 127.0, 1e-8)
                qi = np.asarray(jnp.round(jnp.asarray(qrow / qs)), np.int8)
                sc = (kc_i8[r, :, h_].astype(np.int32)
                      @ qi.astype(np.int32)).astype(np.float32)
                sc = sc * qs * sm * ksc[r, h_]
                own = float(qrow @ (k_i8[r, h_].astype(np.float32)
                                    * k_s[r, h_])) * sm
                sc[t] = own
                sc[t + 1:] = -np.inf
                p = np.exp(sc - sc.max())
                p /= p.sum()
                pt = p[t]
                p = p.copy()
                p[t] = 0.0
                p = p * vsc[r, h_]
                ps = np.maximum(np.abs(p).max() / 127.0, 1e-8)
                pi = np.asarray(jnp.round(jnp.asarray(p / ps)), np.int8)
                o = (pi.astype(np.int32)
                     @ vc_i8[r].reshape(S, D).astype(np.int32)
                     ).astype(np.float32) * ps
                vtq_full = (v_i8[r].astype(np.float32)
                            * v_s[r][:, None]).reshape(D)
                o = o + pt * vtq_full
                att[r, h_] = o
        # keep each head's diagonal Dh block
        out = np.zeros((B, D), np.float32)
        for h_ in range(H):
            out[:, h_ * Dh:(h_ + 1) * Dh] = att[:, h_, h_ * Dh:(h_ + 1) * Dh]
        return out

    xn = xn + self_att(q) @ np.asarray(wos) + np.asarray(bos)

    h2 = lnorm(xn, np.asarray(ln[2]), np.asarray(ln[3]))
    q2 = (h2 @ np.asarray(wqc) + np.asarray(bqc)).reshape(B, H, Dh)
    ck_i8 = np.asarray(ckq)                       # (B, Li, H, Dh)
    cv_i8 = np.asarray(cvq)
    cksn = np.asarray(cks).reshape(B, H)
    cvsn = np.asarray(cvs).reshape(B, H)

    catt = np.zeros((B, H, D), np.float32)
    for r in range(B):
        for h_ in range(H):
            qrow = q2[r, h_]
            qs = np.maximum(np.abs(qrow).max() / 127.0, 1e-8)
            qi = np.asarray(jnp.round(jnp.asarray(qrow / qs)), np.int8)
            sc = (ck_i8[r, :, h_].astype(np.int32)
                  @ qi.astype(np.int32)).astype(np.float32)
            sc = sc * qs * sm * cksn[r, h_]
            m = sc.max()
            p = np.exp(sc - m)
            l = p.sum()
            ps = np.maximum(np.abs(p).max() / 127.0, 1e-8)
            pi = np.asarray(jnp.round(jnp.asarray(p / ps)), np.int8)
            o = (pi.astype(np.int32)
                 @ cv_i8[r].reshape(Li, D).astype(np.int32)
                 ).astype(np.float32) * ps
            catt[r, h_] = o * cvsn[r, h_] / l
    cout = np.zeros((B, D), np.float32)
    for h_ in range(H):
        cout[:, h_ * Dh:(h_ + 1) * Dh] = catt[:, h_, h_ * Dh:(h_ + 1) * Dh]
    xn = xn + cout @ np.asarray(woc) + np.asarray(boc)

    h3 = lnorm(xn, np.asarray(ln[4]), np.asarray(ln[5]))
    z = np.maximum(h3 @ np.asarray(w1) + np.asarray(b1), 0.0)
    xn = xn + z @ np.asarray(w2) + np.asarray(b2)

    np.testing.assert_allclose(np.asarray(xo), xn, rtol=3e-4, atol=3e-4)
