"""Fused decoder-layer Pallas kernel for the KV-cached decode loop.

Motivation (CLAUDE.md perf ledger): at B=256 / bucket 512 the XLA decode
step runs ~2.8 ms against a ~1.3 ms HBM-traffic floor. The gap is schedule
overhead — the `while_loop` body lowers to ~170 small HLO ops (layer norms,
reshapes, scale folds, (B,1,D)-sized GEMVs), each paying fixed per-op cost
on tensors far too small to hide it. This kernel fuses one ENTIRE decoder
layer — pre-norm self-attention with in-register int8 cache append, block-
diagonal-MXU cross-attention over the int8 cross cache, and the FFN — into
a single Pallas call, so a 6-layer step is 6 kernel launches plus the
sampling tail instead of ~170 ops. HBM sees exactly one read of the layer's
weights and caches per step (the DMA floor).

Semantics mirror the `use_mxu` XLA path in `decode.py:step` bit-for-bit up
to f32-accumulation differences:
  x  +=  SelfAttn(LN1(x))   with the current token's K/V quantized to int8
                            (per-token scales) and attended in-register;
  x  +=  CrossAttn(LN2(x))  as (H, Dkv) x (Dkv, Li) block-diagonal MXU dots
                            with K-scales folded into the query rows and
                            V-scales folded into the extracted output;
  x  +=  FFN(LN3(x))        relu((x @ w1 + b1)) @ w2 + b2.

Reference anchor: this is the hot loop of `plankassembly/models.py:284-307`
(the reference re-runs its full decoder per step with no cache at all).

Layouts (chosen for contiguous per-(batch-block) DMA):
  self K/V cache   (B, S, Dkv) int8, scales (B, S, kvH) f32
  cross K          (B, Dkv, Li) int8  (Dkv-major: MXU contraction layout)
  cross V          (B, Li, Dkv) int8, scales (B, kvH) f32
GQA (kvH < H) is handled by the same block-placement map as the XLA path:
query head h reads the Dh-wide column block of kv head h // G.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _layernorm(x, s, b, eps=1e-5):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean((x - m) * (x - m), axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * s + b


def _kernel(t_ref,  # scalar prefetch: current position
            x_ref, wqkv_ref, bqkv_ref, wos_ref, bos_ref,
            wqc_ref, bqc_ref, woc_ref, boc_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, ln_ref,
            kc_ref, vc_ref, ksc_ref, vsc_ref,
            ck_ref, cv_ref, cks_ref, cvs_ref, cbias_ref,
            xo_ref, nk_ref, nv_ref, nks_ref, nvs_ref,
            *, H, kvH, Dh, S, Li, sm_scale, cd):
    RB = x_ref.shape[0]
    D = H * Dh
    Dkv = kvH * Dh
    G = H // kvH
    t = t_ref[0]

    x = x_ref[...]                                   # (RB, D) f32
    ln = ln_ref[...]                                 # (6, D) f32

    # ---------------- self-attention ----------------
    h = _layernorm(x, ln[0], ln[1])
    qkv = jnp.dot(h.astype(cd), wqkv_ref[...],
                  preferred_element_type=jnp.float32) + bqkv_ref[0]
    q = qkv[:, :D].reshape(RB, H, Dh)
    k_t = qkv[:, D:D + Dkv].reshape(RB, kvH, Dh)
    v_t = qkv[:, D + Dkv:].reshape(RB, kvH, Dh)

    # int8-quantize the appended token (per-token, per-kv-head scales) and
    # attend with the DEQUANTIZED values so scores match the XLA path, which
    # reads this token back from the int8 cache.
    k_s = jnp.maximum(jnp.max(jnp.abs(k_t), axis=-1) / 127.0, 1e-8)
    v_s = jnp.maximum(jnp.max(jnp.abs(v_t), axis=-1) / 127.0, 1e-8)
    k_i8 = jnp.round(k_t / k_s[..., None]).astype(jnp.int8)
    v_i8 = jnp.round(v_t / v_s[..., None]).astype(jnp.int8)
    nk_ref[...] = k_i8.reshape(RB, Dkv)
    nv_ref[...] = v_i8.reshape(RB, Dkv)
    nks_ref[...] = k_s
    nvs_ref[...] = v_s
    k_tq = k_i8.astype(jnp.float32) * k_s[..., None]
    v_tq = v_i8.astype(jnp.float32) * v_s[..., None]

    kc = kc_ref[...].reshape(RB, S, kvH, Dh).astype(jnp.float32)
    vc = vc_ref[...].reshape(RB, S, kvH, Dh).astype(jnp.float32)
    ksc = ksc_ref[...]                               # (RB, S, kvH)
    vsc = vsc_ref[...]

    iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    self_bias = jnp.where(iota_s <= t, 0.0, -jnp.inf)      # (1, S)
    at_t = (iota_s == t)

    a_heads = []
    for h_ in range(H):
        g = h_ // G
        qh = q[:, h_, :]                             # (RB, Dh)
        sc_h = jnp.sum(qh[:, None, :] * kc[:, :, g, :], axis=-1)
        sc_h = sc_h * ksc[:, :, g] * sm_scale        # fold per-token K scale
        own = jnp.sum(qh * k_tq[:, g, :], axis=-1) * sm_scale
        sc_h = jnp.where(at_t, own[:, None], sc_h) + self_bias
        m = jnp.max(sc_h, axis=-1, keepdims=True)
        p = jnp.exp(sc_h - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)   # (RB, S)
        p_t = jnp.sum(jnp.where(at_t, p, 0.0), axis=-1)
        p_c = jnp.where(at_t, 0.0, p) * vsc[:, :, g]  # fold V scales
        o_h = jnp.sum(p_c[:, :, None] * vc[:, :, g, :], axis=1)
        a_heads.append(o_h + p_t[:, None] * v_tq[:, g, :])
    a = jnp.concatenate(a_heads, axis=-1)            # (RB, D)
    a = jnp.dot(a.astype(cd), wos_ref[...],
                preferred_element_type=jnp.float32) + bos_ref[0]
    x = x + a

    # ---------------- cross-attention (block-diagonal MXU) ----------------
    h2 = _layernorm(x, ln[2], ln[3])
    q2 = (jnp.dot(h2.astype(cd), wqc_ref[...],
                  preferred_element_type=jnp.float32)
          + bqc_ref[0]).reshape(RB, H, Dh)
    cks = cks_ref[...]                               # (RB, kvH)
    cvs = cvs_ref[...]
    # fold cross-K dequant scales into the query rows, then embed the H
    # per-head queries as block-diagonal rows of a (H, Dkv) matrix
    ih = jax.lax.broadcasted_iota(jnp.int32, (H, kvH), 0)
    ikv = jax.lax.broadcasted_iota(jnp.int32, (H, kvH), 1)
    eye_h = (ih // G == ikv).astype(jnp.float32)     # (H, kvH)
    ks_head = jnp.sum(eye_h[None] * cks[:, None, :], axis=-1)  # (RB, H)
    qh = q2 * ks_head[..., None]
    qblk = (qh[:, :, None, :] * eye_h[None, :, :, None]).reshape(RB, H, Dkv)

    cbias = cbias_ref[...]                           # (RB, Li)
    vs_head = jnp.sum(eye_h[None] * cvs[:, None, :], axis=-1)  # (RB, H)
    c_rows = []
    for r in range(RB):
        sc = jnp.dot(qblk[r].astype(cd), ck_ref[r].astype(cd),
                     preferred_element_type=jnp.float32) * sm_scale
        sc = sc + cbias[r][None, :]                  # (H, Li)
        m = jnp.max(sc, axis=-1, keepdims=True)
        p = jnp.exp(sc - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        of = jnp.dot(p.astype(cd), cv_ref[r].astype(cd),
                     preferred_element_type=jnp.float32)   # (H, Dkv)
        # keep each head's diagonal block, fold the V dequant scale
        ofh = (of.reshape(H, kvH, Dh) * eye_h[:, :, None]).sum(axis=1)
        c_rows.append((ofh * vs_head[r][:, None]).reshape(1, D))
    c = jnp.concatenate(c_rows, axis=0)              # (RB, D)
    c = jnp.dot(c.astype(cd), woc_ref[...],
                preferred_element_type=jnp.float32) + boc_ref[0]
    x = x + c

    # ---------------- feed-forward ----------------
    h3 = _layernorm(x, ln[4], ln[5])
    z = jnp.dot(h3.astype(cd), w1_ref[...],
                preferred_element_type=jnp.float32) + b1_ref[0]
    z = jnp.maximum(z, 0.0)
    z = jnp.dot(z.astype(cd), w2_ref[...],
                preferred_element_type=jnp.float32) + b2_ref[0]
    xo_ref[...] = x + z


@functools.partial(
    jax.jit,
    static_argnames=("H", "kvH", "Dh", "sm_scale", "block_rows", "cd",
                     "interpret"))
def fused_decoder_layer(x, t, wqkv, bqkv, wos, bos, wqc, bqc, woc, boc,
                        w1, b1, w2, b2, ln,
                        k_cache, v_cache, ks_cache, vs_cache,
                        ck, cv, cks, cvs, cbias, *,
                        H, kvH, Dh, sm_scale, block_rows=8,
                        cd=jnp.bfloat16, interpret=False):
    """One decoder layer of one decode step, fully fused.

    x        (B, D) f32        input activations (post-residual of layer-1)
    t        () int32          current decode position
    wqkv     (D, D+2*Dkv)      fused self-attention QKV projection
    ln       (6, D) f32        [n1.s, n1.b, n2.s, n2.b, n3.s, n3.b]
    k/v_cache (B, S, Dkv) int8 self-attention cache (t-th row stale)
    ks/vs_cache (B, S, kvH) f32 per-token cache scales
    ck       (B, Dkv, Li) int8 cross keys (Dkv-major)
    cv       (B, Li, Dkv) int8 cross values
    cks/cvs  (B, kvH) f32      cross K/V dequant scales
    cbias    (B, Li) f32       additive pad mask over encoder keys

    Returns (x_out (B,D) f32, nk (B,Dkv) int8, nv, nks (B,kvH) f32, nvs):
    the layer output plus this token's quantized K/V rows for the caller to
    scatter into the caches at position t.
    """
    B, D = x.shape
    S = k_cache.shape[1]
    Li = ck.shape[2]
    Dkv = kvH * Dh

    rb = min(block_rows, B)
    assert B % rb == 0, (B, rb)
    n = B // rb

    wqkv = wqkv.astype(cd)
    bqkv = bqkv.astype(jnp.float32).reshape(1, -1)
    wos, bos = wos.astype(cd), bos.astype(jnp.float32).reshape(1, -1)
    wqc, bqc = wqc.astype(cd), bqc.astype(jnp.float32).reshape(1, -1)
    woc, boc = woc.astype(cd), boc.astype(jnp.float32).reshape(1, -1)
    w1, b1 = w1.astype(cd), b1.astype(jnp.float32).reshape(1, -1)
    w2, b2 = w2.astype(cd), b2.astype(jnp.float32).reshape(1, -1)
    ln = ln.astype(jnp.float32)

    # index maps take (grid idx, *scalar_prefetch_refs) under
    # PrefetchScalarGridSpec — hence the *_ catch-all
    const = lambda shp: pl.BlockSpec(shp, lambda i, *_: tuple(0 for _ in shp))
    row = lambda *shp: pl.BlockSpec((rb, *shp),
                                    lambda i, *_: (i,) + (0,) * len(shp))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            row(D),                        # x
            const(wqkv.shape),             # weights: block-constant, one
            const(bqkv.shape),             # fetch for the whole grid
            const(wos.shape), const(bos.shape),
            const(wqc.shape), const(bqc.shape),
            const(woc.shape), const(boc.shape),
            const(w1.shape), const(b1.shape),
            const(w2.shape), const(b2.shape),
            const(ln.shape),
            row(S, Dkv), row(S, Dkv),      # self K/V cache
            row(S, kvH), row(S, kvH),      # self cache scales
            row(Dkv, Li), row(Li, Dkv),    # cross K/V
            row(kvH), row(kvH),            # cross scales
            row(Li),                       # cross bias
        ],
        out_specs=[
            row(D),                        # x_out
            row(Dkv), row(Dkv),            # nk, nv
            row(kvH), row(kvH),            # nks, nvs
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((B, D), jnp.float32),
        jax.ShapeDtypeStruct((B, Dkv), jnp.int8),
        jax.ShapeDtypeStruct((B, Dkv), jnp.int8),
        jax.ShapeDtypeStruct((B, kvH), jnp.float32),
        jax.ShapeDtypeStruct((B, kvH), jnp.float32),
    ]
    kernel = functools.partial(
        _kernel, H=H, kvH=kvH, Dh=Dh, S=S, Li=Li, sm_scale=sm_scale, cd=cd)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(jnp.asarray(t, jnp.int32).reshape(1), x.astype(jnp.float32),
      wqkv, bqkv, wos, bos, wqc, bqc, woc, boc, w1, b1, w2, b2, ln,
      k_cache, v_cache, ks_cache, vs_cache,
      ck, cv, cks.astype(jnp.float32), cvs.astype(jnp.float32),
      cbias.astype(jnp.float32))
