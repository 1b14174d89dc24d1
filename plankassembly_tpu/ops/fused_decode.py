"""Fused decoder-layer Pallas kernel for the KV-cached decode loop.

Motivation (CLAUDE.md perf ledger): at B=256 / bucket 512 the XLA decode
step runs ~2.8 ms against a ~1.3 ms HBM-traffic floor. The gap is schedule
overhead — the `while_loop` body lowers to ~170 small HLO ops (layer norms,
reshapes, scale folds, (B,1,D)-sized GEMVs), each paying fixed per-op cost
on tensors far too small to hide it. This kernel fuses a decoder layer's
self-attention (with in-register int8 cache append) and cross-attention
into ONE Pallas call (+ a small FFN kernel), so a 6-layer step is 12 kernel
launches plus the sampling tail instead of ~170 ops. HBM sees exactly one
read of the layer's weights and caches per step (the DMA floor).

Mosaic constraints this kernel is built around (each validated by compile
probes on the target toolchain):
  * vector reshapes that split the lane dim are rejected ((B, D) ->
    (B, H, Dh)), and slices must be 128-lane aligned — with Dh = 64 a
    per-head layout is unusable. Heads are processed in PAIRS: one
    128-lane block holds heads (2p, 2p+1); per-head score/output
    separation uses static even/odd half-masks + masked reductions. Exact
    for MHA (kvH == H); GQA decode stays on the XLA mxu path (already 4x
    lighter on HBM by construction).
  * the Mosaic stack allocator does not reuse temporaries across UNROLLED
    python loops — an unrolled pairs x chunks attention overflows the
    16 MB scoped VMEM limit on live (RB, Li, 128) products alone. So both
    loops are `lax.fori_loop`s, every pair/chunk-varying tensor carries
    its loop axis as a LEADING (untiled) dimension (dynamic indexing of
    tiled axes is unsupported), and cross-attention runs a two-pass
    chunked softmax with a (NCH, RB, CH) score scratch.
  * the auto-pipeline allocates ~4 buffers per streamed input, so only
    tiny operands ride it; weights are ANY-space operands copied to VMEM
    scratch once at grid step 0, self-cache blocks are copied per grid
    step (single-buffered, ~1 MB), and the dominant cross-K/V stream is
    explicitly double-buffered across grid steps (2 slots, 8.4 MB).
  * attention contractions are 3-D broadcast-multiply-reduces on the VPU
    (batched `dot_general` is unsupported); projections are 2-D MXU dots,
    one per pair, with pair-sliced weights stacked on a leading axis.

Semantics mirror the `use_mxu, kv_quant=True` XLA path in `decode.py:step`
up to f32-accumulation order. Reference anchor: this replaces the hot loop
of `plankassembly/models.py:284-307` (which re-runs the full decoder per
step with no cache at all).

Layouts (kvH == H, W = 2*Dh = one head pair, P = H//2):
  self K/V cache   (B, P, S, W) int8, per-token scales (H, B, S) f32
  cross K/V        (B, P, NCH, CH, W) int8, scales (B, H) f32
  cross bias       (NCH, B, CH) f32
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_N_W = 9  # wqkv_p bqkv_p wos_p bos wqc_p bqc_p woc_p boc ln


def _kernel(t_ref,  # scalar prefetch: current position
            x_ref,
            wqkv_h, bqkv_h, wos_h, bos_h, wqc_h, bqc_h, woc_h, boc_h,
            ln_h,                                    # ANY (HBM) weights
            kc_h, vc_h, ksc_h, vsc_h,                # ANY self-cache arrays
            ck_h, cv_h,                              # ANY cross K/V arrays
            cks_ref, cvs_ref, cbias_ref,             # pipelined (small)
            xo_ref, nk_ref, nv_ref, nks_ref, nvs_ref,
            wqkv_s, bqkv_s, wos_s, bos_s, wqc_s, bqc_s, woc_s, boc_s,
            ln_s,                                    # VMEM weight scratch
            kc_s, vc_s, ksc_s, vsc_s,                # VMEM self-cache blocks
            ck_s, cv_s,                              # (2, RB, P, NCH, CH, W)
            sce_s, sco_s,                            # (NCH, RB, CH) scores
            sems,
            *, H, Dh, S, Li, CH, sm_scale, cd):
    RB = x_ref.shape[0]
    D = H * Dh
    W = 2 * Dh                                       # lanes per head pair
    P = H // 2
    NCH = Li // CH
    t = t_ref[0]
    i = pl.program_id(0)
    f32 = jnp.float32

    w_pairs = [(wqkv_h, wqkv_s), (bqkv_h, bqkv_s), (wos_h, wos_s),
               (bos_h, bos_s), (wqc_h, wqc_s), (bqc_h, bqc_s),
               (woc_h, woc_s), (boc_h, boc_s), (ln_h, ln_s)]

    @pl.when(i == 0)
    def _load_weights():
        for j, (src, dst) in enumerate(w_pairs):
            pltpu.make_async_copy(src, dst, sems.at[j]).start()
        for j, (src, dst) in enumerate(w_pairs):
            pltpu.make_async_copy(src, dst, sems.at[j]).wait()

    # cross K/V: explicit 2-slot double buffering across grid steps
    n_blocks = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)
    S_CK, S_CV = _N_W + 4, _N_W + 6  # sem indices: two slots each

    @pl.when(i == 0)
    def _load_first_cross():
        r0 = pl.dslice(0, RB)
        pltpu.make_async_copy(ck_h.at[r0], ck_s.at[0], sems.at[S_CK]).start()
        pltpu.make_async_copy(cv_h.at[r0], cv_s.at[0], sems.at[S_CV]).start()
        pltpu.make_async_copy(ck_h.at[r0], ck_s.at[0], sems.at[S_CK]).wait()
        pltpu.make_async_copy(cv_h.at[r0], cv_s.at[0], sems.at[S_CV]).wait()

    @pl.when(i + 1 < n_blocks)
    def _prefetch_next_cross():
        rn = pl.dslice((i + 1) * RB, RB)
        pltpu.make_async_copy(ck_h.at[rn], ck_s.at[nxt],
                              sems.at[S_CK + nxt]).start()
        pltpu.make_async_copy(cv_h.at[rn], cv_s.at[nxt],
                              sems.at[S_CV + nxt]).start()

    @pl.when(i > 0)
    def _wait_current_cross():
        ri = pl.dslice(i * RB, RB)
        pltpu.make_async_copy(ck_h.at[ri], ck_s.at[slot],
                              sems.at[S_CK + slot]).wait()
        pltpu.make_async_copy(cv_h.at[ri], cv_s.at[slot],
                              sems.at[S_CV + slot]).wait()

    # this block's self-cache rows: single-buffered (~1 MB, hidden behind
    # the cross prefetch)
    rows = pl.dslice(i * RB, RB)
    cache_pairs = [(kc_h.at[rows], kc_s), (vc_h.at[rows], vc_s),
                   (ksc_h.at[:, rows], ksc_s), (vsc_h.at[:, rows], vsc_s)]
    for j, (src, dst) in enumerate(cache_pairs):
        pltpu.make_async_copy(src, dst, sems.at[_N_W + j]).start()
    for j, (src, dst) in enumerate(cache_pairs):
        pltpu.make_async_copy(src, dst, sems.at[_N_W + j]).wait()

    x = x_ref[...]                                   # (RB, D) f32

    def layernorm(v, row):
        s = ln_s[row:row + 1, :]                     # (1, D)
        b = ln_s[row + 1:row + 2, :]
        m = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - m) * (v - m), axis=-1, keepdims=True)
        return (v - m) * jax.lax.rsqrt(var + 1e-5) * s + b

    # static even/odd half masks over one pair block
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    m_e = (iota_w < Dh).astype(f32)                  # (1, W)
    m_o = 1.0 - m_e
    me_cd, mo_cd = m_e.astype(cd), m_o.astype(cd)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, H), 1)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    self_bias = jnp.where(iota_s <= t, 0.0, -jnp.inf)      # (1, S)
    at_t = (iota_s == t)

    def halves(v):
        return (jax.lax.slice_in_dim(v, 0, W, axis=1),
                jax.lax.slice_in_dim(v, W, 2 * W, axis=1),
                jax.lax.slice_in_dim(v, 2 * W, 3 * W, axis=1))

    # ---------------- self-attention (single chunk: S <= 128) ----------
    h1 = layernorm(x, 0).astype(cd)

    def self_body(p, carry):
        acc, nks, nvs = carry
        qkv_p = jnp.dot(h1, wqkv_s[p],
                        preferred_element_type=f32) + bqkv_s[p, 0:1]
        q_p, k_t, v_t = halves(qkv_p)                # (RB, W) each
        # int8-quantize the appended token per half-head; attend with the
        # DEQUANTIZED values so scores match the XLA path, which reads this
        # token back from the int8 cache
        ks_e = jnp.maximum(
            jnp.max(jnp.abs(k_t) * m_e, axis=-1, keepdims=True) / 127., 1e-8)
        ks_o = jnp.maximum(
            jnp.max(jnp.abs(k_t) * m_o, axis=-1, keepdims=True) / 127., 1e-8)
        vs_e = jnp.maximum(
            jnp.max(jnp.abs(v_t) * m_e, axis=-1, keepdims=True) / 127., 1e-8)
        vs_o = jnp.maximum(
            jnp.max(jnp.abs(v_t) * m_o, axis=-1, keepdims=True) / 127., 1e-8)
        k_scale = ks_e * m_e + ks_o * m_o            # (RB, W)
        v_scale = vs_e * m_e + vs_o * m_o
        k_i8 = jnp.round(k_t / k_scale).astype(jnp.int8)
        v_i8 = jnp.round(v_t / v_scale).astype(jnp.int8)
        nk_ref[p] = k_i8
        nv_ref[p] = v_i8
        nks = nks + ks_e * (iota_h == 2 * p) + ks_o * (iota_h == 2 * p + 1)
        nvs = nvs + vs_e * (iota_h == 2 * p) + vs_o * (iota_h == 2 * p + 1)
        k_tq = k_i8.astype(f32) * k_scale
        v_tq = v_i8.astype(f32) * v_scale

        kc_p = kc_s[:, p].astype(cd)                 # (RB, S, W)
        prod = q_p.astype(cd)[:, None, :] * kc_p
        sc_e = jnp.sum(prod * me_cd[None], axis=-1, dtype=f32)
        sc_o = jnp.sum(prod * mo_cd[None], axis=-1, dtype=f32)
        sc_e = sc_e * ksc_s[2 * p] * sm_scale        # per-token K scales
        sc_o = sc_o * ksc_s[2 * p + 1] * sm_scale
        own_e = jnp.sum(q_p * k_tq * m_e, axis=-1, keepdims=True) * sm_scale
        own_o = jnp.sum(q_p * k_tq * m_o, axis=-1, keepdims=True) * sm_scale
        sc_e = jnp.where(at_t, own_e, sc_e) + self_bias
        sc_o = jnp.where(at_t, own_o, sc_o) + self_bias
        p_e = jnp.exp(sc_e - jnp.max(sc_e, axis=-1, keepdims=True))
        p_e = p_e / jnp.sum(p_e, axis=-1, keepdims=True)
        p_o = jnp.exp(sc_o - jnp.max(sc_o, axis=-1, keepdims=True))
        p_o = p_o / jnp.sum(p_o, axis=-1, keepdims=True)
        pt_e = jnp.sum(jnp.where(at_t, p_e, 0.0), axis=-1, keepdims=True)
        pt_o = jnp.sum(jnp.where(at_t, p_o, 0.0), axis=-1, keepdims=True)
        p_e = jnp.where(at_t, 0.0, p_e) * vsc_s[2 * p]       # fold V scales
        p_o = jnp.where(at_t, 0.0, p_o) * vsc_s[2 * p + 1]
        pmix = (p_e[:, :, None] * m_e[None]
                + p_o[:, :, None] * m_o[None]).astype(cd)
        vc_p = vc_s[:, p].astype(cd)
        o_p = jnp.sum(pmix * vc_p, axis=1, dtype=f32)        # (RB, W)
        o_p = o_p + (pt_e * m_e + pt_o * m_o) * v_tq
        acc = acc + jnp.dot(o_p.astype(cd), wos_s[p],
                            preferred_element_type=f32)
        return acc, nks, nvs

    acc0 = (jnp.zeros((RB, D), f32), jnp.zeros((RB, H), f32),
            jnp.zeros((RB, H), f32))
    acc_a, nks, nvs = jax.lax.fori_loop(0, P, self_body, acc0)
    nks_ref[...] = nks
    nvs_ref[...] = nvs
    x = x + acc_a + bos_s[0:1, :]

    # ---------------- cross-attention (two-pass chunked softmax) --------
    h2 = layernorm(x, 2).astype(cd)
    cks = cks_ref[...]                               # (RB, H)
    cvs = cvs_ref[...]

    def cross_body(p, acc):
        q2_p = jnp.dot(h2, wqc_s[p],
                       preferred_element_type=f32) + bqc_s[p, 0:1]
        # per-head dequant scales, extracted by mask-reduce
        cks_e = jnp.sum(cks * (iota_h == 2 * p), axis=-1, keepdims=True)
        cks_o = jnp.sum(cks * (iota_h == 2 * p + 1), axis=-1, keepdims=True)
        cvs_e = jnp.sum(cvs * (iota_h == 2 * p), axis=-1, keepdims=True)
        cvs_o = jnp.sum(cvs * (iota_h == 2 * p + 1), axis=-1, keepdims=True)
        q2p = (q2_p * (cks_e * m_e + cks_o * m_o)).astype(cd)

        def pass1(ci, carry):
            m_em, m_om = carry
            kb = ck_s[slot, :, p, ci].astype(cd)     # (RB, CH, W)
            prod = q2p[:, None, :] * kb
            se = jnp.sum(prod * me_cd[None], axis=-1, dtype=f32) * sm_scale
            so = jnp.sum(prod * mo_cd[None], axis=-1, dtype=f32) * sm_scale
            bias = cbias_ref[ci]                     # (RB, CH)
            se = se + bias
            so = so + bias
            sce_s[ci] = se
            sco_s[ci] = so
            m_em = jnp.maximum(m_em, jnp.max(se, axis=-1, keepdims=True))
            m_om = jnp.maximum(m_om, jnp.max(so, axis=-1, keepdims=True))
            return m_em, m_om

        neg = jnp.full((RB, 1), -jnp.inf, f32)
        m_em, m_om = jax.lax.fori_loop(0, NCH, pass1, (neg, neg))

        def pass2(ci, carry):
            l_e, l_o, o_acc = carry
            pe = jnp.exp(sce_s[ci] - m_em)           # (RB, CH)
            po = jnp.exp(sco_s[ci] - m_om)
            l_e = l_e + jnp.sum(pe, axis=-1, keepdims=True)
            l_o = l_o + jnp.sum(po, axis=-1, keepdims=True)
            vb = cv_s[slot, :, p, ci].astype(cd)
            pmix = (pe[:, :, None] * m_e[None]
                    + po[:, :, None] * m_o[None]).astype(cd)
            o_acc = o_acc + jnp.sum(pmix * vb, axis=1, dtype=f32)
            return l_e, l_o, o_acc

        z = jnp.zeros((RB, 1), f32)
        l_e, l_o, o_acc = jax.lax.fori_loop(
            0, NCH, pass2, (z, z, jnp.zeros((RB, W), f32)))
        # normalize per half and fold the V dequant scale
        o_p = o_acc * ((cvs_e / l_e) * m_e + (cvs_o / l_o) * m_o)
        return acc + jnp.dot(o_p.astype(cd), woc_s[p],
                             preferred_element_type=f32)

    acc_c = jax.lax.fori_loop(0, P, cross_body, jnp.zeros((RB, D), f32))
    xo_ref[...] = x + acc_c + boc_s[0:1, :]


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, ln_ref, xo_ref, *, cd):
    x = x_ref[...]                                   # (RB, D) f32
    s = ln_ref[0:1, :]
    b = ln_ref[1:2, :]
    m = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - m) * (x - m), axis=-1, keepdims=True)
    h = (x - m) * jax.lax.rsqrt(var + 1e-5) * s + b
    z = jnp.dot(h.astype(cd), w1_ref[...],
                preferred_element_type=jnp.float32) + b1_ref[0:1, :]
    z = jnp.maximum(z, 0.0)
    z = jnp.dot(z.astype(cd), w2_ref[...],
                preferred_element_type=jnp.float32) + b2_ref[0:1, :]
    xo_ref[...] = x + z


@functools.partial(jax.jit,
                   static_argnames=("block_rows", "cd", "interpret"))
def fused_ffn(x, w1, b1, w2, b2, ln3, *, block_rows=64, cd=jnp.bfloat16,
              interpret=False):
    """Pre-norm FFN sublayer (LN3 -> w1 -> relu -> w2 -> residual) as one
    kernel. ln3 (2, D) = [n3.scale, n3.bias]."""
    B, D = x.shape
    rb = min(block_rows, B)
    assert B % rb == 0, (B, rb)
    w1c, b1c = w1.astype(cd), b1.astype(jnp.float32).reshape(1, -1)
    w2c, b2c = w2.astype(cd), b2.astype(jnp.float32).reshape(1, -1)
    ln3 = ln3.astype(jnp.float32)
    const = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp))
    return pl.pallas_call(
        functools.partial(_ffn_kernel, cd=cd),
        grid=(B // rb,),
        in_specs=[
            pl.BlockSpec((rb, D), lambda i: (i, 0)),
            const(w1c.shape), const(b1c.shape),
            const(w2c.shape), const(b2c.shape), const(ln3.shape),
        ],
        out_specs=pl.BlockSpec((rb, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.float32), w1c, b1c, w2c, b2c, ln3)


@functools.partial(
    jax.jit,
    static_argnames=("H", "Dh", "sm_scale", "block_rows", "cd", "interpret"))
def fused_decoder_layer(x, t, wqkv, bqkv, wos, bos, wqc, bqc, woc, boc,
                        w1, b1, w2, b2, ln,
                        k_cache, v_cache, ks_cache, vs_cache,
                        ck, cv, cks, cvs, cbias, *,
                        H, Dh, sm_scale, block_rows=8,
                        cd=jnp.bfloat16, interpret=False):
    """One decoder layer of one decode step: a fused attention kernel plus
    `fused_ffn` (MHA only: kvH == H; W = 2*Dh, P = H//2).

    x        (B, D) f32        input activations (post-residual of layer-1)
    t        () int32          current decode position
    wqkv     (D, 3D)           fused self-attention QKV projection
    ln       (6, D) f32        [n1.s, n1.b, n2.s, n2.b, n3.s, n3.b]
    k/v_cache (B, P, S, W) int8  pair-major self cache (t-th row stale)
    ks/vs_cache (H, B, S) f32  per-token cache scales (head-leading)
    ck/cv    (B, P, NCH, CH, W) int8  pair-major chunked cross keys/values
    cks/cvs  (B, H) f32        cross K/V dequant scales
    cbias    (NCH, B, CH) f32  chunk-leading pad mask over encoder keys

    Returns (x_out (B,D) f32, nk (P,B,W) int8, nv, nks (B,H) f32, nvs):
    the layer output plus this token's quantized K/V rows for the caller
    to scatter into the caches at position t.
    """
    assert H % 2 == 0, "fused kernel processes heads in pairs"
    B, D = x.shape
    P = H // 2
    W = 2 * Dh
    S = k_cache.shape[2]
    NCH, CH = cbias.shape[0], cbias.shape[2]
    Li = NCH * CH
    assert S <= 128, "self-attention is single-chunk"

    rb = min(block_rows, B)
    assert B % rb == 0, (B, rb)
    n = B // rb

    # pair-major weight reorders (hoisted out of the decode loop by XLA —
    # all inputs are loop constants)
    def cols(w, p, off):
        return jax.lax.slice_in_dim(w, off + p * W, off + (p + 1) * W, axis=1)
    wqkv_p = jnp.stack([jnp.concatenate(
        [cols(wqkv, p, 0), cols(wqkv, p, D), cols(wqkv, p, 2 * D)], axis=1)
        for p in range(P)]).astype(cd)               # (P, D, 3W)
    bq3 = bqkv.astype(jnp.float32)
    bqkv_p = jnp.stack([jnp.concatenate(
        [bq3[p * W:(p + 1) * W], bq3[D + p * W:D + (p + 1) * W],
         bq3[2 * D + p * W:2 * D + (p + 1) * W]])
        for p in range(P)]).reshape(P, 1, 3 * W)
    wos_p = jnp.stack([wos[p * W:(p + 1) * W, :]
                       for p in range(P)]).astype(cd)   # (P, W, D)
    wqc_p = jnp.stack([cols(wqc, p, 0) for p in range(P)]).astype(cd)
    bqc_p = jnp.stack([bqc.astype(jnp.float32)[p * W:(p + 1) * W]
                       for p in range(P)]).reshape(P, 1, W)
    woc_p = jnp.stack([woc[p * W:(p + 1) * W, :]
                       for p in range(P)]).astype(cd)
    bos2 = bos.astype(jnp.float32).reshape(1, -1)
    boc2 = boc.astype(jnp.float32).reshape(1, -1)
    ln6 = ln.astype(jnp.float32)
    weights = [wqkv_p, bqkv_p, wos_p, bos2, wqc_p, bqc_p, woc_p, boc2, ln6]

    # index maps take (grid idx, *scalar_prefetch_refs) under
    # PrefetchScalarGridSpec — hence the *_ catch-all
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    row = lambda *shp: pl.BlockSpec((rb, *shp),
                                    lambda i, *_: (i,) + (0,) * len(shp))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=(
            [row(D)]                               # x
            + [any_spec] * _N_W                    # weights (manual copy)
            + [any_spec] * 4                       # self caches (manual)
            + [any_spec] * 2                       # cross K/V (manual)
            + [
                row(H), row(H),                    # cross scales
                pl.BlockSpec((NCH, rb, CH),
                             lambda i, *_: (0, i, 0)),   # cross bias
            ]),
        out_specs=[
            row(D),                                # x_out
            pl.BlockSpec((P, rb, W), lambda i, *_: (0, i, 0)),   # nk
            pl.BlockSpec((P, rb, W), lambda i, *_: (0, i, 0)),   # nv
            row(H), row(H),                        # nks, nvs
        ],
        scratch_shapes=(
            [pltpu.VMEM(w.shape, w.dtype) for w in weights]
            + [pltpu.VMEM((rb, P, S, W), jnp.int8),        # self K block
               pltpu.VMEM((rb, P, S, W), jnp.int8),        # self V block
               pltpu.VMEM((H, rb, S), jnp.float32),        # K scales
               pltpu.VMEM((H, rb, S), jnp.float32)]        # V scales
            + [pltpu.VMEM((2, rb, P, NCH, CH, W), jnp.int8),   # cross K
               pltpu.VMEM((2, rb, P, NCH, CH, W), jnp.int8)]   # cross V
            + [pltpu.VMEM((NCH, rb, CH), jnp.float32),     # even scores
               pltpu.VMEM((NCH, rb, CH), jnp.float32)]     # odd scores
            + [pltpu.SemaphoreType.DMA((_N_W + 8,))]),
    )
    out_shapes = [
        jax.ShapeDtypeStruct((B, D), jnp.float32),
        jax.ShapeDtypeStruct((P, B, W), jnp.int8),
        jax.ShapeDtypeStruct((P, B, W), jnp.int8),
        jax.ShapeDtypeStruct((B, H), jnp.float32),
        jax.ShapeDtypeStruct((B, H), jnp.float32),
    ]
    kernel = functools.partial(
        _kernel, H=H, Dh=Dh, S=S, Li=Li, CH=CH, sm_scale=sm_scale, cd=cd)
    x_att, nk, nv, nks, nvs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(jnp.asarray(t, jnp.int32).reshape(1), x.astype(jnp.float32),
      *weights,
      k_cache, v_cache, ks_cache, vs_cache,
      ck, cv, cks.astype(jnp.float32), cvs.astype(jnp.float32),
      cbias.astype(jnp.float32))
    x_out = fused_ffn(x_att, w1, b1, w2, b2, ln[4:6], cd=cd,
                      interpret=interpret)
    return x_out, nk, nv, nks, nvs
