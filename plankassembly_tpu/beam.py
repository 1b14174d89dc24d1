"""Beam-search decode over the mixed vocab ‖ pointer ‖ switch distribution.

Beyond-reference serving feature: the reference evaluates greedily only
(`plankassembly/models.py:284-307` — argmax over the mixed distribution
each step). Beam search explores `num_beams` hypotheses per program under
the exact same mixed-probability model the greedy path samples from
(`decode._mixed_sample` semantics, including the eps-fill of structurally
illegal pointer slots, the plain-vocab first plank, and the j < t pointer
support), and returns the highest-scoring finished hypothesis. With
num_beams=1 it reproduces `greedy_decode`'s tokens exactly (up to each
row's END; tested).

TPU-first design notes:
- Beams are an expanded batch: every per-step tensor carries B*K rows, so
  all matmuls stay large and MXU-shaped; no data-dependent shapes anywhere.
- The encoder memory and the precomputed cross-attention K/V stay
  per-PROGRAM (B rows, not B*K): the per-step cross-attention contracts
  per-beam queries against per-program K/V via a (B, K·H, Dh) einsum, so
  the decode loop's dominant HBM stream (cross K/V re-reads) does NOT
  scale with the beam width.
- Beam reordering is a `take_along_axis` gather over the beam axis of the
  self-attention K/V and pointer h caches — the one per-step cost that
  scales with K (the standard beam-search tax).
- The whole loop is a `lax.while_loop` with the greedy path's early-exit
  condition (all beams of all programs finished), so trained models pay
  ~len(program) steps, not the static bound.

Scoring: cumulative log of the mixed probabilities; finished beams are
frozen by forcing a PAD continuation with log-prob 0. Final selection
takes the best finished beam per program (best unfinished if none
finished) under GNMT-style length normalization score / ((5+len)/6)^alpha
(alpha=0 — the default — is pure sum-log-prob).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from plankassembly_tpu.decode import (
    EPS, _is_prequantized, precompute_cross_kv,
)
from plankassembly_tpu.models.model import (
    NEG_INF,
    ModelDims,
    encode,
    layer_norm,
    pointer_structure_mask,
)

_TINY = 1e-30   # prob floor before log (eps-filled slots stay selectable)
_NEG = -1e9     # finite -inf: one step's worst real log-prob is ~-69, so
                # 128 steps stay > -1e4 and masked slots never win top_k


@partial(jax.jit, static_argnames=("dims", "num_beams", "compute_dtype",
                                   "alpha", "kv_bucket", "early_exit",
                                   "weight_quant"))
def beam_decode(params, batch, dims: ModelDims, num_beams: int = 4,
                compute_dtype=jnp.bfloat16, alpha: float = 0.0,
                kv_bucket=None, early_exit=True, weight_quant=False):
    """Batched beam-search decode. Same output contract as `greedy_decode`
    (samples/attach of the best beam, num_steps) plus:
      beam_scores (B, K) float32 — final length-normalized scores,
      beam_samples/beam_attach (B, K, S) — all hypotheses, best first is
      NOT guaranteed; index with argmax(beam_scores) (the top-level
      samples/attach already did).
    """
    inputs = {k: v for k, v in batch.items() if k.startswith("input")}
    if kv_bucket is not None and kv_bucket < inputs["input_value"].shape[1]:
        inputs = {k: v[:, :kv_bucket] for k, v in inputs.items()}
    memory = encode(params, inputs, dims, deterministic=True,
                    compute_dtype=compute_dtype, flash=True)
    return beam_decode_from_memory(
        params, memory, inputs["input_mask"], dims, num_beams=num_beams,
        compute_dtype=compute_dtype, alpha=alpha, early_exit=early_exit,
        weight_quant=weight_quant)


def beam_decode_from_memory(params, memory, memory_mask, dims: ModelDims,
                            num_beams: int = 4, compute_dtype=jnp.bfloat16,
                            alpha: float = 0.0, early_exit=True,
                            weight_quant=False):
    cd = compute_dtype
    K = num_beams
    S = dims.max_output_length
    H, Dh, D = dims.num_head, dims.head_dim, dims.num_model
    kvH, G = dims.kv_heads, dims.kv_groups
    Dkv = kvH * Dh
    dof = dims.num_output_dof
    V = dims.vocab_size
    PAD = dims.end + 1
    C = V + S                       # mixed-candidate width
    B = memory.shape[0]
    Li = memory.shape[1]
    BK = B * K

    def _expand(kv, n_len, rows):
        """(rows, n, kvH, Dh) -> (rows, n, H, Dh) in-register GQA expand."""
        if G == 1:
            return kv
        e = jnp.broadcast_to(kv[:, :, :, None, :], (rows, n_len, kvH, G, Dh))
        return e.reshape(rows, n_len, H, Dh)

    # cross K/V stay per-program: (L, B, Li, kvH, Dh)
    cross_k, cross_v = precompute_cross_kv(params, memory, dims, cd)
    cross_bias = jnp.where(memory_mask, NEG_INF, 0.0).astype(jnp.float32)

    dec = params["decoder"]
    heads = params["heads"]
    L = dims.num_decoder_layers

    def _layer(tree, l):
        return jax.tree.map(lambda a: a[l], tree)

    sa_l = [_layer(dec["self_attn"], l) for l in range(L)]
    ca_l = [_layer(dec["cross_attn"], l) for l in range(L)]
    ffn_l = [_layer(dec["ffn"], l) for l in range(L)]
    n1_l = [_layer(dec["norm1"], l) for l in range(L)]
    n2_l = [_layer(dec["norm2"], l) for l in range(L)]
    n3_l = [_layer(dec["norm3"], l) for l in range(L)]
    # int8 weight quantization: the same (quantize | consume-prequantized
    # | passthrough) triple as decode_from_memory, applied to the weights
    # this loop re-reads every step (see decode.quantize_decoder_weights)
    prequantized = _is_prequantized(dec["self_attn"]["wq"])
    if weight_quant and not prequantized:
        def _qw(w):
            w32 = w.astype(jnp.float32)
            s = jnp.maximum(jnp.abs(w32).max(axis=0) / 127.0, 1e-12)
            return jnp.round(w32 / s).astype(jnp.int8), s
    elif prequantized:
        def _qw(w):
            return w["q"], w["s"]
    else:
        def _qw(w):
            return w, None

    def _mm(x, wq, s):
        y = x @ wq.astype(x.dtype)
        return y if s is None else y * s.astype(x.dtype)

    if prequantized:
        wqkv_q = [(jnp.concatenate([p["wq"]["q"], p["wk"]["q"],
                                    p["wv"]["q"]], axis=1),
                   jnp.concatenate([p["wq"]["s"], p["wk"]["s"],
                                    p["wv"]["s"]]))
                  for p in sa_l]
    elif weight_quant:
        wqkv_q = [_qw(jnp.concatenate([p["wq"], p["wk"], p["wv"]], axis=1))
                  for p in sa_l]
    else:
        wqkv_q = [(jnp.concatenate(
            [p["wq"], p["wk"], p["wv"]], axis=1).astype(cd), None)
            for p in sa_l]
    bqkv_l = [jnp.concatenate([p["bq"], p["bk"], p["bv"]]).astype(cd)
              for p in sa_l]
    wo_q = [_qw(sa_l[l]["wo"]) for l in range(L)]
    cq_q = [_qw(ca_l[l]["wq"]) for l in range(L)]
    co_q = [_qw(ca_l[l]["wo"]) for l in range(L)]
    w1_q = [_qw(ffn_l[l]["w1"]) for l in range(L)]
    w2_q = [_qw(ffn_l[l]["w2"]) for l in range(L)]
    if weight_quant or prequantized:
        vq, vs = _qw(heads["vocab"]["w"])
        pq, ps = _qw(heads["pointer"]["w"])
        heads = {"vocab": {"w": vq, "s": vs, "b": heads["vocab"]["b"]},
                 "pointer": {"w": pq, "s": ps, "b": heads["pointer"]["b"]},
                 "switch": heads["switch"]}

    struct = jnp.asarray(pointer_structure_mask(dims))  # (S, S) {0,1}
    scale = 1.0 / math.sqrt(Dh)
    pos = jnp.arange(S)
    emb = params["embed"]

    k_cache0 = jnp.zeros((L, BK, S, kvH, Dh), cd)
    v_cache0 = jnp.zeros((L, BK, S, kvH, Dh), cd)
    h_cache0 = jnp.zeros((BK, S, D), jnp.float32)
    output0 = jnp.zeros((BK, S), jnp.int32)
    attach0 = jnp.full((BK, S), -1, jnp.int32)
    done0 = jnp.zeros((B, K), bool)
    length0 = jnp.zeros((B, K), jnp.int32)
    # only beam 0 is live at t=0 (all K start identical; without this the
    # first top_k would pick K copies of the same continuation)
    scores0 = jnp.full((B, K), _NEG, jnp.float32).at[:, 0].set(0.0)

    def _gather_rows(x, parent):
        """Reorder the beam axis by parent index. x: (BK, ...) row-major
        (program-major, beam-minor); parent: (B, K) in [0, K)."""
        xr = x.reshape(B, K, *x.shape[1:])
        idx = parent.reshape(B, K, *([1] * (x.ndim - 1)))
        out = jnp.take_along_axis(xr, idx, axis=1)
        return out.reshape(BK, *x.shape[1:])

    def step(carry):
        (t, scores, output, attach, done, length,
         k_cache, v_cache, h_cache) = carry

        # --- embed decoder input at position t (per beam row) ---
        prev = output[:, jnp.maximum(t - 1, 0)]
        tok_embed = (emb["value"][prev]
                     + emb["coord_out"][(t - 1) % dof][None, :]
                     + emb["pos_out"][(t - 1) // dof][None, :])
        x = jnp.where(t == 0, 0.0, tok_embed)[:, None, :]  # (BK, 1, D)

        self_bias = jnp.where(pos <= t, 0.0, NEG_INF)[None, None, None, :]

        for l in range(L):
            # self-attention with per-beam cache append
            h = layer_norm(n1_l[l], x)
            qkv = (_mm(h.astype(cd), *wqkv_q[l]) + bqkv_l[l])[:, 0]
            q = qkv[:, :D].reshape(BK, 1, H, Dh)
            k_t = qkv[:, D:D + Dkv].reshape(BK, 1, kvH, Dh)
            v_t = qkv[:, D + Dkv:].reshape(BK, 1, kvH, Dh)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k_t[None].astype(cd), (l, 0, t, 0, 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v_t[None].astype(cd), (l, 0, t, 0, 0))
            sc = jnp.einsum("bqhd,bkhd->bhqk", q,
                            _expand(k_cache[l], S, BK),
                            preferred_element_type=jnp.float32) * scale
            w = jax.nn.softmax(sc + self_bias, axis=-1)
            a = jnp.einsum("bhqk,bkhd->bqhd", w.astype(cd),
                           _expand(v_cache[l], S, BK),
                           preferred_element_type=jnp.float32)
            a = a.reshape(BK, 1, D)
            sa = sa_l[l]
            a = _mm(a.astype(cd), *wo_q[l]) + sa["bo"].astype(cd)
            x = x + a.astype(x.dtype)

            # cross-attention: per-beam queries vs per-PROGRAM K/V
            h = layer_norm(n2_l[l], x)
            ca = ca_l[l]
            q2 = (_mm(h.astype(cd), *cq_q[l])
                  + ca["bq"].astype(cd))[:, 0]          # (BK, D)
            qk = q2.reshape(B, K, H, Dh)
            ck = _expand(cross_k[l], Li, B)             # (B, Li, H, Dh)
            cv = _expand(cross_v[l], Li, B)
            sc = jnp.einsum("bkhd,blhd->bkhl", qk, ck,
                            preferred_element_type=jnp.float32) * scale
            w = jax.nn.softmax(sc + cross_bias[:, None, None, :], axis=-1)
            c = jnp.einsum("bkhl,blhd->bkhd", w.astype(cd), cv,
                           preferred_element_type=jnp.float32)
            c = c.reshape(BK, 1, D)
            c = _mm(c.astype(cd), *co_q[l]) + ca["bo"].astype(cd)
            x = x + c.astype(x.dtype)

            # feed-forward
            h = layer_norm(n3_l[l], x)
            f = ffn_l[l]
            z = jax.nn.relu(_mm(h.astype(cd), *w1_q[l])
                            + f["b1"].astype(cd))
            z = _mm(z, *w2_q[l]) + f["b2"].astype(cd)
            x = x + z.astype(x.dtype)

        h_t = layer_norm(dec["final_norm"], x)[:, 0].astype(jnp.float32)
        h_cache = jax.lax.dynamic_update_slice(
            h_cache, h_t[:, None], (0, t, 0))

        # --- per-candidate log-probs (the _mixed_sample distribution) ---
        def _head_mm(head):
            y = h_t @ head["w"].astype(h_t.dtype)
            if head.get("s") is not None:
                y = y * head["s"]
            return y + head["b"]

        vocab_logits = _head_mm(heads["vocab"])
        vocab_probs = jax.nn.softmax(vocab_logits, axis=-1)
        feature = _head_mm(heads["pointer"])
        pointer_logits = jnp.einsum("bd,bsd->bs", feature, h_cache) / D
        prob = jax.nn.sigmoid(h_t @ heads["switch"]["w"]
                              + heads["switch"]["b"])
        triu_bias = jnp.where(pos >= t, NEG_INF, 0.0)[None, :]
        pointer_probs = (jax.nn.softmax(pointer_logits + triu_bias, axis=-1)
                         * prob)
        pointer_probs = jnp.where(struct[t][None, :] == 0, EPS, pointer_probs)
        mixedp = jnp.concatenate([vocab_probs * (1 - prob), pointer_probs],
                                 axis=-1)                # (BK, C) probs
        logp = jnp.log(jnp.maximum(mixedp, _TINY))
        ptr_invalid = pos[None, :] > t                   # j <= t support
        logp = logp.at[:, V:].set(
            jnp.where(ptr_invalid, _NEG, logp[:, V:]))
        # first plank: plain vocab distribution, no pointers
        first = t + 1 < dof
        vocab_lp = jax.nn.log_softmax(vocab_logits, axis=-1)
        logp = jnp.where(first,
                         jnp.concatenate(
                             [vocab_lp, jnp.full((BK, S), _NEG)], axis=-1),
                         logp)
        # finished beams: forced PAD continuation at zero cost
        done_rows = done.reshape(BK)
        pad_row = jnp.full((C,), _NEG).at[PAD].set(0.0)
        logp = jnp.where(done_rows[:, None], pad_row[None, :], logp)

        # --- top-K over (parent beam x candidate) per program ---
        cand = scores[:, :, None] + logp.reshape(B, K, C)
        new_scores, flat_idx = jax.lax.top_k(cand.reshape(B, K * C), K)
        parent = flat_idx // C                            # (B, K)
        choice = flat_idx % C

        output = _gather_rows(output, parent)
        attach = _gather_rows(attach, parent)
        h_cache = _gather_rows(h_cache, parent)
        k_cache = jax.vmap(_gather_rows, in_axes=(0, None))(k_cache, parent)
        v_cache = jax.vmap(_gather_rows, in_axes=(0, None))(v_cache, parent)
        done = jnp.take_along_axis(done, parent, axis=1)
        length = jnp.take_along_axis(length, parent, axis=1)

        choice_r = choice.reshape(BK)
        is_ptr = choice_r >= V
        ptr = jnp.clip(choice_r - V, 0, S - 1)
        copied = jnp.take_along_axis(output, ptr[:, None], axis=1)[:, 0]
        token = jnp.where(is_ptr, copied, choice_r).astype(jnp.int32)
        attach_t = jnp.where(is_ptr, ptr, -1).astype(jnp.int32)
        output = output.at[:, t].set(token)
        attach = attach.at[:, t].set(attach_t)
        length = length + (~done).astype(jnp.int32)
        done = done | (token == dims.end).reshape(B, K)

        return (t + 1, new_scores, output, attach, done, length,
                k_cache, v_cache, h_cache)

    def cond(carry):
        t = carry[0]
        done = carry[4]
        if not early_exit:
            return t < S
        return (t < S) & ~jnp.all(done)

    init = (jnp.array(0, jnp.int32), scores0, output0, attach0, done0,
            length0, k_cache0, v_cache0, h_cache0)
    (t, scores, output, attach, done, length, *_) = jax.lax.while_loop(
        cond, step, init)

    # --- final hypothesis selection ---
    if alpha:
        lp = ((5.0 + length.astype(jnp.float32)) / 6.0) ** alpha
        norm = scores / lp
    else:
        norm = scores
    any_done = jnp.any(done, axis=1, keepdims=True)
    sel = jnp.where(any_done & ~done, _NEG, norm)
    best = jnp.argmax(sel, axis=1)                        # (B,)
    out_bk = output.reshape(B, K, S)
    att_bk = attach.reshape(B, K, S)
    take = lambda x: jnp.take_along_axis(
        x, best[:, None, None], axis=1)[:, 0]
    return {"samples": take(out_bk), "attach": take(att_bk),
            "num_steps": t, "beam_scores": norm,
            "beam_samples": out_bk, "beam_attach": att_bk}
