#!/usr/bin/env python
"""Decode-step cost attribution + optimization variants (VERDICT r1 #2).

Runs the flagship decode (B=128, d=512, 6+6, kv bucket 512, full 128 steps)
in several controlled variants on the real chip and prints one JSON line per
variant:

  ablations   : no-cross / no-self / no-pointer isolate the three HBM streams
  kv handling : bf16, int8 broadcast-dequant (round-1 shipped), int8 deferred
                scale (fold K-scale into q, V-scale past the matmul),
                int8 native MXU dot (quantize q and attention weights too)
  cache layout: stacked (L,B,S,H,Dh) carries vs per-layer split carries

Usage: python tools/bench_decode_variants.py [--variants a,b,...] [--iters 3]
"""
import argparse
import json
import math
import time
from functools import partial

import numpy as np


def build_variant(dims, cd, *, kv_mode="bf16", split_caches=False,
                  cross=True, self_attn=True, pointer=True):
    import jax
    import jax.numpy as jnp
    from plankassembly_tpu.models.model import NEG_INF, layer_norm, \
        pointer_structure_mask
    from plankassembly_tpu.decode import EPS, precompute_cross_kv

    S = dims.max_output_length
    H, Dh, D = dims.num_head, dims.head_dim, dims.num_model
    dof = dims.num_output_dof
    L = dims.num_decoder_layers

    @partial(jax.jit, static_argnames=())
    def run(params, memory, memory_mask):
        B = memory.shape[0]
        cross_k, cross_v = precompute_cross_kv(params, memory, dims, cd)
        if kv_mode.endswith("-t"):
            # head-major layout: per-(b,h) K/V tiles are contiguous
            # (Li, Dh) blocks instead of 64-byte rows at 512-byte stride
            cross_k = cross_k.transpose(0, 1, 3, 2, 4)  # (L,B,H,Li,Dh)
            cross_v = cross_v.transpose(0, 1, 3, 2, 4)
        if kv_mode.startswith("int8"):
            qaxes = (3, 4) if kv_mode.endswith("-t") else (2, 4)
            def _q(x):
                scale = jnp.max(jnp.abs(x), axis=qaxes, keepdims=True) / 127.
                scale = jnp.maximum(scale, 1e-8)
                q = jnp.round(x.astype(jnp.float32) / scale).astype(jnp.int8)
                return q, scale.astype(jnp.float32)
            ck_q, ck_s = _q(cross_k)
            cv_q, cv_s = _q(cross_v)
        cross_bias = jnp.where(memory_mask, NEG_INF, 0.0)[:, None, None, :]
        cross_bias = cross_bias.astype(jnp.float32)

        dec, heads, emb = params["decoder"], params["heads"], params["embed"]

        def _layer(tree, l):
            return jax.tree.map(lambda a: a[l], tree)

        sa_l = [_layer(dec["self_attn"], l) for l in range(L)]
        ca_l = [_layer(dec["cross_attn"], l) for l in range(L)]
        ffn_l = [_layer(dec["ffn"], l) for l in range(L)]
        n1_l = [_layer(dec["norm1"], l) for l in range(L)]
        n2_l = [_layer(dec["norm2"], l) for l in range(L)]
        n3_l = [_layer(dec["norm3"], l) for l in range(L)]
        wqkv_l = [jnp.concatenate([p["wq"], p["wk"], p["wv"]], 1).astype(cd)
                  for p in sa_l]
        bqkv_l = [jnp.concatenate([p["bq"], p["bk"], p["bv"]]).astype(cd)
                  for p in sa_l]

        struct = jnp.asarray(pointer_structure_mask(dims))
        scale = 1.0 / math.sqrt(Dh)

        if split_caches:
            k0 = tuple(jnp.zeros((B, S, H, Dh), cd) for _ in range(L))
            v0 = tuple(jnp.zeros((B, S, H, Dh), cd) for _ in range(L))
        else:
            k0 = jnp.zeros((L, B, S, H, Dh), cd)
            v0 = jnp.zeros((L, B, S, H, Dh), cd)
        h0 = jnp.zeros((B, S, D), jnp.float32)
        out0 = jnp.zeros((B, S), jnp.int32)
        att0 = jnp.full((B, S), -1, jnp.int32)

        def step(carry):
            t, output, attach, k_cache, v_cache, h_cache = carry
            prev = output[:, jnp.maximum(t - 1, 0)]
            tok = (emb["value"][prev]
                   + emb["coord_out"][(t - 1) % dof][None, :]
                   + emb["pos_out"][(t - 1) // dof][None, :])
            x = jnp.where(t == 0, 0.0, tok)[:, None, :]
            pos = jnp.arange(S)
            self_bias = jnp.where(pos <= t, 0.0, NEG_INF)[None, None, None, :]

            for l in range(L):
                if self_attn:
                    h = layer_norm(n1_l[l], x)
                    qkv = h.astype(cd) @ wqkv_l[l] + bqkv_l[l]
                    qkv = qkv.reshape(B, 3, H, Dh)
                    q, k_t, v_t = (qkv[:, 0][:, None], qkv[:, 1][:, None],
                                   qkv[:, 2][:, None])
                    if split_caches:
                        k_cache = (k_cache[:l]
                                   + (jax.lax.dynamic_update_slice(
                                       k_cache[l], k_t, (0, t, 0, 0)),)
                                   + k_cache[l + 1:])
                        v_cache = (v_cache[:l]
                                   + (jax.lax.dynamic_update_slice(
                                       v_cache[l], v_t, (0, t, 0, 0)),)
                                   + v_cache[l + 1:])
                        kl, vl = k_cache[l], v_cache[l]
                    else:
                        k_cache = jax.lax.dynamic_update_slice(
                            k_cache, k_t[None], (l, 0, t, 0, 0))
                        v_cache = jax.lax.dynamic_update_slice(
                            v_cache, v_t[None], (l, 0, t, 0, 0))
                        kl, vl = k_cache[l], v_cache[l]
                    sc = jnp.einsum("bqhd,bkhd->bhqk", q, kl,
                                    preferred_element_type=jnp.float32) * scale
                    w = jax.nn.softmax(sc + self_bias, axis=-1)
                    a = jnp.einsum("bhqk,bkhd->bqhd", w.astype(cd), vl,
                                   preferred_element_type=jnp.float32)
                    sa = sa_l[l]
                    a = (a.reshape(B, 1, D).astype(cd) @ sa["wo"].astype(cd)
                         + sa["bo"].astype(cd))
                    x = x + a.astype(x.dtype)

                if cross:
                    h = layer_norm(n2_l[l], x)
                    ca = ca_l[l]
                    q2 = (h.astype(cd) @ ca["wq"].astype(cd)
                          + ca["bq"].astype(cd)).reshape(B, 1, H, Dh)
                    if kv_mode.endswith("-t"):
                        # head-major K/V: (B,H,Li,Dh) per layer
                        q2t = q2[:, 0]  # (B,H,Dh)
                        bias2 = cross_bias[:, 0]  # (B,1,Li)
                        if kv_mode == "bf16-t":
                            kl_, vl_ = cross_k[l], cross_v[l]
                            sc = jnp.einsum(
                                "bhd,bhkd->bhk", q2t, kl_,
                                preferred_element_type=jnp.float32) * scale
                            w = jax.nn.softmax(sc + bias2, axis=-1)
                            c = jnp.einsum(
                                "bhk,bhkd->bhd", w.astype(cd), vl_,
                                preferred_element_type=jnp.float32)
                        else:  # int8-defer-t
                            qs = q2t * ck_s[l].reshape(B, H, 1).astype(cd)
                            sc = jnp.einsum(
                                "bhd,bhkd->bhk", qs, ck_q[l].astype(cd),
                                preferred_element_type=jnp.float32) * scale
                            w = jax.nn.softmax(sc + bias2, axis=-1)
                            c = jnp.einsum(
                                "bhk,bhkd->bhd", w.astype(cd),
                                cv_q[l].astype(cd),
                                preferred_element_type=jnp.float32)
                            c = c * cv_s[l].reshape(B, H, 1)
                        c = c.reshape(B, 1, D)
                    elif kv_mode == "bf16":
                        sc = jnp.einsum("bqhd,bkhd->bhqk", q2, cross_k[l],
                                        preferred_element_type=jnp.float32)
                        sc = sc * scale
                        w = jax.nn.softmax(sc + cross_bias, axis=-1)
                        c = jnp.einsum("bhqk,bkhd->bqhd", w.astype(cd),
                                       cross_v[l],
                                       preferred_element_type=jnp.float32)
                    elif kv_mode == "int8":  # round-1: broadcast dequant
                        ckl = ck_q[l].astype(cd) * ck_s[l].astype(cd)
                        cvl = cv_q[l].astype(cd) * cv_s[l].astype(cd)
                        sc = jnp.einsum("bqhd,bkhd->bhqk", q2, ckl,
                                        preferred_element_type=jnp.float32)
                        sc = sc * scale
                        w = jax.nn.softmax(sc + cross_bias, axis=-1)
                        c = jnp.einsum("bhqk,bkhd->bqhd", w.astype(cd), cvl,
                                       preferred_element_type=jnp.float32)
                    elif kv_mode == "int8-defer":  # scale past the matmuls
                        # ck_s/cv_s: (B,1,H,1) after [l] — constant over Li,Dh
                        qs = q2 * ck_s[l].transpose(0, 2, 1, 3).reshape(
                            B, 1, H, 1).astype(cd)
                        sc = jnp.einsum("bqhd,bkhd->bhqk", qs,
                                        ck_q[l].astype(cd),
                                        preferred_element_type=jnp.float32)
                        sc = sc * scale
                        w = jax.nn.softmax(sc + cross_bias, axis=-1)
                        c = jnp.einsum("bhqk,bkhd->bqhd", w.astype(cd),
                                       cv_q[l].astype(cd),
                                       preferred_element_type=jnp.float32)
                        c = c * cv_s[l].transpose(0, 2, 1, 3).reshape(
                            B, 1, H, 1)
                    elif kv_mode == "int8-native":  # int8 MXU dots
                        q2f = q2.astype(jnp.float32)
                        q_s = jnp.maximum(
                            jnp.max(jnp.abs(q2f), axis=3, keepdims=True)
                            / 127., 1e-8)
                        q_i8 = jnp.round(q2f / q_s).astype(jnp.int8)
                        sc_i = jax.lax.dot_general(
                            q_i8.reshape(B, H, Dh)[:, :, None, :],
                            ck_q[l].transpose(0, 2, 3, 1),
                            (((3,), (2,)), ((0, 1), (0, 1))),
                            preferred_element_type=jnp.int32)
                        sc = (sc_i.astype(jnp.float32)
                              * (q_s.reshape(B, H, 1, 1)
                                 * ck_s[l].transpose(0, 2, 1, 3)) * scale)
                        w = jax.nn.softmax(sc + cross_bias, axis=-1)
                        wf = w.astype(jnp.float32)
                        w_s = jnp.maximum(
                            jnp.max(wf, axis=3, keepdims=True) / 127., 1e-8)
                        w_i8 = jnp.round(wf / w_s).astype(jnp.int8)
                        c_i = jax.lax.dot_general(
                            w_i8, cv_q[l].transpose(0, 2, 1, 3),
                            (((3,), (2,)), ((0, 1), (0, 1))),
                            preferred_element_type=jnp.int32)
                        c = (c_i.astype(jnp.float32)
                             * (w_s * cv_s[l].transpose(0, 2, 1, 3)))
                        c = c.transpose(0, 2, 1, 3)  # bhqd->bqhd
                    c = (c.reshape(B, 1, D).astype(cd) @ ca["wo"].astype(cd)
                         + ca["bo"].astype(cd))
                    x = x + c.astype(x.dtype)

                h = layer_norm(n3_l[l], x)
                f = ffn_l[l]
                z = jax.nn.relu(h.astype(cd) @ f["w1"].astype(cd)
                                + f["b1"].astype(cd))
                z = z @ f["w2"].astype(cd) + f["b2"].astype(cd)
                x = x + z.astype(x.dtype)

            h_t = layer_norm(dec["final_norm"], x)[:, 0].astype(jnp.float32)
            h_cache = jax.lax.dynamic_update_slice(
                h_cache, h_t[:, None], (0, t, 0))

            vocab_logits = h_t @ heads["vocab"]["w"] + heads["vocab"]["b"]
            if pointer:
                vocab_probs = jax.nn.softmax(vocab_logits, axis=-1)
                feature = h_t @ heads["pointer"]["w"] + heads["pointer"]["b"]
                plogits = jnp.einsum("bd,bsd->bs", feature, h_cache)
                plogits = plogits / dims.num_model
                prob = jax.nn.sigmoid(h_t @ heads["switch"]["w"]
                                      + heads["switch"]["b"])
                triu = jnp.where(pos >= t, NEG_INF, 0.0)[None, :]
                pprobs = jax.nn.softmax(plogits + triu, axis=-1) * prob
                pprobs = jnp.where(struct[t][None, :] == 0, EPS, pprobs)
                pprobs = jnp.where(pos[None, :] > t, -1.0, pprobs)
                mixed = jnp.concatenate([vocab_probs * (1 - prob), pprobs], -1)
                idx = jnp.where(t + 1 < dof, jnp.argmax(vocab_logits, -1),
                                jnp.argmax(mixed, -1)).astype(jnp.int32)
            else:
                idx = jnp.argmax(vocab_logits, -1).astype(jnp.int32)

            is_ptr = idx >= dims.vocab_size
            ptr = jnp.clip(idx - dims.vocab_size, 0, S - 1)
            copied = jnp.take_along_axis(output, ptr[:, None], 1)[:, 0]
            token = jnp.where(is_ptr, copied, idx)
            output = output.at[:, t].set(token)
            attach = attach.at[:, t].set(jnp.where(is_ptr, ptr, -1))
            return (t + 1, output, attach, k_cache, v_cache, h_cache)

        def cond(carry):
            return carry[0] < S  # full bound: benchmark mode

        init = (jnp.array(0, jnp.int32), out0, att0, k0, v0, h0)
        t, output, attach, *_ = jax.lax.while_loop(cond, step, init)
        return {"samples": output, "attach": attach, "num_steps": t}

    return run


VARIANTS = {
    "bf16": dict(kv_mode="bf16"),
    "int8": dict(kv_mode="int8"),
    "int8-defer": dict(kv_mode="int8-defer"),
    "int8-native": dict(kv_mode="int8-native"),
    "bf16-t": dict(kv_mode="bf16-t"),
    "int8-defer-t": dict(kv_mode="int8-defer-t"),
    "bf16-split": dict(kv_mode="bf16", split_caches=True),
    "int8-defer-split": dict(kv_mode="int8-defer", split_caches=True),
    "no-cross": dict(kv_mode="bf16", cross=False),
    "no-self": dict(kv_mode="bf16", self_attn=False),
    "no-pointer": dict(kv_mode="bf16", pointer=False),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from __graft_entry__ import _example_batch
    from plankassembly_tpu.config import Config
    from plankassembly_tpu.decode import pick_kv_bucket
    from plankassembly_tpu.models.model import ModelDims, encode, init_params

    cfg = Config()
    dims = ModelDims.from_config(cfg)
    params = init_params(jax.random.PRNGKey(0), dims)
    batch_np = _example_batch(cfg, args.batch)
    inputs = {k: jnp.asarray(v) for k, v in batch_np.items()
              if k.startswith("input")}
    bucket = pick_kv_bucket(batch_np["input_mask"])
    inputs = {k: v[:, :bucket] for k, v in inputs.items()}
    memory = encode(params, inputs, dims, deterministic=True,
                    compute_dtype=jnp.bfloat16, flash=True)
    memory = jax.block_until_ready(memory)
    mask = inputs["input_mask"]

    S = dims.max_output_length
    ref_samples = None
    for name in args.variants.split(","):
        fn = build_variant(dims, jnp.bfloat16, **VARIANTS[name])
        out = fn(params, memory, mask)
        assert int(np.asarray(out["num_steps"])) == S
        samples = np.asarray(out["samples"])
        if name == "bf16":
            ref_samples = samples
        match = (float((samples == ref_samples).mean())
                 if ref_samples is not None else None)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(params, memory, mask)
            np.asarray(out["samples"])
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "variant": name, "ms_per_step": round(dt / S * 1e3, 3),
            "programs_per_sec_decode_only": round(args.batch / dt, 1),
            "token_match_vs_bf16": match,
        }), flush=True)


if __name__ == "__main__":
    main()
