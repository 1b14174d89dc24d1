"""KV-cached autoregressive shape-program decoding.

TPU-native replacement for the reference's eval loop (`plankassembly/
models.py:267-323`), which re-runs the full decoder over the whole prefix
every step (O(T^3) per sequence, no cache). Here:

- the encoder runs once; per-layer cross-attention K/V are precomputed;
- decoder self-attention K/V and final hidden states are cached in
  fixed-size buffers (static shapes);
- the loop is a `jax.lax.while_loop` with a static 128-step bound and a
  per-sequence done flag, exiting early when every sequence has emitted END
  (mirroring `models.py:306-307`);
- pointer tokens resolve to copied values with on-device gathers
  (`_sample`, `models.py:235-256`), and the structural pointer legality mask
  (`models.py:91-101,168-186`) is precomputed as a constant.

Sampling semantics replicate the reference eval branch of `_create_dist`
exactly, including its quirks: for prefix length < 6 the distribution is the
plain vocab softmax; otherwise vocab scales by (1-p), pointer by p, the triu
mask (j >= t) zeroes pointer probabilities pre-softmax, and structurally
illegal pointer slots are *filled with eps=1e-6* rather than zero
(`models.py:183-184`).
"""
from __future__ import annotations

import math
import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from plankassembly_tpu.models.model import (
    ModelDims,
    NEG_INF,
    encode,
    layer_norm,
    pointer_structure_mask,
)

EPS = 1e-6


def _project(h, w, b, B, H, Dh, cd):
    out = h.astype(cd) @ w.astype(cd) + b.astype(cd)
    return out.reshape(B, -1, H, Dh)


def precompute_cross_kv(params, memory, dims: ModelDims, compute_dtype):
    """Per-layer cross-attention K/V over the encoder memory, stacked on a
    leading layer axis: (Ld, B, Li, kvH, Dh). kvH < H under GQA/MQA
    (`ModelDims.num_kv_head`) — the cache, and with it the decode loop's
    dominant HBM stream, shrinks by H/kvH."""
    B = memory.shape[0]
    Dh = dims.head_dim
    kvH = dims.kv_heads
    ca = params["decoder"]["cross_attn"]

    def one_layer(lp):
        k = _project(memory, lp["wk"], lp["bk"], B, kvH, Dh, compute_dtype)
        v = _project(memory, lp["wv"], lp["bv"], B, kvH, Dh, compute_dtype)
        return k, v

    return jax.vmap(one_layer)(ca)


@partial(jax.jit, static_argnames=("dims", "compute_dtype", "early_exit",
                                   "kv_bucket", "kv_quant", "cross_impl",
                                   "gqa_self_impl", "self_quant",
                                   "weight_quant"))
def greedy_decode(params, batch, dims: ModelDims, compute_dtype=jnp.bfloat16,
                  early_exit=True, kv_bucket=None, kv_quant=None,
                  cross_impl="auto", gqa_self_impl="auto", self_quant=None,
                  weight_quant=False):
    """Batched greedy decode. Returns dict with:
      samples (B, S) int32 generated tokens,
      attach  (B, S) int32 pointer indices (-1 = none),
      num_steps () int32 — steps actually executed (early exit diagnostic).

    kv_bucket: static crop of the encoder length. Real input tokens form a
    prefix (data/packing.py), so cropping to a per-batch bucket (multiple of
    128 >= max real length, chosen by the caller via `pick_kv_bucket`) is
    exact and slashes the HBM traffic of per-step cross-attention K/V reads
    — the decode loop's dominant cost. A bucket WIDER than the packed input
    (e.g. a coarse-quantum ladder rung of 1280 over a 1199-wide dataset)
    pads with masked PAD columns instead: masked positions are inert in
    both encoder attention and cross-attention, and the Pallas kernels
    require the 128-aligned width the bucket promises (an unpadded 1199
    trips Mosaic's lane-tiling alignment check).
    """
    inputs = {k: v for k, v in batch.items() if k.startswith("input")}
    width = inputs["input_value"].shape[1]
    if kv_bucket is not None and kv_bucket < width:
        inputs = {k: v[:, :kv_bucket] for k, v in inputs.items()}
    elif kv_bucket is not None and kv_bucket > width:
        pad = kv_bucket - width
        pad_token = dims.vocab_size - 1  # PAD is the last vocab id

        def _pad(k, v):
            fill = (jnp.ones((v.shape[0], pad), v.dtype) if k == "input_mask"
                    else jnp.full((v.shape[0], pad), pad_token, v.dtype)
                    if k == "input_value"
                    else jnp.zeros((v.shape[0], pad), v.dtype))
            return jnp.concatenate([v, fill], axis=1)

        inputs = {k: _pad(k, v) for k, v in inputs.items()}
    memory = encode(params, inputs, dims, deterministic=True,
                    compute_dtype=compute_dtype, flash=True)
    return decode_from_memory(params, memory, inputs["input_mask"], dims,
                              compute_dtype=compute_dtype,
                              early_exit=early_exit, kv_quant=kv_quant,
                              cross_impl=cross_impl,
                              gqa_self_impl=gqa_self_impl,
                              self_quant=self_quant,
                              weight_quant=weight_quant)


def quantize_decoder_weights(params):
    """Pre-quantize the decode loop's weight matrices to int8 out-of-trace.

    Returns a params pytree where each weight the decode loop re-reads
    every step (self-attention q/k/v/o, cross-attention q/o, both FFN
    matmuls, the vocab and pointer heads) becomes
    ``{"q": int8 (..., K, N), "s": f32 (..., N)}`` (symmetric
    per-output-channel). `decode_from_memory` consumes this form
    directly, skipping its own trace-time quantization — which is what
    lets `export.py` bake the int8 tensors (not the f32 originals) as
    StableHLO constants, halving the artifact. Weights consumed once
    outside the loop (encoder, embeddings, cross-attention K/V
    projections, norms, biases, switch head) stay full precision.
    """
    def _q(w):
        w32 = jnp.asarray(w, jnp.float32)
        s = jnp.maximum(jnp.abs(w32).max(axis=-2) / 127.0, 1e-12)
        return {"q": jnp.round(w32 / s[..., None, :]).astype(jnp.int8),
                "s": s}

    dec = dict(params["decoder"])
    dec["self_attn"] = {k: _q(v) if k in ("wq", "wk", "wv", "wo") else v
                        for k, v in dec["self_attn"].items()}
    dec["cross_attn"] = {k: _q(v) if k in ("wq", "wo") else v
                         for k, v in dec["cross_attn"].items()}
    dec["ffn"] = {k: _q(v) if k in ("w1", "w2") else v
                  for k, v in dec["ffn"].items()}
    heads = {h: ({**params["heads"][h], "w": _q(params["heads"][h]["w"])}
                 if h in ("vocab", "pointer") else params["heads"][h])
             for h in params["heads"]}
    return {**params, "decoder": dec, "heads": heads}


def _pick_auto_impl(backend: str, dims: ModelDims, batch: int, *,
                    kv_quant: bool, self_quant: bool, weight_quant: bool,
                    prequantized: bool) -> str:
    """Resolve cross_impl='auto' (policy factored out for unit tests).

    TPU picks the persistent Pallas kernel exactly in the regime the
    on-chip trained-serving measurement proved it wins at identical F1
    (results/SERVING_r5.md): the caller opted into int8 cross-KV
    (kv_quant), GQA layout, 256 <= B <= 512 (the measured band — above
    it sits the B=1024 guard, below it the weights-dominated small-batch
    regime where mxu+weight_quant is the tuned path) with B divisible
    by 8 (smaller row blocks leave the MXU underfed), and no
    quantization options the kernel doesn't implement. Everything else
    stays on the XLA mxu schedule; non-TPU backends use the generic
    einsum path."""
    if backend != "tpu":
        return "xla"
    if (kv_quant and dims.kv_heads < dims.num_head
            and not self_quant and not weight_quant and not prequantized
            and 256 <= batch <= 512 and batch % 8 == 0):
        return "persistent"
    return "mxu"


def _is_prequantized(w) -> bool:
    return isinstance(w, dict) and "q" in w


def decode_from_memory(params, memory, memory_mask, dims: ModelDims,
                       compute_dtype=jnp.bfloat16, early_exit=True,
                       kv_quant=None, cross_impl="auto",
                       gqa_self_impl="auto", self_quant=None,
                       weight_quant=False):
    """KV-cached decode loop over a precomputed encoder memory — shared by
    the token-input model and the raster/ViT variant (`models/vit.py`).
    memory (B, Li, D); memory_mask (B, Li) bool True = padded key.

    cross_impl: "mxu" (block-diagonal-query MXU einsums, the XLA fast
    path), "persistent" (gen-3 Pallas kernel owning the WHOLE decode loop
    in one launch, `ops/persistent_decode.py` — fastest path, with
    in-launch SMEM early exit since r4), "fused" (whole-decoder-layer
    Pallas kernel, `ops/fused_decode.py` — 6 kernel launches per step
    instead of ~170 HLO ops), "kernel" (Pallas fused cross-attention only,
    `ops/cross_decode.py`), "xla" (einsum fallback, any backend),
    "*-interpret" (Pallas interpret mode, for CPU parity tests), or
    "auto": on TPU, the persistent kernel whenever the caller already
    opted into its built-in semantics and the measured-win regime holds —
    kv_quant truthy (int8 cross-KV accepted), GQA layout, 256 <= B <= 512
    divisible by 8, no self_quant/weight_quant — else "mxu"; "xla" off
    TPU. The persistent conditions mirror the on-chip trained-serving
    measurement (results/SERVING_r5.md: 1.31-1.52x over mxu at F1 delta
    1e-4 on the full 2600-program split, exit histograms identical), so
    production serving (`serving.make_live_backend`, kv_quant=True) rides
    the fast kernel by default while the reference-faithful eval default
    (kv_quant unset) keeps the full-precision mxu path.

    self_quant: int8-quantize the SELF K/V cache (None = follow kv_quant,
    the historical coupling). The self cache is only ~50 MB/step of the
    ~290 MB decode stream but its int8 path adds ~50 small VPU ops per
    step (per-token quantize + 2 extra cache-scale update_slices + score/
    weight scale folds x 6 layers); on a schedule-bound loop the op-count
    cost can exceed the traffic saving — decouple to measure
    (tools/bench_fused.py --self-quant).

    weight_quant: int8-quantize the decoder + head weight matrices
    (symmetric per-output-channel; biases/norms/embeddings stay f32).
    The loop re-reads every decoder weight from HBM each step, so at
    small serving batches (B <= ~64, e.g. the online service's B=16)
    weights — not KV — dominate per-step traffic; int8 halves that
    stream, and the per-column scale folds into the matmul output (one
    (B,1,N) multiply). Dequant happens inside the loop body so the HBM
    stream stays int8 (same structure as the int8 cross-KV path, whose
    in-loop `astype` measurably does NOT get hoisted by XLA). Ignored
    (with a warning) by the persistent/fused/kernel Pallas impls, whose
    weight layouts are baked into the kernels.

    gqa_self_impl (G > 1 only): how grouped-query self-attention contracts
    against its kv-head-wide cache. "expand" broadcasts K/V to all H query
    heads in-register, so the einsums take the exact MHA form whose TPU
    schedule is known-good — HBM traffic is identical as long as XLA keeps
    the broadcast in-register. "grouped" batches over (kv head, group)
    with 5-D einsums. Measured (kv=2, Li=512, int8 KV, v5e, full 128-step
    bound): at B=256 expand wins decisively — 1.896 vs 2.681 ms/step
    (1054.7 vs 746.0 programs/s, also beating MHA's 897.3); at B=512 XLA
    materializes the expanded K/V instead of fusing and expand craters
    (~8 ms/step vs grouped's 5.24). "auto" (default) picks expand for
    B <= 256 and grouped above — the measured crossover
    (tools/bench_fused.py --gqa-self).
    """
    explicit_no_quant = kv_quant is False  # None = unspecified default
    kv_quant = bool(kv_quant)
    _IMPLS = ("auto", "xla", "mxu", "persistent", "persistent-interpret",
              "fused", "fused-interpret", "kernel", "kernel-interpret")
    if cross_impl not in _IMPLS:
        # without this, an unknown string silently falls through to the
        # generic XLA einsum path and gets benchmarked under its own name
        raise ValueError(f"unknown cross_impl {cross_impl!r}; "
                         f"one of {_IMPLS}")
    prequantized = _is_prequantized(params["decoder"]["self_attn"]["wq"])
    if cross_impl == "auto":
        cross_impl = _pick_auto_impl(
            jax.default_backend(), dims, memory.shape[0],
            kv_quant=kv_quant, self_quant=bool(self_quant),
            weight_quant=weight_quant, prequantized=prequantized)
    if weight_quant and not prequantized and cross_impl not in ("mxu", "xla"):
        warnings.warn(
            f"weight_quant is only implemented for the mxu/xla decode "
            f"paths; ignored with cross_impl={cross_impl!r}", stacklevel=2)
        weight_quant = False
    if prequantized:
        if cross_impl not in ("mxu", "xla"):
            raise ValueError(
                "pre-quantized decoder weights (quantize_decoder_weights) "
                f"require cross_impl 'mxu'/'xla', got {cross_impl!r}")
        weight_quant = True
    if gqa_self_impl == "auto":
        gqa_self_impl = "expand" if memory.shape[0] <= 256 else "grouped"
    if cross_impl in ("persistent", "persistent-interpret"):
        # gen-3 Pallas kernel: the ENTIRE greedy loop in one launch
        # (ops/persistent_decode.py); int8 cross-KV + bf16 self-KV
        # semantics are built in (kv_quant/self_quant flags are ignored —
        # warn below so callers asking for full precision notice).
        # Measured (v5e, kv=2, B=256/512, Li=512): 1.06 / 1.9 ms per step
        # = 1891 / 2100 programs/s decode-only vs the mxu path's 1.896 ms
        # (1054.7) — the win that two per-step fused-kernel generations
        # couldn't get.
        B_ = memory.shape[0]
        if B_ > 512:
            # B=1024 reproducibly hung the Mosaic kernel >15 min before
            # its first run completed, and killing it wedged the device
            # ~25 min (CLAUDE.md r3). Until root-caused, large batches
            # take the XLA mxu schedule instead of risking the hang.
            warnings.warn(
                f"persistent decode is unvalidated for B={B_} > 512 "
                "(B=1024 hangs the Mosaic compile/run); falling back to "
                "cross_impl='mxu'", stacklevel=2)
            cross_impl = "mxu"
        elif explicit_no_quant or self_quant:
            warnings.warn(
                "cross_impl='persistent' has int8 cross-KV + bf16 self-KV "
                "semantics built in; kv_quant=False / self_quant=True are "
                "ignored", stacklevel=2)
    if cross_impl in ("persistent", "persistent-interpret"):
        from plankassembly_tpu.ops.persistent_decode import (
            persistent_greedy_decode,
        )
        if memory.shape[1] % 128:
            # Mosaic requires lane-tiling-aligned (128) HBM slices; an
            # unaligned Li reaches here whenever the picked bucket clamps
            # to the dataset's packed width (MAX_INPUT_LENGTH-1 = e.g.
            # 1199). Pad with masked zero columns AFTER the encoder:
            # masked keys are inert in cross-attention and zeros cannot
            # inflate the int8 quantization scales.
            pad = 128 - memory.shape[1] % 128
            memory = jnp.pad(memory, ((0, 0), (0, pad), (0, 0)))
            memory_mask = jnp.pad(memory_mask, ((0, 0), (0, pad)),
                                  constant_values=True)
        B_ = memory.shape[0]
        rb = next(r for r in (16, 8, 4, 2, 1) if B_ % r == 0)
        return persistent_greedy_decode(
            params, memory, memory_mask, dims, block_rows=rb,
            compute_dtype=compute_dtype, early_exit=early_exit,
            interpret=(cross_impl == "persistent-interpret"))
    if cross_impl in ("fused", "fused-interpret"):
        return _decode_fused(params, memory, memory_mask, dims,
                             compute_dtype=compute_dtype,
                             early_exit=early_exit,
                             interpret=(cross_impl == "fused-interpret"))
    use_kernel = cross_impl in ("kernel", "kernel-interpret")
    use_mxu = cross_impl == "mxu"

    cd = compute_dtype
    S = dims.max_output_length
    H, Dh, D = dims.num_head, dims.head_dim, dims.num_model
    kvH, G = dims.kv_heads, dims.kv_groups
    Dkv = kvH * Dh
    if use_kernel and G > 1:
        # the Pallas ablation kernel assumes head-major full-H K/V tiles
        use_kernel = False
        use_mxu = jax.default_backend() == "tpu"
    dof = dims.num_output_dof
    B = memory.shape[0]
    Li = memory.shape[1]

    def _expand_heads(kv, S_len):
        """(B,S,kvH,Dh) -> (B,S,H,Dh) by broadcasting each kv head over its
        G query heads (in-register; fuses into the consuming einsum)."""
        e = jnp.broadcast_to(kv[:, :, :, None, :], (B, S_len, kvH, G, Dh))
        return e.reshape(B, S_len, H, Dh)

    def grouped_scores(q, k, S_len):
        """q (B,1,H,Dh) x k (B,S,kvH,Dh) -> (B,H,1,S) without materializing
        a repeated K in HBM (the kv-head-wide cache stays the only HBM
        stream either way)."""
        if G == 1:
            return jnp.einsum("bqhd,bkhd->bhqk", q, k,
                              preferred_element_type=jnp.float32)
        if gqa_self_impl == "expand":
            return jnp.einsum("bqhd,bkhd->bhqk", q, _expand_heads(k, S_len),
                              preferred_element_type=jnp.float32)
        qg = q.reshape(B, 1, kvH, G, Dh)
        s = jnp.einsum("bqkgd,bskd->bkgqs", qg, k,
                       preferred_element_type=jnp.float32)
        return s.reshape(B, H, 1, S_len)

    def grouped_out(w, v, S_len):
        """w (B,H,1,S) x v (B,S,kvH,Dh) -> (B,1,H,Dh)."""
        if G == 1:
            return jnp.einsum("bhqk,bkhd->bqhd", w, v,
                              preferred_element_type=jnp.float32)
        if gqa_self_impl == "expand":
            return jnp.einsum("bhqk,bkhd->bqhd", w, _expand_heads(v, S_len),
                              preferred_element_type=jnp.float32)
        wg = w.reshape(B, kvH, G, 1, S_len)
        o = jnp.einsum("bkgqs,bskd->bqkgd", wg, v,
                       preferred_element_type=jnp.float32)
        return o.reshape(B, 1, H, Dh)

    head_kv = jnp.arange(H) // G  # query head -> its kv head

    cross_k, cross_v = precompute_cross_kv(params, memory, dims, cd)
    if use_kernel:
        from plankassembly_tpu.ops.cross_decode import (
            cross_attn_decode, quantize_rows,
        )
        Ld = dims.num_decoder_layers
        BH = B * H
        # head-major layouts: per-(batch, head) K/V tiles are contiguous
        ck_hm = cross_k.transpose(0, 1, 3, 4, 2).reshape(Ld, BH, Dh, Li)
        cv_hm = cross_v.transpose(0, 1, 3, 2, 4).reshape(Ld, BH, Li, Dh)
        bias_bh = jnp.broadcast_to(
            jnp.where(memory_mask, NEG_INF, 0.0)[:, None, :]
            .astype(jnp.float32), (B, H, Li)).reshape(BH, Li)
        if kv_quant:
            ck_hm, ck_s = quantize_rows(ck_hm, axes=(2, 3))
            cv_hm, cv_s = quantize_rows(cv_hm, axes=(2, 3))
            ck_s = ck_s.reshape(Ld, BH, 1)
            cv_s = cv_s.reshape(Ld, BH, 1)
        else:
            ck_s = cv_s = None
        cross_k = cross_v = None  # free the (L,B,Li,H,Dh) layout
    elif use_mxu:
        # Block-diagonal-query MXU path (the TPU fast path). The per-step
        # cross-attention is B*H independent (1,Dh)x(Dh,Li) GEMVs, which XLA
        # schedules ~3.5x off the DMA roofline and a VPU kernel turns
        # compute-bound. Trick: embed the H per-head queries as the
        # block-diagonal rows of a (H, D) matrix; then
        #   scores[b] = Qblk[b] @ K_flat[b]^T      (H,D)x(D,Li)  — MXU,
        # with K_flat = memory @ wk the UNSPLIT (B, Li, D) projection, and
        #   out_full[b] = W[b] @ V_flat[b]          (H,Li)x(Li,D) — MXU,
        # from which head h keeps columns [h*Dh:(h+1)*Dh] (diagonal blocks).
        # Extra MXU FLOPs (contraction over D instead of Dh) are free at
        # these sizes; HBM still sees exactly one K/V read per step. int8
        # scales are per (b, head-block) and fold into Qblk rows / the
        # extracted output, adding no traffic.
        from plankassembly_tpu.ops.cross_decode import quantize_rows
        Ld = dims.num_decoder_layers
        k_flat = cross_k.reshape(Ld, B, Li, Dkv)
        v_flat = cross_v.reshape(Ld, B, Li, Dkv)
        if kv_quant:
            # absmax per (layer, batch, kv-head-column-block)
            k4 = k_flat.reshape(Ld, B, Li, kvH, Dh)
            v4 = v_flat.reshape(Ld, B, Li, kvH, Dh)
            k4_q, ck_s = quantize_rows(k4, axes=(2, 4))
            v4_q, cv_s = quantize_rows(v4, axes=(2, 4))
            k_flat = k4_q.reshape(Ld, B, Li, Dkv)
            v_flat = v4_q.reshape(Ld, B, Li, Dkv)
            ck_s = ck_s.reshape(Ld, B, kvH)   # (l, b, kv head)
            cv_s = cv_s.reshape(Ld, B, kvH)
        else:
            ck_s = cv_s = None
        # block-placement map: query head h reads/writes the Dh-wide column
        # block of its kv head h//G. eye(H) when G == 1 (plain MHA).
        eye_h = (head_kv[:, None] == jnp.arange(kvH)[None]).astype(jnp.float32)
        bias_b = jnp.where(memory_mask, NEG_INF, 0.0)[:, None, :]
        bias_b = bias_b.astype(jnp.float32)  # (B, 1, Li)
        cross_k = cross_v = None
    elif kv_quant:
        # int8 cross-K/V: the decode loop re-reads all cross K/V from HBM
        # every step (its dominant traffic); per-(layer,batch,head) symmetric
        # int8 halves it vs bf16. Dequant fuses into the attention matmuls.
        def _q(x):
            scale = jnp.max(jnp.abs(x), axis=(2, 4), keepdims=True) / 127.0
            scale = jnp.maximum(scale, 1e-8)
            q = jnp.round(x.astype(jnp.float32) / scale).astype(jnp.int8)
            return q, scale.astype(jnp.float32)
        ck_q, ck_s = _q(cross_k)
        cv_q, cv_s = _q(cross_v)
        cross_k = None, (ck_q, ck_s)
        cross_v = None, (cv_q, cv_s)
    cross_bias = jnp.where(memory_mask, NEG_INF, 0.0)[:, None, None, :]
    cross_bias = cross_bias.astype(jnp.float32)

    dec = params["decoder"]
    heads = params["heads"]
    L = dims.num_decoder_layers

    # per-layer parameter views (python-unrolled: the layer loop below is
    # unrolled so cache updates are in-place slice writes on the while-carry
    # buffers instead of lax.scan xs->ys stacking copies, which moved
    # ~400 MB/step at B=128)
    def _layer(tree, l):
        return jax.tree.map(lambda a: a[l], tree)

    sa_l = [_layer(dec["self_attn"], l) for l in range(L)]
    ca_l = [_layer(dec["cross_attn"], l) for l in range(L)]
    ffn_l = [_layer(dec["ffn"], l) for l in range(L)]
    n1_l = [_layer(dec["norm1"], l) for l in range(L)]
    n2_l = [_layer(dec["norm2"], l) for l in range(L)]
    n3_l = [_layer(dec["norm3"], l) for l in range(L)]
    if weight_quant and not prequantized:
        def _qw(w):
            """(K, N) -> int8 weights + per-output-channel f32 scale."""
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
        """x @ W with an optionally int8 W: dequant scale folds into the
        matmul OUTPUT (per-column), so the weight's HBM stream stays
        int8 inside the loop body."""
        y = x @ wq.astype(x.dtype)
        return y if s is None else y * s.astype(x.dtype)

    # fused QKV: one (D, 3D) matmul per self-attention instead of three.
    # Per-output-channel quantization commutes with column concatenation,
    # so pre-quantized q/k/v concat directly (int8 blocks + scale vectors).
    if prequantized:
        wqkv_q = [(jnp.concatenate([p["wq"]["q"], p["wk"]["q"],
                                    p["wv"]["q"]], axis=1),
                   jnp.concatenate([p["wq"]["s"], p["wk"]["s"],
                                    p["wv"]["s"]]))
                  for p in sa_l]
    elif weight_quant:
        # quantize from the f32 concat (bit-identical to the
        # quantize_decoder_weights -> concat order of the artifact path)
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
    if weight_quant:
        vq, vs = _qw(heads["vocab"]["w"])
        pq, ps = _qw(heads["pointer"]["w"])
        heads = {"vocab": {"w": vq, "s": vs, "b": heads["vocab"]["b"]},
                 "pointer": {"w": pq, "s": ps, "b": heads["pointer"]["b"]},
                 "switch": heads["switch"]}

    struct = jnp.asarray(pointer_structure_mask(dims))  # (S, S) {0,1}
    scale = 1.0 / math.sqrt(Dh)

    # (self-attention keeps the per-head einsum form: with only S=128 keys
    # it is already near its traffic floor, and a measured block-diagonal
    # variant was slower — tools/bench_decode_variants.py)
    if self_quant is None:
        self_quant = kv_quant
    self_quant = self_quant and use_mxu
    if self_quant:
        # int8 self-KV with one scale per appended token (finer than the
        # cross-KV per-row scales). Scales fold OUTSIDE the dots: the K
        # scale varies over the score's key axis (multiply scores), the V
        # scale folds into the attention weights — so the int8 cache is the
        # only self-attention HBM traffic.
        k_cache0 = jnp.zeros((L, B, S, kvH, Dh), jnp.int8)
        v_cache0 = jnp.zeros((L, B, S, kvH, Dh), jnp.int8)
        ks_cache0 = jnp.zeros((L, B, S, kvH), jnp.float32)
        vs_cache0 = jnp.zeros((L, B, S, kvH), jnp.float32)
    else:
        k_cache0 = jnp.zeros((L, B, S, kvH, Dh), cd)
        v_cache0 = jnp.zeros((L, B, S, kvH, Dh), cd)
        ks_cache0 = vs_cache0 = jnp.zeros((), jnp.float32)
    h_cache0 = jnp.zeros((B, S, D),
                         cd if use_mxu else jnp.float32)
    output0 = jnp.zeros((B, S), jnp.int32)
    attach0 = jnp.full((B, S), -1, jnp.int32)
    done0 = jnp.zeros((B,), bool)

    emb = params["embed"]

    def step(carry):
        (t, output, attach, done, k_cache, v_cache, ks_cache, vs_cache,
         h_cache) = carry

        # --- embed decoder input at position t (`models.py:114-138`) ---
        prev = output[:, jnp.maximum(t - 1, 0)]
        tok_embed = (emb["value"][prev]
                     + emb["coord_out"][(t - 1) % dof][None, :]
                     + emb["pos_out"][(t - 1) // dof][None, :])
        x = jnp.where(t == 0, 0.0, tok_embed)[:, None, :]  # (B, 1, D)

        pos = jnp.arange(S)
        self_bias = jnp.where(pos <= t, 0.0, NEG_INF)[None, None, None, :]

        for l in range(L):
            # self-attention with in-place cache append
            h = layer_norm(n1_l[l], x)
            qkv = (_mm(h.astype(cd), *wqkv_q[l]) + bqkv_l[l])[:, 0]  # (B, D+2Dkv)
            q = qkv[:, :D].reshape(B, 1, H, Dh)
            k_t = qkv[:, D:D + Dkv].reshape(B, 1, kvH, Dh)
            v_t = qkv[:, D + Dkv:].reshape(B, 1, kvH, Dh)
            if self_quant:
                def _q_token(x):  # (B,1,kvH,Dh) -> int8, (B,1,kvH) f32
                    xf = x.astype(jnp.float32)
                    s = jnp.maximum(
                        jnp.max(jnp.abs(xf), axis=-1) / 127.0, 1e-8)
                    return (jnp.round(xf / s[..., None]).astype(jnp.int8), s)
                k_i8, k_s = _q_token(k_t)
                v_i8, v_s = _q_token(v_t)
                k_cache = jax.lax.dynamic_update_slice(
                    k_cache, k_i8[None], (l, 0, t, 0, 0))
                v_cache = jax.lax.dynamic_update_slice(
                    v_cache, v_i8[None], (l, 0, t, 0, 0))
                ks_cache = jax.lax.dynamic_update_slice(
                    ks_cache, k_s[None], (l, 0, t, 0))
                vs_cache = jax.lax.dynamic_update_slice(
                    vs_cache, v_s[None], (l, 0, t, 0))
                scores = grouped_scores(q, k_cache[l].astype(cd), S) * scale
                # per-token K scale varies over the key axis -> fold into
                # scores; V scale folds into the attention weights. Index
                # (B,S,kvH) scales out to query heads via head_kv.
                ks_t = ks_cache[l].transpose(0, 2, 1)[:, head_kv]  # (B,H,S)
                vs_t = vs_cache[l].transpose(0, 2, 1)[:, head_kv]
                scores = scores * ks_t[:, :, None, :]
                w = jax.nn.softmax(scores + self_bias, axis=-1)
                w = w * vs_t[:, :, None, :]
                a = grouped_out(w.astype(cd), v_cache[l].astype(cd), S)
            else:
                k_cache = jax.lax.dynamic_update_slice(
                    k_cache, k_t[None], (l, 0, t, 0, 0))
                v_cache = jax.lax.dynamic_update_slice(
                    v_cache, v_t[None], (l, 0, t, 0, 0))
                scores = grouped_scores(q, k_cache[l], S) * scale
                w = jax.nn.softmax(scores + self_bias, axis=-1)
                a = grouped_out(w.astype(cd), v_cache[l], S)
            a = a.reshape(B, 1, D)
            sa = sa_l[l]
            a = _mm(a.astype(cd), *wo_q[l]) + sa["bo"].astype(cd)
            x = x + a.astype(x.dtype)

            # cross-attention against precomputed K/V
            h = layer_norm(n2_l[l], x)
            ca = ca_l[l]
            q2 = (_mm(h.astype(cd), *cq_q[l])
                  + ca["bq"].astype(cd)).reshape(B, -1, H, Dh)
            if use_kernel:
                c = cross_attn_decode(
                    q2.reshape(B * H, Dh), ck_hm[l], cv_hm[l], bias_bh,
                    None if ck_s is None else ck_s[l],
                    None if cv_s is None else cv_s[l],
                    sm_scale=scale,
                    interpret=(cross_impl == "kernel-interpret"))
                c = c.reshape(B, 1, D)
            elif use_mxu:
                qh = q2[:, 0].astype(jnp.float32)       # (B, H, Dh)
                if ck_s is not None:
                    qh = qh * ck_s[l][:, head_kv][..., None]  # fold K dequant
                qblk = (qh[:, :, None, :]
                        * eye_h[None, :, :, None]).reshape(B, H, Dkv)
                sc = jnp.einsum(
                    "bhe,ble->bhl", qblk.astype(cd), k_flat[l].astype(cd),
                    preferred_element_type=jnp.float32) * scale
                w = jax.nn.softmax(sc + bias_b, axis=-1)  # (B, H, Li)
                of = jnp.einsum(
                    "bhl,ble->bhe", w.astype(cd), v_flat[l].astype(cd),
                    preferred_element_type=jnp.float32)
                c = (of.reshape(B, H, kvH, Dh)
                     * eye_h[None, :, :, None]).sum(axis=2)  # (B, H, Dh)
                if cv_s is not None:
                    c = c * cv_s[l][:, head_kv][..., None]
                c = c.reshape(B, 1, D)
            else:
                if kv_quant:
                    ck = (cross_k[1][0][l].astype(cd)
                          * cross_k[1][1][l].astype(cd))
                    cv = (cross_v[1][0][l].astype(cd)
                          * cross_v[1][1][l].astype(cd))
                else:
                    ck, cv = cross_k[l], cross_v[l]
                scores = grouped_scores(q2, ck, Li) * scale
                w = jax.nn.softmax(scores + cross_bias, axis=-1)
                c = grouped_out(w.astype(cd), cv, Li)
                c = c.reshape(B, 1, D)
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
            h_cache, h_t[:, None].astype(h_cache.dtype), (0, t, 0))

        output, attach, done = _mixed_sample(
            heads, dims, struct, pos, h_t, h_cache, output, attach, done, t)
        return (t + 1, output, attach, done, k_cache, v_cache,
                ks_cache, vs_cache, h_cache)

    def cond(carry):
        t, _, _, done, *_ = carry
        if not early_exit:  # benchmark mode: force the full static bound
            return t < S
        return (t < S) & ~jnp.all(done)

    init = (jnp.array(0, jnp.int32), output0, attach0, done0,
            k_cache0, v_cache0, ks_cache0, vs_cache0, h_cache0)
    t, output, attach, done, *_ = jax.lax.while_loop(cond, step, init)

    return {"samples": output, "attach": attach, "num_steps": t}


def _mixed_sample(heads, dims: ModelDims, struct, pos, h_t, h_cache,
                  output, attach, done, t):
    """Shared sampling tail: mixed vocab ‖ pointer ‖ switch distribution and
    greedy pointer-resolving argmax (`models.py:168-186,235-256`), including
    the reference quirks (eps-fill of structurally illegal pointer slots,
    plain-vocab argmax for the first plank's 6 coords)."""
    S = dims.max_output_length
    dof = dims.num_output_dof

    def _head_mm(head):
        """h_t @ w + b with an optionally int8-quantized w (see
        decode_from_memory(weight_quant=True): 's' is the per-column
        dequant scale)."""
        y = h_t @ head["w"].astype(h_t.dtype)
        if "s" in head:
            y = y * head["s"]
        return y + head["b"]

    vocab_logits = _head_mm(heads["vocab"])
    vocab_probs = jax.nn.softmax(vocab_logits, axis=-1)

    feature = _head_mm(heads["pointer"])
    pointer_logits = jnp.einsum("bd,bsd->bs", feature, h_cache)
    pointer_logits = pointer_logits / dims.num_model
    prob = jax.nn.sigmoid(h_t @ heads["switch"]["w"] + heads["switch"]["b"])

    triu_bias = jnp.where(pos >= t, NEG_INF, 0.0)[None, :]
    pointer_probs = jax.nn.softmax(pointer_logits + triu_bias, axis=-1) * prob
    struct_row = struct[t]  # (S,)
    pointer_probs = jnp.where(struct_row[None, :] == 0, EPS, pointer_probs)
    # restrict candidates to j <= t (the reference dist is only t+1 wide)
    pointer_probs = jnp.where(pos[None, :] > t, -1.0, pointer_probs)

    mixed = jnp.concatenate([vocab_probs * (1 - prob), pointer_probs], axis=-1)
    mixed_idx = jnp.argmax(mixed, axis=-1)
    vocab_idx = jnp.argmax(vocab_logits, axis=-1)

    # `if sz < 6: return vocab_dists` (`models.py:172-173`)
    idx = jnp.where(t + 1 < dof, vocab_idx, mixed_idx).astype(jnp.int32)

    is_ptr = idx >= dims.vocab_size
    ptr = jnp.clip(idx - dims.vocab_size, 0, S - 1)
    copied = jnp.take_along_axis(output, ptr[:, None], axis=1)[:, 0]
    token = jnp.where(is_ptr, copied, idx)
    attach_t = jnp.where(is_ptr, ptr, -1)

    output = output.at[:, t].set(token)
    attach = attach.at[:, t].set(attach_t)
    done = done | (token == dims.end)
    return output, attach, done


def _decode_fused(params, memory, memory_mask, dims: ModelDims,
                  compute_dtype=jnp.bfloat16, early_exit=True,
                  interpret=False):
    """Decode loop built on the fused decoder-layer Pallas kernel
    (`ops/fused_decode.py`): each step is 6 kernel launches + the sampling
    tail instead of ~170 small HLO ops. Implies int8 K/V caches (self and
    cross) — the kernel's only storage format — and MHA (kvH == H; the
    kernel's 128-lane head-pair layout; GQA decode uses the mxu path,
    already H/kvH lighter on HBM by construction). Numerics match the
    `cross_impl="mxu", kv_quant=True` path up to f32-accumulation order.
    """
    from plankassembly_tpu.ops.cross_decode import quantize_rows
    from plankassembly_tpu.ops.fused_decode import fused_decoder_layer

    cd = compute_dtype
    S = dims.max_output_length
    H, Dh, D = dims.num_head, dims.head_dim, dims.num_model
    kvH = dims.kv_heads
    if kvH != H:
        raise ValueError(
            "cross_impl='fused' requires MHA "
            f"(H={H}, kvH={kvH}); use cross_impl='mxu' for GQA/MQA")
    L = dims.num_decoder_layers
    dof = dims.num_output_dof
    B, Li = memory.shape[0], memory.shape[1]

    CH = min(128, Li)
    if Li % CH:
        raise ValueError(f"fused decode needs Li % {CH} == 0, got {Li}")
    NCH = Li // CH

    cross_k, cross_v = precompute_cross_kv(params, memory, dims, cd)
    k4q, ck_s = quantize_rows(cross_k, axes=(2, 4))   # (L,B,Li,H,Dh) int8
    v4q, cv_s = quantize_rows(cross_v, axes=(2, 4))

    # per-layer python lists (NOT a stacked carry: leading-axis slices inside
    # the loop body would materialize 33+ MB copies per step); chunked
    # contraction-major layouts per the kernel's alignment rules
    ck_l = [k4q[l].reshape(B, Li, D).transpose(0, 2, 1)
            .reshape(B, D, NCH, CH).transpose(0, 2, 1, 3)
            for l in range(L)]                        # (B, NCH, D, CH)
    cv_l = [v4q[l].reshape(B, NCH, CH, D) for l in range(L)]
    cks_l = [ck_s[l].reshape(B, H) for l in range(L)]
    cvs_l = [cv_s[l].reshape(B, H) for l in range(L)]
    cbias = (jnp.where(memory_mask, NEG_INF, 0.0).astype(jnp.float32)
             .reshape(B, NCH, CH).transpose(1, 0, 2))  # (NCH, B, CH)

    dec = params["decoder"]
    heads = params["heads"]

    def _layer(tree, l):
        return jax.tree.map(lambda a: a[l], tree)

    sa_l = [_layer(dec["self_attn"], l) for l in range(L)]
    ca_l = [_layer(dec["cross_attn"], l) for l in range(L)]
    ffn_l = [_layer(dec["ffn"], l) for l in range(L)]
    wqkv_l = [jnp.concatenate([p["wq"], p["wk"], p["wv"]], axis=1).astype(cd)
              for p in sa_l]
    bqkv_l = [jnp.concatenate([p["bq"], p["bk"], p["bv"]]) for p in sa_l]
    ln_l = [jnp.stack([_layer(dec["norm1"], l)["scale"],
                       _layer(dec["norm1"], l)["bias"],
                       _layer(dec["norm2"], l)["scale"],
                       _layer(dec["norm2"], l)["bias"],
                       _layer(dec["norm3"], l)["scale"],
                       _layer(dec["norm3"], l)["bias"]])
            for l in range(L)]

    struct = jnp.asarray(pointer_structure_mask(dims))  # (S, S) {0,1}
    scale = 1.0 / math.sqrt(Dh)
    pos = jnp.arange(S)
    emb = params["embed"]

    k_caches0 = tuple(jnp.zeros((B, D, S), jnp.int8) for _ in range(L))
    v_caches0 = tuple(jnp.zeros((B, S, D), jnp.int8) for _ in range(L))
    ks_caches0 = tuple(jnp.zeros((B, H, S), jnp.float32) for _ in range(L))
    vs_caches0 = tuple(jnp.zeros((B, H, S), jnp.float32) for _ in range(L))
    h_cache0 = jnp.zeros((B, S, D), cd)
    output0 = jnp.zeros((B, S), jnp.int32)
    attach0 = jnp.full((B, S), -1, jnp.int32)
    done0 = jnp.zeros((B,), bool)

    def step(carry):
        (t, output, attach, done, k_caches, v_caches, ks_caches, vs_caches,
         h_cache) = carry

        prev = output[:, jnp.maximum(t - 1, 0)]
        tok_embed = (emb["value"][prev]
                     + emb["coord_out"][(t - 1) % dof][None, :]
                     + emb["pos_out"][(t - 1) // dof][None, :])
        x = jnp.where(t == 0, 0.0, tok_embed)  # (B, D) f32

        k_caches, v_caches = list(k_caches), list(v_caches)
        ks_caches, vs_caches = list(ks_caches), list(vs_caches)
        for l in range(L):
            sa, ca, f = sa_l[l], ca_l[l], ffn_l[l]
            x, nk, nv, nks, nvs = fused_decoder_layer(
                x, t, wqkv_l[l], bqkv_l[l], sa["wo"], sa["bo"],
                ca["wq"], ca["bq"], ca["wo"], ca["bo"],
                f["w1"], f["b1"], f["w2"], f["b2"], ln_l[l],
                k_caches[l], v_caches[l], ks_caches[l], vs_caches[l],
                ck_l[l], cv_l[l], cks_l[l], cvs_l[l], cbias,
                H=H, Dh=Dh, sm_scale=scale, cd=cd,
                interpret=interpret)
            k_caches[l] = jax.lax.dynamic_update_slice(
                k_caches[l], nk[:, :, None], (0, 0, t))   # (B, D, S) col t
            v_caches[l] = jax.lax.dynamic_update_slice(
                v_caches[l], nv[:, None, :], (0, t, 0))
            ks_caches[l] = jax.lax.dynamic_update_slice(
                ks_caches[l], nks[:, :, None], (0, 0, t))
            vs_caches[l] = jax.lax.dynamic_update_slice(
                vs_caches[l], nvs[:, :, None], (0, 0, t))

        h_t = layer_norm(dec["final_norm"], x).astype(jnp.float32)  # (B, D)
        h_cache = jax.lax.dynamic_update_slice(
            h_cache, h_t[:, None].astype(h_cache.dtype), (0, t, 0))

        output, attach, done = _mixed_sample(
            heads, dims, struct, pos, h_t, h_cache, output, attach, done, t)
        return (t + 1, output, attach, done, tuple(k_caches),
                tuple(v_caches), tuple(ks_caches), tuple(vs_caches), h_cache)

    def cond(carry):
        t, _, _, done, *_ = carry
        if not early_exit:  # benchmark mode: force the full static bound
            return t < S
        return (t < S) & ~jnp.all(done)

    init = (jnp.array(0, jnp.int32), output0, attach0, done0,
            k_caches0, v_caches0, ks_caches0, vs_caches0, h_cache0)
    t, output, attach, done, *_ = jax.lax.while_loop(cond, step, init)

    return {"samples": output, "attach": attach, "num_steps": t}


@partial(jax.jit, static_argnames=("dims", "compute_dtype", "early_exit"))
def greedy_decode_nocache(params, batch, dims: ModelDims,
                          compute_dtype=jnp.bfloat16, early_exit=True):
    """Algorithmically faithful port of the reference eval loop — NO KV
    cache: every step re-embeds the whole prefix and re-runs the full
    decoder stack (`models.py:284-307`). Exists for two reasons:

    1. parity oracle for `greedy_decode` (same outputs, different schedule);
    2. the performance baseline `bench.py` reports speedups against.

    Uses a static 128-iteration `fori_loop` over full-length (S) padded
    prefixes with position masking, which is the only static-shape way to
    express the reference's growing-prefix recompute.
    """
    from plankassembly_tpu.models.model import decode_stack, embed_output

    cd = compute_dtype
    S = dims.max_output_length
    dof = dims.num_output_dof

    inputs = {k: v for k, v in batch.items() if k.startswith("input")}
    memory = encode(params, inputs, dims, deterministic=True, compute_dtype=cd,
                    flash=True)
    B = memory.shape[0]
    heads = params["heads"]
    struct = jnp.asarray(pointer_structure_mask(dims))
    cross_bias = jnp.where(inputs["input_mask"], NEG_INF, 0.0)[:, None, None, :]

    pos = jnp.arange(S)
    causal = jnp.where(pos[None, :] <= pos[:, None], 0.0, NEG_INF)[None, None]

    def step(t, carry):
        output, attach, done = carry
        # embed the full prefix; positions > t are garbage but masked out
        x = embed_output(params, output[:, : S - 1], dims)  # (B, S, D)
        # mask keys beyond the current prefix (queries > t are garbage but
        # only row t is read)
        prefix_bias = jnp.where(pos <= t, 0.0, NEG_INF)[None, None, None, :]
        hiddens = decode_stack(params, x, memory, causal + prefix_bias,
                               cross_bias, dims, deterministic=True,
                               compute_dtype=cd)
        h_t = hiddens[jnp.arange(B), t].astype(jnp.float32)  # (B, D)
        h_all = hiddens.astype(jnp.float32)

        vocab_logits = h_t @ heads["vocab"]["w"] + heads["vocab"]["b"]
        vocab_probs = jax.nn.softmax(vocab_logits, axis=-1)
        feature = h_t @ heads["pointer"]["w"] + heads["pointer"]["b"]
        pointer_logits = jnp.einsum("bd,bsd->bs", feature, h_all) / dims.num_model
        prob = jax.nn.sigmoid(h_t @ heads["switch"]["w"] + heads["switch"]["b"])

        triu_bias = jnp.where(pos >= t, NEG_INF, 0.0)[None, :]
        pointer_probs = jax.nn.softmax(pointer_logits + triu_bias, axis=-1) * prob
        pointer_probs = jnp.where(struct[t][None, :] == 0, EPS, pointer_probs)
        pointer_probs = jnp.where(pos[None, :] > t, -1.0, pointer_probs)

        mixed = jnp.concatenate([vocab_probs * (1 - prob), pointer_probs], axis=-1)
        idx = jnp.where(t + 1 < dof,
                        jnp.argmax(vocab_logits, axis=-1),
                        jnp.argmax(mixed, axis=-1)).astype(jnp.int32)

        is_ptr = idx >= dims.vocab_size
        ptr = jnp.clip(idx - dims.vocab_size, 0, S - 1)
        copied = jnp.take_along_axis(output, ptr[:, None], axis=1)[:, 0]
        token = jnp.where(is_ptr, copied, idx)
        output = output.at[:, t].set(token)
        attach = attach.at[:, t].set(jnp.where(is_ptr, ptr, -1))
        done = done | (token == dims.end)
        return output, attach, done

    output0 = jnp.zeros((B, S), jnp.int32)
    attach0 = jnp.full((B, S), -1, jnp.int32)
    done0 = jnp.zeros((B,), bool)

    def cond(carry):
        t, state = carry
        if not early_exit:  # benchmark mode: force the full static bound
            return t < S
        return (t < S) & ~jnp.all(state[2])

    def body(carry):
        t, state = carry
        return t + 1, step(t, state)

    t, (output, attach, done) = jax.lax.while_loop(
        cond, body, (jnp.array(0, jnp.int32), (output0, attach0, done0)))
    return {"samples": output, "attach": attach, "num_steps": t}


def pick_kv_bucket(input_mask, quantum: int = 128) -> int:
    """Smallest multiple of `quantum` covering every real (non-pad) input
    token in the batch. Static-shape-friendly: at most Li/quantum distinct
    buckets ever compile. Multi-host: inspects only this process's
    addressable shards, then maxes across processes (the bucket is a static
    compile argument, so every process must pick the same one)."""
    width = int(input_mask.shape[-1])
    if (hasattr(input_mask, "is_fully_addressable")
            and not input_mask.is_fully_addressable):
        shards = [np.asarray(s.data) for s in input_mask.addressable_shards]
        lengths = np.concatenate(
            [(~m).sum(axis=-1).ravel() for m in shards])
        max_len = int(lengths.max()) if lengths.size else quantum
        from jax.experimental import multihost_utils
        max_len = int(np.max(multihost_utils.process_allgather(
            np.asarray(max_len, np.int32))))
    else:
        lengths = np.asarray(~np.asarray(input_mask),
                             dtype=np.int64).sum(axis=-1)
        max_len = int(lengths.max()) if lengths.size else quantum
    bucket = int(-(-max_len // quantum) * quantum)
    return min(bucket, width)


def parse_sequence(sequence: np.ndarray, dims: ModelDims) -> np.ndarray:
    """Host-side: truncate at the first END and reshape to (P, 6)
    (`parse_sequence`, `models.py:258-265`)."""
    sequence = np.asarray(sequence)
    ends = np.flatnonzero(sequence == dims.end)
    valid = sequence[: ends[0]] if len(ends) else sequence
    num_plank = len(valid) // dims.num_output_dof
    return valid[: num_plank * dims.num_output_dof].reshape(-1, dims.num_output_dof)


def eval_step(params, batch, dims: ModelDims, compute_dtype=jnp.bfloat16):
    """Full reference `eval_step` (`models.py:267-323`): decode + host parse.

    Returns dict with device arrays 'samples'/'attach' and per-sample python
    lists 'predicts'/'groundtruths' of (P, 6) int arrays.
    """
    inputs = {k: v for k, v in batch.items() if k.startswith("input")}
    bucket = pick_kv_bucket(inputs["input_mask"])
    out = greedy_decode(params, inputs, dims, compute_dtype=compute_dtype,
                        kv_bucket=bucket)
    samples = np.asarray(out["samples"])
    gts = np.asarray(batch["output_value"])

    predicts = [parse_sequence(samples[i], dims) for i in range(len(samples))]
    groundtruths = [parse_sequence(gts[i], dims) for i in range(len(gts))]

    return {
        "samples": samples,
        "attach": np.asarray(out["attach"]),
        "num_steps": int(out["num_steps"]),
        "predicts": predicts,
        "groundtruths": groundtruths,
    }
