"""Pallas fused cross-attention kernel for the KV-cached decode loop.

The decode loop's dominant cost is re-reading every layer's cross-attention
K/V from HBM each step (SURVEY.md §3.2; the reference hot loop is
`plankassembly/models.py:284-307`). XLA expresses the per-step attention as
B*H batched (1, Dh) x (Dh, Li) GEMVs and measures ~3.5x off the pure DMA
roofline for that traffic (tools/bench_decode_variants.py). This kernel
fixes the two structural problems:

1. layout — K is stored head-major as (B*H, Dh, Li) and V as (B*H, Li, Dh)
   so each grid step DMAs fully contiguous per-(batch, head) tiles instead
   of 64-byte rows at 512-byte stride;
2. fusion — dequantize (int8 path) -> q.K -> bias -> softmax -> p.V -> scale
   happens entirely in VMEM; HBM sees exactly one read of K and V.

Quantized K/V carry one symmetric scale per (batch, head) row, folded into
the softmax scale (K) and the output (V), so the int8 path adds zero extra
HBM traffic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, bias_ref, ks_ref, vs_ref, o_ref, *,
            sm_scale):
    q = q_ref[...].astype(jnp.float32)              # (RB, Dh)
    k = k_ref[...].astype(jnp.float32)              # (RB, Dh, Li)
    scores = jnp.sum(q[:, :, None] * k, axis=1)     # (RB, Li)
    scores = scores * (sm_scale * ks_ref[...])      # ks: (RB, 1)
    scores = scores + bias_ref[...]

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    v = v_ref[...].astype(jnp.float32)              # (RB, Li, Dh)
    out = jnp.sum(p[:, :, None] * v, axis=1)        # (RB, Dh)
    o_ref[...] = (out * vs_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_rows",
                                             "interpret"))
def cross_attn_decode(q, k, v, bias, k_scale=None, v_scale=None, *,
                      sm_scale: float, block_rows: int = 16,
                      interpret: bool = False):
    """One decode step of cross-attention for all (batch, head) rows.

    q       (BH, Dh)  query at the current position (bf16/f32)
    k       (BH, Dh, Li) keys, head-major + Dh-major (int8 or bf16)
    v       (BH, Li, Dh) values (int8 or bf16)
    bias    (BH, Li) f32 additive mask (0 / -inf on padded keys)
    k_scale (BH, 1) f32 per-row dequant scale for k (None = 1.0)
    v_scale (BH, 1) f32 per-row dequant scale for v (None = 1.0)
    returns (BH, Dh) f32
    """
    BH, Dh = q.shape
    Li = k.shape[2]
    ones = jnp.ones((BH, 1), jnp.float32)
    k_scale = ones if k_scale is None else k_scale.reshape(BH, 1)
    v_scale = ones if v_scale is None else v_scale.reshape(BH, 1)

    rb = min(block_rows, BH)
    pad = (-BH) % rb
    if pad:
        zf = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        q, k, v, bias = zf(q), zf(k), zf(v), zf(bias)
        k_scale, v_scale = zf(k_scale), zf(v_scale)
    n = (BH + pad) // rb

    out = pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((rb, Dh), lambda i: (i, 0)),
            pl.BlockSpec((rb, Dh, Li), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, Li, Dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, Li), lambda i: (i, 0)),
            pl.BlockSpec((rb, 1), lambda i: (i, 0)),
            pl.BlockSpec((rb, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((rb, Dh), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH + pad, Dh), jnp.float32),
        interpret=interpret,
    )(q, k, v, bias, k_scale, v_scale)
    return out[:BH]


def quantize_rows(x, axes):
    """Symmetric int8 quantization with one scale per leading row.

    x: float array; `axes`: the axes reduced for the per-row absmax.
    Returns (int8 values, f32 scales shaped like x with `axes` size-1).
    """
    scale = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes,
                    keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.round(x.astype(jnp.float32) / scale).astype(jnp.int8)
    return q, scale.astype(jnp.float32)
