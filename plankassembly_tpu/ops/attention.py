"""Pallas fused attention kernels for TPU.

The reference leans on cuDNN attention inside `torch.nn.Transformer`
(`plankassembly/models.py:59-69`); here the fused kernel is written in
Pallas/Mosaic — the TPU-native kernel language (SURVEY.md §2.4).

Shape regime: sequences are short (<= 1280 keys) and head_dim is 64, so the
entire K/V for one (batch, head) fits comfortably in VMEM (1280 x 64 x 2B =
160 KB). The kernel therefore processes one query block against the full
key range per grid cell — no streaming online-softmax pass is needed, which
keeps the softmax exact in a single shot while still fusing
QK^T -> mask -> softmax -> PV into one VMEM-resident kernel.

Masking is length-based: padded keys form a suffix in this framework's
packing (`data/packing.py`), so a per-batch `kv_length` scalar (prefetched
to SMEM) replaces a full (B, Lk) mask array. Optional causal masking covers
the decoder self-attention. Written blockwise over queries so a future
sequence-parallel mesh axis can shard Lq.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _attn_kernel(lengths_ref, q_ref, k_ref, v_ref, o_ref, *, sm_scale,
                 causal, block_q):
    b = pl.program_id(0)
    qi = pl.program_id(2)

    q = q_ref[0, 0].astype(jnp.float32)  # (BQ, Dh)
    k = k_ref[0, 0].astype(jnp.float32)  # (Lk, Dh)
    v = v_ref[0, 0].astype(jnp.float32)  # (Lk, Dh)

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale  # (BQ, Lk)

    lk = k.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    mask = col < lengths_ref[b]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
        mask = mask & (col <= row + qi * block_q)
    scores = jnp.where(mask, scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) / denom
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("causal", "sm_scale", "block_q",
                                             "interpret"))
def flash_attention(q, k, v, kv_lengths, *, causal=False, sm_scale=None,
                    block_q=128, interpret=False):
    """Fused attention. q (B,H,Lq,Dh), k/v (B,H,Lk,Dh),
    kv_lengths (B,) int32 — keys >= length are masked. Returns (B,H,Lq,Dh)
    in q.dtype."""
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    sm_scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(Dh)

    # pad sequence dims to TPU-friendly multiples
    lq_pad = -Lq % block_q
    lk_pad = -Lk % 128
    qp = _pad_to(q, Lq + lq_pad, 2)
    kp = _pad_to(k, Lk + lk_pad, 2)
    vp = _pad_to(v, Lk + lk_pad, 2)
    Lqp, Lkp = Lq + lq_pad, Lk + lk_pad

    grid = (B, H, Lqp // block_q)
    kernel = functools.partial(_attn_kernel, sm_scale=sm_scale, causal=causal,
                               block_q=block_q)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, Dh),
                             lambda b, h, i, lens: (b, h, i, 0)),
                pl.BlockSpec((1, 1, Lkp, Dh), lambda b, h, i, lens: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, Lkp, Dh), lambda b, h, i, lens: (b, h, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, Dh),
                                   lambda b, h, i, lens: (b, h, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Lqp, Dh), q.dtype),
        interpret=interpret,
    )(kv_lengths.astype(jnp.int32), qp, kp, vp)

    return out[:, :, :Lq]


def xla_attention(q, k, v, kv_lengths, *, causal=False, sm_scale=None):
    """Reference XLA implementation with identical semantics (parity tests
    + non-TPU fallback)."""
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    sm_scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(Dh)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * sm_scale
    col = jnp.arange(Lk)
    mask = col[None, None, None, :] < kv_lengths[:, None, None, None]
    if causal:
        mask = mask & (col[None, None, None, :]
                       <= jnp.arange(Lq)[None, None, :, None])
    scores = jnp.where(mask, scores, NEG_INF)
    w = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(q.dtype), v)
