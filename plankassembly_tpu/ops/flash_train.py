"""Differentiable fused attention with in-kernel dropout (training path).

Motivation (measured on v5e, flagship shapes B=64, L=1199): the XLA training
step spends most of its time materializing (B, H, L, L) float32 attention
scores and, worse, (B, H, L, L) dropout masks via jax.random — ~780 ms of a
1.2 s step. This kernel fuses QK^T -> mask -> softmax -> dropout -> PV in
VMEM and implements a custom VJP that *recomputes* the softmax and
*regenerates* the identical dropout bits from the same counter-based seed in
the backward pass — so neither the scores nor the masks ever touch HBM.

Residuals stored: just (q, k, v) — unlike streaming flash attention this
kernel sees the full key range per query block, so the backward recomputes
the softmax normalizers locally instead of storing LSE (whose (B, H, Lq)
layout would also fight TPU block-tiling rules).

Backward math (O = W V with W = softmax(S) ∘ M / (1-p), M = keep mask):
    dV  = W^T dO
    dW  = dO V^T
    dA  = dW ∘ M / (1-p)
    dS  = A ∘ (dA - rowsum(dA ∘ A))         (A = softmax(S))
    dQ  = dS K * scale,  dK = dS^T Q * scale
dK/dV accumulate across query blocks via revisited output blocks (TPU grid
is sequential; the (b, h) output block stays resident while qi iterates).

Dropout bits come from a counter-based integer hash (xorshift-multiply
rounds over (row, col, cell-seed)) computed as plain VPU arithmetic —
forward and backward regenerate identical masks *by construction*, with no
dependence on hardware PRNG state or compiler tiling (the Mosaic
`prng_random_bits` stream is not guaranteed stable across distinct
kernels). The mask distribution matches standard inverted dropout; the bit
stream differs from jax.random (documented, tested statistically).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _cell_seed(seed_ref, b, h, qi):
    # distinct odd-prime mix per grid cell; identical in fwd and bwd
    return seed_ref[0] + b * 7919 + h * 104729 + qi * 1299721


def _dropout_mask(shape, rate, seed):
    """Counter-based keep mask: integer hash of (row, col, seed).

    Pure arithmetic (wrapping int32 ops + bitcasts) — bit-identical wherever
    it is evaluated, unlike the hardware PRNG whose lane assignment is a
    compiler detail. Two xorshift-multiply finalizer rounds (murmur3-style)
    are plenty for dropout-quality randomness.
    """
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    x = r * jnp.int32(-1640531527)  # 0x9E3779B9 (golden-ratio odd constant)
    x = x ^ (c * jnp.int32(-2048144789))  # 0x85EBCA6B
    x = x + seed * jnp.int32(-1028477387)  # 0xC2B2AE35
    ux = jax.lax.bitcast_convert_type(x, jnp.uint32)
    ux = ux ^ (ux >> 16)
    ux = ux * jnp.uint32(0x7FEB352D)
    ux = ux ^ (ux >> 15)
    ux = ux * jnp.uint32(0x846CA68B)
    ux = ux ^ (ux >> 16)
    threshold = np.uint32(min(int(rate * (2.0**32)), 2**32 - 1))
    return ux >= threshold  # keep with prob 1-rate


def _fwd_kernel(lengths_ref, seed_ref, q_ref, k_ref, v_ref, o_ref, *,
                sm_scale, causal, block_q, rate):
    b, h, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = col < lengths_ref[b]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        mask = mask & (col <= row + qi * block_q)
    s = jnp.where(mask, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    a = p / l

    if rate > 0.0:
        keep = _dropout_mask(a.shape, rate, _cell_seed(seed_ref, b, h, qi))
        a = jnp.where(keep, a / (1.0 - rate), 0.0)

    o = jax.lax.dot_general(a, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _bwd_kernel(lengths_ref, seed_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, sm_scale, causal, block_q, rate):
    b, h, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(qi == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = col < lengths_ref[b]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        mask = mask & (col <= row + qi * block_q)
    s = jnp.where(mask, s, NEG_INF)
    # recompute the softmax normalizers (full key range is resident, so no
    # stored LSE residual is needed; bitwise-identical to the forward)
    m = jnp.max(s, axis=-1, keepdims=True)
    p_ = jnp.exp(s - m)
    l = jnp.sum(p_, axis=-1, keepdims=True)
    a = p_ / l

    if rate > 0.0:
        keep = _dropout_mask(a.shape, rate, _cell_seed(seed_ref, b, h, qi))
        w = jnp.where(keep, a / (1.0 - rate), 0.0)
    else:
        w = a

    # dV += W^T dO
    dv_ref[0, 0] += jax.lax.dot_general(
        w, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)

    dw = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if rate > 0.0:
        da = jnp.where(keep, dw / (1.0 - rate), 0.0)
    else:
        da = dw
    ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))

    dq_ref[0, 0] = (jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale).astype(dq_ref.dtype)
    dk_ref[0, 0] += (jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale).astype(dk_ref.dtype)


def _pad_seq(x, size):
    pad = size - x.shape[2]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def fused_attention_train(q, k, v, kv_lengths, seed, rate=0.0, causal=False,
                          sm_scale=None, block_q=512, interpret=False):
    """Fused attention with optional in-kernel dropout; differentiable.

    q (B,H,Lq,Dh), k/v (B,H,Lk,Dh), kv_lengths (B,) int32, seed () int32.
    """
    out, _ = _fwd(q, k, v, kv_lengths, seed, rate, causal, sm_scale, block_q,
                  interpret)
    return out


def _plan(q, k, block_q):
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    block_q = min(block_q, max(128, 1 << (Lq - 1).bit_length()))
    lq_pad = -Lq % block_q
    lk_pad = -Lk % 128
    return B, H, Lq, Dh, Lk, block_q, Lq + lq_pad, Lk + lk_pad


def _fwd(q, k, v, kv_lengths, seed, rate, causal, sm_scale, block_q,
         interpret):
    B, H, Lq, Dh, Lk, block_q, Lqp, Lkp = _plan(q, k, block_q)
    sm_scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(Dh)
    qp, kp, vp = _pad_seq(q, Lqp), _pad_seq(k, Lkp), _pad_seq(v, Lkp)

    kernel = functools.partial(_fwd_kernel, sm_scale=sm_scale, causal=causal,
                               block_q=block_q, rate=rate)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, H, Lqp // block_q),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, Dh),
                             lambda b, h, i, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, Lkp, Dh), lambda b, h, i, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, Lkp, Dh), lambda b, h, i, *_: (b, h, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, Dh),
                                   lambda b, h, i, *_: (b, h, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Lqp, Dh), q.dtype),
        interpret=interpret,
    )(kv_lengths.astype(jnp.int32), jnp.asarray(seed, jnp.int32).reshape(1),
      qp, kp, vp)

    out = out[:, :, :Lq]
    return out, (q, k, v, kv_lengths, seed)


def _bwd(rate, causal, sm_scale, block_q, interpret, residuals, g):
    q, k, v, kv_lengths, seed = residuals
    B, H, Lq, Dh, Lk, block_q, Lqp, Lkp = _plan(q, k, block_q)
    sm_scale_v = sm_scale if sm_scale is not None else 1.0 / math.sqrt(Dh)
    qp, kp, vp = _pad_seq(q, Lqp), _pad_seq(k, Lkp), _pad_seq(v, Lkp)
    gp = _pad_seq(g, Lqp)

    kernel = functools.partial(_bwd_kernel, sm_scale=sm_scale_v,
                               causal=causal, block_q=block_q, rate=rate)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, H, Lqp // block_q),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, Dh),
                             lambda b, h, i, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, Lkp, Dh), lambda b, h, i, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, Lkp, Dh), lambda b, h, i, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, block_q, Dh),
                             lambda b, h, i, *_: (b, h, i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_q, Dh),
                             lambda b, h, i, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, Lkp, Dh), lambda b, h, i, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, Lkp, Dh), lambda b, h, i, *_: (b, h, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Lqp, Dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, Lkp, Dh), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Lkp, Dh), jnp.float32),
        ],
        interpret=interpret,
    )(kv_lengths.astype(jnp.int32), jnp.asarray(seed, jnp.int32).reshape(1),
      qp, kp, vp, gp)

    return (dq[:, :, :Lq], dk[:, :, :Lk].astype(k.dtype),
            dv[:, :, :Lk].astype(v.dtype), None, None)


def _fwd_rule(q, k, v, kv_lengths, seed, rate, causal, sm_scale, block_q,
              interpret):
    return _fwd(q, k, v, kv_lengths, seed, rate, causal, sm_scale, block_q,
                interpret)


fused_attention_train.defvjp(_fwd_rule, _bwd)
