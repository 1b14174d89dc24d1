"""Persistent Pallas decode kernel: the WHOLE greedy decode loop in one
kernel launch.

Third (and per VERDICT r2, final) generation of the fused-decode
experiment. v1/v2 (`ops/fused_decode.py`) fused one decoder layer per
launch and measured SLOWER than XLA's while_loop schedule (5.49 vs 2.24
ms/step at B=256 MHA) — per-step launch/carry overhead plus per-row
scatter loops ate the fusion win. This generation changes both:

  * persistent: `lax.fori_loop` over all S decode steps runs INSIDE the
    kernel — zero launches after the first, no while-carry copies, and
    the cache DMA for block b+1 overlaps block b's compute;
  * no scatter loops: every batch-row placement that v2 did with a
    python loop over rows (Qbig scatter, P_big scatter, diagonal
    extraction) is a static masked matmul / lane-concat here
    (`collapse`/`spread`/`rowmerge` matrices, `concat + iota-mask`), so
    the layer body is straight-line MXU/VPU code;
  * phase-split projections: QKV / attention-output / FFN projections
    run as full-batch (B-row) matmuls once per layer, not per 8-row
    block — M=8 matmuls waste 15/16 of the MXU sublanes, M=B none.

MEASURED (v5e-1, flagship dims, Li=512, full 128-step bound,
tools/compile_persistent.py): kv=2 B=512 rb=16 1.835 ms/step = 2179.8
programs/s decode-only — 2.07x the best XLA while_loop schedule
(1.896 ms at its own optimal batch); B=256 rb=16 1.058 ms (1890.7).
MHA (kv=8) measures 2.364 ms and LOSES to XLA's 2.229: its 4x-larger
int8 cross-KV stream is BW-bound, so the schedule win doesn't apply —
this kernel is the GQA serving path. rb=32 regresses (2.338 ms);
B=1024 hung pre-first-run (>15 min, unmeasured). Full sweep in
results/RUNS_r3.md; on-chip bf16 token agreement vs mxu 95.3%
(rounding-tie divergence only).

B=1024 HANG LOCALIZED (r5, tools/probe_b1024.py): the kernel LOWERS in
2.5 s and COMPILES in 12.8 s at B=1024 rb=16 (probe JSON in
results/ROUND5.md) — Mosaic/XLA compilation is NOT the hang; the wedge
is in the FIRST EXECUTION of the compiled kernel. Execute-stage
bisection was deliberately not run on the shared v5e chip: a
mid-execution kill wedges the device ~25 min (r3), and every serving /
bench capture rides the same chip. Expected-throughput math says a
healthy B=1024 run would finish in <1 s (2x the 235 ms B=512 wall), so
the >15 min stall is a runtime deadlock/livelock (most plausibly the
manual DMA double-buffer semaphore chain at 64 grid blocks x 128 steps,
or VMEM oversubscription at the 128 MB limit stalling the scoreboard),
not slowness. The B <= 512 dispatch guard below stays; lift it only via
PLANK_PERSISTENT_UNSAFE_LARGE_B=1 on a chip you can afford to wedge.

Semantics match `decode.greedy_decode(kv_quant=True, self_quant=False)`
at the token level (tests/test_persistent_decode.py): int8
per-(layer,row,kv-head) cross K/V with the K scale folded into the
query and the V scale into the attention output; bf16 self K/V cache;
exact `_mixed_sample` tail including the eps-fill / first-plank /
tie-break quirks (`decode.py:457-497`). early_exit=False (benchmark
mode) runs the full static bound; early_exit=True (r4, serving mode)
predicates each step on an SMEM done flag so once every row has emitted
END the remaining iterations cost µs — the in-launch analogue of the
reference's eval-loop break. Reference anchor: replaces the
autoregressive loop of `plankassembly/models.py:284-307` wholesale.

Layouts (append-friendly; every contraction is an MXU NN/NT/TN dot —
all constructs probed in tools/probe_persistent.py):

  cross K   (L, B, Dkv, Li) int8   contraction-major, NN dot vs Qbig
  cross V   (L, B, Li, Dkv) int8   NN dot vs P_big
  self K/V  (L, B, S, Dkv)  bf16   append (RB,1,Dkv) at sublane t;
                                   scores NT dot, output TN dot
  h_cache   (B, S, D)       bf16   append (RB,1,D); pointer NT dot
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
EPS = 1e-6


def _rup(x, m):
    return (x + m - 1) // m * m


def _make_kernel(*, B, RB, H, kvH, Dh, S, Li, L, F, D, V, VP, dof, cd,
                 END, early_exit):
    NB = B // RB
    NR = RB * H
    G = H // kvH
    Dkv = kvH * Dh
    f32 = jnp.float32
    sm_scale = 1.0 / math.sqrt(Dh)
    W1 = D + 2 * Dkv                       # qkv block width in pack1

    def kernel(pack1_h, w1_h, w2_h, b_h, hwhi_h, hwlo_h, hb_h,
               ck_h, cv_h, ks_h, vs_h,
               mbias_ref, vtab_hi_ref, vtab_lo_ref, pos_ref, struct_ref,
               ksel_i, vsel_i, h_i,
               samples_ref, attach_ref, ksel_o, vsel_o, h_o, steps_ref,
               wbuf1, wf1, wf2, bbuf, hwhi, hwlo, hb,
               ckbuf, cvbuf, ksbuf, vsbuf, skbuf, svbuf, hbuf,
               x_all, outf, attf, qkv_all, a_all, q2_all, z_all,
               pl_all, donec,
               sems):
        iota = jax.lax.broadcasted_iota

        # ---- one-time loads + init ----
        pltpu.make_async_copy(hwhi_h, hwhi, sems.at[0]).start()
        pltpu.make_async_copy(hwlo_h, hwlo, sems.at[22]).start()
        pltpu.make_async_copy(hb_h, hb, sems.at[1]).start()
        pltpu.make_async_copy(hwhi_h, hwhi, sems.at[0]).wait()
        pltpu.make_async_copy(hwlo_h, hwlo, sems.at[22]).wait()
        pltpu.make_async_copy(hb_h, hb, sems.at[1]).wait()
        outf[...] = jnp.zeros((B, S), f32)
        attf[...] = jnp.full((B, S), -1.0, f32)
        donec[0] = 0   # 1 once every row has emitted END (early-exit mode)
        donec[1] = 0   # steps actually executed (num_steps parity)

        # static placement matrices (Mosaic folds these iota constants)
        ci0 = iota(jnp.int32, (D, Dkv), 0)
        ci1 = iota(jnp.int32, (D, Dkv), 1)
        collapse = (((ci0 % Dh) == (ci1 % Dh))
                    & ((ci0 // Dh // G) == (ci1 // Dh))).astype(f32)
        si0 = iota(jnp.int32, (Dkv, D), 0)
        si1 = iota(jnp.int32, (Dkv, D), 1)
        spread = (((si0 % Dh) == (si1 % Dh))
                  & ((si0 // Dh) == (si1 // Dh // G))).astype(f32)
        hi0 = iota(jnp.int32, (NR, D), 0)
        hi1 = iota(jnp.int32, (NR, D), 1)
        headsel = ((hi1 // Dh) == (hi0 % H)).astype(f32)
        rowmerge = ((iota(jnp.int32, (RB, NR), 1) // H)
                    == iota(jnp.int32, (RB, NR), 0)).astype(f32)
        def rep_rows(v):
            """(RB, X) -> (NR, X): row r repeated H times (leading merge)."""
            X = v.shape[-1]
            return jnp.broadcast_to(v[:, None, :], (RB, H, X)).reshape(NR, X)

        def layernorm(v, srow):
            s = bbuf[srow:srow + 1, :D]
            b = bbuf[srow + 1:srow + 2, :D]
            m = jnp.mean(v, axis=-1, keepdims=True)
            var = jnp.mean((v - m) * (v - m), axis=-1, keepdims=True)
            return (v - m) * jax.lax.rsqrt(var + 1e-5) * s + b

        def qcol_of(q_blk):
            """(RB, D) cd queries -> (NR, Dkv) f32 per-row-head kv cols."""
            qrep = rep_rows(q_blk.astype(cd)) * headsel.astype(cd)
            return jnp.dot(qrep, collapse.astype(cd),
                           preferred_element_type=f32)

        def unspread(o_nr):
            """(NR, Dkv) outputs -> (RB, D) cd activations. Cast point
            matches the XLA paths (attention output -> cd before wo)."""
            o_rows = (jnp.dot(o_nr.astype(cd), spread.astype(cd),
                              preferred_element_type=f32)
                      * headsel)
            return jnp.dot(rowmerge.astype(cd), o_rows.astype(cd),
                           preferred_element_type=f32).astype(cd)

        def run_step(t):
            # ================= embedding =================
            lane_s = iota(jnp.int32, (B, S), 1)
            prev = jnp.sum(jnp.where(lane_s == t - 1, outf[...], 0.0),
                           axis=-1, keepdims=True)             # (B, 1)
            oh = (iota(jnp.int32, (B, VP), 1) == prev.astype(jnp.int32)
                  ).astype(cd)
            tok = (jnp.dot(oh, vtab_hi_ref[...], preferred_element_type=f32)
                   + jnp.dot(oh, vtab_lo_ref[...],
                             preferred_element_type=f32))      # (B, D)
            oht = (iota(jnp.int32, (1, S), 1) == t).astype(f32)
            posr = jnp.dot(oht, pos_ref[...], preferred_element_type=f32)
            x_all[...] = jnp.where(t == 0, 0.0, tok + posr)

            # ================= decoder layers =================
            def layer_body(l, carry2):
                # weights for this layer (single-buffered; ~5 us stall
                # hidden behind ~100 us of per-layer compute budget)
                pltpu.make_async_copy(pack1_h.at[l], wbuf1,
                                      sems.at[2]).start()
                pltpu.make_async_copy(w1_h.at[l], wf1, sems.at[3]).start()
                pltpu.make_async_copy(w2_h.at[l], wf2, sems.at[4]).start()
                pltpu.make_async_copy(b_h.at[l], bbuf, sems.at[5]).start()
                pltpu.make_async_copy(pack1_h.at[l], wbuf1, sems.at[2]).wait()
                pltpu.make_async_copy(w1_h.at[l], wf1, sems.at[3]).wait()
                pltpu.make_async_copy(w2_h.at[l], wf2, sems.at[4]).wait()
                pltpu.make_async_copy(b_h.at[l], bbuf, sems.at[5]).wait()

                h1 = layernorm(x_all[...], 0)
                qkv_all[...] = (jnp.dot(h1.astype(cd), wbuf1[:, :W1],
                                        preferred_element_type=f32)
                                + bbuf[6:7, :W1]).astype(cd)

                # ---- self-attention blocks ----
                def self_body(b, c3):
                    r0 = b * RB
                    rows = pl.dslice(r0, RB)
                    slot = jax.lax.rem(b, 2)
                    nxt = jax.lax.rem(b + 1, 2)

                    @pl.when(b == 0)
                    def _first():
                        r00 = pl.dslice(l * B, RB)
                        pltpu.make_async_copy(ksel_o.at[r00], skbuf.at[0],
                                              sems.at[6]).start()
                        pltpu.make_async_copy(vsel_o.at[r00], svbuf.at[0],
                                              sems.at[8]).start()

                    @pl.when(b + 1 < NB)
                    def _prefetch():
                        rows2 = pl.dslice(l * B + (b + 1) * RB, RB)
                        pltpu.make_async_copy(ksel_o.at[rows2],
                                              skbuf.at[nxt],
                                              sems.at[6 + nxt]).start()
                        pltpu.make_async_copy(vsel_o.at[rows2],
                                              svbuf.at[nxt],
                                              sems.at[8 + nxt]).start()

                    lrows = pl.dslice(l * B + r0, RB)
                    pltpu.make_async_copy(ksel_o.at[lrows], skbuf.at[slot],
                                          sems.at[6 + slot]).wait()
                    pltpu.make_async_copy(vsel_o.at[lrows], svbuf.at[slot],
                                          sems.at[8 + slot]).wait()

                    qkv_blk = qkv_all[rows, :]                 # (RB, W1) cd
                    q_blk = qkv_blk[:, :D]
                    k_t = qkv_blk[:, D:D + Dkv]
                    v_t = qkv_blk[:, D + Dkv:W1]

                    # insert row t into the loaded cache blocks (VPU), use
                    # the updated values for the dots, and write back only
                    # the 8-sublane-aligned tile containing t (sub-tile
                    # appends are not sliceable on tiled HBM refs)
                    sub_s = iota(jnp.int32, (RB, S, Dkv), 1)
                    sk_upd = jnp.where(sub_s == t, k_t[:, None, :],
                                       skbuf[slot])
                    sv_upd = jnp.where(sub_s == t, v_t[:, None, :],
                                       svbuf[slot])
                    skbuf[slot] = sk_upd
                    svbuf[slot] = sv_upd
                    t8 = pl.multiple_of((t // 8) * 8, 8)
                    ksrc = skbuf.at[slot, :, pl.dslice(t8, 8), :]
                    vsrc = svbuf.at[slot, :, pl.dslice(t8, 8), :]
                    kdst = ksel_o.at[lrows, pl.dslice(t8, 8), :]
                    vdst = vsel_o.at[lrows, pl.dslice(t8, 8), :]
                    pltpu.make_async_copy(ksrc, kdst, sems.at[10]).start()
                    pltpu.make_async_copy(vsrc, vdst, sems.at[11]).start()

                    # sm_scale multiplies the scores AFTER the dot, matching
                    # grouped_scores(...) * scale in the XLA path
                    qs = qcol_of(q_blk)                        # (NR, Dkv) f32
                    k_flat = sk_upd.reshape(RB * S, Dkv)
                    scT = jax.lax.dot_general(                 # (RB*S, NR)
                        k_flat, qs.astype(cd), (((1,), (1,)), ((), ())),
                        preferred_element_type=f32) * sm_scale
                    i0 = iota(jnp.int32, (RB * S, NR), 0)
                    s_of = i0 % S
                    rmatch = (i0 // S) == (iota(jnp.int32, (RB * S, NR), 1)
                                           // H)
                    scT = jnp.where(rmatch & (s_of <= t), scT, NEG_INF)
                    sc3 = scT.reshape(RB, S, NR)
                    mx = jnp.max(sc3, axis=1, keepdims=True)
                    p3 = jnp.exp(sc3 - mx)
                    p3 = p3 / jnp.sum(p3, axis=1, keepdims=True)
                    pT = p3.reshape(RB * S, NR)
                    pT = jnp.where(rmatch, pT, 0.0)
                    v_flat = sv_upd.reshape(RB * S, Dkv)
                    o_nr = jax.lax.dot_general(                # (NR, Dkv)
                        pT.astype(cd), v_flat, (((0,), (0,)), ((), ())),
                        preferred_element_type=f32)
                    a_all[rows, :] = unspread(o_nr).astype(cd)

                    # drain the write-backs before the slot is reused
                    pltpu.make_async_copy(ksrc, kdst, sems.at[10]).wait()
                    pltpu.make_async_copy(vsrc, vdst, sems.at[11]).wait()
                    return c3

                jax.lax.fori_loop(0, NB, self_body, 0)

                x = x_all[...] + (
                    jnp.dot(a_all[...], wbuf1[:, W1:W1 + D],
                            preferred_element_type=f32) + bbuf[7:8, :D])
                x_all[...] = x
                h2 = layernorm(x, 2)
                q2_all[...] = (jnp.dot(h2.astype(cd),
                                       wbuf1[:, W1 + D:W1 + 2 * D],
                                       preferred_element_type=f32)
                               + bbuf[8:9, :D]).astype(cd)

                # ---- cross-attention blocks ----
                def cross_body(b, c4):
                    r0 = b * RB
                    rows = pl.dslice(r0, RB)
                    slot = jax.lax.rem(b, 2)
                    nxt = jax.lax.rem(b + 1, 2)

                    @pl.when(b == 0)
                    def _first():
                        r00 = pl.dslice(l * B, RB)
                        pltpu.make_async_copy(ck_h.at[r00], ckbuf.at[0],
                                              sems.at[12]).start()
                        pltpu.make_async_copy(cv_h.at[r00], cvbuf.at[0],
                                              sems.at[14]).start()
                        pltpu.make_async_copy(ks_h.at[r00], ksbuf.at[0],
                                              sems.at[16]).start()
                        pltpu.make_async_copy(vs_h.at[r00], vsbuf.at[0],
                                              sems.at[18]).start()

                    @pl.when(b + 1 < NB)
                    def _prefetch():
                        rows2 = pl.dslice(l * B + (b + 1) * RB, RB)
                        pltpu.make_async_copy(ck_h.at[rows2],
                                              ckbuf.at[nxt],
                                              sems.at[12 + nxt]).start()
                        pltpu.make_async_copy(cv_h.at[rows2],
                                              cvbuf.at[nxt],
                                              sems.at[14 + nxt]).start()
                        pltpu.make_async_copy(ks_h.at[rows2],
                                              ksbuf.at[nxt],
                                              sems.at[16 + nxt]).start()
                        pltpu.make_async_copy(vs_h.at[rows2],
                                              vsbuf.at[nxt],
                                              sems.at[18 + nxt]).start()

                    lrows = pl.dslice(l * B + r0, RB)
                    pltpu.make_async_copy(ck_h.at[lrows], ckbuf.at[slot],
                                          sems.at[12 + slot]).wait()
                    pltpu.make_async_copy(cv_h.at[lrows], cvbuf.at[slot],
                                          sems.at[14 + slot]).wait()
                    pltpu.make_async_copy(ks_h.at[lrows], ksbuf.at[slot],
                                          sems.at[16 + slot]).wait()
                    pltpu.make_async_copy(vs_h.at[lrows], vsbuf.at[slot],
                                          sems.at[18 + slot]).wait()

                    q2_blk = q2_all[rows, :]
                    # K dequant scale folds into the query IN F32 before the
                    # cd cast (as the XLA mxu path does); sm_scale applies
                    # after the dot
                    qs2 = qcol_of(q2_blk) * rep_rows(ksbuf[slot])
                    qbig = jnp.concatenate([qs2.astype(cd)] * RB, axis=-1)
                    qi = (iota(jnp.int32, (NR, RB * Dkv), 0) // H
                          == iota(jnp.int32, (NR, RB * Dkv), 1) // Dkv)
                    qbig = jnp.where(qi, qbig, 0.0)
                    ck_flat = ckbuf[slot].reshape(RB * Dkv, Li).astype(cd)
                    sc = jnp.dot(qbig, ck_flat,
                                 preferred_element_type=f32) * sm_scale
                    sc = sc + rep_rows(mbias_ref[rows, :])
                    mx2 = jnp.max(sc, axis=-1, keepdims=True)
                    p = jnp.exp(sc - mx2)
                    p = p / jnp.sum(p, axis=-1, keepdims=True)
                    pbig = jnp.concatenate([p.astype(cd)] * RB, axis=-1)
                    pi_ = (iota(jnp.int32, (NR, RB * Li), 0) // H
                           == iota(jnp.int32, (NR, RB * Li), 1) // Li)
                    pbig = jnp.where(pi_, pbig, 0.0)
                    cv_flat = cvbuf[slot].reshape(RB * Li, Dkv).astype(cd)
                    o2 = jnp.dot(pbig, cv_flat,
                                 preferred_element_type=f32)   # (NR, Dkv)
                    o2 = o2 * rep_rows(vsbuf[slot])            # fold V scale
                    z_all[rows, :D] = unspread(o2).astype(cd)
                    return c4

                jax.lax.fori_loop(0, NB, cross_body, 0)

                x = x_all[...] + (
                    jnp.dot(z_all[:, :D], wbuf1[:, W1 + 2 * D:W1 + 3 * D],
                            preferred_element_type=f32) + bbuf[9:10, :D])
                h3 = layernorm(x, 4)
                z = jnp.maximum(
                    jnp.dot(h3.astype(cd), wf1[...],
                            preferred_element_type=f32) + bbuf[10:11, :F],
                    0.0)
                x_all[...] = x + (jnp.dot(z.astype(cd), wf2[...],
                                          preferred_element_type=f32)
                                  + bbuf[11:12, :D])
                return carry2

            jax.lax.fori_loop(0, L, layer_body, 0)

            # ================= sampling tail =================
            fs = hb[1:2, :D]
            fb = hb[2:3, :D]
            xm = jnp.mean(x_all[...], axis=-1, keepdims=True)
            xv = jnp.mean((x_all[...] - xm) * (x_all[...] - xm),
                          axis=-1, keepdims=True)
            h_t = (x_all[...] - xm) * jax.lax.rsqrt(xv + 1e-5) * fs + fb
            ht_cd = h_t.astype(cd)

            # hi/lo-split head matmuls: the XLA path computes these in f32
            # (h_t and the head weights are f32 there); bf16 hi+lo recovers
            # ~f32 accuracy at bf16 MXU rate
            ho = (jnp.dot(ht_cd, hwhi[...], preferred_element_type=f32)
                  + jnp.dot(ht_cd, hwlo[...], preferred_element_type=f32)
                  + hb[0:1, :])                                # (B, HW)
            vl = ho[:, :VP]
            feat = ho[:, VP:VP + D].astype(cd)
            swl = ho[:, VP + D:]
            sw0 = jnp.sum(jnp.where(iota(jnp.int32, (B, 128), 1) == 0,
                                    swl, 0.0), axis=-1, keepdims=True)
            prob = jax.nn.sigmoid(sw0)

            # stage h_t / feature in (free-at-sampling-time) scratch so the
            # block loop can ref-slice them (Mosaic has no value
            # dynamic_slice)
            z_all[:, :D] = ht_cd
            a_all[...] = feat

            def samp_body(b, c5):
                r0 = b * RB
                rows = pl.dslice(r0, RB)
                pltpu.make_async_copy(h_o.at[rows], hbuf, sems.at[20]).start()
                pltpu.make_async_copy(h_o.at[rows], hbuf, sems.at[20]).wait()

                sub_h = iota(jnp.int32, (RB, S, D), 1)
                ht_blk = z_all[rows, :D]                       # (RB, D) cd
                h_upd = jnp.where(sub_h == t, ht_blk[:, None, :], hbuf[...])
                hbuf[...] = h_upd
                t8 = pl.multiple_of((t // 8) * 8, 8)
                hsrc = hbuf.at[:, pl.dslice(t8, 8), :]
                hdst = h_o.at[rows, pl.dslice(t8, 8), :]
                pltpu.make_async_copy(hsrc, hdst, sems.at[21]).start()

                h_flat = h_upd.reshape(RB * S, D)
                plT = jax.lax.dot_general(                     # (RB*S, RB)
                    h_flat, a_all[rows, :], (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
                pl3 = plT.reshape(RB, S, RB)
                d0 = iota(jnp.int32, (RB, S, RB), 0)
                d2 = iota(jnp.int32, (RB, S, RB), 2)
                pl_all[rows, :] = jnp.sum(
                    jnp.where(d0 == d2, pl3, 0.0), axis=-1) / D
                pltpu.make_async_copy(hsrc, hdst, sems.at[21]).wait()
                return c5

            jax.lax.fori_loop(0, NB, samp_body, 0)

            lane_vp = iota(jnp.int32, (B, VP), 1)
            vmax = jnp.max(vl, axis=-1, keepdims=True)
            vsoft = jnp.exp(vl - vmax)
            vsoft = vsoft / jnp.sum(vsoft, axis=-1, keepdims=True)
            vprob = vsoft * (1.0 - prob)

            triu = jnp.where(lane_s >= t, NEG_INF, 0.0)
            plog = pl_all[...] + triu
            pmx = jnp.max(plog, axis=-1, keepdims=True)
            pp = jnp.exp(plog - pmx)
            pp = pp / jnp.sum(pp, axis=-1, keepdims=True) * prob
            oht2 = (iota(jnp.int32, (1, S), 1) == t).astype(f32)
            srow = jnp.dot(oht2, struct_ref[...],
                           preferred_element_type=f32)         # (1, S)
            pp = jnp.where(srow == 0.0, EPS, pp)
            pp = jnp.where(lane_s > t, -1.0, pp)

            vm = jnp.max(vprob, axis=-1, keepdims=True)
            vi = jnp.min(jnp.where(vprob == vm, lane_vp, VP + 1),
                         axis=-1, keepdims=True)
            pm = jnp.max(pp, axis=-1, keepdims=True)
            pidx = jnp.min(jnp.where(pp == pm, lane_s, S + 1),
                           axis=-1, keepdims=True)
            mixed_idx = jnp.where(pm > vm, V + pidx, vi)

            vlm = jnp.max(vl, axis=-1, keepdims=True)
            vidx2 = jnp.min(jnp.where(vl == vlm, lane_vp, VP + 1),
                            axis=-1, keepdims=True)
            idx = jnp.where(t + 1 < dof, vidx2, mixed_idx)

            is_ptr = idx >= V
            ptr = jnp.clip(idx - V, 0, S - 1)
            copied = jnp.sum(jnp.where(lane_s == ptr, outf[...], 0.0),
                             axis=-1, keepdims=True)
            token = jnp.where(is_ptr, copied, idx.astype(f32))
            att_t = jnp.where(is_ptr, ptr.astype(f32), -1.0)
            outf[...] = jnp.where(lane_s == t, token, outf[...])
            attf[...] = jnp.where(lane_s == t, att_t, attf[...])
            donec[1] = t + 1
            if early_exit:
                # a row is done iff END appears anywhere in its emitted
                # prefix (unwritten positions stay 0.0; END = 512 != 0,
                # so reading the whole buffer is exact). Matches the XLA
                # path's `done |= (token == dims.end)` accumulation.
                endhit = jnp.where(outf[...] == float(END), 1.0, 0.0)
                ndone = jnp.sum(jnp.max(endhit, axis=-1, keepdims=True))
                donec[0] = (ndone == float(B)).astype(jnp.int32)

        def step_body(t, carry):
            # early-exit mode: once every row has emitted END the
            # remaining iterations predicate away (µs-scale fori overhead
            # each) — the in-launch analogue of the XLA while_loop's
            # `(t < S) & ~all(done)` condition and the reference's
            # models.py:306-307 break.
            if early_exit:
                @pl.when(donec[0] == 0)
                def _active():
                    run_step(t)
            else:
                run_step(t)
            return carry

        jax.lax.fori_loop(0, S, step_body, 0)
        samples_ref[...] = outf[...].astype(jnp.int32)
        attach_ref[...] = attf[...].astype(jnp.int32)
        steps_ref[0, 0] = donec[1]

    return kernel


@functools.partial(jax.jit, static_argnames=("dims", "block_rows",
                                             "compute_dtype", "early_exit",
                                             "interpret"))
def persistent_greedy_decode(params, memory, memory_mask, dims, *,
                             block_rows=8, compute_dtype=jnp.bfloat16,
                             early_exit=False, interpret=False):
    """Greedy decode with the persistent kernel. Same output contract as
    `decode.greedy_decode`.

    early_exit=False (benchmark mode) runs the full static bound —
    bit-identical to the r3 kernel. early_exit=True keeps the single
    launch but predicates each step on an SMEM done flag: once every row
    has emitted END, the remaining fori_loop iterations are empty
    branches (µs each vs ~1.8 ms of compute), recovering the reference's
    early-exit serving semantics (`plankassembly/models.py:306-307`)
    inside the persistent launch; `num_steps` then reports the true trip
    count like the XLA while_loop path."""
    from plankassembly_tpu.decode import precompute_cross_kv
    from plankassembly_tpu.models.model import pointer_structure_mask

    cd = compute_dtype
    B, Li = memory.shape[0], memory.shape[1]
    S = dims.max_output_length
    H, Dh, D = dims.num_head, dims.head_dim, dims.num_model
    kvH = dims.kv_heads
    Dkv = kvH * Dh
    L = dims.num_decoder_layers
    F = dims.num_feedforward
    V = dims.vocab_size
    VP = _rup(V, 128)
    dof = dims.num_output_dof
    RB = block_rows
    if B % RB:
        raise ValueError(f"persistent decode needs B % {RB} == 0, got {B}")
    if B > 512 and not os.environ.get("PLANK_PERSISTENT_UNSAFE_LARGE_B"):
        # B=1024 reproducibly hung >15 min before its first run completed
        # and killing it wedged the device ~25 min (results/RUNS_r3.md);
        # refuse rather than let any input wedge the chip. decode.py's
        # dispatch falls back to the mxu path above this bound.
        # PLANK_PERSISTENT_UNSAFE_LARGE_B=1 lifts the guard for
        # tools/probe_b1024.py's staged compile/execute bisection ONLY —
        # never set it in serving paths.
        raise ValueError(
            f"persistent decode supports B <= 512 (got {B}): B=1024 hangs "
            "the Mosaic kernel pre-first-run; use cross_impl='mxu'")
    f32 = jnp.float32

    cross_k, cross_v = precompute_cross_kv(params, memory, dims, cd)

    def quant(x):
        s = jnp.max(jnp.abs(x.astype(f32)), axis=(2, 4), keepdims=True)
        s = jnp.maximum(s / 127.0, 1e-8)
        q = jnp.round(x.astype(f32) / s).astype(jnp.int8)
        return q, s[:, :, 0, :, 0]                             # (L, B, kvH)

    kq, ks = quant(cross_k)
    vq, vs = quant(cross_v)
    ck = kq.transpose(0, 1, 3, 4, 2).reshape(L * B, Dkv, Li)
    cv = vq.reshape(L * B, Li, Dkv)
    ks_lane = jnp.repeat(ks, Dh, axis=-1).reshape(L * B, Dkv)
    vs_lane = jnp.repeat(vs, Dh, axis=-1).reshape(L * B, Dkv)

    dec = params["decoder"]
    sa, ca, ffn = dec["self_attn"], dec["cross_attn"], dec["ffn"]
    pack1 = jnp.concatenate([
        sa["wq"], sa["wk"], sa["wv"],                          # W1 cols
        sa["wo"], ca["wq"], ca["wo"],
    ], axis=-1).astype(cd)                                     # (L,D,W1+3D)
    w1p = ffn["w1"].astype(cd)
    w2p = ffn["w2"].astype(cd)
    PW = max(D + 2 * Dkv, F)

    def pad_to(v, w):
        return jnp.pad(v.astype(f32), ((0, 0), (0, w - v.shape[-1])))

    n1, n2, n3 = dec["norm1"], dec["norm2"], dec["norm3"]
    brows = [n1["scale"], n1["bias"], n2["scale"], n2["bias"],
             n3["scale"], n3["bias"],
             jnp.concatenate([sa["bq"], sa["bk"], sa["bv"]], axis=-1),
             sa["bo"], ca["bq"], ca["bo"], ffn["b1"], ffn["b2"]]
    bpack = jnp.stack([pad_to(jnp.atleast_2d(r), PW) for r in brows], axis=1)
    bpack = jnp.pad(bpack, ((0, 0), (0, 16 - len(brows)), (0, 0)))
    bpack = bpack.reshape(L, 16, PW)

    heads = params["heads"]
    hwp = jnp.concatenate([
        jnp.pad(heads["vocab"]["w"].astype(f32), ((0, 0), (0, VP - V))),
        heads["pointer"]["w"].astype(f32),
        jnp.pad(heads["switch"]["w"].astype(f32).reshape(D, -1),
                ((0, 0), (0, 127))),
    ], axis=-1)                                                # (D, HW) f32
    hwp_hi = hwp.astype(cd)
    hwp_lo = (hwp - hwp_hi.astype(f32)).astype(cd)
    HW = VP + D + 128
    fnorm = dec["final_norm"]
    hb0 = jnp.concatenate([
        jnp.pad(heads["vocab"]["b"].astype(f32), (0, VP - V),
                constant_values=NEG_INF),
        heads["pointer"]["b"].astype(f32),
        jnp.pad(heads["switch"]["b"].astype(f32).reshape(-1), (0, 127)),
    ])
    hbp = jnp.stack([hb0,
                     jnp.pad(fnorm["scale"].astype(f32), (0, HW - D)),
                     jnp.pad(fnorm["bias"].astype(f32), (0, HW - D)),
                     jnp.zeros((HW,), f32)], axis=0)           # (4, HW)

    emb = params["embed"]
    vt = jnp.pad(emb["value"].astype(f32), ((0, VP - V), (0, 0)))
    vt_hi = vt.astype(cd)
    vt_lo = (vt - vt_hi.astype(f32)).astype(cd)
    tt = np.arange(S)
    pos_emb = (emb["coord_out"][jnp.asarray((tt - 1) % dof)]
               + emb["pos_out"][jnp.asarray((tt - 1) // dof)]).astype(f32)

    struct = jnp.asarray(pointer_structure_mask(dims), f32)
    mbias = jnp.where(memory_mask, NEG_INF, 0.0).astype(f32)

    k0 = jnp.zeros((L * B, S, Dkv), cd)
    v0 = jnp.zeros((L * B, S, Dkv), cd)
    h0 = jnp.zeros((B, S, D), cd)

    kern = _make_kernel(B=B, RB=RB, H=H, kvH=kvH, Dh=Dh, S=S, Li=Li,
                        L=L, F=F, D=D, V=V, VP=VP, dof=dof, cd=cd,
                        END=dims.end, early_exit=early_exit)
    out = pl.pallas_call(
        kern,
        in_specs=([pl.BlockSpec(memory_space=pltpu.ANY)] * 11
                  + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
                  + [pl.BlockSpec(memory_space=pltpu.ANY)] * 3),
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, S), jnp.int32),
                   jax.ShapeDtypeStruct((B, S), jnp.int32),
                   jax.ShapeDtypeStruct((L * B, S, Dkv), cd),
                   jax.ShapeDtypeStruct((L * B, S, Dkv), cd),
                   jax.ShapeDtypeStruct((B, S, D), cd),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)),
        input_output_aliases={16: 2, 17: 3, 18: 4},
        scratch_shapes=[
            pltpu.VMEM((D, D + 2 * Dkv + 3 * D), cd),    # wbuf1
            pltpu.VMEM((D, F), cd),                      # wf1
            pltpu.VMEM((F, D), cd),                      # wf2
            pltpu.VMEM((16, PW), f32),                   # bbuf
            pltpu.VMEM((D, HW), cd),                     # hwhi
            pltpu.VMEM((D, HW), cd),                     # hwlo
            pltpu.VMEM((4, HW), f32),                    # hb
            pltpu.VMEM((2, RB, Dkv, Li), jnp.int8),      # ckbuf
            pltpu.VMEM((2, RB, Li, Dkv), jnp.int8),      # cvbuf
            pltpu.VMEM((2, RB, Dkv), f32),               # ksbuf
            pltpu.VMEM((2, RB, Dkv), f32),               # vsbuf
            pltpu.VMEM((2, RB, S, Dkv), cd),             # skbuf
            pltpu.VMEM((2, RB, S, Dkv), cd),             # svbuf
            pltpu.VMEM((RB, S, D), cd),                  # hbuf
            pltpu.VMEM((B, D), f32),                     # x_all
            pltpu.VMEM((B, S), f32),                     # outf
            pltpu.VMEM((B, S), f32),                     # attf
            pltpu.VMEM((B, D + 2 * Dkv), cd),            # qkv_all
            pltpu.VMEM((B, D), cd),                      # a_all
            pltpu.VMEM((B, D), cd),                      # q2_all
            pltpu.VMEM((B, max(F, D)), cd),              # z_all
            pltpu.VMEM((B, S), f32),                     # pl_all
            pltpu.SMEM((2,), jnp.int32),                 # donec
            pltpu.SemaphoreType.DMA((24,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(pack1, w1p, w2p, bpack, hwp_hi, hwp_lo, hbp, ck, cv, ks_lane, vs_lane,
      mbias, vt_hi, vt_lo, pos_emb, struct, k0, v0, h0)

    return {"samples": out[0], "attach": out[1],
            "num_steps": out[5][0, 0]}
