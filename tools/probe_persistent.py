"""Compile-only Mosaic probes for the persistent decode kernel design.

Each probe lowers+compiles a tiny Pallas kernel for the TPU backend
(server-side; never executes on the chip, so it is safe to run while a
training job owns the device) and reports OK / FAIL with the Mosaic error.
The persistent kernel (ops/persistent_decode.py) only uses constructs
that pass here; failed probes get a documented fallback.

Probes:
  nt_dot        dot_general contracting (1,)x(1,)  — "A @ B^T" form
  tn_dot        dot_general contracting (0,)x(0,)  — "A^T @ B" form
  append_sub    DMA append at a dynamic SUBLANE offset (contiguous rows)
  append_lane   DMA append at a dynamic LANE offset (strided column write)
  dyn_sub_read  dynamic sublane slice read of a VMEM scratch ref
  lane_concat   jnp.concatenate([x]*RB, axis=-1) + static mask multiply
  transpose2d   jnp.transpose of a small 2-D block
  wdma_dyn      weight DMA from HBM at a dynamic leading index
  fori_dma      fori_loop with dynamic-offset DMAs and slot-parity wait
"""
import functools
import sys
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

RESULTS = {}


def probe(name):
    def deco(fn):
        def run():
            try:
                fn()
                RESULTS[name] = "OK"
                print(f"[probe] {name}: OK", flush=True)
            except Exception as e:  # noqa: BLE001
                msg = str(e).split("\n")[0][:300]
                RESULTS[name] = f"FAIL: {msg}"
                print(f"[probe] {name}: FAIL\n  {msg}", flush=True)
                if "-v" in sys.argv:
                    traceback.print_exc()
        run.__name__ = name
        return run
    return deco


def compile_kernel(kernel, out_shape, in_shapes, scratch_shapes=(),
                   in_specs=None, **kw):
    if in_specs is None:
        in_specs = [pl.BlockSpec(memory_space=pltpu.ANY) for _ in in_shapes]
    f = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=list(scratch_shapes),
        **kw,
    )
    args = [jax.ShapeDtypeStruct(s, d) for (s, d) in in_shapes]
    jax.jit(f).lower(*args).compile()


@probe("nt_dot")
def p_nt_dot():
    # (1024, 128) x (64, 128) contracting last-vs-last -> (1024, 64)
    def k(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    compile_kernel(
        k, jax.ShapeDtypeStruct((1024, 64), jnp.float32),
        [((1024, 128), jnp.bfloat16), ((64, 128), jnp.bfloat16)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    )


@probe("tn_dot")
def p_tn_dot():
    # (1024, 64) x (1024, 128) contracting first-vs-first -> (64, 128)
    def k(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    compile_kernel(
        k, jax.ShapeDtypeStruct((64, 128), jnp.float32),
        [((1024, 64), jnp.bfloat16), ((1024, 128), jnp.bfloat16)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    )


@probe("append_sub")
def p_append_sub():
    # append (RB, 1, 128) at dynamic sublane position t of HBM (B, S, 128)
    def k(t_ref, x_ref, o_ref, src, sem):
        t = t_ref[0]
        src[...] = x_ref[...] * 2.0
        cp = pltpu.make_async_copy(
            src, o_ref.at[pl.dslice(8, 8), pl.dslice(t, 1), :], sem)
        cp.start()
        cp.wait()

    f = pl.pallas_call(
        k,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.VMEM((8, 1, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((32, 16, 128), jnp.float32),
    )
    jax.jit(f).lower(
        jax.ShapeDtypeStruct((1,), jnp.int32),
        jax.ShapeDtypeStruct((8, 1, 128), jnp.float32)).compile()


@probe("append_lane")
def p_append_lane():
    # append (RB, 128, 1) at dynamic LANE position t of HBM (B, 128, S)
    def k(t_ref, x_ref, o_ref, src, sem):
        t = t_ref[0]
        src[...] = x_ref[...] * 2.0
        cp = pltpu.make_async_copy(
            src, o_ref.at[pl.dslice(8, 8), :, pl.dslice(t, 1)], sem)
        cp.start()
        cp.wait()

    f = pl.pallas_call(
        k,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.VMEM((8, 128, 1), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((32, 128, 16), jnp.float32),
    )
    jax.jit(f).lower(
        jax.ShapeDtypeStruct((1,), jnp.int32),
        jax.ShapeDtypeStruct((8, 128, 1), jnp.float32)).compile()


@probe("dyn_sub_read")
def p_dyn_sub_read():
    # read (8, 512) at dynamic 8-aligned sublane offset from a VMEM scratch
    def k(i_ref, o_ref, big):
        i = i_ref[0]
        big[...] = jnp.ones((64, 512), jnp.float32)
        o_ref[...] = big[pl.dslice(i * 8, 8), :] * 3.0

    f = pl.pallas_call(
        k,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=[],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((64, 512), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
    )
    jax.jit(f).lower(jax.ShapeDtypeStruct((1,), jnp.int32)).compile()


@probe("lane_concat")
def p_lane_concat():
    # tile (64, 512) -> (64, 4096) along lanes, mask, and write
    def k(x_ref, o_ref):
        x = x_ref[...]
        big = jnp.concatenate([x] * 8, axis=-1)
        rr = jax.lax.broadcasted_iota(jnp.int32, (64, 4096), 0) // 8
        cc = jax.lax.broadcasted_iota(jnp.int32, (64, 4096), 1) // 512
        o_ref[...] = jnp.where(rr == cc, big, 0.0)

    compile_kernel(
        k, jax.ShapeDtypeStruct((64, 4096), jnp.float32),
        [((64, 512), jnp.float32)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    )


@probe("transpose2d")
def p_transpose2d():
    def k(x_ref, o_ref):
        o_ref[...] = jnp.transpose(x_ref[...], (1, 0))

    compile_kernel(
        k, jax.ShapeDtypeStruct((512, 8), jnp.float32),
        [((8, 512), jnp.float32)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    )


@probe("wdma_dyn")
def p_wdma_dyn():
    # DMA a (512, 768) weight block from HBM at dynamic leading index
    def k(l_ref, w_hbm, o_ref, wbuf, sem):
        l = l_ref[0]
        cp = pltpu.make_async_copy(w_hbm.at[l], wbuf, sem)
        cp.start()
        cp.wait()
        o_ref[...] = jnp.sum(wbuf[...].astype(jnp.float32),
                             axis=0, keepdims=True)

    f = pl.pallas_call(
        k,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((512, 768), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((1, 768), jnp.float32),
    )
    jax.jit(f).lower(
        jax.ShapeDtypeStruct((1,), jnp.int32),
        jax.ShapeDtypeStruct((6, 512, 768), jnp.bfloat16)).compile()


@probe("fori_dma")
def p_fori_dma():
    # the core loop shape: fori over blocks, slot-parity double buffer
    def k(x_hbm, o_ref, buf, sems, acc):
        nb = 4

        def body(b, carry):
            slot = jax.lax.rem(b, 2)
            nxt = jax.lax.rem(b + 1, 2)

            @pl.when(b == 0)
            def _first():
                cp = pltpu.make_async_copy(
                    x_hbm.at[pl.dslice(0, 8)], buf.at[0], sems.at[0])
                cp.start()

            @pl.when(b + 1 < nb)
            def _prefetch():
                cp = pltpu.make_async_copy(
                    x_hbm.at[pl.dslice((b + 1) * 8, 8)], buf.at[nxt],
                    sems.at[nxt])
                cp.start()

            pltpu.make_async_copy(
                x_hbm.at[pl.dslice(b * 8, 8)], buf.at[slot],
                sems.at[slot]).wait()
            acc[...] = acc[...] + jnp.sum(buf[slot], axis=0, keepdims=True)
            return carry

        acc[...] = jnp.zeros_like(acc)
        jax.lax.fori_loop(0, nb, body, 0)
        o_ref[...] = acc[...]

    f = pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, 8, 512), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.VMEM((1, 512), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((1, 512), jnp.float32),
    )
    jax.jit(f).lower(jax.ShapeDtypeStruct((32, 512), jnp.float32)).compile()


ALL = [p_nt_dot, p_tn_dot, p_append_sub, p_append_lane, p_dyn_sub_read,
       p_lane_concat, p_transpose2d, p_wdma_dyn, p_fori_dma]


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    print(f"backend: {jax.default_backend()}", flush=True)
    for fn in ALL:
        if names and fn.__name__ not in names:
            continue
        fn()
    print("\nsummary:")
    for k, v in RESULTS.items():
        print(f"  {k:14s} {v}")


if __name__ == "__main__":
    main()
