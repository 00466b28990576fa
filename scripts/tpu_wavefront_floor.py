"""Wavefront step-cost floor probe (r5).

The streamed wavefront kernel costs ~3 us per diagonal at
B=64,U_pad=384 (T=1500: ~5.4 ms per sweep pair). This probe measures a
degenerate variant — same panel streaming and loop structure, but the
step body reduced to ONE lse on the alpha carry (no validity masks, no
ll capture, no beta) — to separate the structural floor (loop + DMA +
lse dependency chain) from the maskwork. If the floor is ~1 us/step the
masks/captures are the target; if ~3 us the structure itself is.
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import slope_time_ms  # noqa: E402
from warp_transducer_tpu.ops.pallas.wavefront import (  # noqa: E402
    NEG, _lse, _shift_right,
)

B, U, N, CH = 64, 384, 1800, 8
NCH = N // CH


def kernel(lpb_hbm, lpe_hbm, out_hbm, lpb_v, lpe_v, a_out, in_sems, out_sems):
    def in_dma(slot, c, which):
        hbm, buf = ((lpb_hbm, lpb_v), (lpe_hbm, lpe_v))[which]
        return pltpu.make_async_copy(
            hbm.at[pl.ds(c * CH, CH)], buf.at[slot], in_sems.at[slot, which])

    def out_dma(slot, c):
        return pltpu.make_async_copy(
            a_out.at[slot], out_hbm.at[pl.ds(c * CH, CH)], out_sems.at[slot])

    for w in range(2):
        in_dma(0, 0, w).start()

    def chunk_body(c, a_prev):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < NCH)
        def _():
            for w in range(2):
                in_dma(1 - slot, c + 1, w).start()

        for w in range(2):
            in_dma(slot, c, w).wait()

        @pl.when(c >= 2)
        def _():
            out_dma(slot, c - 2).wait()

        def step(k, a_prev):
            a_n = _lse(a_prev + lpb_v[slot, k],
                       _shift_right(a_prev + lpe_v[slot, k],
                                    jnp.asarray(NEG, jnp.float32)))
            a_out[slot, k] = a_n
            return a_n

        a_prev = jax.lax.fori_loop(0, CH, step, a_prev)
        out_dma(slot, c).start()
        return a_prev

    a0 = jnp.full((B, U), 0.0, jnp.float32)
    jax.lax.fori_loop(0, NCH, chunk_body, a0)
    out_dma(jax.lax.rem(NCH - 1, 2), NCH - 1).wait()

    @pl.when(NCH >= 2)
    def _():
        out_dma(jax.lax.rem(NCH - 2, 2), NCH - 2).wait()


@jax.jit
def run(lpb, lpe):
    buf = lambda: pltpu.VMEM((2, CH, B, U), jnp.float32)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((N, B, U), jnp.float32),
        scratch_shapes=[buf(), buf(), buf(),
                        pltpu.SemaphoreType.DMA((2, 2)),
                        pltpu.SemaphoreType.DMA((2,))],
    )(lpb, lpe)


lpb = jax.jit(lambda k: jax.random.uniform(k, (N, B, U)) - 2.0)(
    jax.random.PRNGKey(0))
lpe = jax.jit(lambda k: jax.random.uniform(k, (N, B, U)) - 2.0)(
    jax.random.PRNGKey(1))

t0 = time.time()
run.lower(lpb, lpe).compile()
print(f"compile {time.time()-t0:.1f}s")


@jax.jit
def loop(lpb, lpe, n):
    def body(i, c):
        o = run(lpb * (1.0 + c * 1e-30), lpe)
        return c + o[0, 0, 0] * 1e-20
    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))


ms = slope_time_ms(lambda n: loop(lpb, lpe, n), n_cap=256)
print(f"floor kernel: {ms:.3f} ms total, {ms/N*1e3:.2f} us/step "
      f"({N} steps, alpha-only lse, no masks)")


# --- variant 2: alpha + beta interleaved (4 in-streams, 2 out), still no
# masks/captures — isolates the mask/capture cost in the production kernel.
def kernel2(lpb_hbm, lpe_hbm, oa_hbm, ob_hbm,
            lpb_f, lpe_f, lpb_b, lpe_b, a_out, b_out, in_sems, out_sems):
    from warp_transducer_tpu.ops.pallas.wavefront import _shift_left

    def in_dma(slot, c, which):
        fwd_lo = c * CH
        bwd_lo = N - (c + 1) * CH
        srcs = ((lpb_hbm, fwd_lo, lpb_f), (lpe_hbm, fwd_lo, lpe_f),
                (lpb_hbm, bwd_lo, lpb_b), (lpe_hbm, bwd_lo, lpe_b))
        hbm, lo, buf = srcs[which]
        return pltpu.make_async_copy(
            hbm.at[pl.ds(lo, CH)], buf.at[slot], in_sems.at[slot, which])

    def out_dma(slot, c, which):
        if which == 0:
            return pltpu.make_async_copy(
                a_out.at[slot], oa_hbm.at[pl.ds(c * CH, CH)],
                out_sems.at[slot, 0])
        return pltpu.make_async_copy(
            b_out.at[slot], ob_hbm.at[pl.ds(N - (c + 1) * CH, CH)],
            out_sems.at[slot, 1])

    for w in range(4):
        in_dma(0, 0, w).start()

    def chunk_body(c, carry):
        a_prev, b_next = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < NCH)
        def _():
            for w in range(4):
                in_dma(1 - slot, c + 1, w).start()

        for w in range(4):
            in_dma(slot, c, w).wait()

        @pl.when(c >= 2)
        def _():
            out_dma(slot, c - 2, 0).wait()
            out_dma(slot, c - 2, 1).wait()

        neg = jnp.asarray(NEG, jnp.float32)

        def step(k, carry):
            a_prev, b_next = carry
            a_n = _lse(a_prev + lpb_f[slot, k],
                       _shift_right(a_prev + lpe_f[slot, k], neg))
            a_out[slot, k] = a_n
            kk = CH - 1 - k
            b_m = _lse(b_next + lpb_b[slot, kk],
                       _shift_left(b_next, neg) + lpe_b[slot, kk])
            b_out[slot, kk] = b_m
            return a_n, b_m

        carry = jax.lax.fori_loop(0, CH, step, (a_prev, b_next))
        out_dma(slot, c, 0).start()
        out_dma(slot, c, 1).start()
        return carry

    a0 = jnp.full((B, U), 0.0, jnp.float32)
    jax.lax.fori_loop(0, NCH, chunk_body, (a0, a0))
    for which in range(2):
        out_dma(jax.lax.rem(NCH - 1, 2), NCH - 1, which).wait()

    @pl.when(NCH >= 2)
    def _():
        for which in range(2):
            out_dma(jax.lax.rem(NCH - 2, 2), NCH - 2, which).wait()


@jax.jit
def run2(lpb, lpe):
    buf = lambda: pltpu.VMEM((2, CH, B, U), jnp.float32)
    return pl.pallas_call(
        kernel2,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        out_shape=(jax.ShapeDtypeStruct((N, B, U), jnp.float32),
                   jax.ShapeDtypeStruct((N, B, U), jnp.float32)),
        scratch_shapes=[buf(), buf(), buf(), buf(), buf(), buf(),
                        pltpu.SemaphoreType.DMA((2, 4)),
                        pltpu.SemaphoreType.DMA((2, 2))],
    )(lpb, lpe)


t0 = time.time()
run2.lower(lpb, lpe).compile()
print(f"compile2 {time.time()-t0:.1f}s")


@jax.jit
def loop2(lpb, lpe, n):
    def body(i, c):
        oa, ob = run2(lpb * (1.0 + c * 1e-30), lpe)
        return c + oa[0, 0, 0] * 1e-20 + ob[0, 0, 0] * 1e-20
    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))


ms = slope_time_ms(lambda n: loop2(lpb, lpe, n), n_cap=256)
print(f"floor kernel2 (alpha+beta, no masks): {ms:.3f} ms, "
      f"{ms/N*1e3:.2f} us/step")
