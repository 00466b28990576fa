"""Streamed Pallas wavefront kernel: full-batch diagonals, HBM-resident panels.

The panel kernel (``wavefront.py``) tiles the batch over the grid, which
serialises ``B/B_tile × (T+U-1)`` tiny VPU steps.  This version runs ONE
kernel invocation for the whole batch: every diagonal step operates on a
(B, U_pad) tile (B on sublanes, U on lanes — full VPU occupancy at B≥8),
so the sequential step count is exactly ``T+U-1`` regardless of batch size.

The four diagonal panels (lpb, lpe in; alpha, beta out) of shape
(N, B, U_pad) do not fit VMEM for production shapes, so they stay in HBM and
are streamed per CH-diagonal chunk with double-buffered async DMA:

  * forward stream: lpb/lpe chunks ascending for the alpha recursion;
  * backward stream: the same arrays descending for the beta recursion
    (both sweeps share one loop — step n advances alpha on diagonal n and
    beta on diagonal N-1-n, like the panel kernel);
  * alpha/beta chunks are DMA'd back out as they complete.

Per-utterance lengths are handled identically to the panel kernel
(finite -inf sentinel, masked validity, in-loop log-likelihood capture,
corner seeding for ragged beta starts) — see wavefront.py for the math and
the mapping to the reference CUDA kernels
(/root/reference/include/detail/gpu_rnnt_kernel.h:11-113).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..lattice import LatticeResult, skew, unskew
from .wavefront import NEG, _LANES, _SUBLANES, _lse, _round_up, _shift_left, _shift_right

_VMEM_BUDGET = 8 * 1024 * 1024


def _pick_chunk(B: int, U_pad: int) -> int:
    # 12 chunk-sized buffers live at once (4 in-streams + 2 out, double
    # buffered). Measured: larger chunks (32MB budget, ch=32) do NOT speed
    # up the sweep and exceed VMEM at headline shapes — keep ch<=8.
    per_diag = B * U_pad * 4
    ch = _VMEM_BUDGET // (12 * per_diag)
    return max(1, min(int(ch), 8))


def _stream_kernel(
    tb_ref, ub_ref, lpb_hbm, lpe_hbm,
    alpha_hbm, beta_hbm, llf_ref, llb_ref,
    lpb_f, lpe_f, lpb_b, lpe_b, a_out, b_out, in_sems, out_sems,
    *, n_pad: int, ch: int, compute_betas: bool,
):
    B, U = tb_ref.shape[0], lpb_f.shape[3]
    NCH = n_pad // ch
    f32 = jnp.float32
    neg = jnp.asarray(NEG, f32)

    Tb = tb_ref[...]  # (B, 1)
    Ub = ub_ref[...]
    n_seed = Tb + Ub - 2
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (B, U), 1)
    is_final_lane = u_iota == Ub - 1

    def valid(n):
        t = n - u_iota
        return (t >= 0) & (t < Tb) & (u_iota < Ub)

    def in_dma(slot, c, which):
        # forward chunks ascend; backward chunks mirror from the top
        fwd_lo = c * ch
        bwd_lo = n_pad - (c + 1) * ch
        srcs = (
            (lpb_hbm, fwd_lo, lpb_f), (lpe_hbm, fwd_lo, lpe_f),
            (lpb_hbm, bwd_lo, lpb_b), (lpe_hbm, bwd_lo, lpe_b),
        )
        hbm, lo, buf = srcs[which]
        return pltpu.make_async_copy(
            hbm.at[pl.ds(lo, ch)], buf.at[slot], in_sems.at[slot, which]
        )

    n_in_streams = 4 if compute_betas else 2

    def start_in(slot, c):
        for w in range(n_in_streams):
            in_dma(slot, c, w).start()

    def wait_in(slot, c):
        for w in range(n_in_streams):
            in_dma(slot, c, w).wait()

    def out_dma(slot, c, which):
        if which == 0:
            return pltpu.make_async_copy(
                a_out.at[slot], alpha_hbm.at[pl.ds(c * ch, ch)], out_sems.at[slot, 0]
            )
        return pltpu.make_async_copy(
            b_out.at[slot], beta_hbm.at[pl.ds(n_pad - (c + 1) * ch, ch)],
            out_sems.at[slot, 1],
        )

    start_in(0, 0)

    def chunk_body(c, carry):
        a_prev, lpb_prev, lpe_prev, b_next, llf = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < NCH)
        def _():
            start_in(1 - slot, c + 1)

        wait_in(slot, c)

        # previous use of this out slot must have drained before we rewrite
        @pl.when(c >= 2)
        def _():
            out_dma(slot, c - 2, 0).wait()
            if compute_betas:
                out_dma(slot, c - 2, 1).wait()

        def step(k, inner):
            a_prev, lpb_prev, lpe_prev, b_next, llf = inner
            n = c * ch + k

            lpb_n = lpb_f[slot, k]
            lpe_n = lpe_f[slot, k]

            # ---- alpha on diagonal n ----
            no_emit = a_prev + lpb_prev
            emit = _shift_right(a_prev + lpe_prev, neg)
            a_n = jnp.where(valid(n), _lse(no_emit, emit), neg)
            a_n = jnp.where((n == 0) & (u_iota == 0), 0.0, a_n)
            a_out[slot, k] = a_n
            cand = jnp.sum(
                jnp.where(is_final_lane, a_n + lpb_n, 0.0), axis=1, keepdims=True
            )
            llf = jnp.where(n == n_seed, cand, llf)

            if compute_betas:
                # ---- beta on diagonal m = n_pad-1-n ----
                m = n_pad - 1 - n
                kk = ch - 1 - k
                lpb_m = lpb_b[slot, kk]
                lpe_m = lpe_b[slot, kk]
                b_no_emit = b_next + lpb_m
                b_emit = _shift_left(b_next, neg) + lpe_m
                b_m = jnp.where(valid(m), _lse(b_no_emit, b_emit), neg)
                b_m = jnp.where((m == n_seed) & is_final_lane, lpb_m, b_m)
                b_out[slot, kk] = b_m
            else:
                b_m = b_next

            return a_n, lpb_n, lpe_n, b_m, llf

        # NOT unrolled: a static-k Python unroll (window_stream-style) was
        # measured r5 at B=64,T=1500 — 30.3 vs 29.6 ms for the whole
        # prep+lattice stage, i.e. neutral. The per-step cost is the lse
        # dependency-chain latency (~3 us/diagonal), not loop overhead.
        carry = jax.lax.fori_loop(0, ch, step, (a_prev, lpb_prev, lpe_prev, b_next, llf))

        out_dma(slot, c, 0).start()
        if compute_betas:
            out_dma(slot, c, 1).start()
        return carry

    init = (
        jnp.full((B, U), neg, f32),  # a_prev (virtual diagonal -1)
        jnp.full((B, U), neg, f32),  # lpb_prev
        jnp.full((B, U), neg, f32),  # lpe_prev
        jnp.full((B, U), neg, f32),  # b_next (virtual diagonal n_pad)
        jnp.full((B, 1), neg, f32),  # llf
    )
    _, _, _, b_final, llf = jax.lax.fori_loop(0, NCH, chunk_body, init)

    # drain the last two output chunks
    last = NCH - 1
    out_dma(jax.lax.rem(last, 2), last, 0).wait()
    if compute_betas:
        out_dma(jax.lax.rem(last, 2), last, 1).wait()

    @pl.when(NCH >= 2)
    def _():
        prev = last - 1
        out_dma(jax.lax.rem(prev, 2), prev, 0).wait()
        if compute_betas:
            out_dma(jax.lax.rem(prev, 2), prev, 1).wait()

    llf_ref[...] = llf
    llb_ref[...] = b_final[:, 0:1] if compute_betas else llf


@functools.partial(jax.jit, static_argnames=("compute_betas", "interpret"))
def _wavefront_stream(lpb, lpe, input_lengths, label_lengths, compute_betas, interpret):
    B, T, U = lpb.shape
    N = T + U - 1
    U_pad = _round_up(U, _LANES)
    B_pad = _round_up(B, _SUBLANES)
    ch = _pick_chunk(B_pad, U_pad)
    n_pad = _round_up(N, ch)

    lpb32 = jnp.maximum(lpb.astype(jnp.float32), NEG)
    lpe32 = jnp.maximum(lpe.astype(jnp.float32), NEG)
    lpb_d = skew(lpb32, fill=NEG)
    lpe_d = skew(lpe32, fill=NEG)
    lpb_d = jnp.pad(
        lpb_d, ((0, n_pad - N), (0, B_pad - B), (0, U_pad - U)), constant_values=NEG
    )
    lpe_d = jnp.pad(
        lpe_d, ((0, n_pad - N), (0, B_pad - B), (0, U_pad - U)), constant_values=NEG
    )

    tb = jnp.pad(input_lengths.astype(jnp.int32), (0, B_pad - B), constant_values=1)[:, None]
    ub = jnp.pad(label_lengths.astype(jnp.int32) + 1, (0, B_pad - B), constant_values=1)[:, None]

    kernel = functools.partial(
        _stream_kernel, n_pad=n_pad, ch=ch, compute_betas=compute_betas
    )
    buf = lambda: pltpu.VMEM((2, ch, B_pad, U_pad), jnp.float32)
    # Scoring path: the backward stream never runs — shrink the beta HBM
    # output to a 1-diagonal stub and its three VMEM buffers (lpb_b, lpe_b,
    # b_out) to minimal tiles (score_forward analog, gpu_rnnt.h:237-253).
    bbuf = buf if compute_betas else (
        lambda: pltpu.VMEM((2, 1, _SUBLANES, _LANES), jnp.float32)
    )
    n_beta = n_pad if compute_betas else 1
    alpha_d, beta_d, llf, llb = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tb
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ub
            pl.BlockSpec(memory_space=pl.ANY),  # lpb panels (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # lpe panels (HBM)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, B_pad, U_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_beta, B_pad, U_pad), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, 1), jnp.float32),
        ),
        scratch_shapes=[
            buf(), buf(), bbuf(), bbuf(),  # lpb_f, lpe_f, lpb_b, lpe_b
            buf(), bbuf(),  # a_out, b_out
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tb, ub, lpb_d, lpe_d)

    alphas = unskew(alpha_d[:N, :B, :U], T)
    betas = unskew(beta_d[:N, :B, :U], T) if compute_betas else alphas
    return LatticeResult(
        alphas.astype(lpb.dtype),
        betas.astype(lpb.dtype),
        llf[:B, 0].astype(lpb.dtype),
        llb[:B, 0].astype(lpb.dtype),
    )


def forward_backward(lpb, lpe, input_lengths, label_lengths,
                     compute_betas: bool = True, interpret: bool | None = None) -> LatticeResult:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _wavefront_stream(
        lpb, lpe, input_lengths, label_lengths, compute_betas, interpret
    )
