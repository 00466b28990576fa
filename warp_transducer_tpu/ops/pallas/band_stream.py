"""Streamed Pallas kernel for the pruned (banded) RNN-T lattice.

The XLA band recursion (``ops/pruned.py:_band_lattice``) is a ``lax.scan``
over T steps; at T=1500 the 1500 dependent vector-op chains dominate the
pruned loss (11.2 ms at B=16,T=1500,S=5 vs 12.8 ms dense — the band's
19x memory cut bought almost no time). This kernel runs the whole
t-recursion in ONE invocation, eliminating the per-step XLA dispatch the
same way ``wavefront_stream.py`` does for the dense anti-diagonal sweep.

Layout: band row t is an (S_pad, B_pad) tile — S on sublanes (band width,
padded to 8), batch on lanes (padded to 128). Each step then works on a
single VPU tile:

* the no-emit dependency crosses rows with a PER-BATCH shift of
  delta(t) = ranges[t] - ranges[t-1] in [0, S): expressed as an unrolled
  select over the S possible deltas (S is small), each a masked sublane
  roll;
* the in-row emit chain alpha(t,s) = c(s) + LSE_{j<=s}(ne(j) - c(j))
  (c = exclusive prefix-sum of clamped lpe) runs as log2(S_pad)-step
  Hillis-Steele scans over sublanes;
* alpha (ascending) and beta (descending) share one loop — step k
  advances alpha on row k and beta on row T-1-k;
* lpb/lpe rows stream HBM->VMEM in double-buffered chunks (4 in-streams:
  forward + backward), alpha/beta rows stream back out (2 out-streams);
  the small integer row metadata (ranges, deltas) stays VMEM-resident.

Math and masks mirror ``ops/pruned.py`` exactly (same CLAMP, same NEG
sentinel, same infeasible-band semantics); cross-checked cell-by-cell by
``tests/test_pruned.py``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wavefront import _LANES, _SUBLANES, _lse, _round_up

NEG = -1.0e30
_CLAMP = -1e4  # row-chain sentinel (see ops/pruned.py)
_VMEM_BUDGET = 8 * 1024 * 1024


def _pick_chunk(S_pad: int, B_pad: int, n_rows: int) -> int:
    # 12 chunk buffers live at once (4 in double-buffered + 2 out double-
    # buffered); band rows are tiny (S_pad*B_pad*4 bytes), so chunks can be
    # large — bigger chunks amortise the DMA round-trips.
    per_row = S_pad * B_pad * 4
    ch = _VMEM_BUDGET // (12 * per_row)
    ch = max(1, min(int(ch), 128))
    return min(ch, _round_up(n_rows, 1))


def _excl_cumsum_sub(x, s_iota):
    """Exclusive prefix-sum along sublanes (axis 0)."""
    n = x.shape[0]
    y = x
    sh = 1
    while sh < n:
        rolled = pltpu.roll(y, sh, axis=0)
        y = y + jnp.where(s_iota >= sh, rolled, 0.0)
        sh *= 2
    e = pltpu.roll(y, 1, axis=0)
    return jnp.where(s_iota >= 1, e, 0.0)


def _cumlse_sub(x, s_iota, neg):
    """Inclusive prefix log-sum-exp along sublanes."""
    n = x.shape[0]
    y = x
    sh = 1
    while sh < n:
        rolled = pltpu.roll(y, sh, axis=0)
        y = _lse(y, jnp.where(s_iota >= sh, rolled, neg))
        sh *= 2
    return y


def _rev_cumlse_sub(x, s_iota, neg):
    """Inclusive suffix log-sum-exp along sublanes."""
    n = x.shape[0]
    y = x
    sh = 1
    while sh < n:
        rolled = pltpu.roll(y, n - sh, axis=0)  # result[s] = y[s + sh]
        y = _lse(y, jnp.where(s_iota < n - sh, rolled, neg))
        sh *= 2
    return y


def _shift_by_delta_up(x, delta_row, s_iota, S, neg):
    """out[s] = x[s + d] per-lane (d = delta_row lane value), NEG outside."""
    n = x.shape[0]
    out = jnp.full(x.shape, neg, x.dtype)
    for d in range(S):
        sh = pltpu.roll(x, n - d, axis=0) if d else x
        sh = jnp.where(s_iota <= (S - 1) - d, sh, neg)
        out = jnp.where(delta_row == d, sh, out)
    return out


def _shift_by_delta_down(x, delta_row, s_iota, S, neg):
    """out[s] = x[s - d] per-lane, NEG outside."""
    out = jnp.full(x.shape, neg, x.dtype)
    for d in range(S):
        sh = pltpu.roll(x, d, axis=0) if d else x
        sh = jnp.where(s_iota >= d, sh, neg)
        out = jnp.where(delta_row == d, sh, out)
    return out


def _band_kernel(
    tb_ref, ub_ref, ranges_ref, da_ref, db_ref, lpb_hbm, lpe_hbm,
    alpha_hbm, beta_hbm, llf_ref, llb_ref,
    lpb_f, lpe_f, lpb_b, lpe_b, a_out, b_out, in_sems, out_sems,
    *, n_pad: int, ch: int, s_band: int,
):
    S_pad, Bp = lpb_f.shape[2], lpb_f.shape[3]
    NCH = n_pad // ch
    f32 = jnp.float32
    neg = jnp.asarray(NEG, f32)
    S = s_band

    Tb = tb_ref[...]  # (1, Bp) int32
    Ub = ub_ref[...]
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (S_pad, Bp), 0)

    def in_dma(slot, c, which):
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

    def start_in(slot, c):
        for w in range(4):
            in_dma(slot, c, w).start()

    def wait_in(slot, c):
        for w in range(4):
            in_dma(slot, c, w).wait()

    def out_dma(slot, c, which):
        if which == 0:
            return pltpu.make_async_copy(
                a_out.at[slot], alpha_hbm.at[pl.ds(c * ch, ch)],
                out_sems.at[slot, 0],
            )
        return pltpu.make_async_copy(
            b_out.at[slot], beta_hbm.at[pl.ds(n_pad - (c + 1) * ch, ch)],
            out_sems.at[slot, 1],
        )

    start_in(0, 0)

    def chunk_body(c, carry):
        a_prev, lpb_prev, b_next, llf, llb = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < NCH)
        def _():
            start_in(1 - slot, c + 1)

        wait_in(slot, c)

        @pl.when(c >= 2)
        def _():
            out_dma(slot, c - 2, 0).wait()
            out_dma(slot, c - 2, 1).wait()

        def step(k, inner):
            a_prev, lpb_prev, b_next, llf, llb = inner
            t = c * ch + k

            # ---- alpha on row t (ascending) -------------------------------
            lpb_t = lpb_f[slot, k]
            lpe_t = lpe_f[slot, k]
            da_row = da_ref[pl.ds(t, 1), :]  # (1, Bp)
            r_row = ranges_ref[pl.ds(t, 1), :]
            u = r_row + s_iota
            valid = (t < Tb) & (u < Ub) & (s_iota < S)

            ne = _shift_by_delta_up(a_prev + lpb_prev, da_row, s_iota, S, neg)
            ne = jnp.where((t == 0) & (s_iota == 0), 0.0, ne)
            lpe_c = jnp.maximum(lpe_t, _CLAMP)
            cpre = _excl_cumsum_sub(lpe_c, s_iota)
            a_t = cpre + _cumlse_sub(ne - cpre, s_iota, neg)
            a_t = jnp.where(valid, a_t, neg)
            a_out[slot, k] = a_t

            match = valid & (u == Ub - 1) & (t == Tb - 1)
            has = jnp.sum(jnp.where(match, 1.0, 0.0), axis=0, keepdims=True)
            cand = jnp.sum(jnp.where(match, a_t + lpb_t, 0.0), axis=0,
                           keepdims=True)
            llf = jnp.where(t == Tb - 1,
                            jnp.where(has > 0, cand, neg), llf)

            # ---- beta on row m = n_pad-1-t (descending) -------------------
            m = n_pad - 1 - t
            kk = ch - 1 - k
            lpb_m = lpb_b[slot, kk]
            lpe_m = lpe_b[slot, kk]
            db_row = db_ref[pl.ds(m, 1), :]
            r_m = ranges_ref[pl.ds(m, 1), :]
            u_m = r_m + s_iota
            valid_m = (m < Tb) & (u_m < Ub) & (s_iota < S)

            nb = _shift_by_delta_down(b_next, db_row, s_iota, S, neg)
            ne_b = nb + lpb_m
            terminal = (m == Tb - 1) & (u_m == Ub - 1)
            ne_b = jnp.where(terminal, lpb_m, ne_b)
            lpe_cb = jnp.maximum(lpe_m, _CLAMP)
            pre = _excl_cumsum_sub(lpe_cb, s_iota)
            b_m = _rev_cumlse_sub(ne_b + pre, s_iota, neg) - pre
            b_m = jnp.where(valid_m, b_m, neg)
            b_out[slot, kk] = b_m

            cand_b = jnp.sum(jnp.where(s_iota == 0, b_m, 0.0), axis=0,
                             keepdims=True)
            llb = jnp.where(m == 0, cand_b, llb)

            return a_t, lpb_t, b_m, llf, llb

        carry = jax.lax.fori_loop(0, ch, step,
                                  (a_prev, lpb_prev, b_next, llf, llb))
        out_dma(slot, c, 0).start()
        out_dma(slot, c, 1).start()
        return carry

    init = (
        jnp.full((S_pad, Bp), neg, f32),  # a_prev (virtual row -1)
        jnp.full((S_pad, Bp), neg, f32),  # lpb_prev
        jnp.full((S_pad, Bp), neg, f32),  # b_next (virtual row n_pad)
        jnp.full((1, Bp), neg, f32),      # llf
        jnp.full((1, Bp), neg, f32),      # llb
    )
    _, _, _, llf, llb = jax.lax.fori_loop(0, NCH, chunk_body, init)

    last = NCH - 1
    out_dma(jax.lax.rem(last, 2), last, 0).wait()
    out_dma(jax.lax.rem(last, 2), last, 1).wait()

    @pl.when(NCH >= 2)
    def _():
        prev = last - 1
        out_dma(jax.lax.rem(prev, 2), prev, 0).wait()
        out_dma(jax.lax.rem(prev, 2), prev, 1).wait()

    llf_ref[...] = llf
    llb_ref[...] = llb


def band_row_metadata(ranges, input_lengths, label_lengths, T_pad):
    """Panel-layout integer metadata shared by the band kernels.

    Returns (ranges_p, da_p, db_p) as (T_pad, B_pad) int32 and (tb, ub) as
    (1, B_pad) int32; padded lanes get length 1 (their cells are invalid).
    """
    B, T = ranges.shape
    B_pad = _round_up(B, _LANES)
    r = ranges.astype(jnp.int32)
    delta_a = jnp.diff(r, axis=1, prepend=r[:, :1])
    delta_b = jnp.diff(r, axis=1, append=r[:, -1:])
    pad_rows = lambda x: jnp.pad(
        jnp.transpose(x, (1, 0)), ((0, T_pad - T), (0, B_pad - B))
    )  # (B,T) -> (T_pad, B_pad), zero padding (rows beyond T are invalid)
    tb = jnp.pad(input_lengths.astype(jnp.int32), (0, B_pad - B),
                 constant_values=1)[None, :]
    ub = jnp.pad(label_lengths.astype(jnp.int32) + 1, (0, B_pad - B),
                 constant_values=1)[None, :]
    return pad_rows(r), pad_rows(delta_a), pad_rows(delta_b), tb, ub


@functools.partial(jax.jit, static_argnames=("s_band", "interpret"))
def _band_stream(lpb, lpe, ranges, input_lengths, label_lengths, s_band,
                 interpret):
    B, T, S = lpb.shape
    S_pad = _round_up(S, _SUBLANES)
    B_pad = _round_up(B, _LANES)
    ch = _pick_chunk(S_pad, B_pad, T)
    n_pad = _round_up(T, ch)

    f32 = jnp.float32
    to_panel = lambda x: jnp.pad(
        jnp.transpose(jnp.maximum(x.astype(f32), NEG), (1, 2, 0)),
        ((0, n_pad - T), (0, S_pad - S), (0, B_pad - B)),
        constant_values=NEG,
    )  # (B,T,S) -> (n_pad, S_pad, B_pad)
    lpb_p = to_panel(lpb)
    lpe_p = to_panel(lpe)

    ranges_p, da_p, db_p, tb, ub = band_row_metadata(
        ranges, input_lengths, label_lengths, n_pad
    )

    alpha_p, beta_p, llf, llb = stream_panels(
        lpb_p, lpe_p, ranges_p, da_p, db_p, tb, ub, S, interpret
    )
    unpanel = lambda x: jnp.transpose(x[:T, :S, :B], (2, 0, 1))  # (B,T,S)
    return unpanel(alpha_p), unpanel(beta_p), llf[0, :B], llb[0, :B]


def stream_panels(lpb_p, lpe_p, ranges_p, da_p, db_p, tb, ub, s_band,
                  interpret):
    """Run the streamed band sweep on prebuilt panels.

    Inputs: lpb_p/lpe_p (T_pad, S_pad, B_pad) f32 NEG-padded panels,
    metadata from ``band_row_metadata``. Returns (alpha_p, beta_p, llf,
    llb) with the lattices still in panel layout (same T_pad) — the
    all-panels pruned pipeline (``band_pipeline.py``) consumes them
    without ever materialising a (B, T, S)-layout array.
    """
    T_pad, S_pad, B_pad = lpb_p.shape
    ch = _pick_chunk(S_pad, B_pad, T_pad)
    n_pad = _round_up(T_pad, ch)
    if n_pad != T_pad:
        pad = ((0, n_pad - T_pad), (0, 0), (0, 0))
        lpb_p = jnp.pad(lpb_p, pad, constant_values=NEG)
        lpe_p = jnp.pad(lpe_p, pad, constant_values=NEG)
        rpad = ((0, n_pad - T_pad), (0, 0))
        ranges_p = jnp.pad(ranges_p, rpad)
        da_p = jnp.pad(da_p, rpad)
        db_p = jnp.pad(db_p, rpad)

    kernel = functools.partial(_band_kernel, n_pad=n_pad, ch=ch,
                               s_band=s_band)
    buf = lambda: pltpu.VMEM((2, ch, S_pad, B_pad), jnp.float32)
    alpha_p, beta_p, llf, llb = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tb
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ub
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ranges
            pl.BlockSpec(memory_space=pltpu.VMEM),  # delta_a
            pl.BlockSpec(memory_space=pltpu.VMEM),  # delta_b
            pl.BlockSpec(memory_space=pl.ANY),      # lpb rows (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # lpe rows (HBM)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, S_pad, B_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, S_pad, B_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, B_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, B_pad), jnp.float32),
        ),
        scratch_shapes=[
            buf(), buf(), buf(), buf(),  # lpb_f, lpe_f, lpb_b, lpe_b
            buf(), buf(),  # a_out, b_out
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tb, ub, ranges_p, da_p, db_p, lpb_p, lpe_p)
    return alpha_p[:T_pad], beta_p[:T_pad], llf, llb


def band_forward_backward(lpb, lpe, ranges, input_lengths, label_lengths,
                          interpret: bool | None = None):
    """Pallas drop-in for the XLA band scan in ``ops/pruned.py``.

    Returns (alphas, betas, ll_forward, ll_backward) with identical
    semantics (NEG sentinels, infeasible bands give ll == NEG).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    S = lpb.shape[2]
    return _band_stream(lpb, lpe, ranges, input_lengths, label_lengths, S,
                        interpret)
