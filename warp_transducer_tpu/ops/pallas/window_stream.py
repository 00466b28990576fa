"""Streamed Pallas kernel for the duration-arc lattices (multi-blank, TDT).

The XLA pending-window scans (``ops/multiblank.py:_multiblank_lattice``,
``ops/tdt.py:_tdt_lattice``) are ``lax.scan``s over T steps; at long T the
per-step dispatch dominates exactly as it did for the pruned band loss
before ``band_stream.py`` (~7 us/step XLA vs ~2.3 us in-kernel). This
kernel runs the whole t-recursion in ONE invocation, generalising the
band/wavefront streamed kernels to arbitrary duration arcs.

It is the TPU generalisation of the reference's wavefront recursion
(/root/reference/include/detail/gpu_rnnt_kernel.h:11-47) to lattices whose
no-emit arcs can cross several rows at once.

Layout: row t is a (B_pad, U_pad) tile — batch on sublanes, U on lanes
(``wavefront_stream.py`` convention; full VPU occupancy at B >= 8). The
per-row input channels (lpb, lpe, and the K big-blank / D duration-head
caches) are stacked into one (T_pad, C, B_pad, U_pad) panel so each chunk
is ONE DMA per direction.

Arc algebra (static, baked into the kernel via partial):

* ``chain_chs``: channel indices summed for the within-row u-chain weight
  (the d=0 emit arcs); the chain is solved with the exclusive-prefix +
  cumulative-LSE trick along lanes, log2(U_pad) roll steps.
* ``blank_arcs``: (m, chs) arcs (t, u) -> (t+m, u) — pending slot m-1.
* ``emit_arcs``: (m, chs) arcs (t, u) -> (t+m, u+1) — pending slot m-1
  with a one-lane shift (TDT token arcs with d >= 1).

State: a W-slot pending window P (alpha arrivals for rows t..t+W-1) and
the last W beta rows — each a RING BUFFER in VMEM scratch (row r lives at
slot r % W, dynamic leading-dim indexing). Rings beat the natural
loop-carried tuple-of-tiles design twice over: no W-1 tile moves per step
(renamed tuple carries force Mosaic to insert real copies at the loop
back-edge), and no splat-initialised carries (Mosaic resolves those to a
replicated register layout and then cannot relayout the computed loop
body back into it — "Invalid relayout: non-singleton dimension is
replicated in destination", a hardware-compile failure the client-side
lowering check does not reach). Alpha (ascending) and beta (descending)
share one loop: step k advances row k and row T-1-k. Terminal arcs (a
blank-family arc landing exactly on T_b at u = U_b-1) are folded into
llf during the alpha sweep and into the beta seed, mirroring the XLA
engines cell-for-cell.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wavefront import NEG, _LANES, _SUBLANES, _lse, _round_up, _shift_left, _shift_right

_CLAMP = -1e4  # row-chain sentinel (see ops/pruned.py)
_VMEM_BUDGET = 8 * 1024 * 1024


def _pick_chunk(B_pad: int, U_pad: int, C: int) -> int:
    # live chunk buffers: 2 dirs x 2 slots x C-channel in-rows + 2 x 2
    # out-rows; the W-window carries are chunk-independent.
    per_row = B_pad * U_pad * 4
    ch = _VMEM_BUDGET // ((4 * C + 4) * per_row)
    return max(1, min(int(ch), 16))


def _excl_cumsum_lane(x, lane_iota):
    """Exclusive prefix-sum along lanes (axis 1)."""
    n = x.shape[1]
    y = x
    sh = 1
    while sh < n:
        rolled = pltpu.roll(y, sh, axis=1)
        y = y + jnp.where(lane_iota >= sh, rolled, 0.0)
        sh *= 2
    e = pltpu.roll(y, 1, axis=1)
    return jnp.where(lane_iota >= 1, e, 0.0)


def _cumlse_lane(x, lane_iota, neg):
    """Inclusive prefix log-sum-exp along lanes."""
    n = x.shape[1]
    y = x
    sh = 1
    while sh < n:
        rolled = pltpu.roll(y, sh, axis=1)
        y = _lse(y, jnp.where(lane_iota >= sh, rolled, neg))
        sh *= 2
    return y


def _rev_cumlse_lane(x, lane_iota, neg):
    """Inclusive suffix log-sum-exp along lanes."""
    n = x.shape[1]
    y = x
    sh = 1
    while sh < n:
        rolled = pltpu.roll(y, n - sh, axis=1)  # result[u] = y[u + sh]
        y = _lse(y, jnp.where(lane_iota < n - sh, rolled, neg))
        sh *= 2
    return y


def _window_kernel(
    tb_ref, ub_ref, chans_hbm,
    alpha_hbm, beta_hbm, llf_ref, llb_ref,
    in_f, in_b, a_out, b_out, P_ring, bw_ring, in_sems, out_sems,
    *, n_pad: int, ch: int, W: int,
    chain_chs, blank_arcs, emit_arcs,
):
    Bp, Up = in_f.shape[3], in_f.shape[4]
    NCH = n_pad // ch
    f32 = jnp.float32
    neg = jnp.asarray(NEG, f32)

    Tb = tb_ref[...]  # (Bp, 1) int32
    Ub = ub_ref[...]
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (Bp, Up), 1)
    final_lane = u_iota == Ub - 1
    neg_tile = jnp.where(u_iota >= 0, neg, 0.0)  # iota-backed: never a
    # replicated-layout splat (see module docstring)

    def valid(t):
        return (t < Tb) & (u_iota < Ub)

    def in_dma(slot, c, which):
        lo = c * ch if which == 0 else n_pad - (c + 1) * ch
        buf = in_f if which == 0 else in_b
        return pltpu.make_async_copy(
            chans_hbm.at[pl.ds(lo, ch)], buf.at[slot], in_sems.at[slot, which]
        )

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

    def wsum(buf, slot, k, chs):
        w = buf[slot, k, chs[0]]
        for c in chs[1:]:
            w = w + buf[slot, k, c]
        return w

    in_dma(0, 0, 0).start()
    in_dma(0, 0, 1).start()

    # P_ring[r % W] accumulates alpha arrivals for row r; bw_ring[r % W]
    # holds beta row r while rows r-W..r-1 still need it.
    for j in range(W):
        P_ring[j] = neg_tile
        bw_ring[j] = neg_tile

    def chunk_body(c, carry):
        llf, llb = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < NCH)
        def _():
            in_dma(1 - slot, c + 1, 0).start()
            in_dma(1 - slot, c + 1, 1).start()

        in_dma(slot, c, 0).wait()
        in_dma(slot, c, 1).wait()

        @pl.when(c >= 2)
        def _():
            out_dma(slot, c - 2, 0).wait()
            out_dma(slot, c - 2, 1).wait()

        def row_alpha(t, k, t_slot, llf):
            """Alpha on row t (buffer row k); all ring slots STATIC —
            dynamic VMEM indexing in the hot loop measured ~2x slower
            (address generation defeats Mosaic's pipelining), so the
            caller unrolls W rows per iteration with t % W == t_slot."""
            ne = P_ring[t_slot]
            ne = jnp.where((t == 0) & (u_iota == 0), 0.0, ne)
            if chain_chs is not None:
                wch = jnp.maximum(wsum(in_f, slot, k, chain_chs), _CLAMP)
                cpre = _excl_cumsum_lane(wch, u_iota)
                a_t = cpre + _cumlse_lane(ne - cpre, u_iota, neg)
            else:
                a_t = ne
            a_t = jnp.where(valid(t), a_t, neg)
            a_out[slot, k] = a_t

            # free the slot BEFORE the arc writes: an m == W arc lands on
            # row t+W, which reuses slot t % W
            P_ring[t_slot] = neg_tile
            for m, chs in blank_arcs:
                w = wsum(in_f, slot, k, chs)
                s_m = (t_slot + m) % W
                P_ring[s_m] = _lse(P_ring[s_m], a_t + w)
                # terminal arc: lands exactly on T_b at the last label
                cand = jnp.sum(
                    jnp.where(final_lane & valid(t), a_t + w, 0.0),
                    axis=1, keepdims=True)
                hit = (t + m == Tb)
                llf = jnp.where(hit, _lse(llf, cand), llf)
            for m, chs in emit_arcs:
                w = wsum(in_f, slot, k, chs)
                s_m = (t_slot + m) % W
                P_ring[s_m] = _lse(P_ring[s_m], _shift_right(a_t + w, neg))
            return llf

        def row_beta(r, kk, r_slot, llb):
            """Beta on row r (buffer row kk), static slots as above."""
            nb = neg_tile
            for m, chs in blank_arcs:
                w = wsum(in_b, slot, kk, chs)
                nb = _lse(nb, w + bw_ring[(r_slot + m) % W])
                nb = _lse(nb, jnp.where((r + m == Tb) & final_lane, w, neg))
            for m, chs in emit_arcs:
                w = wsum(in_b, slot, kk, chs)
                nb = _lse(nb, w + _shift_left(bw_ring[(r_slot + m) % W],
                                              neg))
            if chain_chs is not None:
                wchb = jnp.maximum(wsum(in_b, slot, kk, chain_chs), _CLAMP)
                cb = _excl_cumsum_lane(wchb, u_iota)
                b_r = _rev_cumlse_lane(nb + cb, u_iota, neg) - cb
            else:
                b_r = nb
            b_r = jnp.where(valid(r), b_r, neg)
            b_out[slot, kk] = b_r
            # row r+W (stored at this slot) was needed by rows > r only
            bw_ring[r_slot] = b_r

            cand_b = jnp.sum(jnp.where(u_iota == 0, b_r, 0.0),
                             axis=1, keepdims=True)
            return jnp.where(r == 0, cand_b, llb)

        def step(g, inner):
            """One iteration = W consecutive rows; ch % W == 0 and
            n_pad % W == 0 keep every slot index static."""
            llf, llb = inner
            base = c * ch + g * W
            for j in range(W):
                t = base + j
                llf = row_alpha(t, g * W + j, j, llf)
                # r = n_pad - 1 - t; n_pad % W == 0 makes its slot static
                r_slot = (W - 1 - j) % W
                llb = row_beta(n_pad - 1 - t, ch - 1 - (g * W + j),
                               r_slot, llb)
            return llf, llb

        carry = jax.lax.fori_loop(0, ch // W, step, (llf, llb))
        out_dma(slot, c, 0).start()
        out_dma(slot, c, 1).start()
        return carry

    # (Bp, 1) splat carries are fine (singleton-lane replication is legal;
    # wavefront_stream carries its llf the same way at B=128)
    col = jnp.full((Bp, 1), neg, f32)
    llf, llb = jax.lax.fori_loop(0, NCH, chunk_body, (col, col))

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


@functools.partial(
    jax.jit,
    static_argnames=("chain_chs", "blank_arcs", "emit_arcs", "interpret"))
def _window_stream(chans, input_lengths, label_lengths,
                   chain_chs, blank_arcs, emit_arcs, interpret):
    """Run the pending-window sweep.

    chans: (C, B, T, U) f32 stacked per-row channel caches, or the
    prebuilt (T, C, B, U) panel (``panel_major=True`` callers transpose
    at the producer so XLA fuses the reorientation into prep).
    Returns (alphas, betas, llf, llb) with (B, T, U) lattices.
    """
    C, B, T, U = chans.shape
    W = max(m for m, _ in blank_arcs + emit_arcs)
    U_pad = _round_up(U, _LANES)
    B_pad = _round_up(B, _SUBLANES)
    ch = _pick_chunk(B_pad, U_pad, C)
    # the kernel's inner loop processes W rows per iteration with static
    # ring slots; ch and hence n_pad must be multiples of W
    ch = max(W, (ch // W) * W)
    n_pad = _round_up(T, ch)

    panel = jnp.pad(
        jnp.transpose(jnp.maximum(chans.astype(jnp.float32), NEG),
                      (2, 0, 1, 3)),  # (C,B,T,U) -> (T,C,B,U)
        ((0, n_pad - T), (0, 0), (0, B_pad - B), (0, U_pad - U)),
        constant_values=NEG,
    )
    tb = jnp.pad(input_lengths.astype(jnp.int32), (0, B_pad - B),
                 constant_values=1)[:, None]
    ub = jnp.pad(label_lengths.astype(jnp.int32) + 1, (0, B_pad - B),
                 constant_values=1)[:, None]
    return _run_window_kernel(panel, tb, ub, B, T, U, ch, n_pad, W,
                              chain_chs, blank_arcs, emit_arcs, interpret)


def window_geometry(T, W, B, U, C):
    """(ch, n_pad, B_pad, U_pad) the kernel will use — callers building
    the (n_pad, C, B_pad, U_pad) panel at the producer need these."""
    U_pad = _round_up(U, _LANES)
    B_pad = _round_up(B, _SUBLANES)
    ch = _pick_chunk(B_pad, U_pad, C)
    ch = max(W, (ch // W) * W)
    return ch, _round_up(T, ch), B_pad, U_pad


@functools.partial(
    jax.jit,
    static_argnames=("T", "U", "chain_chs", "blank_arcs", "emit_arcs",
                     "interpret"))
def _window_stream_panel(panel, input_lengths, label_lengths, T, U,
                         chain_chs, blank_arcs, emit_arcs, interpret):
    """As ``_window_stream`` but on a prebuilt NEG-padded
    (n_pad, C, B_pad, U_pad) panel (from ``window_geometry`` shapes)."""
    n_pad, C, B_pad, U_pad = panel.shape
    B = input_lengths.shape[0]
    W = max(m for m, _ in blank_arcs + emit_arcs)
    ch, n_pad2, _, _ = window_geometry(T, W, B, U, C)
    assert n_pad2 == n_pad, (n_pad2, n_pad)
    tb = jnp.pad(input_lengths.astype(jnp.int32), (0, B_pad - B),
                 constant_values=1)[:, None]
    ub = jnp.pad(label_lengths.astype(jnp.int32) + 1, (0, B_pad - B),
                 constant_values=1)[:, None]
    return _run_window_kernel(panel, tb, ub, B, T, U, ch, n_pad, W,
                              chain_chs, blank_arcs, emit_arcs, interpret)


def _run_window_kernel(panel, tb, ub, B, T, U, ch, n_pad, W,
                       chain_chs, blank_arcs, emit_arcs, interpret):
    n_pad_, C, B_pad, U_pad = panel.shape

    kernel = functools.partial(
        _window_kernel, n_pad=n_pad, ch=ch, W=W,
        chain_chs=chain_chs, blank_arcs=blank_arcs, emit_arcs=emit_arcs)
    inbuf = lambda: pltpu.VMEM((2, ch, C, B_pad, U_pad), jnp.float32)
    outbuf = lambda: pltpu.VMEM((2, ch, B_pad, U_pad), jnp.float32)
    alpha_p, beta_p, llf, llb = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tb
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ub
            pl.BlockSpec(memory_space=pl.ANY),      # channel panel (HBM)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, B_pad, U_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, B_pad, U_pad), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, 1), jnp.float32),
        ),
        scratch_shapes=[
            inbuf(), inbuf(),    # forward / backward channel chunks
            outbuf(), outbuf(),  # alpha / beta chunks
            pltpu.VMEM((W, B_pad, U_pad), jnp.float32),  # P ring
            pltpu.VMEM((W, B_pad, U_pad), jnp.float32),  # bw ring
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tb, ub, panel)

    unpanel = lambda x: jnp.transpose(x[:T, :B, :U], (1, 0, 2))
    return unpanel(alpha_p), unpanel(beta_p), llf[:B, 0], llb[:B, 0]


def multiblank_forward_backward(lpb, lpe, lpB, durations, input_lengths,
                                label_lengths, interpret: bool | None = None):
    """Pallas drop-in for ``ops/multiblank.py:_multiblank_lattice``.

    Returns (alphas, betas, ll_forward, ll_backward), identical semantics
    (NEG sentinels, terminal big-blank arcs folded into llf).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    K = len(durations)
    chans = jnp.stack(
        [lpb, lpe] + [lpB[..., k] for k in range(K)], axis=0)
    blank_arcs = ((1, (0,)),) + tuple(
        (int(m), (2 + k,)) for k, m in enumerate(durations))
    return _window_stream(chans, input_lengths, label_lengths,
                          chain_chs=(1,), blank_arcs=blank_arcs,
                          emit_arcs=(), interpret=interpret)


def tdt_forward_backward(lpb, lpe, lpd, durations, input_lengths,
                         label_lengths, interpret: bool | None = None):
    """Pallas drop-in for ``ops/tdt.py:_tdt_lattice``.

    Token arcs with d >= 1 are emit arcs landing one lane over; d = 0
    token arcs form the within-row chain; blank arcs need d >= 1.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    D = len(durations)
    chans = jnp.stack(
        [lpb, lpe] + [lpd[..., j] for j in range(D)], axis=0)
    chain = None
    blank_arcs = []
    emit_arcs = []
    for j, d in enumerate(durations):
        if d == 0:
            chain = (1, 2 + j)
        else:
            blank_arcs.append((int(d), (0, 2 + j)))
            emit_arcs.append((int(d), (1, 2 + j)))
    return _window_stream(chans, input_lengths, label_lengths,
                          chain_chs=chain, blank_arcs=tuple(blank_arcs),
                          emit_arcs=tuple(emit_arcs), interpret=interpret)
