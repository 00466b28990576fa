"""Fused joint-network + RNN-T-loss Pallas kernels.

The dense large-V loss is HBM-bound: the (B, T, U, V) joint tensor is
written by the joint network's output projection, read by prep, and
read+written again by the gradient pass — ~69% of the chip's practical
stream rate with nothing left to tune (ROADMAP #8). These kernels make the
big tensor DISAPPEAR: the joint projection's output tile is produced in
VMEM by the MXU and consumed in-register.

Given the projected trunk activations e = enc_proj(enc) (B, T, H) and
p = pred_proj(pred) (B, U, H), the joint is
``logits[b,t,u] = tanh(e[b,t] + p[b,u]) @ W + bias`` (models/transducer.py
``Joint``; reference analog: the test-time joint of
/root/reference/pytorch_binding/test/test_time.py:45-99).

* ``fused_prep``: per (batch, T-tile) grid step, builds the (T_t·U_pad, H)
  row block, runs the (H, V)-tiled MXU matmul, and reduces each row online
  (running max / sum-exp + blank and label column extraction) to the three
  (B, T, U) lattice caches. The (·, V) logits exist only tile-wise in VMEM
  — the reference's ``reduce.h`` fused one step further into the producer.
* ``fused_grad``: recomputes each logits tile, forms the dense gradient
  g = coef·softmax − cb·1_blank − ce·1_label in-register (the closed form
  of /root/reference/include/detail/gpu_rnnt_kernel.h:143-179), and
  contracts it immediately: dW += hᵀg, de/dp from (g Wᵀ)·tanh′, db += Σg.
  The gradient tensor is never materialised either.

Layout notes: row blocks are (T_t·U_pad, H) with U_pad a multiple of 8
and T_t·U_pad a multiple of 128, so the collapse/expand reshapes between
(T_t, U_pad, H) and (R, H) are layout no-ops; per-row scalars (labels and
the (B,T,U) coefficient fields) are passed pre-flattened as (rows, 1)
panels to avoid lane-relayout transposes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wavefront import _LANES, _SUBLANES, _round_up

NEG = -1.0e30
# Tuning knobs (env-overridable for experiments; defaults are the measured
# best at B=64, T=150, U=21, V=5000, H=256 on v5e).
import os as _os

# 1024-wide V tiles beat 512 at the headline fused shape (bf16 15.41 vs
# 15.61 ms, f32 15.91 vs 16.33; 2048 ties 1024 — tiles A/B, round 3).
_V_TILE = int(_os.environ.get("WTT_FUSED_VTILE", 1024))
# 512-row blocks measured 3% faster than 256 at the headline fused shape
# (15.63 vs 16.16 ms); 1024-row blocks are ~30% WORSE (20.4 ms).
_MIN_ROWS = int(_os.environ.get("WTT_FUSED_MINROWS", 512))
# Software-pipeline the forward kernel: issue tile k+1's MXU matmul before
# tile k's VPU epilogue so the scheduler can overlap them (the epilogue —
# exp, reduces, selects — is the measured gap between 15.9 ms and the
# ~12.8 ms pure-matmul floor at the headline shape).
_PIPELINE = int(_os.environ.get("WTT_FUSED_PIPELINE", 0))
# Move the forward tile's CROSS-LANE sum(exp) onto the MXU: one extra
# small matmul against a constant ones column (v_tile x LANES, ~+20% of
# that tile's MXU work) replaces the multi-pass VPU lane reduce. The
# FORWARD epilogue is the VPU-bound half (max + exp + sum lane-reduces
# ≈ 4x the tile's matmul time at the headline fused shape); db's
# backward sum is a cheap sublane reduce and stays on the VPU. A/B knob.
_MXU_SUM = int(_os.environ.get("WTT_FUSED_MXU_SUM", 0))
# Fold log(coef) into the backward exp: g = exp(logits + (denom + lcoef))
# computes coef*softmax in ONE exp pass instead of exp-then-multiply —
# one full (R, v_tile) VPU pass saved per tile. Exact for coef == 0
# (lcoef = NEG, exp underflows to 0); the label column's f32 -ce
# cancellation is untouched. A/B knob.
_LOGCOEF = int(_os.environ.get("WTT_FUSED_LOGCOEF", 0))
# DIAGNOSTIC ONLY — outputs are garbage (finite, data-dependent so nothing
# is DCEd). Keeps the exact grid, block specs, DMAs, tanh recompute and
# every MXU matmul, but strips the per-tile VPU epilogue (softmax
# reductions forward; exp/select/sub + db reduce backward). bench --fused
# under this knob measures the kernel's matmul+DMA envelope in its real
# program structure — the measured floor the epilogue gap is judged
# against (the analytic "pure matmul" floor ignores tanh, accumulator
# traffic and tile-boundary effects). 1 = both kernels, 2 = forward
# only, 3 = backward only (splits the epilogue cost between them).
_MM_ONLY = int(_os.environ.get("WTT_FUSED_MM_ONLY", 0))
_MM_ONLY_FWD = _MM_ONLY in (1, 2)
_MM_ONLY_BWD = _MM_ONLY in (1, 3)
# Chunk-count budget for the V-chunked drivers. v5e has 128 MiB of
# physical VMEM; Mosaic's default 16 MiB scope forced 63 backward chunks
# at H=1024/V=32000 — each chunk re-reading e/p and recomputing tanh(h),
# a 63x recompute tax that made chunked-fused SLOWER than unfused. The
# pallas_calls raise vmem_limit_bytes to match (budget + headroom for
# Mosaic's own double-buffering of the row panels).
_VMEM_BUDGET = int(_os.environ.get("WTT_FUSED_VMEM_MB", 48)) * 1024 * 1024
_VMEM_LIMIT = pltpu.CompilerParams(
    vmem_limit_bytes=_VMEM_BUDGET + 48 * 1024 * 1024)


def _row_geometry(T: int, U: int):
    """Pick (T_t, U_pad, R): U_pad multiple of 8, R = T_t*U_pad multiple
    of 128, R in a VPU/MXU-friendly range.

    T_t must itself be a multiple of 8 (or cover all of T): the e/de
    blocks are (1, T_t, H) over (B, T_pad, H) arrays, and Mosaic requires
    the second-to-last block dim to be 8-divisible or equal the array dim.
    The gcd formula alone gives T_t in {1, 2, 4} whenever U_pad is a
    multiple of 128 (label lengths ~121+), which lowers fine in
    interpreter mode and fails on TPU.
    """
    U_pad = _round_up(U, _SUBLANES)
    import math

    T_t = _LANES // math.gcd(U_pad, _LANES)  # smallest T_t with R % 128 == 0
    while T_t * U_pad < _MIN_ROWS:  # grow towards fuller MXU row blocks
        T_t *= 2
    while T_t % _SUBLANES:  # powers of 2: one or two doublings
        T_t *= 2
    R = T_t * U_pad
    return T_t, U_pad, R


# ---------------------------------------------------------------------------
# Forward: (e, p, W, bias, labels) -> (denom, lpb, lpe) row-flat
# ---------------------------------------------------------------------------

def _prep_kernel(e_ref, p_ref, w_ref, bias_ref, *refs,
                 blank: int, n_vt: int, v_tile: int, t_t: int, u_pad: int,
                 mm_dtype, v_base: int = 0, partial: bool = False,
                 with_dur: bool = False, extra_cols: tuple = (),
                 with_label: bool = True, lab_bf16: bool = True):
    """One (batch, T-tile) row block.

    Default outputs: (denom, lpb, lpe).  With ``partial=True`` the outputs
    are the raw online-reduction state (max, sum-exp-rel-max, blank logit,
    label logit) so a V-chunked caller can merge several invocations whose
    W slices each fit VMEM; ``v_base`` is the global column id of this
    kernel's first V column (blank/label ids stay global). With
    ``with_dur`` (the TDT path) the inputs gain (w_d, bias_d) before the
    labels and the outputs gain the duration head's raw logits (R, D_pad)
    — one extra tiny MXU matmul on the same joint features.

    Label logits never touch the V loop: ``wlab`` (the host-gathered
    W[:, labels[u]] columns, (U_pad, H)) turns them into ONE (R, H)
    multiply-reduce per block plus the gathered bias — the V loop's old
    per-tile compare/select/max (3 full passes over every logits tile)
    was the single largest VPU epilogue cost. ``with_label=False``
    (V-chunked calls with v_base > 0) skips it; the chunk at v_base == 0
    carries the full-W label value."""
    f32 = jnp.float32
    neg = jnp.asarray(NEG, f32)
    R = t_t * u_pad
    H = e_ref.shape[2]
    if with_dur:
        wd_ref, bd_ref, lab_ref, *refs = refs
    else:
        lab_ref, *refs = refs
    if with_label:
        wlab_ref, blab_ref, *out_refs = refs
    else:
        out_refs = refs
    if with_dur:
        *out_refs, dlog_ref = out_refs
    if extra_cols:
        # multi-blank: the K big-blank columns cached into one padded
        # (R, 128) output (sliced to K on the host)
        *out_refs, lpx_ref = out_refs

    e_t = e_ref[0].astype(f32)  # (T_t, H)
    p_t = p_ref[0].astype(f32)  # (U_pad, H)
    h3 = jnp.tanh(e_t[:, None, :] + p_t[None, :, :])  # (T_t, U_pad, H)
    hm3 = h3.reshape(R, H)
    hm = hm3.astype(mm_dtype)
    if with_dur:
        dlog_ref[...] = jax.lax.dot_general(
            hm3, wd_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + bd_ref[...]

    lab = lab_ref[...]  # (R, 1) int32; -1 where no label defined

    m = jnp.full((R, 1), neg, f32)
    s = jnp.zeros((R, 1), f32)
    blank_logit = jnp.full((R, 1), neg, f32)
    if with_label:
        # Round the product inputs to whatever the V-loop matmul rounds
        # to: the TPU MXU's DEFAULT f32 precision rounds matmul inputs to
        # bf16 (f32 accumulate) — full-f32 products here measured 2e-3
        # relative drift vs the unfused reference on hardware. Interpret
        # mode (CPU) does exact-f32 matmuls, so there lab_bf16=False.
        bf = jnp.bfloat16 if lab_bf16 else f32
        wl = wlab_ref[0].astype(bf).astype(f32)  # (U_pad, H)
        ll3 = jnp.sum(h3.astype(bf).astype(f32) * wl[None], axis=2,
                      keepdims=True)  # (T_t, U_pad, 1)
        lab_logit = ll3.reshape(R, 1) + blab_ref[...]
        lab_logit = jnp.where(lab >= 0, lab_logit, neg)
    else:
        lab_logit = jnp.full((R, 1), neg, f32)
    if extra_cols:
        lpx = jnp.full(lpx_ref.shape, neg, f32)

    def tile_logits(k):
        w_k = w_ref[:, k * v_tile:(k + 1) * v_tile].astype(mm_dtype)
        return jax.lax.dot_general(
            hm, w_k, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + bias_ref[:, k * v_tile:(k + 1) * v_tile]

    if _MXU_SUM:
        # (v_tile, LANES) constant whose column 0 is ones: exp-tile @ ones
        # turns the cross-lane sum into a small MXU matmul (v_tile/LANES of
        # a main-tile pass) and frees a VPU reduce pass per tile.
        lane0 = jax.lax.broadcasted_iota(jnp.int32, (v_tile, _LANES), 1)
        ones_col = jnp.where(lane0 == 0, 1.0, 0.0)

    nxt = tile_logits(0) if _PIPELINE else None
    for k in range(n_vt):
        if _PIPELINE:
            logits = nxt
            nxt = tile_logits(k + 1) if k + 1 < n_vt else None
        else:
            logits = tile_logits(k)
        if _MM_ONLY_FWD:
            s = s + logits[:, :1]  # cheap lane slice; keeps matmuls live
            continue
        t_max = jnp.max(logits, axis=1, keepdims=True)
        m_new = jnp.maximum(m, t_max)
        ex = jnp.exp(logits - m_new)
        if _MXU_SUM:
            # f32 operands: the MXU's default precision rounds them to
            # bf16 internally (no VPU convert pass) and accumulates f32.
            # Per-element rounding is ±2^-9 with random sign, so the
            # tile-sum's relative error is ~0.2%/sqrt(v_tile) ≈ 1e-4 —
            # ~3e-5 on log(s), inside the cross-engine parity bounds.
            t_sum = jax.lax.dot_general(
                ex, ones_col, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)[:, :1]
        else:
            t_sum = jnp.sum(ex, axis=1, keepdims=True)
        s = s * jnp.exp(m - m_new) + t_sum
        m = m_new
        if k * v_tile <= blank - v_base < (k + 1) * v_tile:
            bl = blank - v_base - k * v_tile
            blank_logit = logits[:, bl:bl + 1]
        for kk, xcol in enumerate(extra_cols):
            if k * v_tile <= xcol - v_base < (k + 1) * v_tile:
                # column write as a lane-iota select: .at[...].set emits a
                # scatter, which Mosaic cannot lower (interpreter accepts it)
                c = xcol - v_base - k * v_tile
                colx = jax.lax.broadcasted_iota(jnp.int32, lpx.shape, 1)
                lpx = jnp.where(colx == kk, logits[:, c:c + 1], lpx)

    if _MM_ONLY_FWD:
        d = -jnp.log1p(jnp.abs(s))  # finite, data-dependent garbage
        if partial:
            m_ref, s_ref, bl_ref, le_ref = out_refs
            m_ref[...] = d; s_ref[...] = 1.0 + jnp.abs(d)
            bl_ref[...] = d; le_ref[...] = d
        else:
            denom_ref, lpb_ref, lpe_ref = out_refs
            denom_ref[...] = d; lpb_ref[...] = d; lpe_ref[...] = d
            if extra_cols:
                lpx_ref[...] = d + jnp.zeros(lpx_ref.shape, f32)
        return

    if partial:
        m_ref, s_ref, bl_ref, le_ref = out_refs
        m_ref[...] = m
        s_ref[...] = s  # sum of exp(logit - m) over this chunk's columns
        bl_ref[...] = blank_logit
        le_ref[...] = lab_logit
        return

    denom_ref, lpb_ref, lpe_ref = out_refs
    denom = -(m + jnp.log(s))
    denom_ref[...] = denom
    lpb_ref[...] = blank_logit + denom
    lpe_ref[...] = lab_logit + denom  # stays ~NEG where lab == -1
    if extra_cols:
        lpx_ref[...] = lpx + denom


# ---------------------------------------------------------------------------
# Backward: recompute tiles, contract the in-register dense gradient
# ---------------------------------------------------------------------------

def _grad_kernel(e_ref, p_ref, w_ref, bias_ref, *refs,
                 blank: int, n_vt: int, v_tile: int, t_t: int, u_pad: int,
                 mm_dtype, v_base: int = 0, with_dur: bool = False,
                 extra_cols: tuple = ()):
    """The label column's -ce correction MUST stay inside the V loop: the
    label-column gradient is coef*p_lab - ce, two nearly-cancelling O(1)
    terms whose difference is often ~1e-3.  The MXU's DEFAULT f32 precision
    rounds matmul inputs to bf16, so subtracting in f32 BEFORE the
    ``astype(mm_dtype)`` rounds the small difference (matching the unfused
    reference, which feeds g - ce*onehot through one matmul), while any
    out-of-loop ``dh -= ce*wlab`` correction rounds the two large terms
    separately and scatters de at the bf16 ulp of g (measured 7e-4 abs /
    0.36 rel on hardware at the test shapes — catastrophic cancellation no
    rounding trick fixes).  The per-tile compare/select costs ~2 VPU passes
    over each logits tile; correctness owns that cost."""
    f32 = jnp.float32
    R = t_t * u_pad
    H = e_ref.shape[2]
    b = pl.program_id(0)
    i = pl.program_id(1)
    if with_dur and extra_cols:
        raise NotImplementedError(
            "_grad_kernel: with_dur + extra_cols (a TDT + multi-blank "
            "hybrid) has no caller and no ref layout defined")
    if with_dur:
        wd_ref, lab_ref, denom_ref, coef_ref, cb_ref, ce_ref, gd_ref, *refs = refs
    elif extra_cols:
        lab_ref, denom_ref, coef_ref, cb_ref, ce_ref, cx_ref, *refs = refs
        cx = cx_ref[...]  # (R, 128); columns >= K are zero
    else:
        lab_ref, denom_ref, coef_ref, cb_ref, ce_ref, *refs = refs
    de_ref, dp_ref, dw_ref, db_ref, *refs = refs
    if with_dur:
        (dwd_ref,) = refs

    e_t = e_ref[0].astype(f32)
    p_t = p_ref[0].astype(f32)
    h3 = jnp.tanh(e_t[:, None, :] + p_t[None, :, :])  # (T_t, U_pad, H)
    hm32 = h3.reshape(R, H)
    hm = hm32.astype(mm_dtype)

    lab = lab_ref[...]        # (R, 1)
    denom = denom_ref[...]    # (R, 1)
    coef = coef_ref[...]
    cb = cb_ref[...]
    ce = ce_ref[...]
    if _LOGCOEF:
        # per-row constant; folding it into the exp argument turns the
        # per-tile coef*exp(logits+denom) into a single exp pass
        dl = denom + jnp.where(coef > 0, jnp.log(coef), NEG)

    @pl.when((b == 0) & (i == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        if with_dur:
            dwd_ref[...] = jnp.zeros_like(dwd_ref)

    @pl.when(i == 0)
    def _():
        dp_ref[...] = jnp.zeros_like(dp_ref)

    dh = jnp.zeros((R, H), f32)
    if with_dur:
        # duration head: its cotangent joins dh before the tanh backprop
        # (padded D columns of gd are zero, so they contribute nothing)
        gd = gd_ref[...]  # (R, D_pad)
        dh = dh + jax.lax.dot_general(
            gd, wd_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        dwd_ref[...] += jax.lax.dot_general(
            hm32, gd, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        )
    # loop-invariant: the tile-column iota (per-tile ids derive from it by
    # shifting the comparand, not regenerating the iota)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, v_tile), 1)
    for k in range(n_vt):
        w_k = w_ref[:, k * v_tile:(k + 1) * v_tile]
        logits = jax.lax.dot_general(
            hm, w_k.astype(mm_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + bias_ref[:, k * v_tile:(k + 1) * v_tile]
        # softmax prob of tile columns; padded columns have bias NEG -> 0
        if _MM_ONLY_BWD:
            g = logits  # diagnostic: identical MXU work, no VPU epilogue
        elif _LOGCOEF:
            g = jnp.exp(logits + dl)
        else:
            g = coef * jnp.exp(logits + denom)
        if not _MM_ONLY_BWD:
            if k * v_tile <= blank - v_base < (k + 1) * v_tile:
                g = g - jnp.where(col == (blank - v_base - k * v_tile),
                                  cb, 0.0)
            for kk, xcol in enumerate(extra_cols):
                if k * v_tile <= xcol - v_base < (k + 1) * v_tile:
                    c = xcol - v_base - k * v_tile
                    g = g - jnp.where(col == c, cx[:, kk:kk + 1], 0.0)
            # label column (per-row dynamic): ce is zero wherever lab == -1,
            # and lab - v_base - k*v_tile < 0 there, so no extra mask
            g = g - jnp.where(col == (lab - v_base - k * v_tile), ce, 0.0)

        g_mm = g.astype(mm_dtype)  # one convert pass, both matmuls
        dh = dh + jax.lax.dot_general(
            g_mm, w_k.astype(mm_dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=f32,
        )
        dw_ref[:, k * v_tile:(k + 1) * v_tile] += jax.lax.dot_general(
            hm, g_mm, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        if _MM_ONLY_BWD:
            db_ref[:, k * v_tile:(k + 1) * v_tile] += g[:1, :]
        else:
            db_ref[:, k * v_tile:(k + 1) * v_tile] += jnp.sum(
                g, axis=0, keepdims=True
            )

    dh_pre = (dh * (1.0 - hm32 * hm32)).reshape(t_t, u_pad, H)
    de_ref[0] = jnp.sum(dh_pre, axis=1)  # (T_t, H)
    dp_ref[0] += jnp.sum(dh_pre, axis=0)  # (U_pad, H)


# ---------------------------------------------------------------------------
# Host wrappers
# ---------------------------------------------------------------------------

def _common_geometry(e, p, W):
    B, T, H = e.shape
    U = p.shape[1]
    V = W.shape[1]
    T_t, U_pad, R = _row_geometry(T, U)
    T_pad = _round_up(T, T_t)
    # big row blocks (long labels force R = 8*U_pad) shrink the V tile so
    # the two (R, v_tile) f32 logits-sized temporaries stay ~<=4 MB
    v_cap = max(_LANES, (4 * 1024 * 1024 // (R * 8)) // _LANES * _LANES)
    v_tile = min(_V_TILE, v_cap, _round_up(V, _LANES))
    V_pad = _round_up(V, v_tile)
    n_vt = V_pad // v_tile
    return B, T, U, H, V, T_t, U_pad, R, T_pad, v_tile, V_pad, n_vt


def _labels_full(labels, label_valid_len, B, U, U_pad):
    """(B, U_pad) int32: labels[u] per u; -1 where the emit transition is
    undefined (u >= U-1 or beyond the utterance)."""
    labels_u = labels.astype(jnp.int32)
    lab_full = jnp.full((B, U_pad), -1, jnp.int32)
    lab_full = jax.lax.dynamic_update_slice(
        lab_full, labels_u[:, : U - 1], (0, 0)
    ) if U > 1 else lab_full
    u_iota = jnp.arange(U_pad, dtype=jnp.int32)[None, :]
    return jnp.where(u_iota < label_valid_len[:, None], lab_full, -1)


def _labels_rows(labels, label_valid_len, B, T_pad, U, U_pad, T_t):
    """(rows, 1) int32 panel: labels[u] for row (b, t, u); -1 where the
    emit transition is undefined (u >= U-1 or beyond the utterance)."""
    lab_full = _labels_full(labels, label_valid_len, B, U, U_pad)
    rows = jnp.broadcast_to(lab_full[:, None, :], (B, T_pad, U_pad))
    return rows.reshape(-1, 1)


def _gather_label_cols(W, bias, lab_full):
    """wlab (B, U_pad, H) = W[:, labels] and blab (B, U_pad) = bias[labels]
    (index 0 / value 0 where no label — the kernels mask by lab >= 0).
    Must be fed the FULL-width W, never a V chunk."""
    safe = jnp.maximum(lab_full, 0)
    wlab = jnp.take(W, safe, axis=1)  # (H, B, U_pad)
    wlab = jnp.transpose(wlab, (1, 2, 0))
    blab = jnp.where(lab_full >= 0,
                     jnp.take(bias.astype(jnp.float32), safe), 0.0)
    return wlab, blab


def _blab_rows(blab, B, T_pad, U_pad):
    rows = jnp.broadcast_to(blab[:, None, :], (B, T_pad, U_pad))
    return rows.reshape(-1, 1).astype(jnp.float32)


def _flat_rows(x, B, T, U, T_pad, U_pad, fill=0.0):
    """(B, T, U) -> (B*T_pad*U_pad, 1) f32 panel."""
    x = jnp.pad(x.astype(jnp.float32),
                ((0, 0), (0, T_pad - T), (0, U_pad - U)),
                constant_values=fill)
    return x.reshape(-1, 1)


@functools.partial(jax.jit, static_argnames=("blank", "interpret", "v_base",
                                             "partial"))
def fused_prep(e, p, W, bias, labels, label_lengths, blank=0,
               interpret=False, v_base=0, partial=False,
               wlab=None, blab=None):
    """(denom, lpb, lpe) as (B, T, U) f32 — the joint tensor never exists.

    e: (B, T, H), p: (B, U, H) projected trunk activations; W: (H, V),
    bias: (V,) output-projection parameters; labels: (B, >=U-1) int32.

    With ``partial=True`` (the V-chunked path: W here is one V slice whose
    first global column is ``v_base``) returns the unmerged online state
    (m, s, blank_logit, label_logit) instead; ``fused_prep_chunked`` merges
    the chunks. The label logit is computed OUTSIDE the V loop from the
    gathered W[:, labels] columns: pass ``wlab``/``blab`` (from
    ``_gather_label_cols`` on the FULL W) on chunked calls; only the
    v_base == 0 chunk computes it (others report the NEG sentinel).
    """
    B, T, U, H, V, T_t, U_pad, R, T_pad, v_tile, V_pad, n_vt = (
        _common_geometry(e, p, W))
    f32 = jnp.float32
    mm_dtype = jnp.bfloat16 if W.dtype == jnp.bfloat16 else f32
    T_tiles = T_pad // T_t
    with_label = v_base == 0

    e_p = jnp.pad(e, ((0, 0), (0, T_pad - T), (0, 0)))
    p_p = jnp.pad(p, ((0, 0), (0, U_pad - U), (0, 0)))
    W_p = jnp.pad(W, ((0, 0), (0, V_pad - V)))
    bias_p = jnp.pad(bias.astype(f32)[None, :], ((0, 0), (0, V_pad - V)),
                     constant_values=NEG)
    lab_full = _labels_full(labels, label_lengths.astype(jnp.int32),
                            B, U, U_pad)
    lab_rows = jnp.broadcast_to(
        lab_full[:, None, :], (B, T_pad, U_pad)).reshape(-1, 1)
    rows_total = B * T_pad * U_pad

    extra_in, extra_specs = [], []
    if with_label:
        if wlab is None:
            wlab, blab = _gather_label_cols(W, bias, lab_full)
        extra_in = [wlab, _blab_rows(blab, B, T_pad, U_pad)]

    kernel = functools.partial(
        _prep_kernel, blank=blank, n_vt=n_vt, v_tile=v_tile,
        t_t=T_t, u_pad=U_pad, mm_dtype=mm_dtype, v_base=v_base,
        partial=partial, with_label=with_label, lab_bf16=not interpret,
    )
    row_spec = pl.BlockSpec((R, 1), lambda b, i: (b * T_tiles + i, 0),
                            memory_space=pltpu.VMEM)
    if with_label:
        extra_specs = [
            pl.BlockSpec((1, U_pad, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
        ]
    n_out = 4 if partial else 3
    outs = pl.pallas_call(
        kernel,
        grid=(B, T_tiles),
        in_specs=[
            pl.BlockSpec((1, T_t, H), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U_pad, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, V_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
        ] + extra_specs,
        out_specs=(row_spec,) * n_out,
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows_total, 1), f32) for _ in range(n_out)
        ),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(e_p, p_p, W_p, bias_p, lab_rows, *extra_in)

    unflat = lambda x: x.reshape(B, T_pad, U_pad)[:, :T, :U]
    return tuple(unflat(o) for o in outs)


@functools.partial(jax.jit, static_argnames=("blank", "interpret", "v_base"))
def fused_grad(e, p, W, bias, labels, label_lengths, denom, coef, cb, ce,
               blank=0, interpret=False, v_base=0):
    """(de, dp, dW, db) from the (B, T, U) coefficient fields.

    coef/cb/ce must already be valid-masked and cotangent-scaled (zero on
    invalid cells); the dense (B, T, U, V) gradient is formed tile-wise in
    VMEM and contracted on the spot. The label column's -ce lands in-loop
    (see ``_grad_kernel`` — the f32 cancellation must happen before the
    MXU's bf16 input rounding), so V-chunked callers need no label
    plumbing: the chunk owning the label's global column (ids in
    ``labels`` stay global; ``v_base`` is this chunk's first column)
    applies it naturally.
    """
    B, T, U, H, V, T_t, U_pad, R, T_pad, v_tile, V_pad, n_vt = (
        _common_geometry(e, p, W))
    f32 = jnp.float32
    mm_dtype = jnp.bfloat16 if W.dtype == jnp.bfloat16 else f32
    T_tiles = T_pad // T_t

    e_p = jnp.pad(e, ((0, 0), (0, T_pad - T), (0, 0)))
    p_p = jnp.pad(p, ((0, 0), (0, U_pad - U), (0, 0)))
    W_p = jnp.pad(W, ((0, 0), (0, V_pad - V)))
    bias_p = jnp.pad(bias.astype(f32)[None, :], ((0, 0), (0, V_pad - V)),
                     constant_values=NEG)
    lab_full = _labels_full(labels, label_lengths.astype(jnp.int32),
                            B, U, U_pad)
    lab_rows = jnp.broadcast_to(
        lab_full[:, None, :], (B, T_pad, U_pad)).reshape(-1, 1)
    denom_r = _flat_rows(denom, B, T, U, T_pad, U_pad)
    coef_r = _flat_rows(coef, B, T, U, T_pad, U_pad)
    cb_r = _flat_rows(cb, B, T, U, T_pad, U_pad)
    ce_r = _flat_rows(ce, B, T, U, T_pad, U_pad)

    uh_spec = pl.BlockSpec((1, U_pad, H), lambda b, i: (b, 0, 0),
                           memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _grad_kernel, blank=blank, n_vt=n_vt, v_tile=v_tile,
        t_t=T_t, u_pad=U_pad, mm_dtype=mm_dtype, v_base=v_base,
    )
    T_tiles_ = T_tiles
    row_spec = pl.BlockSpec((R, 1), lambda b, i: (b * T_tiles_ + i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = (
        pl.BlockSpec((1, T_t, H), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        uh_spec,
        pl.BlockSpec((H, V_pad), lambda b, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, V_pad), lambda b, i: (0, 0),
                     memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((B, T_pad, H), f32),
        jax.ShapeDtypeStruct((B, U_pad, H), f32),
        jax.ShapeDtypeStruct((H, V_pad), f32),
        jax.ShapeDtypeStruct((1, V_pad), f32),
    )
    de, dp, dW, db = pl.pallas_call(
        kernel,
        grid=(B, T_tiles),
        in_specs=[
            pl.BlockSpec((1, T_t, H), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            uh_spec,
            pl.BlockSpec((H, V_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            row_spec,   # labels
            row_spec,   # denom
            row_spec,   # coef
            row_spec,   # cb
            row_spec,   # ce
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(e_p, p_p, W_p, bias_p, lab_rows, denom_r, coef_r, cb_r, ce_r)

    return (de[:, :T].astype(e.dtype), dp[:, :U].astype(p.dtype),
            dW[:, :V].astype(W.dtype), db[0, :V].astype(bias.dtype))


# ---------------------------------------------------------------------------
# TDT drivers: the same kernels with the duration head enabled
# ---------------------------------------------------------------------------

_D_PAD = _LANES  # the duration head (D <= 8) pads to one lane tile


def _pad_dur_head(Wd, bias_d, H):
    D = Wd.shape[1]
    Wd_p = jnp.pad(Wd.astype(jnp.float32), ((0, 0), (0, _D_PAD - D)))
    bd_p = jnp.pad(bias_d.astype(jnp.float32)[None, :],
                   ((0, 0), (0, _D_PAD - D)))
    return Wd_p, bd_p


@functools.partial(jax.jit, static_argnames=("blank", "interpret"))
def fused_prep_tdt(e, p, W, bias, Wd, bias_d, labels, label_lengths,
                   blank=0, interpret=False):
    """(denom, lpb, lpe, dur_logits) — ``fused_prep`` plus the TDT duration
    head computed tile-wise on the same joint features (dur_logits
    (B, T, U, D) raw; softmax them on the host)."""
    B, T, U, H, V, T_t, U_pad, R, T_pad, v_tile, V_pad, n_vt = (
        _common_geometry(e, p, W))
    D = Wd.shape[1]
    f32 = jnp.float32
    mm_dtype = jnp.bfloat16 if W.dtype == jnp.bfloat16 else f32
    T_tiles = T_pad // T_t

    e_p = jnp.pad(e, ((0, 0), (0, T_pad - T), (0, 0)))
    p_p = jnp.pad(p, ((0, 0), (0, U_pad - U), (0, 0)))
    W_p = jnp.pad(W, ((0, 0), (0, V_pad - V)))
    bias_p = jnp.pad(bias.astype(f32)[None, :], ((0, 0), (0, V_pad - V)),
                     constant_values=NEG)
    Wd_p, bd_p = _pad_dur_head(Wd, bias_d, H)
    lab_full = _labels_full(labels, label_lengths.astype(jnp.int32),
                            B, U, U_pad)
    lab_rows = jnp.broadcast_to(
        lab_full[:, None, :], (B, T_pad, U_pad)).reshape(-1, 1)
    wlab, blab = _gather_label_cols(W, bias, lab_full)
    rows_total = B * T_pad * U_pad

    kernel = functools.partial(
        _prep_kernel, blank=blank, n_vt=n_vt, v_tile=v_tile,
        t_t=T_t, u_pad=U_pad, mm_dtype=mm_dtype, with_dur=True,
        lab_bf16=not interpret,
    )
    row_spec = pl.BlockSpec((R, 1), lambda b, i: (b * T_tiles + i, 0),
                            memory_space=pltpu.VMEM)
    drow_spec = pl.BlockSpec((R, _D_PAD), lambda b, i: (b * T_tiles + i, 0),
                             memory_space=pltpu.VMEM)
    denom, lpb, lpe, dlog = pl.pallas_call(
        kernel,
        grid=(B, T_tiles),
        in_specs=[
            pl.BlockSpec((1, T_t, H), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U_pad, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, V_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, _D_PAD), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _D_PAD), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
            pl.BlockSpec((1, U_pad, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
        ],
        out_specs=(row_spec, row_spec, row_spec, drow_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows_total, 1), f32),
            jax.ShapeDtypeStruct((rows_total, 1), f32),
            jax.ShapeDtypeStruct((rows_total, 1), f32),
            jax.ShapeDtypeStruct((rows_total, _D_PAD), f32),
        ),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(e_p, p_p, W_p, bias_p, Wd_p, bd_p, lab_rows, wlab,
      _blab_rows(blab, B, T_pad, U_pad))

    unflat = lambda x: x.reshape(B, T_pad, U_pad)[:, :T, :U]
    dlog = dlog.reshape(B, T_pad, U_pad, _D_PAD)[:, :T, :U, :D]
    return unflat(denom), unflat(lpb), unflat(lpe), dlog


@functools.partial(jax.jit, static_argnames=("blank", "interpret"))
def fused_grad_tdt(e, p, W, bias, Wd, labels, label_lengths, denom, coef,
                   cb, ce, g_dur, blank=0, interpret=False):
    """(de, dp, dW, db, dWd) — ``fused_grad`` plus the duration head:
    g_dur (B, T, U, D) must already be valid-masked and cotangent-scaled;
    its cotangent joins dh in-kernel and dWd is accumulated per block
    (d(bias_d) is a plain XLA sum on the host side)."""
    B, T, U, H, V, T_t, U_pad, R, T_pad, v_tile, V_pad, n_vt = (
        _common_geometry(e, p, W))
    D = Wd.shape[1]
    f32 = jnp.float32
    mm_dtype = jnp.bfloat16 if W.dtype == jnp.bfloat16 else f32
    T_tiles = T_pad // T_t

    e_p = jnp.pad(e, ((0, 0), (0, T_pad - T), (0, 0)))
    p_p = jnp.pad(p, ((0, 0), (0, U_pad - U), (0, 0)))
    W_p = jnp.pad(W, ((0, 0), (0, V_pad - V)))
    bias_p = jnp.pad(bias.astype(f32)[None, :], ((0, 0), (0, V_pad - V)),
                     constant_values=NEG)
    Wd_p, _ = _pad_dur_head(Wd, jnp.zeros((D,), f32), H)
    lab_full = _labels_full(labels, label_lengths.astype(jnp.int32),
                            B, U, U_pad)
    lab_rows = jnp.broadcast_to(
        lab_full[:, None, :], (B, T_pad, U_pad)).reshape(-1, 1)
    denom_r = _flat_rows(denom, B, T, U, T_pad, U_pad)
    coef_r = _flat_rows(coef, B, T, U, T_pad, U_pad)
    cb_r = _flat_rows(cb, B, T, U, T_pad, U_pad)
    ce_r = _flat_rows(ce, B, T, U, T_pad, U_pad)
    gd_r = jnp.pad(g_dur.astype(f32),
                   ((0, 0), (0, T_pad - T), (0, U_pad - U),
                    (0, _D_PAD - D))).reshape(-1, _D_PAD)

    kernel = functools.partial(
        _grad_kernel, blank=blank, n_vt=n_vt, v_tile=v_tile,
        t_t=T_t, u_pad=U_pad, mm_dtype=mm_dtype, with_dur=True,
    )
    row_spec = pl.BlockSpec((R, 1), lambda b, i: (b * T_tiles + i, 0),
                            memory_space=pltpu.VMEM)
    drow_spec = pl.BlockSpec((R, _D_PAD), lambda b, i: (b * T_tiles + i, 0),
                             memory_space=pltpu.VMEM)
    uh_spec = pl.BlockSpec((1, U_pad, H), lambda b, i: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    de, dp, dW, db, dWd = pl.pallas_call(
        kernel,
        grid=(B, T_tiles),
        in_specs=[
            pl.BlockSpec((1, T_t, H), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            uh_spec,
            pl.BlockSpec((H, V_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, _D_PAD), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            row_spec,   # labels
            row_spec,   # denom
            row_spec,   # coef
            row_spec,   # cb
            row_spec,   # ce
            drow_spec,  # g_dur
        ],
        out_specs=(
            pl.BlockSpec((1, T_t, H), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            uh_spec,
            pl.BlockSpec((H, V_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, _D_PAD), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T_pad, H), f32),
            jax.ShapeDtypeStruct((B, U_pad, H), f32),
            jax.ShapeDtypeStruct((H, V_pad), f32),
            jax.ShapeDtypeStruct((1, V_pad), f32),
            jax.ShapeDtypeStruct((H, _D_PAD), f32),
        ),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(e_p, p_p, W_p, bias_p, Wd_p, lab_rows, denom_r, coef_r, cb_r, ce_r,
      gd_r)

    return (de[:, :T].astype(e.dtype), dp[:, :U].astype(p.dtype),
            dW[:, :V].astype(W.dtype), db[0, :V].astype(bias.dtype),
            dWd[:, :D].astype(Wd.dtype))


# ---------------------------------------------------------------------------
# Standalone duration-head kernels: compose with the V-CHUNKED token-head
# drivers (the integrated with_dur kernels need resident W). Exactness:
# dh_total = g_tok @ W^T + g_dur @ Wd^T multiplies (1 - h^2) LINEARLY, so
# the duration head's de/dp contributions can be computed in a separate
# pass over recomputed h and ADDED to the chunked token-head gradients.
# ---------------------------------------------------------------------------

def _dur_prep_kernel(e_ref, p_ref, wd_ref, bd_ref, dlog_ref,
                     *, t_t: int, u_pad: int):
    f32 = jnp.float32
    R = t_t * u_pad
    H = e_ref.shape[2]
    h3 = jnp.tanh(e_ref[0].astype(f32)[:, None, :]
                  + p_ref[0].astype(f32)[None, :, :])
    dlog_ref[...] = jax.lax.dot_general(
        h3.reshape(R, H), wd_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + bd_ref[...]


def _dur_grad_kernel(e_ref, p_ref, wd_ref, gd_ref,
                     de_ref, dp_ref, dwd_ref, *, t_t: int, u_pad: int):
    f32 = jnp.float32
    R = t_t * u_pad
    H = e_ref.shape[2]
    b = pl.program_id(0)
    i = pl.program_id(1)
    h3 = jnp.tanh(e_ref[0].astype(f32)[:, None, :]
                  + p_ref[0].astype(f32)[None, :, :])
    hm = h3.reshape(R, H)

    @pl.when((b == 0) & (i == 0))
    def _():
        dwd_ref[...] = jnp.zeros_like(dwd_ref)

    @pl.when(i == 0)
    def _():
        dp_ref[...] = jnp.zeros_like(dp_ref)

    gd = gd_ref[...]
    dwd_ref[...] += jax.lax.dot_general(
        hm, gd, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    dh = jax.lax.dot_general(
        gd, wd_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=f32)
    dh = (dh * (1.0 - hm * hm)).reshape(t_t, u_pad, H)
    de_ref[0] = jnp.sum(dh, axis=1)
    dp_ref[0] += jnp.sum(dh, axis=0)


def _dur_geometry(e, p, Wd):
    B, T, H = e.shape
    U = p.shape[1]
    T_t, U_pad, R = _row_geometry(T, U)
    T_pad = _round_up(T, T_t)
    return B, T, U, H, T_t, U_pad, R, T_pad


@functools.partial(jax.jit, static_argnames=("interpret",))
def dur_head_prep(e, p, Wd, bias_d, interpret=False):
    """dur_logits (B, T, U, D) from recomputed joint features — the
    V-independent half of the TDT fused forward."""
    B, T, U, H, T_t, U_pad, R, T_pad = _dur_geometry(e, p, Wd)
    D = Wd.shape[1]
    f32 = jnp.float32
    T_tiles = T_pad // T_t
    e_p = jnp.pad(e, ((0, 0), (0, T_pad - T), (0, 0)))
    p_p = jnp.pad(p, ((0, 0), (0, U_pad - U), (0, 0)))
    Wd_p, bd_p = _pad_dur_head(Wd, bias_d, H)
    kernel = functools.partial(_dur_prep_kernel, t_t=T_t, u_pad=U_pad)
    dlog = pl.pallas_call(
        kernel,
        grid=(B, T_tiles),
        in_specs=[
            pl.BlockSpec((1, T_t, H), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U_pad, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, _D_PAD), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _D_PAD), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, _D_PAD),
                               lambda b, i: (b * T_tiles + i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * T_pad * U_pad, _D_PAD), f32),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(e_p, p_p, Wd_p, bd_p)
    D_ = D
    return dlog.reshape(B, T_pad, U_pad, _D_PAD)[:, :T, :U, :D_]


@functools.partial(jax.jit, static_argnames=("interpret",))
def dur_head_grad(e, p, Wd, g_dur, interpret=False):
    """(de2, dp2, dWd): the duration head's additive contributions to the
    joint-input gradients (g_dur already valid-masked and scaled)."""
    B, T, U, H, T_t, U_pad, R, T_pad = _dur_geometry(e, p, Wd)
    D = Wd.shape[1]
    f32 = jnp.float32
    T_tiles = T_pad // T_t
    e_p = jnp.pad(e, ((0, 0), (0, T_pad - T), (0, 0)))
    p_p = jnp.pad(p, ((0, 0), (0, U_pad - U), (0, 0)))
    Wd_p, _ = _pad_dur_head(Wd, jnp.zeros((D,), f32), H)
    gd_r = jnp.pad(g_dur.astype(f32),
                   ((0, 0), (0, T_pad - T), (0, U_pad - U),
                    (0, _D_PAD - D))).reshape(-1, _D_PAD)
    kernel = functools.partial(_dur_grad_kernel, t_t=T_t, u_pad=U_pad)
    de, dp, dWd = pl.pallas_call(
        kernel,
        grid=(B, T_tiles),
        in_specs=[
            pl.BlockSpec((1, T_t, H), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U_pad, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, _D_PAD), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, _D_PAD), lambda b, i: (b * T_tiles + i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T_t, H), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U_pad, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, _D_PAD), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T_pad, H), f32),
            jax.ShapeDtypeStruct((B, U_pad, H), f32),
            jax.ShapeDtypeStruct((H, _D_PAD), f32),
        ),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(e_p, p_p, Wd_p, gd_r)
    return (de[:, :T].astype(e.dtype), dp[:, :U].astype(p.dtype),
            dWd[:, :D].astype(Wd.dtype))


# ---------------------------------------------------------------------------
# Multi-blank drivers: the same kernels with K static big-blank columns
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("blank", "extra_cols",
                                             "interpret"))
def fused_prep_mb(e, p, W, bias, labels, label_lengths, blank=0,
                  extra_cols=(), interpret=False):
    """(denom, lpb, lpe, lpX) — ``fused_prep`` plus the K big-blank column
    caches lpX (B, T, U, K) (= logit + denom, no sigma). K >= 1 (use
    ``fused_prep`` for the standard loss)."""
    assert extra_cols, "fused_prep_mb needs >= 1 extra column"
    B, T, U, H, V, T_t, U_pad, R, T_pad, v_tile, V_pad, n_vt = (
        _common_geometry(e, p, W))
    K = len(extra_cols)
    f32 = jnp.float32
    mm_dtype = jnp.bfloat16 if W.dtype == jnp.bfloat16 else f32
    T_tiles = T_pad // T_t

    e_p = jnp.pad(e, ((0, 0), (0, T_pad - T), (0, 0)))
    p_p = jnp.pad(p, ((0, 0), (0, U_pad - U), (0, 0)))
    W_p = jnp.pad(W, ((0, 0), (0, V_pad - V)))
    bias_p = jnp.pad(bias.astype(f32)[None, :], ((0, 0), (0, V_pad - V)),
                     constant_values=NEG)
    lab_full = _labels_full(labels, label_lengths.astype(jnp.int32),
                            B, U, U_pad)
    lab_rows = jnp.broadcast_to(
        lab_full[:, None, :], (B, T_pad, U_pad)).reshape(-1, 1)
    wlab, blab = _gather_label_cols(W, bias, lab_full)
    rows_total = B * T_pad * U_pad

    kernel = functools.partial(
        _prep_kernel, blank=blank, n_vt=n_vt, v_tile=v_tile,
        t_t=T_t, u_pad=U_pad, mm_dtype=mm_dtype, extra_cols=extra_cols,
        lab_bf16=not interpret,
    )
    row_spec = pl.BlockSpec((R, 1), lambda b, i: (b * T_tiles + i, 0),
                            memory_space=pltpu.VMEM)
    xrow_spec = pl.BlockSpec((R, _D_PAD), lambda b, i: (b * T_tiles + i, 0),
                             memory_space=pltpu.VMEM)
    denom, lpb, lpe, lpx = pl.pallas_call(
        kernel,
        grid=(B, T_tiles),
        in_specs=[
            pl.BlockSpec((1, T_t, H), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U_pad, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, V_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
            pl.BlockSpec((1, U_pad, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
        ],
        out_specs=(row_spec, row_spec, row_spec, xrow_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows_total, 1), f32),
            jax.ShapeDtypeStruct((rows_total, 1), f32),
            jax.ShapeDtypeStruct((rows_total, 1), f32),
            jax.ShapeDtypeStruct((rows_total, _D_PAD), f32),
        ),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(e_p, p_p, W_p, bias_p, lab_rows, wlab,
      _blab_rows(blab, B, T_pad, U_pad))

    unflat = lambda x: x.reshape(B, T_pad, U_pad)[:, :T, :U]
    lpx = lpx.reshape(B, T_pad, U_pad, _D_PAD)[:, :T, :U, :K]
    return unflat(denom), unflat(lpb), unflat(lpe), lpx


@functools.partial(jax.jit, static_argnames=("blank", "extra_cols",
                                             "interpret"))
def fused_grad_mb(e, p, W, bias, labels, label_lengths, denom, coef, cb,
                  ce, cX, blank=0, extra_cols=(), interpret=False):
    """(de, dp, dW, db) — ``fused_grad`` plus K big-blank coefficient
    fields cX (B, T, U, K) subtracted at their static columns (K >= 1)."""
    assert extra_cols, "fused_grad_mb needs >= 1 extra column"
    B, T, U, H, V, T_t, U_pad, R, T_pad, v_tile, V_pad, n_vt = (
        _common_geometry(e, p, W))
    K = len(extra_cols)
    f32 = jnp.float32
    mm_dtype = jnp.bfloat16 if W.dtype == jnp.bfloat16 else f32
    T_tiles = T_pad // T_t

    e_p = jnp.pad(e, ((0, 0), (0, T_pad - T), (0, 0)))
    p_p = jnp.pad(p, ((0, 0), (0, U_pad - U), (0, 0)))
    W_p = jnp.pad(W, ((0, 0), (0, V_pad - V)))
    bias_p = jnp.pad(bias.astype(f32)[None, :], ((0, 0), (0, V_pad - V)),
                     constant_values=NEG)
    lab_full = _labels_full(labels, label_lengths.astype(jnp.int32),
                            B, U, U_pad)
    lab_rows = jnp.broadcast_to(
        lab_full[:, None, :], (B, T_pad, U_pad)).reshape(-1, 1)
    denom_r = _flat_rows(denom, B, T, U, T_pad, U_pad)
    coef_r = _flat_rows(coef, B, T, U, T_pad, U_pad)
    cb_r = _flat_rows(cb, B, T, U, T_pad, U_pad)
    ce_r = _flat_rows(ce, B, T, U, T_pad, U_pad)
    cx_r = jnp.pad(cX.astype(f32),
                   ((0, 0), (0, T_pad - T), (0, U_pad - U),
                    (0, _D_PAD - K))).reshape(-1, _D_PAD)

    kernel = functools.partial(
        _grad_kernel, blank=blank, n_vt=n_vt, v_tile=v_tile,
        t_t=T_t, u_pad=U_pad, mm_dtype=mm_dtype, extra_cols=extra_cols,
    )
    row_spec = pl.BlockSpec((R, 1), lambda b, i: (b * T_tiles + i, 0),
                            memory_space=pltpu.VMEM)
    xrow_spec = pl.BlockSpec((R, _D_PAD), lambda b, i: (b * T_tiles + i, 0),
                             memory_space=pltpu.VMEM)
    uh_spec = pl.BlockSpec((1, U_pad, H), lambda b, i: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    de, dp, dW, db = pl.pallas_call(
        kernel,
        grid=(B, T_tiles),
        in_specs=[
            pl.BlockSpec((1, T_t, H), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            uh_spec,
            pl.BlockSpec((H, V_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            row_spec,   # labels
            row_spec,   # denom
            row_spec,   # coef
            row_spec,   # cb
            row_spec,   # ce
            xrow_spec,  # cX
        ],
        out_specs=(
            pl.BlockSpec((1, T_t, H), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            uh_spec,
            pl.BlockSpec((H, V_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T_pad, H), f32),
            jax.ShapeDtypeStruct((B, U_pad, H), f32),
            jax.ShapeDtypeStruct((H, V_pad), f32),
            jax.ShapeDtypeStruct((1, V_pad), f32),
        ),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(e_p, p_p, W_p, bias_p, lab_rows, denom_r, coef_r, cb_r, ce_r, cx_r)

    return (de[:, :T].astype(e.dtype), dp[:, :U].astype(p.dtype),
            dW[:, :V].astype(W.dtype), db[0, :V].astype(bias.dtype))


# ---------------------------------------------------------------------------
# V-chunked drivers: arbitrary H·V without the resident-W VMEM ceiling
# ---------------------------------------------------------------------------
#
# When W (H, V) does not fit VMEM, split V into chunks whose W slice does
# and run the resident kernels per chunk.  Forward chunks return the raw
# online-softmax state (partial=True) and are merged with one cheap XLA
# logsumexp combine over the (B, T, U)-sized partials; backward chunks each
# own their dW/db slice outright and only de/dp need summing.  This costs
# one extra tanh/row-block recompute and one e/p re-read per extra chunk —
# noise beside the O(B·T·U·V·H) matmuls that dominate at such sizes — and
# is exactly the work a hand-rolled W-streaming kernel would do, without a
# second kernel to validate.  (The reference never faces this: its
# gpu_rnnt.h holds everything in GB-scale HBM.)

_N_CHUNKS_OVERRIDE = int(_os.environ.get("WTT_FUSED_FORCE_CHUNKS", 0))


def fused_n_chunks(e, p, W, backward: bool = False,
                   extra_bytes: int = 0) -> int:
    """Number of V chunks needed for the resident-W kernels to fit VMEM.

    ``extra_bytes``: additional per-invocation working set beyond the
    standard kernels' — the TDT/multi-blank variants keep (R, 128) f32
    row panels (dlog / g_dur / lpX / cX) and the (H, 128) duration head
    (+ its accumulator) resident; callers pass that footprint here."""
    if _N_CHUNKS_OVERRIDE:
        return _N_CHUNKS_OVERRIDE
    B, T, U, H, V, T_t, U_pad, R, T_pad, v_tile, V_pad, n_vt = (
        _common_geometry(e, p, W))
    w_bytes = 2 if W.dtype == jnp.bfloat16 else 4
    fixed = R * H * 4 * 2 + R * v_tile * 4 * 2 + extra_bytes
    per_col = H * (w_bytes + (4 if backward else 0))  # W (+ dW accumulator)
    if backward:
        fixed += R * H * 4  # dh
    cap = max(_VMEM_BUDGET - fixed, per_col * v_tile) // per_col
    v_c = max(v_tile, (cap // v_tile) * v_tile)
    return -(-V_pad // v_c)  # ceil


def variant_extra_bytes(e, p, W, n_panels: int, dur_head: bool) -> int:
    """VMEM footprint the TDT/multi-blank kernel variants add:
    ``n_panels`` (R, 128) f32 row panels plus, for the duration head,
    the (H, 128) weights and their f32 accumulator."""
    _, _, _, H, _, _, _, R, _, _, _, _ = _common_geometry(e, p, W)
    extra = n_panels * R * _LANES * 4
    if dur_head:
        extra += 2 * H * _LANES * 4
    return extra


def _chunk_slices(e, p, W, bias, n_c):
    H, V = W.shape
    # chunk width must be a multiple of the inner calls' v_tile — use the
    # same (R-adaptive) geometry they will compute
    v_tile = _common_geometry(e, p, W)[9]
    v_c = _round_up(-(-_round_up(V, v_tile) // n_c), v_tile)
    V_tot = n_c * v_c
    W_p = jnp.pad(W, ((0, 0), (0, V_tot - V)))
    bias_p = jnp.pad(bias.astype(jnp.float32), (0, V_tot - V),
                     constant_values=NEG)
    cols = lambda x, c: jax.lax.slice_in_dim(x, c * v_c, (c + 1) * v_c,
                                             axis=x.ndim - 1)
    return W_p, bias_p, cols, v_c


def fused_prep_chunked(e, p, W, bias, labels, label_lengths, blank=0,
                       interpret=False):
    """``fused_prep`` for W of any size: V-chunked with logsumexp merge.

    The label logit is V-independent (gathered full-W columns), so only
    the v_base == 0 chunk computes it; the others report NEG and the max
    merge passes it through."""
    n_c = fused_n_chunks(e, p, W, backward=False)
    if n_c <= 1:
        return fused_prep(e, p, W, bias, labels, label_lengths,
                          blank=blank, interpret=interpret)
    B, T, H = e.shape
    U = p.shape[1]
    U_pad = _row_geometry(T, U)[1]
    lab_full = _labels_full(labels, label_lengths.astype(jnp.int32),
                            B, U, U_pad)
    wlab, blab = _gather_label_cols(W, bias, lab_full)
    W_p, bias_p, cols, v_c = _chunk_slices(e, p, W, bias, n_c)
    ms, ss, bls, les = [], [], [], []
    for c in range(n_c):
        kw = dict(wlab=wlab, blab=blab) if c == 0 else {}
        m, s, bl, le = fused_prep(
            e, p, cols(W_p, c), cols(bias_p, c), labels, label_lengths,
            blank=blank, interpret=interpret, v_base=c * v_c, partial=True,
            **kw,
        )
        ms.append(m); ss.append(s); bls.append(bl); les.append(le)
    m = functools.reduce(jnp.maximum, ms)
    s = sum(sc * jnp.exp(mc - m) for sc, mc in zip(ss, ms))
    denom = -(m + jnp.log(s))
    lpb = functools.reduce(jnp.maximum, bls) + denom
    lpe = functools.reduce(jnp.maximum, les) + denom
    return denom, lpb, lpe


def fused_grad_chunked(e, p, W, bias, labels, label_lengths, denom, coef,
                       cb, ce, blank=0, interpret=False):
    """``fused_grad`` for W of any size: per-chunk dW/db, summed de/dp.

    Label ids stay global, so the chunk owning a row's label column
    applies its in-loop -ce correction naturally — no cross-chunk label
    plumbing."""
    n_c = fused_n_chunks(e, p, W, backward=True)
    if n_c <= 1:
        return fused_grad(e, p, W, bias, labels, label_lengths, denom,
                          coef, cb, ce, blank=blank, interpret=interpret)
    W_p, bias_p, cols, v_c = _chunk_slices(e, p, W, bias, n_c)
    de = dp = None
    dWs, dbs = [], []
    for c in range(n_c):
        dec, dpc, dWc, dbc = fused_grad(
            e, p, cols(W_p, c), cols(bias_p, c), labels, label_lengths,
            denom, coef, cb, ce, blank=blank, interpret=interpret,
            v_base=c * v_c,
        )
        de = dec if de is None else de + dec
        dp = dpc if dp is None else dp + dpc
        dWs.append(dWc); dbs.append(dbc)
    V = W.shape[1]
    dW = jnp.concatenate(dWs, axis=1)[:, :V]
    db = jnp.concatenate(dbs, axis=0)[:V]
    return de, dp, dW.astype(W.dtype), db.astype(bias.dtype)
