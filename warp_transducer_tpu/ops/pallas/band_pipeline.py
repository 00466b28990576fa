"""Transpose-free Pallas pipeline for the pruned loss (prep → lattice → grad).

At production scale (B=128, T=1500, S=5, V=50) the pruned loss is NOT
recursion-bound (the streamed band kernel sweeps the lattice in ~0.2 ms) —
it is bound by the cell work around it. Two designs failed before this one:

* pure-XLA cell passes on (B, T, S) fields: XLA shatters the prep/gradient
  math into dozens of unfused big-shape passes (41 ms at B=128);
* v1 all-panels kernels that produced/consumed every per-cell field in the
  band-lattice kernel's native (T, S, B) panel orientation: each grid step
  spent its time on ~15 small (B, Tc) <-> (Tc, B) in-register transposes,
  measured 3.3 ms prep + 11.5 ms grad at B=128 — slower than not fusing.

The v2 design keeps the big activations in their natural (B, T, S·V) flat
view everywhere and never transposes inside a kernel:

1. ``prep_fields``: one Pallas read of the activations produces lpb/lpe/
   denom LANE-PACKED as one (B, T_pad, 3·S_pad) array — per-(t, s) scalars
   live at lane g·S_pad + s with t on sublanes, exactly the orientation a
   lane-slice + lane-broadcast consumes. No transposes: the per-segment
   reductions produce (B, Tc, 1) keepdims values that select-accumulate
   into the packed lanes.
2. ``band_stream.stream_panels``: unchanged. The (T, S, B) panels it needs
   are built by ONE cheap XLA transpose of the small (B, T, S) fields
   (~6 MB each; XLA picks good layouts for its own intermediates).
3. gradient: the coefficient fields coef/cb/ce are computed in XLA from
   the lattice panels by the SAME tested math as the XLA engine
   (``ops.pruned._band_coefs``), packed with denom and the per-cell label
   lane ids into one (B, T_pad, 5·S_pad) carrier, and ``grad_fields``
   makes one Pallas read of the activations + one write of the gradient,
   lane-broadcasting the per-cell scalars along each segment's V columns.

Replaces the reference's banded analog of gpu_rnnt_kernel.h:143-179 +
reduce.h:102-146 (which never prunes; the band is beyond-reference).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .band_stream import NEG, band_row_metadata, stream_panels
from .wavefront import _LANES, _SUBLANES, _round_up

# Scoped-VMEM per-kernel ceiling (v5e has 128 MiB physical; Mosaic's
# default scope is 16 MiB). The grad kernel keeps ~6 (B, Tc, SV) f32
# temporaries live, so Tc is budgeted so the working set stays inside it.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def _pick_tc(B: int, SV: int, n_live: int) -> int:
    budget = 40 * 1024 * 1024  # n_live temporaries + double-buffered blocks
    # Budget with the LANE-PADDED minor dim: VMEM tiles pad SV to a
    # multiple of 128, so e.g. SV=140 (S=5, V=28) occupies 256 lanes —
    # 1.83x the logical bytes. Budgeting logical bytes let the r4 rewrite
    # compile at SV=250 (pad 256, ~exact) but blow the 96 MB scoped limit
    # at SV=140 (125.5 MB measured, caught by the r5 roundup).
    sv_pad = _round_up(SV, _LANES)
    tc = budget // (n_live * B * sv_pad * 4)
    return max(8, min(64, tc // 8 * 8))


# ---------------------------------------------------------------------------
# Kernel 1: prep — activations -> lane-packed (lpb | lpe | denom)
# ---------------------------------------------------------------------------

def _prep_kernel(x_ref, lab_ref, out_ref, *, s_band: int, v: int,
                 blank: int, s_pad: int):
    f32 = jnp.float32
    neg = jnp.asarray(NEG, f32)
    B, Tc, SV = x_ref.shape
    x = x_ref[...].astype(f32)  # (B, Tc, SV)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, Tc, SV), 2)
    lane_o = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 2)

    out = jnp.full(out_ref.shape, neg, f32)
    for s in range(s_band):
        in_seg = (lane >= s * v) & (lane < (s + 1) * v)
        xm = jnp.where(in_seg, x, neg)
        m = jnp.max(xm, axis=2, keepdims=True)  # (B, Tc, 1)
        e = jnp.sum(jnp.where(in_seg, jnp.exp(x - m), 0.0), axis=2,
                    keepdims=True)
        d = -(m + jnp.log(e))
        c = s * v + blank
        lpb = x[:, :, c:c + 1] + d
        # label logit: lab_ref carries the GLOBAL lane id s*v + label
        # (or -1 where the cell has no label)
        lab_s = lab_ref[:, :, s:s + 1].astype(jnp.int32)
        ll = jnp.max(jnp.where(lane == lab_s, x, neg), axis=2,
                     keepdims=True)
        lpe = jnp.where(ll <= neg / 2, neg, ll + d)
        # pack: lanes [0, S_pad) = lpb, [S_pad, 2 S_pad) = lpe, rest denom
        out = jnp.where(lane_o == s, lpb, out)
        out = jnp.where(lane_o == s_pad + s, lpe, out)
        out = jnp.where(lane_o == 2 * s_pad + s, d, out)
    out_ref[...] = out


def _prep_fields_call(acts_flat, lab_lane, s_band, v, blank, Tc, interpret):
    """(B, T, S·V) activations -> (B, T, 3·S_pad) packed
    (lpb | lpe | denom). ``lab_lane``: (B, T, S_pad) f32 global label
    lane ids (s·V + label), -1 where the cell has no label. T need not be
    a Tc multiple: the grid is cdiv and Mosaic masks the edge block — the
    big tensors are never physically padded (a T-pad of the activations
    is a full 192 MB copy at the production shape)."""
    B, T, SV = acts_flat.shape
    S_pad = lab_lane.shape[2]
    kernel = functools.partial(_prep_kernel, s_band=s_band, v=v,
                               blank=blank, s_pad=S_pad)
    out = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(T, Tc),),
        in_specs=[
            pl.BlockSpec((B, Tc, SV), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Tc, S_pad), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, Tc, 3 * S_pad), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, 3 * S_pad), jnp.float32),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(acts_flat, lab_lane)
    return out


# ---------------------------------------------------------------------------
# Kernel 2: gradient — one read of the activations, one write of the grad
# ---------------------------------------------------------------------------

def _grad_kernel(x_ref, f_ref, g_ref, *, s_band: int, v: int, blank: int,
                 s_pad: int, out_dtype):
    """``f_ref``: (B, Tc, 5·S_pad) lane-packed per-cell scalars
    [denom | coef | cb | ce | label-lane-id]. All validity/terminal/
    feasibility masking and the cotangent scale are already folded in by
    the XLA side (ops.pruned._band_coefs): coef/cb/ce are zero and denom
    is the NEG sentinel outside valid cells, so g is exactly zero there
    (exp(x + NEG) underflows; no NaN even for huge raw activations)."""
    f32 = jnp.float32
    B, Tc, SV = x_ref.shape
    x = x_ref[...].astype(f32)
    f = f_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, Tc, SV), 2)

    den_b = jnp.full((B, Tc, SV), jnp.asarray(NEG, f32), f32)
    coef_b = jnp.zeros((B, Tc, SV), f32)
    sub = jnp.zeros((B, Tc, SV), f32)
    for s in range(s_band):
        in_seg = (lane >= s * v) & (lane < (s + 1) * v)
        den_s = f[:, :, s:s + 1]
        coef_s = f[:, :, s_pad + s:s_pad + s + 1]
        cb_s = f[:, :, 2 * s_pad + s:2 * s_pad + s + 1]
        ce_s = f[:, :, 3 * s_pad + s:3 * s_pad + s + 1]
        lab_s = f[:, :, 4 * s_pad + s:4 * s_pad + s + 1].astype(jnp.int32)
        den_b = jnp.where(in_seg, den_s, den_b)
        coef_b = jnp.where(in_seg, coef_s, coef_b)
        sub = sub + jnp.where(lane == s * v + blank, cb_s, 0.0)
        sub = sub + jnp.where(lane == lab_s, ce_s, 0.0)
    g_ref[...] = (coef_b * jnp.exp(x + den_b) - sub).astype(out_dtype)


def _grad_fields_call(acts_flat, fields, s_band, v, blank, Tc, out_dtype,
                      interpret):
    B, T, SV = acts_flat.shape
    S_pad = fields.shape[2] // 5
    kernel = functools.partial(_grad_kernel, s_band=s_band, v=v,
                               blank=blank, s_pad=S_pad, out_dtype=out_dtype)
    g = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(T, Tc),),
        in_specs=[
            pl.BlockSpec((B, Tc, SV), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Tc, 5 * S_pad), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, Tc, SV), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, SV), out_dtype),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(acts_flat, fields)
    return g


# ---------------------------------------------------------------------------
# Host drivers
# ---------------------------------------------------------------------------

def _geometry(B, T, S, V):
    S_pad = _round_up(S, _SUBLANES)
    SV = S * V
    Tc = _pick_tc(B, SV, n_live=6)
    T_pad = _round_up(T, Tc)
    return S_pad, SV, Tc, T_pad


def _to_panels(x_bts, T_pad, S_pad, B_pad):
    """(B, T, S) -> (T_pad, S_pad, B_pad) NEG-padded panel (XLA transpose —
    a few MB; XLA lays its own intermediates out well)."""
    B, T, S = x_bts.shape
    p = jnp.pad(x_bts, ((0, B_pad - B), (0, T_pad - T), (0, S_pad - S)),
                constant_values=NEG)
    return jnp.transpose(p, (1, 2, 0))


def pruned_forward(acts, lab_band, has_lab, ranges, input_lengths,
                   label_lengths, blank, interpret, delay_penalty=0.0):
    """Flat-view forward: returns (costs_ll, residuals dict)."""
    B, T, S, V = acts.shape
    S_pad, SV, Tc, T_pad = _geometry(B, T, S, V)
    B_pad = _round_up(B, _LANES)

    xf = acts.reshape(B, T, SV)

    # global label lane ids (s*V + label), -1 where no label
    s_iota = jnp.arange(S, dtype=jnp.int32)[None, None, :]
    lab_lane = jnp.where(has_lab, s_iota * V + lab_band.astype(jnp.int32), -1)
    lab_lane_p = jnp.pad(
        lab_lane.astype(jnp.float32),
        ((0, 0), (0, 0), (0, S_pad - S)), constant_values=-1.0)

    packed = _prep_fields_call(xf, lab_lane_p, S, V, blank, Tc, interpret)
    lpb = packed[:, :, 0:S]
    lpe = packed[:, :, S_pad:S_pad + S]
    den = packed[:, :, 2 * S_pad:2 * S_pad + S]
    if delay_penalty:
        # delay-penalized transducer (arXiv:2211.00490)
        t = jnp.arange(T, dtype=jnp.float32)
        mid = (input_lengths.astype(jnp.float32) - 1) / 2
        lpe = lpe + jnp.float32(delay_penalty) * (
            mid[:, None, None] - t[None, :, None])

    lpb_p = _to_panels(lpb, T_pad, S_pad, B_pad)
    lpe_p = _to_panels(lpe, T_pad, S_pad, B_pad)
    ranges_p, da_p, db_p, tb, ub = band_row_metadata(
        ranges, input_lengths, label_lengths, T_pad
    )
    alpha_p, beta_p, llf, llb = stream_panels(
        lpb_p, lpe_p, ranges_p, da_p, db_p, tb, ub, S, interpret
    )
    res = dict(
        lpb=lpb, lpe=lpe, den=den, lab_lane=lab_lane,
        alpha_p=alpha_p, beta_p=beta_p, llf=llf,
        ranges=ranges, has_lab=has_lab,
        input_lengths=input_lengths, label_lengths=label_lengths,
    )
    return llf[0, :B], res


def pruned_backward(acts, res, scale, blank, interpret, fastemit_lambda=0.0):
    """One Pallas read of the activations + one write of the gradient; the
    coefficient fields come from the SAME XLA math as the XLA engine
    (ops.pruned._band_coefs — tested against the f64 oracle)."""
    from .. import pruned as _pruned  # lazy: ops.pruned lazily imports us

    B, T, S, V = acts.shape
    S_pad, SV, Tc, T_pad = _geometry(B, T, S, V)

    # lattice panels -> (B, T, S) fields (cheap XLA transposes)
    alphas = jnp.transpose(res["alpha_p"], (2, 0, 1))[:B, :T, :S]
    betas = jnp.transpose(res["beta_p"], (2, 0, 1))[:B, :T, :S]
    ll = res["llf"][0, :B]

    class _Lat:
        pass

    lat = _Lat()
    lat.alphas, lat.betas, lat.ll_forward = alphas, betas, ll
    coef, cb, ce, valid = _pruned._band_coefs(
        res["lpb"], res["lpe"], lat, res["ranges"], res["has_lab"],
        # input_lengths/label_lengths only shape the valid mask, which
        # band_row_metadata already encoded in tb/ub; recompute from ranges
        *_lengths_from(res), scale, fastemit_lambda,
    )
    den = jnp.where(valid, res["den"], NEG)
    lab = jnp.where(valid, res["lab_lane"].astype(jnp.float32), -1.0)

    pad = lambda x, cval: jnp.pad(
        x.astype(jnp.float32),
        ((0, 0), (0, 0), (0, S_pad - S)), constant_values=cval)
    fields = jnp.concatenate(
        [pad(den, NEG), pad(coef, 0.0), pad(cb, 0.0), pad(ce, 0.0),
         pad(lab, -1.0)], axis=2)

    xf = acts.reshape(B, T, SV)
    g = _grad_fields_call(xf, fields, S, V, blank, Tc, acts.dtype, interpret)
    return g.reshape(B, T, S, V)


def _lengths_from(res):
    """The forward stashes lengths inside res for the backward's mask."""
    return res["input_lengths"], res["label_lengths"]
