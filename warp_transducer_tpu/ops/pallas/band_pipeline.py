"""All-panels Pallas pipeline for the pruned loss (prep → lattice → grad).

At production scale (B=128, T=1500, S=5, V=50) the band pipeline's cost is
NOT the recursion (the streamed kernel does it in <1 ms) but the cell-wise
XLA passes around it: every (B, T, S) coefficient array tiles its (T, S)
minor pair to (8, 128) — 25x physical padding at S=5 — and XLA's lowering
of the prep/gradient math shatters into dozens of unfused big-shape
passes (measured 18.7 ms total, ~17 of them outside the recursion).

This pipeline keeps EVERYTHING in two good layouts:

* the big activations as the flat (B, T, S·V) view (lane dim S·V, ~2%
  padding, contiguous chunks);
* every per-cell field (lpb/lpe/denom, α/β, labels) as (T_pad, S_pad,
  B_pad) PANELS — the band-lattice kernel's native layout (batch on
  lanes, band index on sublanes).

Three Pallas invocations per training step:

1. ``prep_panels``: one read of the activations → lpb/lpe/denom/label
   panels (per-segment online reductions, in-register transposes to
   panel orientation).
2. ``band_stream.stream_panels``: the existing streamed α/β sweep,
   consuming and producing panels directly.
3. ``grad_panels``: one read of the activations + one write of the
   gradient; the coefficient fields coef/cb/ce are computed IN-KERNEL
   from the α/β panels (β shifts along sublanes, the per-batch band-delta
   shift as an unrolled select) and broadcast per segment — they are
   never materialised in HBM at all.

The (B, T, S)-layout arrays the XLA path uses never exist here.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .band_stream import NEG, band_row_metadata, stream_panels
from .wavefront import _LANES, _SUBLANES, _round_up

def _pick_tc(B_pad: int, SV: int) -> int:
    # acts block (B, Tc, SV) f32; the grad kernel keeps ~6 same-size
    # temporaries live on the scoped-VMEM stack (default limit 16 MB), so
    # the block itself must stay ~1 MB (B=128, T=1504, SV=250 compiled at
    # 24.3 MB scoped with a 2 MB block — hard compile failure on v5e).
    budget = 1024 * 1024
    tc = max(8, budget // (B_pad * SV * 4))
    return min(64, _round_up(tc, 8))


# ---------------------------------------------------------------------------
# Kernel 1: prep — activations -> lpb/lpe/denom panels
# ---------------------------------------------------------------------------

def _prep_kernel(x_ref, lab_ref, lpb_ref, lpe_ref, den_ref,
                 *, s_band: int, v: int, blank: int):
    f32 = jnp.float32
    neg = jnp.asarray(NEG, f32)
    B, Tc, SV = x_ref.shape
    B_pad = lpb_ref.shape[2]
    x = x_ref[...].astype(f32)  # (B, Tc, SV)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, Tc, SV), 2)

    # initialise ALL sublanes (s >= s_band stays at the NEG sentinel —
    # uninitialised VMEM would poison the lattice's prefix chains)
    lpb_ref[...] = jnp.full(lpb_ref.shape, neg, f32)
    lpe_ref[...] = jnp.full(lpe_ref.shape, neg, f32)
    den_ref[...] = jnp.full(den_ref.shape, neg, f32)

    for s in range(s_band):
        in_seg = (lane >= s * v) & (lane < (s + 1) * v)
        xm = jnp.where(in_seg, x, neg)
        m = jnp.max(xm, axis=2)  # (B, Tc)
        e = jnp.sum(jnp.where(in_seg, jnp.exp(x - m[:, :, None]), 0.0),
                    axis=2)
        d = -(m + jnp.log(e))
        lpb_bt = x[:, :, s * v + blank] + d
        # label column: lab panel row (Tc, B_pad) -> (B, Tc) orientation
        lab_s = lab_ref[:, s, :]  # (Tc, B_pad) int32, -1 = no label
        lab_bt = jnp.transpose(lab_s, (1, 0))[:B]  # (B, Tc)
        target = jnp.where(lab_bt < 0, -1, s * v + lab_bt)
        sel = lane == target[:, :, None]
        lab_logit = jnp.max(jnp.where(sel, x, neg), axis=2)  # (B, Tc)
        lpe_bt = jnp.where(lab_logit <= neg / 2, neg, lab_logit + d)

        pad = B_pad - B
        to_panel = lambda a: jnp.pad(jnp.transpose(a, (1, 0)),
                                     ((0, 0), (0, pad)),
                                     constant_values=NEG)
        lpb_ref[:, s, :] = to_panel(lpb_bt)
        lpe_ref[:, s, :] = to_panel(lpe_bt)
        den_ref[:, s, :] = to_panel(d)


# ---------------------------------------------------------------------------
# Kernel 2: gradient — recompute coef/cb/ce from panels, one pass over acts
# ---------------------------------------------------------------------------

def _shift_down_by_delta(x, delta_row, s_iota, S, neg):
    """out[s] = x[s - d] per-lane along sublanes (axis 1 of (Tc,S_pad,Bp))."""
    out = jnp.full(x.shape, neg, x.dtype)
    for d in range(S):
        sh = pltpu.roll(x, d, axis=1) if d else x
        sh = jnp.where(s_iota >= d, sh, neg)
        out = jnp.where(delta_row == d, sh, out)
    return out


def _grad_kernel(x_ref, lab_ref, lpb_ref, lpe_ref, den_ref,
                 alpha_ref, beta_ref, beta_next_ref,
                 r_ref, dnext_ref, tb_ref, ub_ref, ll_ref, scale_ref,
                 g_ref, *, s_band: int, v: int, blank: int, t_c: int,
                 out_dtype, fastemit_lambda: float = 0.0):
    f32 = jnp.float32
    neg = jnp.asarray(NEG, f32)
    B, Tc, SV = x_ref.shape
    S_pad, B_pad = lpb_ref.shape[1], lpb_ref.shape[2]
    S = s_band
    i = pl.program_id(0)

    # ---- coefficient fields on (Tc, S_pad, B_pad) panels ----------------
    alpha = alpha_ref[...]
    beta = beta_ref[...]
    lpb = lpb_ref[...]
    lpe = lpe_ref[...]  # NEG sentinel where no label: exp underflows to 0
    ll = ll_ref[...]  # (1, B_pad)
    scale = scale_ref[...]
    Tb = tb_ref[...]
    Ub = ub_ref[...]

    t_row = (i * Tc + jax.lax.broadcasted_iota(
        jnp.int32, (Tc, S_pad, B_pad), 0))
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (Tc, S_pad, B_pad), 1)
    r3 = r_ref[...][:, None, :]  # (Tc, 1, B_pad)
    u = r3 + s_iota
    valid = (t_row < Tb[None]) & (u < Ub[None]) & (s_iota < S)

    # bshift_u: beta(t, u+1) = panel (t, s+1): sublane roll up
    b_up = pltpu.roll(beta, S_pad - 1, axis=1)
    b_up = jnp.where(s_iota < S_pad - 1, b_up, neg)
    b_up = jnp.where(u + 1 < Ub[None], b_up, neg)
    # bshift_t: beta(t+1, u) = next-row panel at (s - delta_next)
    dnext3 = dnext_ref[...][:, None, :]
    b_dn = _shift_down_by_delta(beta_next_ref[...], dnext3, s_iota, S, neg)
    b_dn = jnp.where(t_row + 1 < Tb[None], b_dn, neg)
    terminal = (t_row == Tb[None] - 1) & (u == Ub[None] - 1)
    b_dn = jnp.where(terminal, 0.0, b_dn)

    a_ll = alpha - ll[None]
    feas = (ll > neg / 2)[None]
    sc = jnp.where(feas, scale[None], 0.0)
    coef = jnp.where(valid, jnp.exp(a_ll + beta) * sc, 0.0)
    cb = jnp.where(valid, jnp.exp(a_ll + lpb + b_dn) * sc, 0.0)
    has_lab = lab_ref[...] >= 0
    ce = jnp.where(valid & has_lab, jnp.exp(a_ll + lpe + b_up) * sc, 0.0)
    if fastemit_lambda:
        lam = jnp.asarray(fastemit_lambda, f32)
        coef = coef + lam * ce  # coef == cb + ce, so this is FastEmit's
        ce = ce * (1.0 + lam)   # (1+λ)-scaled emit arc (arXiv:2010.11148)
    denom = den_ref[...]

    # ---- one pass over the activations ----------------------------------
    # Build the segment-broadcast fields first with cheap selects, then run
    # ONE full-size exp/mul/sub chain: the previous per-segment form kept
    # ~12 (B, Tc, SV) temporaries live in the unrolled s-loop and blew the
    # 16 MB scoped-VMEM stack at B=128 (24.3 MB compile failure).
    x = x_ref[...].astype(f32)  # (B, Tc, SV)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, Tc, SV), 2)
    den_b = jnp.zeros((B, Tc, SV), f32)
    coef_b = jnp.zeros((B, Tc, SV), f32)
    sub = jnp.zeros((B, Tc, SV), f32)
    for s in range(S):
        in_seg = (lane >= s * v) & (lane < (s + 1) * v)
        # NB: transpose-then-basic-index with a None (`[:B, :, None]`)
        # emits lax.gather, which Mosaic can't lower; lax.slice +
        # expand_dims stays on the slice path.
        tr = lambda p: jnp.expand_dims(jax.lax.slice(
            jnp.transpose(p[:, s, :], (1, 0)), (0, 0), (B, Tc)), 2)
        den_b = jnp.where(in_seg, tr(denom), den_b)
        coef_b = jnp.where(in_seg, tr(coef), coef_b)
        sub = sub + jnp.where(lane == s * v + blank, tr(cb), 0.0)
        lab_bt = jnp.transpose(lab_ref[:, s, :], (1, 0))[:B]  # (B, Tc)
        target = jnp.where(lab_bt < 0, -1, s * v + lab_bt)
        sub = sub + jnp.where(lane == target[:, :, None], tr(ce), 0.0)
    g_ref[...] = (coef_b * jnp.exp(x + den_b) - sub).astype(out_dtype)


# ---------------------------------------------------------------------------
# Host drivers
# ---------------------------------------------------------------------------

def _geometry(B, T, S, V):
    S_pad = _round_up(S, _SUBLANES)
    B_pad = _round_up(B, _LANES)
    SV = S * V
    Tc = _pick_tc(B_pad, SV)
    T_pad = _round_up(T, Tc)
    return S_pad, B_pad, SV, Tc, T_pad


def _lab_panel(lab_band, has_lab, T_pad, S_pad, B_pad):
    """(B, T, S) labels -> (T_pad, S_pad, B_pad) int32 panel, -1 sentinel."""
    B, T, S = lab_band.shape
    lab = jnp.where(has_lab, lab_band.astype(jnp.int32), -1)
    lab = jnp.transpose(lab, (1, 2, 0))  # (T, S, B)
    return jnp.pad(lab, ((0, T_pad - T), (0, S_pad - S), (0, B_pad - B)),
                   constant_values=-1)


@functools.partial(jax.jit, static_argnames=("blank", "interpret"))
def prep_panels(acts, lab_panel, blank=0, interpret=False):
    """(lpb_p, lpe_p, denom_p) panels from one pass over the activations."""
    B, T, S, V = acts.shape
    S_pad, B_pad, SV, Tc, T_pad = _geometry(B, T, S, V)
    xf = acts.reshape(B, T, SV)
    if T_pad != T:
        xf = jnp.pad(xf, ((0, 0), (0, T_pad - T), (0, 0)))
    kernel = functools.partial(_prep_kernel, s_band=S, v=V, blank=blank)
    panel_spec = pl.BlockSpec((Tc, S_pad, B_pad), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    lpb_p, lpe_p, den_p = pl.pallas_call(
        kernel,
        grid=(T_pad // Tc,),
        in_specs=[
            pl.BlockSpec((B, Tc, SV), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            panel_spec,
        ],
        out_specs=(panel_spec, panel_spec, panel_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((T_pad, S_pad, B_pad), jnp.float32)
            for _ in range(3)
        ),
        interpret=interpret,
    )(xf, lab_panel)
    return lpb_p, lpe_p, den_p


@functools.partial(jax.jit, static_argnames=("blank", "interpret",
                                              "fastemit_lambda"))
def grad_panels(acts, lab_panel, lpb_p, lpe_p, den_p, alpha_p, beta_p,
                ranges_p, db_p, tb, ub, llf, scale, blank=0,
                interpret=False, fastemit_lambda=0.0):
    """(B, T, S, V) gradient in one read+write pass over the activations;
    the coefficient fields are computed in-kernel from the lattice panels."""
    B, T, S, V = acts.shape
    S_pad, B_pad, SV, Tc, T_pad = _geometry(B, T, S, V)
    xf = acts.reshape(B, T, SV)
    if T_pad != T:
        xf = jnp.pad(xf, ((0, 0), (0, T_pad - T), (0, 0)))
    # beta(t+1) rows aligned with row t (cheap panel-layout shift)
    beta_next = jnp.concatenate(
        [beta_p[1:], jnp.full((1, S_pad, B_pad), NEG, jnp.float32)], axis=0
    )
    scale_p = jnp.pad(scale.astype(jnp.float32), (0, B_pad - B))[None, :]

    kernel = functools.partial(_grad_kernel, s_band=S, v=V, blank=blank,
                               t_c=Tc, out_dtype=acts.dtype,
                               fastemit_lambda=float(fastemit_lambda))
    panel_spec = pl.BlockSpec((Tc, S_pad, B_pad), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((Tc, B_pad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    one_spec = pl.BlockSpec((1, B_pad), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    g = pl.pallas_call(
        kernel,
        grid=(T_pad // Tc,),
        in_specs=[
            pl.BlockSpec((B, Tc, SV), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            panel_spec,              # labels
            panel_spec, panel_spec, panel_spec,  # lpb, lpe, denom
            panel_spec, panel_spec, panel_spec,  # alpha, beta, beta_next
            row_spec, row_spec,      # ranges, delta_next
            one_spec, one_spec,      # tb, ub
            one_spec, one_spec,      # ll, scale
        ],
        out_specs=pl.BlockSpec((B, Tc, SV), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, SV), acts.dtype),
        # Mosaic's stack allocator does not reuse buffers across the
        # unrolled segment loop (~26 live (B,Tc,SV) temps at B=128), which
        # blows the DEFAULT 16 MiB scoped-vmem limit; v5e has 128 MiB of
        # physical VMEM, so raise the scope instead of shrinking Tc further
        # (smaller blocks measured slower).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xf, lab_panel, lpb_p, lpe_p, den_p, alpha_p, beta_p, beta_next,
      ranges_p, db_p, tb, ub, llf, scale_p)
    return g[:, :T].reshape(B, T, S, V)


def pruned_forward(acts, lab_band, has_lab, ranges, input_lengths,
                   label_lengths, blank, interpret, delay_penalty=0.0):
    """Panels forward: returns (costs_ll, residual panels dict)."""
    B, T, S, V = acts.shape
    S_pad, B_pad, SV, Tc, T_pad = _geometry(B, T, S, V)
    lab_panel = _lab_panel(lab_band, has_lab, T_pad, S_pad, B_pad)
    lpb_p, lpe_p, den_p = prep_panels(acts, lab_panel, blank=blank,
                                      interpret=interpret)
    if delay_penalty:
        # delay-penalized transducer (arXiv:2211.00490): emit log-weights
        # get + lam*((T_b-1)/2 - t); panel layout is (T_pad, S_pad, B_pad)
        t = jnp.arange(T_pad, dtype=jnp.float32)
        mid = (input_lengths.astype(jnp.float32) - 1) / 2
        mid = jnp.pad(mid, (0, B_pad - B))
        lpe_p = lpe_p + jnp.float32(delay_penalty) * (
            mid[None, None, :] - t[:, None, None])
    ranges_p, da_p, db_p, tb, ub = band_row_metadata(
        ranges, input_lengths, label_lengths, T_pad
    )
    alpha_p, beta_p, llf, llb = stream_panels(
        lpb_p, lpe_p, ranges_p, da_p, db_p, tb, ub, S, interpret
    )
    res = dict(
        lab_panel=lab_panel, lpb_p=lpb_p, lpe_p=lpe_p, den_p=den_p,
        alpha_p=alpha_p, beta_p=beta_p, ranges_p=ranges_p, db_p=db_p,
        tb=tb, ub=ub, llf=llf,
    )
    return llf[0, :B], res


def pruned_backward(acts, res, scale, blank, interpret, fastemit_lambda=0.0):
    return grad_panels(
        acts, res["lab_panel"], res["lpb_p"], res["lpe_p"], res["den_p"],
        res["alpha_p"], res["beta_p"], res["ranges_p"], res["db_p"],
        res["tb"], res["ub"], res["llf"], scale, blank=blank,
        interpret=interpret, fastemit_lambda=float(fastemit_lambda),
    )
