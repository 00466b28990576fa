"""Token-and-Duration Transducer (TDT) loss (Xu et al., arXiv:2304.06795).

The joint network outputs TWO heads per lattice cell: token logits over V
and duration logits over a small duration set (e.g. ``(0, 1, 2, 3, 4)``).
Every emission carries a duration d: a token emission moves
(t, u) -> (t+d, u+1), a blank emission moves (t, u) -> (t+d, u). The model
learns to skip frames — like the multi-blank transducer but with the skip
chosen by a separate shared duration predictor rather than per-symbol big
blanks, which in practice allows much larger skips and faster decoding.

Semantics (matched by the oracle, ``utils/numpy_oracle_tdt.py``):

* token arcs may use d = 0 (the standard transducer's vertical moves);
  blank arcs require d >= 1 (no self-loop);
* interior arcs land on a frame (t + d <= T-1); the path terminates with a
  blank arc consuming the remaining frames EXACTLY (t + d == T at u = U-1);
* both heads are independently log-softmaxed (fused here, like
  ``rnnt_loss``); ``sigma`` under-normalizes the TOKEN head only.

There is no reference-library counterpart; the engine generalises the
wavefront recursion (/root/reference/include/detail/gpu_rnnt_kernel.h:11-47)
with duration arcs. TPU-native design: the same fused t-major ``lax.scan``
as ``ops/multiblank.py`` — a pending-arrivals window P (B, W, U) where a
duration-d arc emitted at row t lands at slot d-1 (token arcs shifted one
column right), and the d=0 token arcs form the within-row chain solved with
the exclusive-prefix logsumexp trick. Both sweeps run in ONE scan.
"""
from __future__ import annotations

import functools
import os as _os
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import prep as _prep
from .pruned import NEG, _CLAMP, _cum_lse
from .rnnt import _compute_dtype


class TDTLattice(NamedTuple):
    alphas: jax.Array       # (B, T, U)
    betas: jax.Array        # (B, T, U)
    ll_forward: jax.Array   # (B,)
    ll_backward: jax.Array  # (B,)


def _check_durations(durations):
    durs = tuple(int(d) for d in durations)
    if not durs:
        raise ValueError("durations must be non-empty")
    if any(d < 0 for d in durs):
        raise ValueError(f"durations must be >= 0, got {durs}")
    if len(set(durs)) != len(durs):
        raise ValueError(f"durations must be distinct, got {durs}")
    if max(durs) < 1:
        raise ValueError(
            f"at least one duration must be >= 1 (blank arcs need it), "
            f"got {durs}")
    return durs


def _tdt_prep(token_logits, duration_logits, labels, blank, sigma,
              compute_dtype):
    """Fused two-head prep: sigma-shifted lpb/lpe + duration log-probs."""
    B, T, U, V = token_logits.shape
    x = token_logits.astype(compute_dtype)
    labels_u = _prep._pad_labels(labels.astype(jnp.int32), U)

    if compute_dtype == jnp.float32:
        # One read of the token head: streaming-logsumexp denominator plus
        # the label/blank selects in a single variadic reduce (see
        # prep.onepass_stats for the measured rationale).
        labels_full = jnp.pad(labels_u, ((0, 0), (0, 1)))  # (B, U)
        denom, e, bv = _prep.onepass_stats(x, labels_full, blank)
        shift = denom - jnp.asarray(sigma, compute_dtype)
        lpb = bv + shift
        u_iota = jnp.arange(U, dtype=jnp.int32)[None, None, :]
        lpe = jnp.where(u_iota == U - 1, NEG, e + shift)
        lpe = jnp.maximum(lpe, NEG)
        xd = duration_logits.astype(compute_dtype)
        md = jnp.max(xd, axis=-1, keepdims=True)
        denom_d = -(md[..., 0] + jnp.log(jnp.sum(jnp.exp(xd - md), axis=-1)))
        lpd = xd + denom_d[..., None]  # (B, T, U, D)
        return lpb, lpe, lpd, denom, denom_d

    m = jnp.max(x, axis=-1, keepdims=True)
    denom = -(m[..., 0] + jnp.log(jnp.sum(jnp.exp(x - m), axis=-1)))
    shift = denom - jnp.asarray(sigma, compute_dtype)
    lpb = x[..., blank] + shift

    if U > 1:
        v_iota = jnp.arange(V, dtype=jnp.int32)
        sel = v_iota[None, None, :] == labels_u[:, :, None]
        gathered = jnp.max(
            jnp.where(sel[:, None, :, :], x[:, :, : U - 1, :],
                      jnp.asarray(-1e30, compute_dtype)),
            axis=-1,
        )
        lpe = jnp.pad(gathered, ((0, 0), (0, 0), (0, 1)),
                      constant_values=NEG) + shift
    else:
        lpe = jnp.full((B, T, U), NEG, compute_dtype)
    lpe = jnp.maximum(lpe, NEG)

    xd = duration_logits.astype(compute_dtype)
    md = jnp.max(xd, axis=-1, keepdims=True)
    denom_d = -(md[..., 0] + jnp.log(jnp.sum(jnp.exp(xd - md), axis=-1)))
    lpd = xd + denom_d[..., None]  # (B, T, U, D)
    return lpb, lpe, lpd, denom, denom_d


def _shift_right_u(x, neg):
    """out[..., u] = x[..., u-1]; column 0 gets the sentinel."""
    return jnp.concatenate(
        [jnp.full(x.shape[:-1] + (1,), neg, x.dtype), x[..., :-1]], axis=-1)


def _shift_left_u(x, neg):
    """out[..., u] = x[..., u+1]; the last column gets the sentinel."""
    return jnp.concatenate(
        [x[..., 1:], jnp.full(x.shape[:-1] + (1,), neg, x.dtype)], axis=-1)


def _tdt_lattice(lpb, lpe, lpd, durations, input_lengths,
                 label_lengths) -> TDTLattice:
    """Fused t-major sweep (see module docstring)."""
    B, T, U = lpb.shape
    dtype = lpb.dtype
    neg = jnp.asarray(NEG, dtype)
    durs = durations
    W = max(durs)
    has0 = 0 in durs
    j0 = durs.index(0) if has0 else -1
    Tb = input_lengths.astype(jnp.int32)
    Ub = label_lengths.astype(jnp.int32) + 1
    u_iota = jnp.arange(U, dtype=jnp.int32)[None, :]

    def valid(t):
        return (t < Tb[:, None]) & (u_iota < Ub[:, None])

    def excl_prefix(w_row):
        c = jnp.cumsum(jnp.maximum(w_row, _CLAMP), axis=1)
        return jnp.pad(c[:, :-1], ((0, 0), (1, 0)))

    def step(carry, xs):
        P, bw = carry
        (ta, lpb_a, lpe_a, lpd_a), (tb, lpb_b, lpe_b, lpd_b) = xs

        # ---- alpha on row ta ----
        ne = P[:, 0]
        ne = jnp.where((ta == 0) & (u_iota == 0), 0.0, ne)
        if has0:
            # within-row chain = the d=0 token arcs, solved by the
            # exclusive-prefix trick
            c = excl_prefix(lpe_a + lpd_a[..., j0])
            a_t = c + _cum_lse(ne - c, axis=1)
        else:
            # no d=0 arcs -> no within-row moves; the clamp-based chain
            # would leak impossible paths at ~e^-1e4 and break the
            # infeasibility sentinel
            a_t = ne
        a_t = jnp.where(valid(ta), a_t, neg)
        P = jnp.concatenate([P[:, 1:], jnp.full((B, 1, U), neg, dtype)],
                            axis=1)
        for j, d in enumerate(durs):
            if d < 1:
                continue
            dep = jnp.logaddexp(
                a_t + lpb_a + lpd_a[..., j],
                _shift_right_u(a_t + lpe_a + lpd_a[..., j], neg))
            P = P.at[:, d - 1].set(jnp.logaddexp(P[:, d - 1], dep))

        # ---- beta on row tb ----
        at_last_u = u_iota == (Ub - 1)[:, None]
        nb = jnp.full((B, U), neg, dtype)
        for j, d in enumerate(durs):
            if d < 1:
                continue
            nb = jnp.logaddexp(nb, lpb_b + lpd_b[..., j] + bw[:, d - 1])
            nb = jnp.logaddexp(
                nb, lpe_b + lpd_b[..., j] + _shift_left_u(bw[:, d - 1], neg))
            nb = jnp.logaddexp(
                nb, jnp.where((tb + d == Tb[:, None]) & at_last_u,
                              lpb_b + lpd_b[..., j], neg))
        if has0:
            cb = excl_prefix(lpe_b + lpd_b[..., j0])
            p = nb + cb
            b_t = _cum_lse(p[:, ::-1], axis=1)[:, ::-1] - cb
        else:
            b_t = nb
        b_t = jnp.where(valid(tb), b_t, neg)
        bw = jnp.concatenate([b_t[:, None], bw[:, :-1]], axis=1)

        return (P, bw), (a_t, b_t)

    mv = lambda x: jnp.moveaxis(x, 1, 0)
    ts = jnp.arange(T, dtype=jnp.int32)[:, None, None]
    xs_a = (ts, mv(lpb), mv(lpe), mv(lpd))
    xs_b = tuple(x[::-1] for x in xs_a)
    init = (jnp.full((B, W, U), neg, dtype), jnp.full((B, W, U), neg, dtype))
    # WTT_VARIANT_UNROLL overrides for hardware A/B (0 = auto).
    # unroll=8 wins at EVERY T on hardware (T=150,B=128,D=4 headline
    # 1.650 -> 1.450 ms, r4 A/B): the T-step scan is dispatch-bound.
    unroll = int(_os.environ.get("WTT_VARIANT_UNROLL", 0)) or 8
    _, (a_rows, b_rows) = lax.scan(step, init, (xs_a, xs_b), unroll=unroll)
    alphas = jnp.moveaxis(a_rows, 0, 1)
    betas = jnp.moveaxis(b_rows[::-1], 0, 1)

    batch = jnp.arange(B)
    u_star = jnp.clip(Ub - 1, 0, U - 1)
    ll_f = jnp.full((B,), NEG, dtype)
    for j, d in enumerate(durs):
        if d < 1:
            continue
        tk = Tb - d
        ok = tk >= 0
        tk_c = jnp.clip(tk, 0, T - 1)
        contrib = (alphas[batch, tk_c, u_star] + lpb[batch, tk_c, u_star]
                   + lpd[batch, tk_c, u_star, j])
        ll_f = jnp.logaddexp(ll_f, jnp.where(ok, contrib, neg))
    return TDTLattice(alphas, betas, ll_f, betas[:, 0, 0])


def _tdt_shifts(betas, d, input_lengths, label_lengths):
    """(bs_blank, bs_tok) for duration d:
    bs_blank[t,u] = betas[t+d, u] (t+d < T_b), 0 on the terminal arc
    (t+d == T_b, u == U_b-1, d >= 1), -inf elsewhere;
    bs_tok[t,u]   = betas[t+d, u+1] (t+d < T_b and u+1 < U_b)."""
    B, T, U = betas.shape
    dtype = betas.dtype
    neg = jnp.asarray(NEG, dtype)
    Tb = input_lengths.astype(jnp.int32)[:, None, None]
    Ub = (label_lengths.astype(jnp.int32) + 1)[:, None, None]
    t_iota = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    u_iota = jnp.arange(U, dtype=jnp.int32)[None, None, :]
    if d < T:
        sh = jnp.concatenate(
            [betas[:, d:, :], jnp.full((B, d, U), neg, dtype)], axis=1)
    else:
        sh = jnp.full((B, T, U), neg, dtype)
    in_t = t_iota + d < Tb
    bs_tok = _shift_left_u(sh, neg)
    bs_tok = jnp.where(in_t & (u_iota + 1 < Ub), bs_tok, neg)
    bs_blank = jnp.where(in_t, sh, neg)
    if d >= 1:
        terminal = (t_iota + d == Tb) & (u_iota == Ub - 1)
        bs_blank = jnp.where(terminal, jnp.zeros((), dtype), bs_blank)
    else:
        bs_blank = jnp.full((B, T, U), neg, dtype)
    return bs_blank, bs_tok


def _tdt_coefs(lpb, lpe, lpd, lat, durations, input_lengths, label_lengths,
               scale=None, fastemit_lambda=0.0):
    """The cotangent-scaled coefficient fields of both heads' gradients:
    (coef, cb, ce, cb_js, ce_js) — all (B, T, U), per-duration lists for
    the duration head. coef = exp(α+β−ll) (+ λ·ce under FastEmit) is the
    shared occupation; cb/ce are the summed blank/token arc posteriors
    (ce NOT yet (1+λ)-scaled — callers apply it where the token/duration
    selects consume it). Infeasible utterances (ll at the NEG sentinel)
    get zero fields (the pruned-loss convention)."""
    B, T, U = lpb.shape
    dtype = lat.alphas.dtype
    from .gradients import _valid_cells

    alphas, betas, ll = lat.alphas, lat.betas, lat.ll_forward
    valid = _valid_cells((B, T, U), input_lengths, label_lengths)
    feasible = ll > NEG / 2
    if scale is None:
        scale = jnp.ones((B,), dtype)
    scale = jnp.where(feasible, scale.astype(dtype), 0.0)
    a_ll = alphas - ll[:, None, None]

    cb_js, ce_js = [], []
    for j, d in enumerate(durations):
        bs_blank, bs_tok = _tdt_shifts(betas, d, input_lengths, label_lengths)
        cb_js.append(jnp.where(
            valid, jnp.exp(a_ll + lpb + lpd[..., j] + bs_blank), 0.0))
        ce_js.append(jnp.where(
            valid, jnp.exp(a_ll + lpe + lpd[..., j] + bs_tok), 0.0))
    cb = sum(cb_js)
    ce = sum(ce_js)
    coef = jnp.where(valid, jnp.exp(a_ll + betas), 0.0)
    lam = float(fastemit_lambda)
    if lam:
        coef = coef + lam * ce
    s = scale.astype(dtype)[:, None, None]
    return (coef * s, cb * s, ce * s,
            [c * s for c in cb_js], [c * s for c in ce_js])


def _tdt_grads(token_logits, duration_logits, denom, denom_d, lpb, lpe, lpd,
               lat, labels_full, durations, input_lengths, label_lengths,
               blank, scale=None, fastemit_lambda=0.0):
    """Dense (d cost/d token_logits, d cost/d duration_logits), one fused
    pass per head: g_head = p_head * W - per-class arc posteriors (both
    heads share W = exp(alpha+beta-ll); every arc carries exactly one
    factor from each head)."""
    B, T, U, V = token_logits.shape
    D = duration_logits.shape[-1]
    dtype = lat.alphas.dtype
    from .gradients import _valid_cells

    valid = _valid_cells((B, T, U), input_lengths, label_lengths)
    lam = float(fastemit_lambda)
    coef, cb, ce, cb_js, ce_js = _tdt_coefs(
        lpb, lpe, lpd, lat, durations, input_lengths, label_lengths,
        scale=scale, fastemit_lambda=fastemit_lambda)

    # token head
    logp = token_logits.astype(dtype) + denom[..., None]
    probs = jnp.exp(logp)
    v_iota = jnp.arange(V, dtype=jnp.int32)
    g_tok = coef[..., None] * probs
    g_tok = g_tok - jnp.where(v_iota[None, None, None, :] == blank,
                              cb[..., None], 0.0)
    is_label = v_iota[None, None, None, :] == labels_full[:, None, :, None]
    g_tok = g_tok - jnp.where(is_label, ((1.0 + lam) * ce)[..., None], 0.0)
    g_tok = jnp.where(valid[..., None], g_tok, 0.0)

    # duration head
    probs_d = jnp.exp(duration_logits.astype(dtype) + denom_d[..., None])
    g_dur = coef[..., None] * probs_d
    g_dur = g_dur - jnp.stack(
        [cb_js[j] + (1.0 + lam) * ce_js[j] for j in range(D)], axis=-1)
    g_dur = jnp.where(valid[..., None], g_dur, 0.0)
    return (g_tok.astype(token_logits.dtype),
            g_dur.astype(duration_logits.dtype))


def _tdt_lattice_dispatch(lpb, lpe, lpd, durations, input_lengths,
                          label_lengths, implementation):
    """Engine switch: 'xla' = the fused t-major scan above; 'pallas' = the
    single-invocation streamed pending-window kernel
    (``pallas/window_stream.py``). fp64 always takes the XLA engine."""
    if implementation == "pallas" and lpb.dtype != jnp.float64:
        from .pallas.window_stream import tdt_forward_backward

        a, b, llf, llb = tdt_forward_backward(
            lpb, lpe, lpd, durations, input_lengths, label_lengths)
        return TDTLattice(a, b, llf, llb)
    return _tdt_lattice(lpb, lpe, lpd, durations, input_lengths,
                        label_lengths)


def _tdt_forward(token_logits, duration_logits, labels, input_lengths,
                 label_lengths, blank, durations, sigma, delay_penalty,
                 implementation="xla"):
    cdtype = _compute_dtype(token_logits.dtype)
    lpb, lpe, lpd, denom, denom_d = _tdt_prep(
        token_logits, duration_logits, labels, blank, sigma, cdtype)
    if delay_penalty:
        lpe = _prep.delay_shift(lpe, input_lengths, delay_penalty)
    lat = _tdt_lattice_dispatch(lpb, lpe, lpd, durations, input_lengths,
                                label_lengths, implementation)
    return lpb, lpe, lpd, denom, denom_d, lat


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _tdt_costs(token_logits, duration_logits, labels, input_lengths,
               label_lengths, blank, durations, sigma, fastemit_lambda,
               delay_penalty, implementation):
    *_, lat = _tdt_forward(token_logits, duration_logits, labels,
                           input_lengths, label_lengths, blank, durations,
                           sigma, delay_penalty, implementation)
    return (-lat.ll_forward).astype(token_logits.dtype)


def _tdt_costs_fwd(token_logits, duration_logits, labels, input_lengths,
                   label_lengths, blank, durations, sigma, fastemit_lambda,
                   delay_penalty, implementation):
    lpb, lpe, lpd, denom, denom_d, lat = _tdt_forward(
        token_logits, duration_logits, labels, input_lengths, label_lengths,
        blank, durations, sigma, delay_penalty, implementation)
    costs = (-lat.ll_forward).astype(token_logits.dtype)
    residuals = (token_logits, duration_logits, lpb, lpe, lpd, denom,
                 denom_d, lat, labels, input_lengths, label_lengths)
    return costs, residuals


def _tdt_costs_bwd(blank, durations, sigma, fastemit_lambda, delay_penalty,
                   implementation, residuals, g):
    (token_logits, duration_logits, lpb, lpe, lpd, denom, denom_d, lat,
     labels, input_lengths, label_lengths) = residuals
    U = token_logits.shape[2]
    labels_full = jnp.pad(_prep._pad_labels(labels.astype(jnp.int32), U),
                          ((0, 0), (0, 1)), constant_values=0)
    g_tok, g_dur = _tdt_grads(
        token_logits, duration_logits, denom, denom_d, lpb, lpe, lpd, lat,
        labels_full, durations, input_lengths, label_lengths, blank,
        scale=g.astype(lat.alphas.dtype), fastemit_lambda=fastemit_lambda)
    z = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (g_tok, g_dur, z(labels), z(input_lengths), z(label_lengths))


_tdt_costs.defvjp(_tdt_costs_fwd, _tdt_costs_bwd)


def rnnt_loss_tdt(
    token_logits: jax.Array,
    duration_logits: jax.Array,
    labels: jax.Array,
    input_lengths: jax.Array,
    label_lengths: jax.Array,
    durations: Sequence[int] = (0, 1, 2, 3, 4),
    blank: int = 0,
    reduction: str = "mean",
    sigma: float = 0.0,
    fastemit_lambda: float = 0.0,
    delay_penalty: float = 0.0,
    implementation: str = "auto",
) -> jax.Array:
    """Token-and-Duration Transducer loss (arXiv:2304.06795).

    Args:
      token_logits: (B, T, U, V) raw token-head outputs (log-softmax fused).
      duration_logits: (B, T, U, D) raw duration-head outputs, column j for
        ``durations[j]`` (log-softmax fused, independent of the token head).
      labels / input_lengths / label_lengths / blank / reduction: as in
        ``rnnt_loss``.
      durations: the duration set. Token emissions may use any of them
        (including 0 = stay on the frame); blank emissions only d >= 1. The
        path ends with a blank consuming the remaining frames exactly, so
        the set should contain 1 unless every utterance's frame count is
        reachable without it.
      sigma: logit under-normalization on the TOKEN head (the TDT paper's
        training trick). 0 disables.
      fastemit_lambda / delay_penalty: latency regularizers, as in
        ``rnnt_loss`` (both act on the token-emit arcs).
      implementation: 'auto' | 'xla' | 'pallas' — XLA pending-window scan
        vs the single-invocation streamed Pallas kernel
        (``pallas/window_stream.py``; 3.7x faster at T=1500). 'auto'
        picks the kernel on TPU when T >= 256, the scan otherwise.

    Returns (B,) costs for reduction='none', scalar otherwise.
    Differentiable w.r.t. both logits tensors.
    """
    if token_logits.ndim != 4 or duration_logits.ndim != 4:
        raise ValueError(
            f"token/duration logits must be 4-D; got {token_logits.shape}, "
            f"{duration_logits.shape}")
    if token_logits.shape[:3] != duration_logits.shape[:3]:
        raise ValueError(
            f"token and duration logits disagree on (B, T, U): "
            f"{token_logits.shape[:3]} vs {duration_logits.shape[:3]}")
    durs = _check_durations(durations)
    if duration_logits.shape[-1] != len(durs):
        raise ValueError(
            f"duration_logits last dim {duration_logits.shape[-1]} != "
            f"len(durations) = {len(durs)}")
    if reduction not in ("none", "sum", "mean"):
        raise ValueError(f"reduction must be none|sum|mean, got {reduction!r}")
    if fastemit_lambda < 0:
        raise ValueError(f"fastemit_lambda must be >= 0, got {fastemit_lambda}")
    if delay_penalty < 0:
        raise ValueError(f"delay_penalty must be >= 0, got {delay_penalty}")
    from .multiblank import _resolve_window_impl
    from .rnnt import _certify_inputs

    _certify_inputs(token_logits, labels, input_lengths, label_lengths)
    impl = _resolve_window_impl(implementation, token_logits.shape[1])
    costs = _tdt_costs(token_logits, duration_logits, labels, input_lengths,
                       label_lengths, int(blank), durs, float(sigma),
                       float(fastemit_lambda), float(delay_penalty), impl)
    if reduction == "sum":
        return jnp.sum(costs)
    if reduction == "mean":
        return jnp.mean(costs)
    return costs
