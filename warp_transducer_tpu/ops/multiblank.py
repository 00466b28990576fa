"""Multi-blank RNN-Transducer loss (Xu et al., arXiv:2211.03541).

Besides the standard blank (advance one frame), the vocabulary carries K
"big blank" symbols with durations m_k >= 2: emitting big blank k advances
t by m_k while keeping u, letting the model skip silence/steady frames and
cutting inference steps. This module computes the exact multi-blank
negative log-likelihood and its dense gradient w.r.t. the raw joint
activations (log-softmax fused, like ``rnnt_loss``).

There is no reference-library counterpart (the reference computes only the
standard transducer; its lattice recursion is
``/root/reference/include/detail/gpu_rnnt_kernel.h:11-47``); the engine
here generalises that recursion with duration arcs.

TPU-native design: a t-major ``lax.scan`` whose carry holds

* a pending-arrivals buffer P (B, W, U), W = max duration: P[:, j] is the
  logsumexp of all blank-family arc contributions scheduled to land on row
  t+1+j (a duration-m arc emitted at row t lands at slot m-1) — the
  multi-step generalisation of the wavefront's single no-emit predecessor;
* the within-row emit chain alpha(t, u) = LSE(ne(t, j<=u) + sum lpe) is
  solved in log2(U) vector steps with the exclusive-prefix trick shared
  with the pruned band recursion (``ops/pruned.py``).

The backward sweep mirrors it with a window of the NEXT W beta rows; both
directions run in ONE fused scan (step k advances alpha row k and beta row
T-1-k), halving the sequential-loop overhead.
"""
from __future__ import annotations

import functools
import os as _os
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import prep as _prep
from .pruned import NEG, _CLAMP, _cum_lse
from .rnnt import _certify_inputs, _compute_dtype


class MultiblankLattice(NamedTuple):
    alphas: jax.Array       # (B, T, U)
    betas: jax.Array        # (B, T, U)
    ll_forward: jax.Array   # (B,)
    ll_backward: jax.Array  # (B,)


def _resolve_indices(V, blank, durations, big_blank_indices):
    K = len(durations)
    durs = tuple(int(m) for m in durations)
    if any(m < 2 for m in durs):
        raise ValueError(f"big-blank durations must all be >= 2, got {durs}")
    if len(set(durs)) != K:
        raise ValueError(f"big-blank durations must be distinct, got {durs}")
    if big_blank_indices is None:
        idx = tuple(range(V - K, V))
    else:
        idx = tuple(int(i) for i in big_blank_indices)
    if len(idx) != K:
        raise ValueError(
            f"big_blank_indices has {len(idx)} entries for {K} durations")
    if len(set(idx)) != K or any(i < 0 or i >= V for i in idx) or blank in idx:
        raise ValueError(
            f"big_blank_indices must be distinct in-range and != blank; "
            f"got {idx} (blank={blank}, V={V})")
    return durs, idx


def _multiblank_prep(acts, labels, blank, bb_indices, sigma, compute_dtype):
    """denom + sigma-shifted lpb / lpe / lpB caches in one fused pass.

    lp_v = acts_v + denom - sigma: the paper's logit under-normalization
    (sigma > 0 leaves per-cell mass < 1, so paths with FEWER emissions —
    more big blanks — are penalized less)."""
    B, T, U, V = acts.shape
    x = acts.astype(compute_dtype)
    labels_u = _prep._pad_labels(labels.astype(jnp.int32), U)  # (B, U-1)

    if compute_dtype == jnp.float32:
        # One read of the activations: streaming-logsumexp denominator plus
        # the label / blank / big-blank column selects in a single variadic
        # reduce (see prep.onepass_stats for the measured rationale).
        labels_full = jnp.pad(labels_u, ((0, 0), (0, 1)))  # (B, U)
        denom, e, bv, *bb_cols = _prep.onepass_stats(
            x, labels_full, blank, extra_cols=tuple(bb_indices))
        shift = denom - jnp.asarray(sigma, compute_dtype)
        lpb = bv + shift
        lpB = (jnp.stack(bb_cols, axis=-1) + shift[..., None]
               if bb_indices else jnp.zeros((B, T, U, 0), compute_dtype))
        u_iota = jnp.arange(U, dtype=jnp.int32)[None, None, :]
        lpe = jnp.where(u_iota == U - 1, NEG, e + shift)
        lpe = jnp.maximum(lpe, NEG)
        return lpb, lpe, lpB, denom, labels_u

    m = jnp.max(x, axis=-1, keepdims=True)
    denom = -(m[..., 0] + jnp.log(jnp.sum(jnp.exp(x - m), axis=-1)))
    shift = denom - jnp.asarray(sigma, compute_dtype)
    lpb = x[..., blank] + shift
    lpB = jnp.stack([x[..., i] for i in bb_indices], axis=-1) \
        + shift[..., None] if bb_indices else jnp.zeros(
            (B, T, U, 0), compute_dtype)

    if U > 1:
        v_iota = jnp.arange(V, dtype=jnp.int32)
        sel = v_iota[None, None, :] == labels_u[:, :, None]  # (B, U-1, V)
        gathered = jnp.max(
            jnp.where(sel[:, None, :, :], x[:, :, : U - 1, :],
                      jnp.asarray(-1e30, compute_dtype)),
            axis=-1,
        )
        lpe = jnp.pad(gathered, ((0, 0), (0, 0), (0, 1)),
                      constant_values=NEG) + shift
    else:
        lpe = jnp.full((B, T, U), NEG, compute_dtype)
    lpe = jnp.maximum(lpe, NEG)  # keep the sentinel finite
    return lpb, lpe, lpB, denom, labels_u


def _multiblank_lattice(lpb, lpe, lpB, durations, input_lengths,
                        label_lengths) -> MultiblankLattice:
    """Fused t-major sweep: scan step k advances alpha on row k and beta on
    row T-1-k. See the module docstring for the carry design."""
    B, T, U = lpb.shape
    dtype = lpb.dtype
    neg = jnp.asarray(NEG, dtype)
    K = len(durations)
    W = max(durations) if K else 1
    Tb = input_lengths.astype(jnp.int32)
    Ub = label_lengths.astype(jnp.int32) + 1
    u_iota = jnp.arange(U, dtype=jnp.int32)[None, :]

    def valid(t):
        return (t < Tb[:, None]) & (u_iota < Ub[:, None])

    def excl_prefix(lpe_row):
        c = jnp.cumsum(jnp.maximum(lpe_row, _CLAMP), axis=1)
        return jnp.pad(c[:, :-1], ((0, 0), (1, 0)))

    def step(carry, xs):
        P, bw = carry
        (ta, lpb_a, lpe_a, lpB_a), (tb, lpb_b, lpe_b, lpB_b) = xs

        # ---- alpha on row ta (ascending) ----
        ne = P[:, 0]
        ne = jnp.where((ta == 0) & (u_iota == 0), 0.0, ne)
        c = excl_prefix(lpe_a)
        a_t = c + _cum_lse(ne - c, axis=1)
        a_t = jnp.where(valid(ta), a_t, neg)
        P = jnp.concatenate([P[:, 1:], jnp.full((B, 1, U), neg, dtype)], axis=1)
        P = P.at[:, 0].set(jnp.logaddexp(P[:, 0], a_t + lpb_a))
        for k in range(K):
            m = durations[k]
            P = P.at[:, m - 1].set(
                jnp.logaddexp(P[:, m - 1], a_t + lpB_a[..., k]))

        # ---- beta on row tb (descending) ----
        nb = lpb_b + bw[:, 0]
        for k in range(K):
            m = durations[k]
            nb = jnp.logaddexp(nb, lpB_b[..., k] + bw[:, m - 1])
        at_last_u = u_iota == (Ub - 1)[:, None]
        term = jnp.where((tb == (Tb - 1)[:, None]) & at_last_u, lpb_b, neg)
        for k in range(K):
            m = durations[k]
            term = jnp.logaddexp(
                term,
                jnp.where((tb + m == Tb[:, None]) & at_last_u,
                          lpB_b[..., k], neg))
        nb = jnp.logaddexp(nb, term)
        cb = excl_prefix(lpe_b)
        p = nb + cb
        b_t = _cum_lse(p[:, ::-1], axis=1)[:, ::-1] - cb
        b_t = jnp.where(valid(tb), b_t, neg)
        bw = jnp.concatenate([b_t[:, None], bw[:, :-1]], axis=1)

        return (P, bw), (a_t, b_t)

    mv = lambda x: jnp.moveaxis(x, 1, 0)
    ts = jnp.arange(T, dtype=jnp.int32)[:, None, None]  # (T,1,1) vs (B,U)
    xs_a = (ts, mv(lpb), mv(lpe), mv(lpB))
    xs_b = tuple(x[::-1] for x in xs_a)
    init = (jnp.full((B, W, U), neg, dtype), jnp.full((B, W, U), neg, dtype))
    # WTT_VARIANT_UNROLL overrides for hardware A/B (0 = auto).
    # unroll=8 wins at EVERY T on hardware: at T=150,B=128,K=2 it cut the
    # loss+grad headline 1.655 -> 1.302 ms (r4 A/B; unroll=4 gave 1.503) —
    # the T-step scan is dispatch-bound, so fusing 8 steps per iteration
    # amortises the per-step XLA overhead, and at long T it was already 8.
    unroll = int(_os.environ.get("WTT_VARIANT_UNROLL", 0)) or 8
    _, (a_rows, b_rows) = lax.scan(step, init, (xs_a, xs_b), unroll=unroll)
    alphas = jnp.moveaxis(a_rows, 0, 1)
    betas = jnp.moveaxis(b_rows[::-1], 0, 1)

    # ll_forward: logsumexp over the terminal arcs (final blank of any
    # duration consuming the remaining frames exactly)
    batch = jnp.arange(B)
    u_star = jnp.clip(Ub - 1, 0, U - 1)
    t1 = jnp.clip(Tb - 1, 0, T - 1)
    ll_f = alphas[batch, t1, u_star] + lpb[batch, t1, u_star]
    for k in range(K):
        m = durations[k]
        tk = Tb - m
        ok = tk >= 0
        tk_c = jnp.clip(tk, 0, T - 1)
        contrib = alphas[batch, tk_c, u_star] + lpB[batch, tk_c, u_star, k]
        ll_f = jnp.logaddexp(ll_f, jnp.where(ok, contrib, neg))
    ll_b = betas[:, 0, 0]
    return MultiblankLattice(alphas, betas, ll_f, ll_b)


def _beta_shift_m(betas, m, input_lengths, label_lengths):
    """bshift_m[t, u] = betas[t+m, u] for t+m <= T_b-1; 0 on the terminal
    arc (t+m == T_b and u == U_b-1); -inf elsewhere."""
    B, T, U = betas.shape
    dtype = betas.dtype
    neg = jnp.asarray(NEG, dtype)
    Tb = input_lengths.astype(jnp.int32)[:, None, None]
    Ub = (label_lengths.astype(jnp.int32) + 1)[:, None, None]
    t_iota = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    u_iota = jnp.arange(U, dtype=jnp.int32)[None, None, :]
    if m < T:
        shifted = jnp.concatenate(
            [betas[:, m:, :], jnp.full((B, m, U), neg, dtype)], axis=1)
    else:
        shifted = jnp.full((B, T, U), neg, dtype)
    shifted = jnp.where(t_iota + m < Tb, shifted, neg)
    terminal = (t_iota + m == Tb) & (u_iota == Ub - 1)
    return jnp.where(terminal, jnp.zeros((), dtype), shifted)


def _mb_coefs(lpb, lpe, lpB, lat, durations, input_lengths, label_lengths,
              scale=None, fastemit_lambda=0.0):
    """The cotangent-scaled coefficient fields (coef, cb, ce, cBs) of the
    multi-blank gradient — ce already (1+λ)-scaled, coef carrying the
    FastEmit + λ·ce fold (cf. gradients.grad_wrt_acts)."""
    B, T, U = lpb.shape
    K = len(durations)
    dtype = lat.alphas.dtype
    alphas, betas, ll = lat.alphas, lat.betas, lat.ll_forward
    from .gradients import _beta_shifts, _valid_cells

    bshift_t, bshift_u = _beta_shifts(betas, alphas, input_lengths,
                                      label_lengths)
    valid = _valid_cells((B, T, U), input_lengths, label_lengths)

    a_ll = alphas - ll[:, None, None]
    coef = jnp.where(valid, jnp.exp(a_ll + betas), 0.0)
    cb = jnp.where(valid, jnp.exp(a_ll + lpb + bshift_t), 0.0)
    ce = jnp.where(valid, jnp.exp(a_ll + lpe + bshift_u), 0.0)
    cBs = []
    for k in range(K):
        sh = _beta_shift_m(betas, durations[k], input_lengths, label_lengths)
        cBs.append(jnp.where(valid, jnp.exp(a_ll + lpB[..., k] + sh), 0.0))
    if fastemit_lambda:
        lam = jnp.asarray(fastemit_lambda, dtype)
        coef = coef + lam * ce
        ce = ce * (1.0 + lam)
    if scale is not None:
        s = scale.astype(dtype)[:, None, None]
        coef, cb, ce = coef * s, cb * s, ce * s
        cBs = [c * s for c in cBs]
    return coef, cb, ce, cBs


def _multiblank_grad(acts, denom, lpb, lpe, lpB, lat, labels_u, durations,
                     bb_indices, input_lengths, label_lengths, blank,
                     out_dtype, scale=None, fastemit_lambda=0.0):
    """Dense d(cost)/d(acts) in one fused pass:
    g = p·W − [v==blank]·cb − [v==y_u]·ce − Σ_k [v==idx_k]·cB_k, with
    W = exp(α+β−ll) (= the sum of all outgoing-arc posteriors; σ is
    constant w.r.t. acts so the softmax Jacobian is the standard one)."""
    B, T, U, V = acts.shape
    K = len(durations)
    dtype = lat.alphas.dtype
    from .gradients import _valid_cells

    valid = _valid_cells((B, T, U), input_lengths, label_lengths)
    coef, cb, ce, cBs = _mb_coefs(
        lpb, lpe, lpB, lat, durations, input_lengths, label_lengths,
        scale=scale, fastemit_lambda=fastemit_lambda)

    logp = acts.astype(dtype) + denom[..., None]
    probs = jnp.exp(logp)
    v_iota = jnp.arange(V, dtype=jnp.int32)
    g = coef[..., None] * probs
    g = g - jnp.where(v_iota[None, None, None, :] == blank, cb[..., None], 0.0)
    is_label = v_iota[None, None, None, :] == labels_u[:, None, :, None]
    g = g - jnp.where(is_label, ce[..., None], 0.0)
    for k in range(K):
        g = g - jnp.where(v_iota[None, None, None, :] == bb_indices[k],
                          cBs[k][..., None], 0.0)
    g = jnp.where(valid[..., None], g, 0.0)
    return g.astype(out_dtype)


# Below this T, 'auto' keeps the XLA scan: the streamed kernel's panel
# build/readback overhead slightly outweighs the dispatch savings at short
# T (measured donation-chain at B=128,T=150: 1.64 ms XLA vs 1.81 ms
# kernel), while at T=1500 the kernel wins 3-3.7x (B=16: 64.6 -> 21.4 ms
# multi-blank, 67.9 -> 18.5 ms TDT).
_WINDOW_MIN_T = 256


def _resolve_window_impl(implementation: str, T: int) -> str:
    from .rnnt import _pick_implementation

    impl = _pick_implementation(implementation)
    if implementation == "auto" and impl == "pallas" and T < _WINDOW_MIN_T:
        return "xla"
    return impl


def _mb_lattice_dispatch(lpb, lpe, lpB, durations, input_lengths,
                         label_lengths, implementation):
    """Engine switch: 'xla' = the fused t-major scan above; 'pallas' = the
    single-invocation streamed pending-window kernel
    (``pallas/window_stream.py``). fp64 always takes the XLA engine (the
    kernel is f32)."""
    if implementation == "pallas" and lpb.dtype != jnp.float64:
        from .pallas.window_stream import multiblank_forward_backward

        a, b, llf, llb = multiblank_forward_backward(
            lpb, lpe, lpB, durations, input_lengths, label_lengths)
        return MultiblankLattice(a, b, llf, llb)
    return _multiblank_lattice(lpb, lpe, lpB, durations, input_lengths,
                               label_lengths)


def _mb_forward(acts, labels, input_lengths, label_lengths, blank,
                durations, bb_indices, sigma, delay_penalty,
                implementation="xla"):
    cdtype = _compute_dtype(acts.dtype)
    lpb, lpe, lpB, denom, labels_u = _multiblank_prep(
        acts, labels, blank, bb_indices, sigma, cdtype)
    if delay_penalty:
        lpe = _prep.delay_shift(lpe, input_lengths, delay_penalty)
    lat = _mb_lattice_dispatch(lpb, lpe, lpB, durations, input_lengths,
                               label_lengths, implementation)
    return lpb, lpe, lpB, denom, labels_u, lat


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _mb_costs(acts, labels, input_lengths, label_lengths, blank, durations,
              bb_indices, sigma, fastemit_lambda, delay_penalty,
              implementation):
    *_, lat = _mb_forward(acts, labels, input_lengths, label_lengths,
                          blank, durations, bb_indices, sigma, delay_penalty,
                          implementation)
    return (-lat.ll_forward).astype(acts.dtype)


def _mb_costs_fwd(acts, labels, input_lengths, label_lengths, blank,
                  durations, bb_indices, sigma, fastemit_lambda,
                  delay_penalty, implementation):
    lpb, lpe, lpB, denom, labels_u, lat = _mb_forward(
        acts, labels, input_lengths, label_lengths, blank, durations,
        bb_indices, sigma, delay_penalty, implementation)
    costs = (-lat.ll_forward).astype(acts.dtype)
    residuals = (acts, lpb, lpe, lpB, denom, lat, labels,
                 input_lengths, label_lengths)
    return costs, residuals


def _mb_costs_bwd(blank, durations, bb_indices, sigma, fastemit_lambda,
                  delay_penalty, implementation, residuals, g):
    (acts, lpb, lpe, lpB, denom, lat, labels,
     input_lengths, label_lengths) = residuals
    U = acts.shape[2]
    labels_full = jnp.pad(_prep._pad_labels(labels.astype(jnp.int32), U),
                          ((0, 0), (0, 1)), constant_values=0)
    d_acts = _multiblank_grad(
        acts, denom, lpb, lpe, lpB, lat, labels_full, durations, bb_indices,
        input_lengths, label_lengths, blank, acts.dtype,
        scale=g.astype(lat.alphas.dtype), fastemit_lambda=fastemit_lambda)
    z = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (d_acts, z(labels), z(input_lengths), z(label_lengths))


_mb_costs.defvjp(_mb_costs_fwd, _mb_costs_bwd)


def rnnt_loss_multiblank(
    acts: jax.Array,
    labels: jax.Array,
    input_lengths: jax.Array,
    label_lengths: jax.Array,
    big_blank_durations: Sequence[int],
    blank: int = 0,
    big_blank_indices: Optional[Sequence[int]] = None,
    reduction: str = "mean",
    sigma: float = 0.0,
    fastemit_lambda: float = 0.0,
    delay_penalty: float = 0.0,
    implementation: str = "auto",
) -> jax.Array:
    """Multi-blank transducer loss (arXiv:2211.03541).

    Args:
      acts: (B, T, U, V) raw joint activations (log-softmax fused).
      labels / input_lengths / label_lengths / blank / reduction: as in
        ``rnnt_loss``. Labels must not use the big-blank vocab entries —
        label values are traced arrays so this cannot be validated under
        jit (the native binding does validate it); a collision silently
        merges the emit and big-blank posteriors on that column, like a
        label equal to ``blank`` in the reference.
      big_blank_durations: K distinct durations, each >= 2 — emitting big
        blank k advances t by m_k and keeps u. The path may also END on a
        big blank that consumes the remaining frames exactly.
      big_blank_indices: the K vocab indices of the big blanks, aligned
        with the durations. Default: the LAST K entries (V-K .. V-1).
      sigma: logit under-normalization (the paper's trick): every log-prob
        is shifted by -sigma, so paths with fewer emissions (more big
        blanks) are penalized less. 0 disables; the paper uses ~0.05.
      fastemit_lambda / delay_penalty: the latency regularizers, exactly
        as in ``rnnt_loss`` (FastEmit scales only the label-emit arc).
      implementation: 'auto' | 'xla' | 'pallas'. The duration arcs break
        the anti-diagonal wavefront's 2-neighbour structure, so both
        engines run the pending-window t-recursion: 'xla' as a fused
        t-major scan, 'pallas' as one streamed kernel invocation
        (``pallas/window_stream.py``; 3-3.7x faster at long T). 'auto'
        picks the kernel on TPU when T >= 256 and the scan otherwise
        (the kernel's panel overhead loses at short T).

    Returns (B,) costs for reduction='none', scalar otherwise.
    Differentiable w.r.t. acts. With K=0 this is exactly ``rnnt_loss``.
    """
    from .rnnt import _pick_implementation

    _certify_inputs(acts, labels, input_lengths, label_lengths)
    if reduction not in ("none", "sum", "mean"):
        raise ValueError(f"reduction must be none|sum|mean, got {reduction!r}")
    if fastemit_lambda < 0:
        raise ValueError(f"fastemit_lambda must be >= 0, got {fastemit_lambda}")
    if delay_penalty < 0:
        raise ValueError(f"delay_penalty must be >= 0, got {delay_penalty}")
    durs, idx = _resolve_indices(acts.shape[-1], int(blank),
                                 big_blank_durations, big_blank_indices)
    impl = _resolve_window_impl(implementation, acts.shape[1])
    costs = _mb_costs(acts, labels, input_lengths, label_lengths, int(blank),
                      durs, idx, float(sigma), float(fastemit_lambda),
                      float(delay_penalty), impl)
    if reduction == "sum":
        return jnp.sum(costs)
    if reduction == "mean":
        return jnp.mean(costs)
    return costs
