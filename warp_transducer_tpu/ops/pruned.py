"""Pruned RNN-T loss: the dense loss evaluated on a (B, T, S, V) band.

Stage 2 of pruned-transducer training (Kuang et al., arXiv 2206.13236):
stage 1 (``rnnt_loss_simple``) trains an additive joiner and exposes the
lattice posteriors; ``rnnt_prune_ranges`` turns those posteriors into a
per-frame band start ``ranges[b, t]`` of width ``s_range``; the real joint
network is evaluated ONLY on the banded cells and ``rnnt_loss_pruned``
computes the transducer loss restricted to paths inside the band.

Memory: O(B·T·S·V) instead of O(B·T·U·V) — with S=4..16 this is a
U/S-fold cut of the joint tensor and its gradient (e.g. U=301, S=16 →
19x), the lever that makes long-utterance large-vocab training fit.

Band recursion (t-major, not anti-diagonal): band cell (t, s) is lattice
cell u = ranges[t] + s. The no-emit predecessor lives at band index
s + δ(t) of row t-1 (δ(t) = ranges[t] - ranges[t-1] ∈ [0, S)); the emit
predecessor is (t, s-1) — a chain WITHIN the row, solved in log₂S
vector steps with the prefix trick

    α(t, s) = c(s) + LSE_{j ≤ s} ( ne(j) - c(j) ),   c(s) = Σ_{k<s} lpe(t, k)

(cumulative logsumexp via ``lax.associative_scan``). lpe sentinels are
clamped to a moderate negative so the prefix sums cannot cancel
catastrophically; cells outside the valid lattice are re-masked each step.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import prep as _prep
from .rnnt import _pick_implementation, _run_lattice
from .simple import _factorised_lattice_inputs

NEG = -1e30
_CLAMP = -1e4  # row-chain sentinel: kills paths (e^-1e4 = 0) without
               # destroying f32 precision in the prefix sums


class BandLattice(NamedTuple):
    alphas: jax.Array  # (B, T, S)
    betas: jax.Array   # (B, T, S)
    ll_forward: jax.Array   # (B,)
    ll_backward: jax.Array  # (B,)


# --------------------------------------------------------------------------
# Range construction
# --------------------------------------------------------------------------

def rnnt_prune_ranges(am, lm, labels, input_lengths, label_lengths,
                      s_range: int, blank: int = 0,
                      implementation: str = "auto"):
    """Band starts (B, T) from the simple-joiner lattice posteriors.

    Standalone entry point — runs the factorised lattice itself. Inside a
    training step prefer ``rnnt_loss_simple(..., prune_range=S)``, which
    returns the ranges from the SAME lattice the loss already computed.

    Guarantees: ranges[:, 0] == 0; non-decreasing; steps <= s_range - 1
    (also across the t >= T_b padding, which is held constant);
    ranges[b, t] <= max(0, U_b - s_range).

    The terminal cell (T_b-1, U_b-1) is inside the band whenever a band
    of width ``s_range`` can contain a path at all, i.e. when
    ``U_b - 1 <= T_b * (s_range - 1)``. For shorter utterances no width-S
    band contains any alignment; ``rnnt_loss_pruned`` then returns a huge
    finite cost (~1e30) with zero gradients — raise ``s_range`` for such
    data.
    """
    U = lm.shape[1]
    if int(s_range) < 2:
        raise ValueError(f"s_range must be >= 2, got {s_range}")
    impl = _pick_implementation(implementation)

    labels_u = _prep._pad_labels(labels.astype(jnp.int32), U)
    labels_u = jnp.pad(labels_u, ((0, 0), (0, 1)), constant_values=0)
    lpb, lpe, _, _, _, _ = _factorised_lattice_inputs(
        am, lm, labels_u, int(blank), jax.lax.Precision.DEFAULT
    )
    res = _run_lattice(impl, _prep.PreparedInputs(lpb, lpe, None),
                       input_lengths, label_lengths)
    return ranges_from_posteriors(
        res.alphas, res.betas, res.ll_forward,
        input_lengths, label_lengths, s_range,
    )


def ranges_from_posteriors(alphas, betas, ll, input_lengths, label_lengths,
                           s_range: int):
    """Band starts from precomputed lattice alphas/betas (see
    ``rnnt_prune_ranges`` for the guarantees)."""
    B, T, U = alphas.shape
    S = int(s_range)
    if S < 2:
        raise ValueError(f"s_range must be >= 2, got {S}")
    # posterior mass through each cell
    gamma = alphas + betas - ll[:, None, None]  # (B, T, U)

    Ub = label_lengths.astype(jnp.int32) + 1  # (B,)
    hi = jnp.maximum(Ub - S, 0)[:, None]  # max start (B,1)
    best_u = jnp.argmax(gamma, axis=2).astype(jnp.int32)  # (B, T)
    raw = jnp.clip(best_u - (S - 1) // 2, 0, hi)

    # forward: monotone, jump-limited, start at 0
    def fwd(r_prev, x):
        r = jnp.clip(x, r_prev, r_prev + (S - 1))
        r = jnp.minimum(r, hi[:, 0])
        return r, r

    r0 = jnp.zeros((B,), jnp.int32)
    _, r_fwd = lax.scan(fwd, r0, jnp.moveaxis(raw, 1, 0))
    r_fwd = jnp.moveaxis(r_fwd, 0, 1).at[:, 0].set(0)  # (B, T)

    # force the band to reach the terminal at each utterance's last frame,
    # then sweep backwards so the raise never exceeds the jump limit
    Tb = input_lengths.astype(jnp.int32)
    t_iota = jnp.arange(T, dtype=jnp.int32)[None, :]
    at_end = t_iota == (Tb - 1)[:, None]
    r_fwd = jnp.where(at_end, hi, r_fwd)

    def bwd(r_next, x):
        r = jnp.maximum(x, r_next - (S - 1))
        return r, r

    r_last = r_fwd[:, -1]
    _, r_bwd = lax.scan(bwd, r_last, jnp.moveaxis(r_fwd[:, :-1], 1, 0),
                        reverse=True)
    ranges = jnp.concatenate([jnp.moveaxis(r_bwd, 0, 1), r_last[:, None]], axis=1)
    # The path must start at (0, 0), and the backward raise may have lifted
    # r(0) above 0 (only possible for utterances no width-S band can align);
    # re-run the forward clamp so the monotone/step<=S-1 contract holds
    # unconditionally. Infeasible utterances then simply fail to reach the
    # terminal and get a huge finite cost, never out-of-contract ranges.
    ranges = ranges.at[:, 0].set(0)
    _, r_fix = lax.scan(fwd, jnp.zeros((B,), jnp.int32),
                        jnp.moveaxis(ranges, 1, 0))
    ranges = jnp.moveaxis(r_fix, 0, 1).at[:, 0].set(0)
    # hold the value constant beyond each utterance's last frame so the
    # Tb-1 -> Tb boundary never sees a negative step (the band recursion
    # and gradient read delta at that boundary)
    batch = jnp.arange(B)
    r_end = ranges[batch, jnp.maximum(Tb - 1, 0)]
    ranges = jnp.where(t_iota >= (Tb - 1)[:, None], r_end[:, None], ranges)
    return jnp.clip(ranges, 0, jnp.maximum(Ub - 1, 0)[:, None])


def gather_banded(x_u: jax.Array, ranges: jax.Array, s_range: int) -> jax.Array:
    """Gather per-frame bands from a U-indexed array.

    x_u: (B, U, ...) (e.g. prediction-network outputs), ranges: (B, T).
    Returns (B, T, S, ...): out[b, t, s] = x_u[b, ranges[b, t] + s]
    (clipped at U-1; out-of-range cells are masked inside the loss).

    Differentiable with a custom transpose: the autodiff transpose of a
    gather is a scatter-add, which lowers to a serial per-index loop on
    TPU (measured: +~40 ms on the B=128,T=1500,S=5 pruned north-star).
    The VJP here instead forms the same sum as a batched one-hot
    contraction on the MXU, T-chunked so the (B, Tc·S, U) one-hot stays
    small; duplicate (clipped) indices accumulate exactly as in the
    scatter, only the f32 summation order differs.
    """
    B, U = x_u.shape[0], x_u.shape[1]
    return _gather_banded_vjp(
        x_u, ranges.astype(jnp.int32), int(s_range), int(U),
        tuple(x_u.shape[2:]),
    )


def _band_gather_idx(ranges, S, U):
    return jnp.clip(
        ranges[:, :, None] + jnp.arange(S, dtype=ranges.dtype), 0, U - 1
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _gather_banded_vjp(x_u, ranges, S, U, rest):
    return jax.vmap(lambda xu, ix: xu[ix])(x_u, _band_gather_idx(ranges, S, U))


def _gather_banded_fwd(x_u, ranges, S, U, rest):
    return _gather_banded_vjp(x_u, ranges, S, U, rest), ranges


def _gather_banded_bwd(S, U, rest, res, g):
    ranges = res
    xdt = g.dtype  # the gather does not cast, so cotangent dtype == x dtype
    B, T = ranges.shape
    f32 = jnp.float32
    H = int(np.prod(rest)) if rest else 1
    g3 = g.astype(f32).reshape(B, T, S, H)
    u_iota = jnp.arange(U, dtype=jnp.int32)
    dims = (((1,), (1,)), ((0,), (0,)))  # (B,K,U)^T(K) @ (B,K,H) -> (B,U,H)
    # chunk T so the one-hot operand stays <= ~256 MB (env knob for tests)
    import os as _os
    limit = int(_os.environ.get("WTT_GATHER_BWD_ONEHOT_MB", 256)) << 20
    Tc = max(1, min(T, limit // max(4 * B * S * U, 1)))
    nc = -(-T // Tc)
    # Per-operand precision: the TPU MXU's DEFAULT f32 path rounds inputs
    # to bf16, which would round the COTANGENT itself (~0.2% error measured
    # on v5e) — a scatter transpose must move values exactly. The one-hot
    # operand is exact at any precision (entries are 0/1), so only the g
    # operand pays the multi-pass f32 path.
    prec = (lax.Precision.DEFAULT, lax.Precision.HIGHEST)
    if nc == 1:
        onehot = (_band_gather_idx(ranges, S, U).reshape(B, T * S, 1)
                  == u_iota).astype(f32)
        dx = lax.dot_general(onehot, g3.reshape(B, T * S, H), dims,
                             preferred_element_type=f32, precision=prec)
    else:
        T_pad = nc * Tc
        # padded rows index u=0 but carry zero cotangent -> contribute 0
        rc = jnp.pad(ranges, ((0, 0), (0, T_pad - T)))
        gp = jnp.pad(g3, ((0, 0), (0, T_pad - T), (0, 0), (0, 0)))
        rc = rc.reshape(B, nc, Tc).transpose(1, 0, 2)
        gp = gp.reshape(B, nc, Tc, S, H).transpose(1, 0, 2, 3, 4)

        def step(acc, x):
            rc_i, g_i = x
            onehot = (_band_gather_idx(rc_i, S, U).reshape(B, Tc * S, 1)
                      == u_iota).astype(f32)
            return acc + lax.dot_general(
                onehot, g_i.reshape(B, Tc * S, H), dims,
                preferred_element_type=f32, precision=prec), None

        dx, _ = lax.scan(step, jnp.zeros((B, U, H), f32), (rc, gp))
    dx = dx.reshape((B, U) + rest).astype(xdt)
    return dx, np.zeros(ranges.shape, dtype=jax.dtypes.float0)


_gather_banded_vjp.defvjp(_gather_banded_fwd, _gather_banded_bwd)


# --------------------------------------------------------------------------
# Band lattice recursion
# --------------------------------------------------------------------------

def _cum_lse(x, axis):
    return lax.associative_scan(jnp.logaddexp, x, axis=axis)


def _band_lattice(lpb, lpe, ranges, input_lengths, label_lengths,
                  implementation: str = "xla") -> BandLattice:
    """Fused sweep: scan step k advances alpha on row k AND beta on row
    T-1-k (the stream kernel's trick), halving the sequential-loop
    overhead vs two separate T-step scans.

    ``implementation='pallas'`` dispatches to the single-invocation
    streamed kernel (``pallas/band_stream.py``) that runs the whole
    t-recursion in-kernel — the XLA scan's T dependent dispatches are the
    dominant cost at long T.
    """
    if implementation == "pallas":
        from .pallas import band_stream

        alphas, betas, ll_f, ll_b = band_stream.band_forward_backward(
            lpb, lpe, ranges, input_lengths, label_lengths
        )
        return BandLattice(alphas, betas, ll_f, ll_b)
    B, T, S = lpb.shape
    Tb = input_lengths.astype(jnp.int32)
    Ub = label_lengths.astype(jnp.int32) + 1
    s_iota = jnp.arange(S, dtype=jnp.int32)[None, :]
    delta_a = jnp.diff(ranges, axis=1, prepend=ranges[:, :1])  # δ(t) at t
    delta_b = jnp.diff(ranges, axis=1, append=ranges[:, -1:])  # δ(t+1) at t

    def valid(t, r_t):
        u = r_t[:, None] + s_iota
        return (t < Tb[:, None]) & (u < Ub[:, None])

    def shift_left_by(x, d):
        idx = s_iota + d[:, None]
        ok = (idx >= 0) & (idx < S)
        return jnp.where(ok, jnp.take_along_axis(x, jnp.clip(idx, 0, S - 1), axis=1), NEG)

    def shift_right_by(x, d):
        idx = s_iota - d[:, None]
        ok = (idx >= 0) & (idx < S)
        return jnp.where(ok, jnp.take_along_axis(x, jnp.clip(idx, 0, S - 1), axis=1), NEG)

    def excl_prefix(lpe_c):
        return jnp.pad(jnp.cumsum(lpe_c, axis=1)[:, :-1], ((0, 0), (1, 0)))

    def step(carry, xs):
        a_prev, lpb_prev, b_next = carry
        (ta, lpb_a, lpe_a, da, ra), (tb, lpb_b, lpe_b, db, rb) = xs

        # ---- alpha on row ta (ascending) ----
        ne = shift_left_by(a_prev + lpb_prev, da)
        ne = jnp.where((ta == 0) & (s_iota == 0), 0.0, ne)
        lpe_ca = jnp.maximum(lpe_a, _CLAMP)
        c = excl_prefix(lpe_ca)
        a_t = c + _cum_lse(ne - c, axis=1)
        a_t = jnp.where(valid(ta, ra), a_t, NEG)

        # ---- beta on row tb (descending) ----
        ne_b = shift_right_by(b_next, db) + lpb_b
        u = rb[:, None] + s_iota
        terminal = (tb == (Tb - 1)[:, None]) & (u == (Ub - 1)[:, None])
        ne_b = jnp.where(terminal, lpb_b, ne_b)
        lpe_cb = jnp.maximum(lpe_b, _CLAMP)
        pre = excl_prefix(lpe_cb)
        p = ne_b + pre
        b_t = _cum_lse(p[:, ::-1], axis=1)[:, ::-1] - pre
        b_t = jnp.where(valid(tb, rb), b_t, NEG)

        return (a_t, lpb_a, b_t), (a_t, b_t)

    mv = lambda x: jnp.moveaxis(x, 1, 0)
    ts = jnp.arange(T, dtype=jnp.int32)
    xs_a = (ts, mv(lpb), mv(lpe), mv(delta_a), mv(ranges))
    rev = lambda x: x[::-1]
    xs_b = tuple(rev(x) for x in (ts, mv(lpb), mv(lpe), mv(delta_b), mv(ranges)))
    init = (jnp.full((B, S), NEG), jnp.full((B, S), NEG), jnp.full((B, S), NEG))
    # unroll: the per-step work is tiny ((B,S) vector ops), so the T-step
    # while-loop overhead dominates at long T; unrolling lets XLA fuse 8
    # steps' elementwise work per loop iteration. Gated on T because the
    # 8x-bigger loop body slows compilation with no runtime win at short T.
    unroll = 8 if T >= 512 else 1
    _, (a_rows, b_rows) = lax.scan(step, init, (xs_a, xs_b), unroll=unroll)
    alphas = jnp.moveaxis(a_rows, 0, 1)
    betas = jnp.moveaxis(b_rows[::-1], 0, 1)

    batch = jnp.arange(B)
    t_last = Tb - 1
    s_star = Ub - 1 - ranges[batch, t_last]
    ll_f = (alphas[batch, t_last, jnp.clip(s_star, 0, S - 1)]
            + lpb[batch, t_last, jnp.clip(s_star, 0, S - 1)])
    ll_f = jnp.where((s_star >= 0) & (s_star < S), ll_f, NEG)
    ll_b = betas[:, 0, 0]
    return BandLattice(alphas, betas, ll_f, ll_b)


# --------------------------------------------------------------------------
# Loss + gradient
# --------------------------------------------------------------------------

def _band_prep(acts, labels, ranges, blank):
    """lpb/lpe/denom on the band; labels gathered per (t, s)."""
    B, T, S, V = acts.shape
    x = acts.astype(jnp.float32)
    m = jnp.max(x, axis=-1)
    denom = -(m + jnp.log(jnp.sum(jnp.exp(x - m[..., None]), axis=-1)))
    lpb = x[..., blank] + denom

    # emit defined only below U-1 (and below Ub-1, which the lattice mask
    # enforces)
    lab_band, has_lab = _band_labels(labels, ranges, S)
    v_iota = jnp.arange(V, dtype=jnp.int32)
    sel = v_iota[None, None, None, :] == lab_band[..., None]
    e = jnp.max(jnp.where(sel, x, NEG), axis=-1)
    lpe = jnp.where(has_lab, e + denom, NEG)
    return lpb, lpe, denom, lab_band, has_lab


def _band_coefs(lpb, lpe, lat, ranges, has_lab, input_lengths,
                label_lengths, scale, fastemit_lambda=0.0):
    """The three valid-masked, cotangent-scaled (B, T, S) coefficient
    fields of the band gradient (band twin of gradients.grad_wrt_acts's
    coef/cb/ce). ``fastemit_lambda`` scales the emit coefficient by
    (1 + λ) and folds + λ·ce into the softmax coefficient (FastEmit,
    arXiv:2010.11148). Infeasible utterances (no path inside the band)
    get zero coefficients."""
    B, T, S = lpb.shape
    f32 = jnp.float32
    Tb = input_lengths.astype(jnp.int32)
    Ub = label_lengths.astype(jnp.int32) + 1
    s_iota = jnp.arange(S, dtype=jnp.int32)[None, None, :]
    t_iota = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    u = ranges[:, :, None] + s_iota  # (B, T, S)
    valid = (t_iota < Tb[:, None, None]) & (u < Ub[:, None, None])

    alphas, betas, ll = lat.alphas, lat.betas, lat.ll_forward
    # bshift_u: β(t, u+1) = band (t, s+1)
    bshift_u = jnp.concatenate(
        [betas[:, :, 1:], jnp.full((B, T, 1), NEG)], axis=2
    )
    bshift_u = jnp.where(u + 1 < Ub[:, None, None], bshift_u, NEG)
    # bshift_t: β(t+1, u) = band (t+1, s - δ(t+1)). δ ∈ [0, S), so the
    # per-(b, t) minor-axis shift is an S-way select chain over STATIC
    # rolls — a take_along_axis here is a minor-axis gather, which XLA:TPU
    # lowers catastrophically (measured ~7 ms of the pruned backward at
    # B=128, T=1500, S=5; the select chain is S cheap full passes).
    delta_next = jnp.diff(ranges, axis=1, append=ranges[:, -1:])  # (B, T)
    beta_next = jnp.concatenate(
        [betas[:, 1:, :], jnp.full((B, 1, S), NEG)], axis=1
    )  # β(t+1, ·) at row t
    d3 = delta_next[:, :, None]
    bshift_t = jnp.full_like(beta_next, NEG)
    for d in range(S):
        # out[s] = beta_next[s - d]: right-shift by d, NEG-fill on the left
        sh = jnp.pad(beta_next[:, :, :S - d], ((0, 0), (0, 0), (d, 0)),
                     constant_values=NEG) if d else beta_next
        bshift_t = jnp.where(d3 == d, sh, bshift_t)
    bshift_t = jnp.where(t_iota + 1 < Tb[:, None, None], bshift_t, NEG)
    terminal = (t_iota == (Tb - 1)[:, None, None]) & (u == (Ub - 1)[:, None, None])
    bshift_t = jnp.where(terminal, 0.0, bshift_t)

    a_ll = alphas - ll[:, None, None]
    coef = jnp.where(valid, jnp.exp(a_ll + betas), 0.0)
    cb = jnp.where(valid, jnp.exp(a_ll + lpb + bshift_t), 0.0)
    ce = jnp.where(valid & has_lab, jnp.exp(a_ll + lpe + bshift_u), 0.0)
    if fastemit_lambda:
        lam = jnp.asarray(fastemit_lambda, coef.dtype)
        coef = coef + lam * ce
        ce = ce * (1.0 + lam)
    # infeasible utterances (no path inside the band): ll is the NEG
    # sentinel and the a_ll cancellation is garbage — zero their gradient
    feasible = ll > NEG / 2
    scale = jnp.where(feasible, scale.astype(f32), 0.0)
    sc = scale.astype(f32)[:, None, None]
    return coef * sc, cb * sc, ce * sc, valid


def _band_grad(acts, denom, lpb, lpe, lat, ranges, lab_band, has_lab,
               input_lengths, label_lengths, blank, scale,
               fastemit_lambda=0.0):
    """Dense gradient on the band (one fused elementwise pass).
    ``fastemit_lambda`` scales the emit coefficient by (1 + λ) and folds
    + λ·ce into the softmax coefficient (FastEmit, arXiv:2010.11148)."""
    B, T, S, V = acts.shape
    f32 = jnp.float32
    coef, cb, ce, valid = _band_coefs(
        lpb, lpe, lat, ranges, has_lab, input_lengths, label_lengths,
        scale, fastemit_lambda,
    )

    logp = acts.astype(f32) + denom[..., None]
    probs = jnp.exp(logp)
    v_iota = jnp.arange(V, dtype=jnp.int32)
    is_blank = v_iota[None, None, None, :] == blank
    is_label = v_iota[None, None, None, :] == lab_band[..., None]

    g = coef[..., None] * probs
    g = g - jnp.where(is_blank, cb[..., None], 0.0)
    g = g - jnp.where(is_label, ce[..., None], 0.0)
    g = jnp.where(valid[..., None], g, 0.0)
    return g.astype(acts.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _pruned_costs(acts, ranges, labels, input_lengths, label_lengths, blank,
                  implementation, fastemit_lambda, delay_penalty):
    costs, _ = _pruned_fwd(acts, ranges, labels, input_lengths,
                           label_lengths, blank, implementation,
                           fastemit_lambda, delay_penalty)
    return costs


def _band_labels(labels, ranges, S):
    """(lab_band, has_lab): per-cell label ids and their validity.

    Gather-free: labels[b, ranges[b,t]+s] as an iota-compare masked
    reduction XLA fuses end-to-end. The obvious vmap ``lb[ix]`` emits an
    XLA gather, which lowers so badly on TPU that it dominated the whole
    pruned loss at B=128, T=1500 (label ids < V < 2^24 are f32-exact, so
    the reduce runs in f32 on the VPU)."""
    B, T = ranges.shape
    U_minus_1 = labels.shape[1]
    u_idx = ranges[:, :, None] + jnp.arange(S, dtype=jnp.int32)  # (B,T,S)
    if U_minus_1 == 0:
        return jnp.zeros((B, T, S), jnp.int32), u_idx < 0
    u_iota = jnp.arange(U_minus_1, dtype=jnp.int32)
    onehot = u_idx[..., None] == u_iota  # (B,T,S,U-1), fused into the sum
    lab_f = labels.astype(jnp.float32)[:, None, None, :]
    lab_band = jnp.sum(jnp.where(onehot, lab_f, 0.0), axis=-1)
    return lab_band.astype(jnp.int32), u_idx < U_minus_1


def _pruned_fwd(acts, ranges, labels, input_lengths, label_lengths, blank,
                implementation, fastemit_lambda=0.0, delay_penalty=0.0):
    if implementation == "pallas":
        # all-panels pipeline: no (B, T, S)-layout intermediate ever exists
        from .pallas import band_pipeline

        interpret = jax.default_backend() != "tpu"
        lab_band, has_lab = _band_labels(labels, ranges, acts.shape[2])
        llf, panels = band_pipeline.pruned_forward(
            acts, lab_band, has_lab, ranges.astype(jnp.int32),
            input_lengths, label_lengths, blank, interpret,
            delay_penalty=delay_penalty,
        )
        costs = (-llf).astype(acts.dtype)
        return costs, (acts, panels, ranges, labels,
                       input_lengths, label_lengths)

    lpb, lpe, denom, lab_band, has_lab = _band_prep(acts, labels, ranges, blank)
    if delay_penalty:
        from . import prep as _dp_prep

        lpe = _dp_prep.delay_shift(lpe, input_lengths, delay_penalty)
    lat = _band_lattice(lpb, lpe, ranges, input_lengths, label_lengths,
                        implementation=implementation)
    costs = (-lat.ll_forward).astype(acts.dtype)
    residuals = (acts, ranges, labels, input_lengths, label_lengths,
                 lpb, lpe, denom, lab_band, has_lab, lat)
    return costs, residuals


def _pruned_bwd(blank, implementation, fastemit_lambda, delay_penalty,
                residuals, g):
    def int_zeros(*shapes):
        return tuple(np.zeros(s, dtype=jax.dtypes.float0) for s in shapes)

    if implementation == "pallas":
        from .pallas import band_pipeline

        (acts, panels, ranges, labels,
         input_lengths, label_lengths) = residuals
        interpret = jax.default_backend() != "tpu"
        d_acts = band_pipeline.pruned_backward(acts, panels, g, blank,
                                               interpret,
                                               fastemit_lambda=fastemit_lambda)
        return (d_acts,) + int_zeros(
            ranges.shape, labels.shape, input_lengths.shape,
            label_lengths.shape
        )

    (acts, ranges, labels, input_lengths, label_lengths,
     lpb, lpe, denom, lab_band, has_lab, lat) = residuals
    d_acts = _band_grad(acts, denom, lpb, lpe, lat, ranges, lab_band, has_lab,
                        input_lengths, label_lengths, blank, g,
                        fastemit_lambda=fastemit_lambda)
    return (d_acts,) + int_zeros(
        ranges.shape, labels.shape, input_lengths.shape, label_lengths.shape
    )


_pruned_costs.defvjp(_pruned_fwd, _pruned_bwd)


def rnnt_loss_pruned(
    acts: jax.Array,
    ranges: jax.Array,
    labels: jax.Array,
    input_lengths: jax.Array,
    label_lengths: jax.Array,
    blank: int = 0,
    reduction: str = "mean",
    implementation: str = "auto",
    fastemit_lambda: float = 0.0,
    delay_penalty: float = 0.0,
) -> jax.Array:
    """Transducer loss restricted to a pruned band of the lattice.

    Args:
      acts: (B, T, S, V) joint logits on the band (raw; log-softmax fused):
        ``acts[b, t, s]`` is the joint at lattice cell (t, ranges[b,t]+s).
      ranges: (B, T) int32 band starts from ``rnnt_prune_ranges``
        (monotone, steps < S, ranges[:,0]==0, terminal covered).
      labels / lengths / blank / reduction: as in ``rnnt_loss``.
      implementation: 'auto' | 'xla' | 'pallas' — the band recursion
        engine ('pallas' = single-invocation streamed kernel, the long-T
        fast path; 'auto' picks it on TPU).
      fastemit_lambda: FastEmit strength λ (arXiv:2010.11148): scales the
        emit-arc gradient by (1 + λ); the loss value is unchanged.
      delay_penalty: delay-penalized transducer strength (arXiv:2211.00490):
        emit arcs at frame t get + λ·((T_b-1)/2 - t) on their log-weight
        (changes the objective, exactly differentiable).

    Returns the negative log-likelihood over band-internal paths; equals
    ``rnnt_loss`` exactly when the band covers the whole lattice.
    Differentiable w.r.t. acts (lazy backward, one fused band pass).
    """
    if reduction not in ("none", "sum", "mean"):
        raise ValueError(f"reduction must be none|sum|mean, got {reduction!r}")
    if acts.ndim != 4:
        raise ValueError(f"acts must be (B, T, S, V); got {acts.shape}")
    if ranges.shape != acts.shape[:2]:
        raise ValueError(
            f"ranges must be (B, T) = {acts.shape[:2]}; got {ranges.shape}"
        )
    if fastemit_lambda < 0:
        raise ValueError(f"fastemit_lambda must be >= 0, got {fastemit_lambda}")
    if delay_penalty < 0:
        raise ValueError(f"delay_penalty must be >= 0, got {delay_penalty}")
    impl = _pick_implementation(implementation)
    costs = _pruned_costs(acts, ranges.astype(jnp.int32), labels,
                          input_lengths, label_lengths, int(blank), impl,
                          float(fastemit_lambda), float(delay_penalty))
    if reduction == "sum":
        return jnp.sum(costs)
    if reduction == "mean":
        return jnp.mean(costs)
    return costs
