"""Viterbi forced alignment over the RNN-T lattice.

A capability the reference never had: the most-likely monotonic alignment
between an utterance and its transcript — the max-plus (tropical) analog of
the forward recursion the loss uses (same wavefront structure as
``ops/lattice.py``, ``logaddexp`` replaced by ``maximum``), followed by a
backtrace over the (T, U) decision lattice.

At each lattice cell the path either consumes a frame (blank, t+1) or emits
the next label (u+1); the returned alignment is, per utterance, the label
index emitted at each frame boundary — encoded as ``emit_at[t] = number of
labels emitted while at frame t`` is ragged, so instead we return the
standard dense form: for each of the N = T+U-1 path steps, whether it was
an emit (1) or a frame advance (0), plus the frame index at which each
label was emitted.

All shapes are static; runs under jit on TPU/CPU.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import prep as _prep
from .lattice import skew


class ViterbiAlignment(NamedTuple):
    score: jax.Array        # (B,) log-prob of the best path
    emit_frames: jax.Array  # (B, U-1) int32: frame index where label u was
                            # emitted (padded with -1 beyond label_lengths)
    path: jax.Array         # (B, N) int32: 1 = emit, 0 = frame advance,
                            # -1 = beyond the utterance's path length


def _viterbi_alphas(lpb, lpe, input_lengths, label_lengths):
    """Max-plus forward pass in diagonal layout. Returns (B, N, U) alphas."""
    B, T, U = lpb.shape
    N = T + U - 1
    dtype = lpb.dtype
    neg = jnp.asarray(-jnp.inf, dtype)

    Tb = input_lengths.astype(jnp.int32)
    Ub = label_lengths.astype(jnp.int32) + 1
    u_iota = jnp.arange(U, dtype=jnp.int32)[None, :]

    lpb_d = skew(lpb)
    lpe_d = skew(lpe)

    def valid_mask(n):
        t = n - u_iota
        return (t >= 0) & (t < Tb[:, None]) & (u_iota < Ub[:, None])

    a0 = jnp.full((B, U), neg).at[:, 0].set(jnp.zeros((), dtype))

    def step(a_prev, xs):
        n, lpb_prev, lpe_prev = xs
        no_emit = a_prev + lpb_prev
        emit = jnp.concatenate(
            [jnp.full((B, 1), neg), (a_prev + lpe_prev)[:, :-1]], axis=1
        )
        a_n = jnp.where(valid_mask(n), jnp.maximum(no_emit, emit), neg)
        return a_n, a_n

    ns = jnp.arange(1, N, dtype=jnp.int32)
    _, a_rest = lax.scan(step, a0, (ns, lpb_d[: N - 1], lpe_d[: N - 1]))
    return jnp.concatenate([a0[None], a_rest], axis=0).transpose(1, 0, 2)  # (B, N, U)


def rnnt_viterbi_align(
    acts, labels, input_lengths, label_lengths, blank=0, log_probs_input=False,
) -> ViterbiAlignment:
    """Best monotonic alignment of each utterance to its transcript.

    Args mirror ``rnnt_loss``. Returns a ``ViterbiAlignment``; ``score`` is
    the log-probability of the single best path (≤ the total log-likelihood
    the loss integrates over all paths).
    """
    B, T, U, V = acts.shape
    cdtype = jnp.float64 if acts.dtype == jnp.float64 else jnp.float32
    prepped = _prep.prepare(acts, labels, int(blank), bool(log_probs_input),
                            compute_dtype=cdtype)
    lpb, lpe = prepped.lpb, prepped.lpe
    N = T + U - 1

    alphas_d = _viterbi_alphas(lpb, lpe, input_lengths, label_lengths)  # (B, N, U)

    Tb = input_lengths.astype(jnp.int32)
    Ub = label_lengths.astype(jnp.int32) + 1
    batch = jnp.arange(B)
    final_lpb = lpb[batch, Tb - 1, Ub - 1]
    score = alphas_d[batch, Tb + Ub - 2, Ub - 1] + final_lpb

    # Backtrace from (T_b-1, U_b-1) down to (0, 0): at cell (t, u) on
    # diagonal n the predecessor was either (t-1, u) [frame advance] or
    # (t, u-1) [emit]. N-1 static steps; finished utterances idle on u=0.
    def back_step(carry, k):
        u, t = carry  # (B,) current cell, walking n = t+u downward
        n = t + u
        active = n > 0
        # predecessor scores (−inf when out of range)
        a_no_emit = jnp.where(
            t - 1 >= 0,
            alphas_d[batch, jnp.maximum(n - 1, 0), u]
            + lpb[batch, jnp.maximum(t - 1, 0), u],
            -jnp.inf,
        )
        a_emit = jnp.where(
            u - 1 >= 0,
            alphas_d[batch, jnp.maximum(n - 1, 0), jnp.maximum(u - 1, 0)]
            + lpe[batch, t, jnp.maximum(u - 1, 0)],
            -jnp.inf,
        )
        took_emit = active & (a_emit >= a_no_emit)
        u_next = jnp.where(took_emit, u - 1, u)
        t_next = jnp.where(active & ~took_emit, t - 1, t)
        # record: step n-1 of the path (0-indexed from the start)
        rec = jnp.where(active, took_emit.astype(jnp.int32), -1)
        return (u_next, t_next), (rec, n - 1, jnp.where(took_emit, u - 1, -1), t)

    (u_end, t_end), (recs, ns, emitted_u, frames) = lax.scan(
        back_step, (Ub - 1, Tb - 1), jnp.arange(N - 1)
    )
    # recs[k] is the decision taken entering step ns[k]; scatter into (B, N).
    # Inactive steps (ns < 0) are routed to index N, which mode="drop"
    # discards — they must not clobber legitimate writes at index 0.
    path = jnp.full((B, N), -1, jnp.int32)
    idx = jnp.where(ns >= 0, ns, N)  # (N-1, B)
    path = path.at[batch[None, :], idx].set(recs, mode="drop")
    # frame at which each label u was emitted
    emit_frames = jnp.full((B, U - 1), -1, jnp.int32) if U > 1 else jnp.zeros((B, 0), jnp.int32)
    if U > 1:
        uu = jnp.where(emitted_u >= 0, emitted_u, U - 1)  # (N-1, B)
        emit_frames = emit_frames.at[batch[None, :], uu].set(
            jnp.where(emitted_u >= 0, frames, -1), mode="drop"
        )
    return ViterbiAlignment(score=score.astype(acts.dtype), emit_frames=emit_frames, path=path)


class TDTViterbiAlignment(NamedTuple):
    score: jax.Array           # (B,) log-prob of the best path
    emit_frames: jax.Array     # (B, U-1) int32: frame where label u was
                               # emitted (-1 beyond label_lengths)
    emit_durations: jax.Array  # (B, U-1) int32: duration chosen by that
                               # emission (-1 beyond label_lengths)


def tdt_viterbi_align(
    token_logits, duration_logits, labels, input_lengths, label_lengths,
    durations, blank=0, sigma=0.0,
) -> TDTViterbiAlignment:
    """Best TDT alignment: the max-plus analog of ``rnnt_loss_tdt``'s
    recursion (``ops/tdt.py``) plus a backtrace that recovers, for every
    emitted label, the frame it was emitted at and the duration the
    duration head assigned it — the forced-alignment tool for TDT models
    (durations are part of the path, unlike the standard transducer).

    Args mirror ``rnnt_loss_tdt``. ``score`` is the log-probability of the
    single best path (<= -rnnt_loss_tdt, which integrates over all paths).
    """
    from .tdt import _check_durations, _tdt_prep

    durs = _check_durations(durations)
    B, T, U, V = token_logits.shape
    D = len(durs)
    cdtype = (jnp.float64 if token_logits.dtype == jnp.float64
              else jnp.float32)
    lpb, lpe, lpd, _, _ = _tdt_prep(token_logits, duration_logits, labels,
                                    int(blank), sigma, cdtype)
    neg = jnp.asarray(-jnp.inf, cdtype)
    lpe = jnp.where(lpe < -1e29, neg, lpe)  # exact -inf for max-plus
    Tb = input_lengths.astype(jnp.int32)
    Ub = label_lengths.astype(jnp.int32) + 1
    batch = jnp.arange(B)
    u_iota = jnp.arange(U, dtype=jnp.int32)[None, :]
    has0 = 0 in durs
    j0 = durs.index(0) if has0 else -1
    W = max(durs)

    # ---- max-plus forward (the LSE scan of ops/tdt.py with max) ----------
    def valid(t):
        return (t < Tb[:, None]) & (u_iota < Ub[:, None])

    def step(P, xs):
        t, lpb_t, lpe_t, lpd_t = xs
        ne = P[:, 0]
        ne = jnp.where((t == 0) & (u_iota == 0), 0.0, ne)
        if has0:
            w = lpe_t + lpd_t[..., j0]
            c = jnp.cumsum(jnp.where(jnp.isfinite(w), w, -1e9), axis=1)
            c = jnp.pad(c[:, :-1], ((0, 0), (1, 0)))
            v_t = c + lax.associative_scan(jnp.maximum, ne - c, axis=1)
        else:
            v_t = ne
        v_t = jnp.where(valid(t), v_t, neg)
        P = jnp.concatenate([P[:, 1:], jnp.full((B, 1, U), neg, cdtype)],
                            axis=1)
        for j, d in enumerate(durs):
            if d < 1:
                continue
            dep = jnp.maximum(
                v_t + lpb_t + lpd_t[..., j],
                jnp.concatenate([jnp.full((B, 1), neg, cdtype),
                                 (v_t + lpe_t + lpd_t[..., j])[:, :-1]],
                                axis=1))
            P = P.at[:, d - 1].set(jnp.maximum(P[:, d - 1], dep))
        return P, v_t

    mv = lambda x: jnp.moveaxis(x, 1, 0)
    ts = jnp.arange(T, dtype=jnp.int32)[:, None, None]
    init = jnp.full((B, W, U), neg, cdtype)
    _, v_rows = lax.scan(step, init, (ts, mv(lpb), mv(lpe), mv(lpd)))
    v = jnp.moveaxis(v_rows, 0, 1)  # (B, T, U)

    # terminal arcs: score and the backtrace start cell in one sweep
    u_star = jnp.clip(Ub - 1, 0, U - 1)
    score = jnp.full((B,), neg, cdtype)
    final_t = jnp.zeros((B,), jnp.int32)
    for j, d in enumerate(durs):
        if d < 1:
            continue
        tk = jnp.clip(Tb - d, 0, T - 1)
        cand = jnp.where(Tb - d >= 0,
                         v[batch, tk, u_star] + lpb[batch, tk, u_star]
                         + lpd[batch, tk, u_star, j], neg)
        final_t = jnp.where(cand > score, tk, final_t)
        score = jnp.maximum(score, cand)

    # ---- backtrace --------------------------------------------------------
    # Start from the best final blank arc, then repeatedly pick the argmax
    # incoming arc of the current cell. <= T + U steps; finished utterances
    # idle at (0, 0).

    Um1 = max(U - 1, 1)
    ef0 = jnp.full((B, Um1), -1, jnp.int32)
    ed0 = jnp.full((B, Um1), -1, jnp.int32)

    def back(carry, _):
        t, u, ef, ed = carry
        active = (t > 0) | (u > 0)
        best_s = jnp.full((B,), neg, cdtype)
        best_tok = jnp.zeros((B,), bool)
        best_t = jnp.zeros((B,), jnp.int32)
        best_d = jnp.zeros((B,), jnp.int32)
        for j, d in enumerate(durs):
            tp = t - d
            ok_t = tp >= 0
            tpc = jnp.clip(tp, 0, T - 1)
            # token arc from (t-d, u-1)
            upc = jnp.clip(u - 1, 0, U - 1)
            s_tok = jnp.where(
                ok_t & (u - 1 >= 0),
                v[batch, tpc, upc] + lpe[batch, tpc, upc]
                + lpd[batch, tpc, upc, j], neg)
            upd = s_tok > best_s
            best_s = jnp.maximum(best_s, s_tok)
            best_tok = jnp.where(upd, True, best_tok)
            best_t = jnp.where(upd, tpc, best_t)
            best_d = jnp.where(upd, d, best_d)
            # blank arc from (t-d, u), d >= 1
            if d >= 1:
                s_bl = jnp.where(
                    ok_t, v[batch, tpc, jnp.clip(u, 0, U - 1)]
                    + lpb[batch, tpc, jnp.clip(u, 0, U - 1)]
                    + lpd[batch, tpc, jnp.clip(u, 0, U - 1), j], neg)
                upd = s_bl > best_s
                best_s = jnp.maximum(best_s, s_bl)
                best_tok = jnp.where(upd, False, best_tok)
                best_t = jnp.where(upd, tpc, best_t)
                best_d = jnp.where(upd, d, best_d)
        took_tok = active & best_tok
        if U > 1:
            lab_u = jnp.clip(u - 1, 0, Um1 - 1)
            sel = (jnp.arange(Um1)[None, :] == lab_u[:, None]) \
                & took_tok[:, None]
            ef = jnp.where(sel, best_t[:, None], ef)
            ed = jnp.where(sel, best_d[:, None], ed)
        t = jnp.where(active, best_t, t)
        u = jnp.where(took_tok, u - 1, u)
        return (t, u, ef, ed), None

    (t_end, u_end, ef, ed), _ = lax.scan(
        back, (final_t, u_star, ef0, ed0), None, length=T + U)
    if U == 1:
        ef = jnp.zeros((B, 0), jnp.int32)
        ed = jnp.zeros((B, 0), jnp.int32)
    return TDTViterbiAlignment(
        score=score.astype(token_logits.dtype), emit_frames=ef,
        emit_durations=ed)


class MultiblankViterbiAlignment(NamedTuple):
    score: jax.Array        # (B,) log-prob of the best path
    emit_frames: jax.Array  # (B, U-1) int32: frame where label u was
                            # emitted (-1 beyond label_lengths)
    path: jax.Array         # (B, N) int32 — NOTE: encoding differs from
                            # ViterbiAlignment.path: 0 = emit, m >= 1 =
                            # blank advancing m frames, -1 = padding


def multiblank_viterbi_align(
    acts, labels, input_lengths, label_lengths, big_blank_durations,
    blank=0, big_blank_indices=None, sigma=0.0,
) -> MultiblankViterbiAlignment:
    """Best multi-blank alignment (arXiv 2211.03541): the max-plus analog
    of ``rnnt_loss_multiblank``'s recursion plus a backtrace. Returns a
    ``MultiblankViterbiAlignment`` — its ``path`` records, per step, the
    frames that step consumed ({0 = emit, m >= 1 = blank advancing m
    frames, -1 = padding}); this deliberately differs from the dense
    ``ViterbiAlignment.path`` encoding ({1 = emit, 0 = advance}), which
    cannot express multi-frame blanks.

    Args mirror ``rnnt_loss_multiblank``.
    """
    from .multiblank import _multiblank_prep, _resolve_indices

    B, T, U, V = acts.shape
    durs, idx = _resolve_indices(V, int(blank), big_blank_durations,
                                 big_blank_indices)
    K = len(durs)
    cdtype = jnp.float64 if acts.dtype == jnp.float64 else jnp.float32
    lpb, lpe, lpB, _, _ = _multiblank_prep(acts, labels, int(blank), idx,
                                           sigma, cdtype)
    neg = jnp.asarray(-jnp.inf, cdtype)
    lpe = jnp.where(lpe < -1e29, neg, lpe)
    Tb = input_lengths.astype(jnp.int32)
    Ub = label_lengths.astype(jnp.int32) + 1
    batch = jnp.arange(B)
    u_iota = jnp.arange(U, dtype=jnp.int32)[None, :]
    W = max(durs) if K else 1
    all_durs = (1,) + durs  # blank arc families: standard then big blanks

    def arc_w(lpb_t, lpB_t, j):
        return lpb_t if j == 0 else lpB_t[..., j - 1]

    def valid(t):
        return (t < Tb[:, None]) & (u_iota < Ub[:, None])

    def step(P, xs):
        t, lpb_t, lpe_t, lpB_t = xs
        ne = P[:, 0]
        ne = jnp.where((t == 0) & (u_iota == 0), 0.0, ne)
        c = jnp.cumsum(jnp.where(jnp.isfinite(lpe_t), lpe_t, -1e9), axis=1)
        c = jnp.pad(c[:, :-1], ((0, 0), (1, 0)))
        v_t = c + lax.associative_scan(jnp.maximum, ne - c, axis=1)
        v_t = jnp.where(valid(t), v_t, neg)
        P = jnp.concatenate([P[:, 1:], jnp.full((B, 1, U), neg, cdtype)],
                            axis=1)
        for j, m in enumerate(all_durs):
            P = P.at[:, m - 1].set(
                jnp.maximum(P[:, m - 1], v_t + arc_w(lpb_t, lpB_t, j)))
        return P, v_t

    mv = lambda x: jnp.moveaxis(x, 1, 0)
    ts = jnp.arange(T, dtype=jnp.int32)[:, None, None]
    init = jnp.full((B, W, U), neg, cdtype)
    _, v_rows = lax.scan(step, init, (ts, mv(lpb), mv(lpe), mv(lpB)))
    v = jnp.moveaxis(v_rows, 0, 1)

    u_star = jnp.clip(Ub - 1, 0, U - 1)
    score = jnp.full((B,), neg, cdtype)
    final_t = jnp.zeros((B,), jnp.int32)
    for j, m in enumerate(all_durs):
        tk = jnp.clip(Tb - m, 0, T - 1)
        w = (lpb if j == 0 else lpB[..., j - 1])[batch, tk, u_star]
        cand = jnp.where(Tb - m >= 0, v[batch, tk, u_star] + w, neg)
        final_t = jnp.where(cand > score, tk, final_t)
        score = jnp.maximum(score, cand)

    N = T + U - 1
    Um1 = max(U - 1, 1)
    path0 = jnp.full((B, N), -1, jnp.int32)
    ef0 = jnp.full((B, Um1), -1, jnp.int32)

    def back(carry, _):
        t, u, k, path, ef = carry  # k = step counter from the path END
        active = (t > 0) | (u > 0)
        best_s = jnp.full((B,), neg, cdtype)
        best_adv = jnp.zeros((B,), jnp.int32)  # 0 = emit
        best_t = jnp.zeros((B,), jnp.int32)
        # emit arc from (t, u-1)
        upc = jnp.clip(u - 1, 0, U - 1)
        s_e = jnp.where(u - 1 >= 0,
                        v[batch, t, upc] + lpe[batch, t, upc], neg)
        upd = s_e > best_s
        best_s = jnp.maximum(best_s, s_e)
        best_t = jnp.where(upd, t, best_t)
        for j, m in enumerate(all_durs):
            tp = t - m
            tpc = jnp.clip(tp, 0, T - 1)
            w = (lpb if j == 0 else lpB[..., j - 1])[batch, tpc, u]
            s_b = jnp.where(tp >= 0, v[batch, tpc, u] + w, neg)
            upd = s_b > best_s
            best_s = jnp.maximum(best_s, s_b)
            best_adv = jnp.where(upd, m, best_adv)
            best_t = jnp.where(upd, tpc, best_t)
        took_emit = active & (best_adv == 0)
        # record at slot k from the end; inactive -> index N (dropped)
        slot = jnp.where(active, k, N)
        path = path.at[batch, slot].set(
            jnp.where(active, best_adv, -1), mode="drop")
        if U > 1:
            lab_u = jnp.clip(u - 1, 0, Um1 - 1)
            sel = (jnp.arange(Um1)[None, :] == lab_u[:, None]) \
                & took_emit[:, None]
            ef = jnp.where(sel, t[:, None], ef)
        t = jnp.where(active & ~took_emit, best_t, t)
        u = jnp.where(took_emit, u - 1, u)
        k = jnp.where(active, k + 1, k)
        return (t, u, k, path, ef), None

    # the terminal blank arc (source = final_t) consumes the remaining
    # Tb - final_t frames; record it as the path's last step (slot 0 from
    # the end), then backtrace the rest
    path0 = path0.at[batch, 0].set(Tb - final_t)
    k0 = jnp.ones((B,), jnp.int32)
    (t_e, u_e, k_e, path_rev, ef), _ = lax.scan(
        back, (final_t, u_star, k0, path0, ef0), None, length=N)
    # path_rev[k] is the k-th step counted from the END; flip per utterance
    # without a lane-axis gather (playbook rule): one-hot contraction over
    # the tiny (B, N, N) selector; step codes are small ints, exact in f32
    pos = jnp.arange(N, dtype=jnp.int32)
    src = k_e[:, None] - 1 - pos[None, :]  # (B, N)
    onehot = (src[:, :, None] == pos[None, None, :]).astype(jnp.float32)
    flipped = jnp.einsum("bjk,bk->bj", onehot,
                         path_rev.astype(jnp.float32)).astype(jnp.int32)
    path = jnp.where(src >= 0, flipped, -1)
    if U == 1:
        ef = jnp.zeros((B, 0), jnp.int32)
    return MultiblankViterbiAlignment(score=score.astype(acts.dtype),
                                      emit_frames=ef, path=path)
