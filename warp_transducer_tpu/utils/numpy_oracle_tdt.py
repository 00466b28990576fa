"""Plain-NumPy Token-and-Duration Transducer (TDT) loss oracle.

Test-only oracle for the TDT loss (Xu et al., arXiv:2304.06795): the joint
network outputs TWO heads per lattice cell — token logits over V and
duration logits over a small duration set (e.g. (0, 1, 2, 3, 4)). Every
emission carries a duration d: a token emission moves (t, u) -> (t+d, u+1),
a blank emission moves (t, u) -> (t+d, u). Durations let the model skip
frames, cutting decode steps like multi-blank but with the duration chosen
by a separate, shared predictor instead of per-symbol big blanks.

Semantics implemented here (and matched by ``ops/tdt.py``):

* token arcs may use d = 0 (emit several labels on one frame, the standard
  transducer's vertical moves); blank arcs require d >= 1 (no self-loop);
* interior arcs must land on a frame (t + d <= T-1); the path TERMINATES
  with a blank arc that consumes the remaining frames EXACTLY
  (t + d == T, u == U-1) — the duration-generalisation of the standard
  final-blank convention (Graves 2012);
* both heads are independently log-softmaxed; ``sigma`` (the TDT paper's
  logit under-normalization) shifts the TOKEN log-probs only.

Loss = -log sum over complete paths of prod(token prob * duration prob).
"""
from __future__ import annotations

import numpy as np

from .numpy_oracle import log_softmax

NEG_INF = -np.inf


def _lse(*xs):
    out = NEG_INF
    for x in xs:
        out = np.logaddexp(out, x)
    return out


def tdt_single(lp_tok, lp_dur, labels, durations, blank=0,
               delay_penalty=0.0):
    """Lattice state for one utterance.

    lp_tok: (T, U, V) token log-probs (already softmaxed + sigma-shifted).
    lp_dur: (T, U, D) duration log-probs, column j <-> durations[j].
    """
    T, U, V = lp_tok.shape
    durs = list(durations)
    lpb = lp_tok[:, :, blank].astype(np.float64)
    lpe = np.full((T, U), NEG_INF, dtype=np.float64)
    if U > 1:
        lpe[:, : U - 1] = np.take_along_axis(
            lp_tok[:, : U - 1, :], np.asarray(labels)[None, :, None], axis=2
        )[:, :, 0]
    if delay_penalty:
        shift = delay_penalty * ((T - 1) / 2.0 - np.arange(T, dtype=np.float64))
        lpe = lpe + shift[:, None]
    lpd = lp_dur.astype(np.float64)

    # Row-vectorized sweeps (see numpy_oracle._alphas): the only IN-ROW
    # arc is the d = 0 token arc, so each row is a vectorized vertical-arc
    # logaddexp over all d >= 1 arcs followed by a logaddexp.accumulate
    # scan along u with the d = 0 emit weight.
    j0 = durs.index(0) if 0 in durs else None
    a = np.full((T, U), NEG_INF, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        for t in range(T):
            vert = np.full(U, NEG_INF)
            if t == 0:
                vert[0] = 0.0
            for j, d in enumerate(durs):
                if d >= 1 and t - d >= 0:
                    vert = np.logaddexp(
                        vert, a[t - d] + lpb[t - d] + lpd[t - d, :, j])
                    if U > 1:
                        vert[1:] = np.logaddexp(
                            vert[1:], a[t - d, : U - 1] + lpe[t - d, : U - 1]
                            + lpd[t - d, : U - 1, j])
            if j0 is not None and U > 1:
                e0 = np.maximum(lpe[t, : U - 1] + lpd[t, : U - 1, j0], -1e15)
                cumd = np.concatenate(([0.0], np.cumsum(e0)))
                a[t] = np.logaddexp.accumulate(vert - cumd) + cumd
            else:
                a[t] = vert

    ll_fwd = NEG_INF
    for j, d in enumerate(durs):
        if d >= 1 and T - d >= 0:
            ll_fwd = np.logaddexp(
                ll_fwd, a[T - d, U - 1] + lpb[T - d, U - 1]
                + lpd[T - d, U - 1, j])

    b = np.full((T, U), NEG_INF, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        for t in range(T - 1, -1, -1):
            vert = np.full(U, NEG_INF)
            for j, d in enumerate(durs):
                if d >= 1 and t + d == T:
                    vert[U - 1] = np.logaddexp(
                        vert[U - 1], lpb[t, U - 1] + lpd[t, U - 1, j])
                if d >= 1 and t + d <= T - 1:
                    vert = np.logaddexp(
                        vert, lpb[t] + lpd[t, :, j] + b[t + d])
                    if U > 1:
                        vert[: U - 1] = np.logaddexp(
                            vert[: U - 1], lpe[t, : U - 1]
                            + lpd[t, : U - 1, j] + b[t + d, 1:])
            if j0 is not None and U > 1:
                e0 = np.maximum(lpe[t, : U - 1] + lpd[t, : U - 1, j0], -1e15)
                S = np.concatenate((np.cumsum(e0[::-1])[::-1], [0.0]))
                b[t] = np.logaddexp.accumulate((vert - S)[::-1])[::-1] + S
            else:
                b[t] = vert
    return dict(alphas=a, betas=b, ll_fwd=ll_fwd, ll_bwd=b[0, 0],
                lpb=lpb, lpe=lpe, lpd=lpd)


def tdt_grads(token_logits, duration_logits, labels, durations, blank=0,
              sigma=0.0, fastemit_lambda=0.0, delay_penalty=0.0):
    """(cost, d cost/d token_logits, d cost/d duration_logits), both heads'
    log-softmax fused. Every arc carries exactly one token factor and one
    duration factor, so both heads share the per-cell occupation
    W = exp(alpha + beta - ll) as their softmax coefficient:
    g_head = p_head * W - (per-class arc posterior). FastEmit scales the
    token-emit posterior by (1 + lambda) in the token head (and in W for
    both heads, keeping each a proper softmax-minus-targets form)."""
    T, U, V = token_logits.shape
    D = duration_logits.shape[-1]
    durs = list(durations)
    lam = float(fastemit_lambda)
    lp_tok = log_softmax(token_logits) - sigma
    lp_dur = log_softmax(duration_logits)
    st = tdt_single(lp_tok, lp_dur, labels, durs, blank=blank,
                    delay_penalty=delay_penalty)
    a, b, ll = st["alphas"], st["betas"], st["ll_fwd"]
    if np.isneginf(ll):
        # no duration combination consumes the frames exactly: infeasible
        # utterance. Convention (shared with the pruned loss and the JAX /
        # native engines): huge finite cost, zero gradients.
        return 1e30, np.zeros((T, U, V)), np.zeros((T, U, D))
    lpb, lpe, lpd = st["lpb"], st["lpe"], st["lpd"]

    # per-arc posteriors
    post_tok = np.zeros((T, U, V), dtype=np.float64)  # token-class posterior
    post_dur = np.zeros((T, U, D), dtype=np.float64)  # duration-class posterior
    ce = np.zeros((T, U), dtype=np.float64)           # total token-emit posterior
    for j, d in enumerate(durs):
        if U > 1 and d <= T - 1:
            p = np.zeros((T, U - 1), dtype=np.float64)
            p[: T - d] = np.exp(a[: T - d, : U - 1] + lpe[: T - d, : U - 1]
                                + lpd[: T - d, : U - 1, j]
                                + b[d:, 1:] - ll)
            post_tok[:, np.arange(U - 1), np.asarray(labels)] += (1.0 + lam) * p
            post_dur[:, : U - 1, j] += (1.0 + lam) * p
            ce[:, : U - 1] += p
        if d >= 1:
            pb = np.zeros((T, U), dtype=np.float64)
            if d <= T - 1:
                pb[: T - d] = np.exp(a[: T - d] + lpb[: T - d]
                                     + lpd[: T - d, :, j] + b[d:] - ll)
            if d <= T:
                pb[T - d, U - 1] += np.exp(
                    a[T - d, U - 1] + lpb[T - d, U - 1] + lpd[T - d, U - 1, j]
                    - ll)
            post_tok[:, :, blank] += pb
            post_dur[:, :, j] += pb

    w = np.exp(a + b - ll) + lam * ce  # (T, U)
    g_tok = w[:, :, None] * np.exp(log_softmax(token_logits)) - post_tok
    g_dur = w[:, :, None] * np.exp(lp_dur) - post_dur
    return -ll, g_tok, g_dur


def tdt_batch(token_logits, duration_logits, labels, input_lengths,
              label_lengths, durations, blank=0, sigma=0.0,
              fastemit_lambda=0.0, delay_penalty=0.0):
    """Batched oracle over padded (B, T, U, V) / (B, T, U, D) raw logits."""
    tok = np.asarray(token_logits, dtype=np.float64)
    dur = np.asarray(duration_logits, dtype=np.float64)
    B, T, U, V = tok.shape
    costs = np.zeros((B,), dtype=np.float64)
    g_tok = np.zeros_like(tok)
    g_dur = np.zeros_like(dur)
    for i in range(B):
        t = int(input_lengths[i])
        u = int(label_lengths[i]) + 1
        lab = np.asarray(labels[i][: u - 1], dtype=np.int64)
        c, gt, gd = tdt_grads(
            tok[i, :t, :u], dur[i, :t, :u], lab, tuple(durations),
            blank=blank, sigma=sigma, fastemit_lambda=fastemit_lambda,
            delay_penalty=delay_penalty)
        costs[i] = c
        g_tok[i, :t, :u] = gt
        g_dur[i, :t, :u] = gd
    return costs, g_tok, g_dur
