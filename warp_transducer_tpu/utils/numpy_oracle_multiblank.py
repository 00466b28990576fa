"""Plain-NumPy multi-blank RNN-Transducer loss oracle.

Test-only correctness oracle for the multi-blank transducer
(Xu et al., arXiv:2211.03541): besides the standard blank (which advances
one frame), the vocabulary carries K "big blank" symbols; emitting big
blank k advances t by its duration m_k >= 2 while keeping u. Big blanks
let the model skip silence/steady frames, cutting decode steps.

Semantics implemented (and matched by ``ops/multiblank.py``):

* alpha(t, u) = LSE( alpha(t-1, u)   + lpb(t-1, u),
                     alpha(t, u-1)   + lpe(t, u-1),
                     alpha(t-m_k, u) + lpB_k(t-m_k, u)  for each k with
                                                        t - m_k >= 0 )
* the path terminates by emitting any blank whose duration consumes the
  remaining frames EXACTLY: ll = LSE( alpha(T-1, U-1) + lpb(T-1, U-1),
  { alpha(T-m_k, U-1) + lpB_k(T-m_k, U-1) | m_k <= T } ).
* ``sigma`` is the paper's logit under-normalization: every log-prob is
  log_softmax(acts) - sigma, so paths with FEWER emissions (more big
  blanks) are penalized less — the training pressure toward big blanks.

There is no reference-library counterpart (the reference computes only
the standard transducer); the oracle exists so the JAX engine has an
independent loop-based spec, like ``numpy_oracle.py`` for the dense loss.
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


def multiblank_single(log_probs, labels, durations, big_blank_indices,
                      blank=0, delay_penalty=0.0):
    """Lattice state for one utterance.

    Args:
      log_probs: (T, U, V) log-probs (already log-softmaxed and
        sigma-shifted by the caller).
      labels: (U-1,) int labels.
      durations: tuple of K big-blank durations (each >= 2).
      big_blank_indices: tuple of K vocab indices, aligned with durations.
    """
    T, U, V = log_probs.shape
    K = len(durations)
    lpb = log_probs[:, :, blank].astype(np.float64)
    lpB = np.stack(
        [log_probs[:, :, big_blank_indices[k]] for k in range(K)], axis=0
    ).astype(np.float64) if K else np.zeros((0, T, U))
    lpe = np.full((T, U), NEG_INF, dtype=np.float64)
    if U > 1:
        lpe[:, : U - 1] = np.take_along_axis(
            log_probs[:, : U - 1, :], np.asarray(labels)[None, :, None], axis=2
        )[:, :, 0]
    if delay_penalty:
        shift = delay_penalty * ((T - 1) / 2.0 - np.arange(T, dtype=np.float64))
        lpe = lpe + shift[:, None]

    a = np.full((T, U), NEG_INF, dtype=np.float64)
    a[0, 0] = 0.0
    for t in range(T):
        for u in range(U):
            if t == 0 and u == 0:
                continue
            terms = []
            if t > 0:
                terms.append(a[t - 1, u] + lpb[t - 1, u])
            if u > 0:
                terms.append(a[t, u - 1] + lpe[t, u - 1])
            for k, m in enumerate(durations):
                if t - m >= 0:
                    terms.append(a[t - m, u] + lpB[k, t - m, u])
            a[t, u] = _lse(*terms) if terms else NEG_INF

    ll_fwd = a[T - 1, U - 1] + lpb[T - 1, U - 1]
    for k, m in enumerate(durations):
        if m <= T:
            ll_fwd = np.logaddexp(ll_fwd, a[T - m, U - 1] + lpB[k, T - m, U - 1])

    b = np.full((T, U), NEG_INF, dtype=np.float64)
    for t in range(T - 1, -1, -1):
        for u in range(U - 1, -1, -1):
            terms = []
            if u == U - 1:
                if t == T - 1:
                    terms.append(lpb[t, u])
                for k, m in enumerate(durations):
                    if t + m == T:
                        terms.append(lpB[k, t, u])
            if t < T - 1:
                terms.append(lpb[t, u] + b[t + 1, u])
            if u < U - 1:
                terms.append(lpe[t, u] + b[t, u + 1])
            for k, m in enumerate(durations):
                if t + m <= T - 1:
                    terms.append(lpB[k, t, u] + b[t + m, u])
            b[t, u] = _lse(*terms) if terms else NEG_INF
    return dict(alphas=a, betas=b, ll_fwd=ll_fwd, ll_bwd=b[0, 0],
                lpb=lpb, lpe=lpe, lpB=lpB)


def multiblank_grad_wrt_acts(acts, labels, durations, big_blank_indices,
                             blank=0, sigma=0.0, fastemit_lambda=0.0,
                             delay_penalty=0.0):
    """(cost, dense d cost/d acts) with log-softmax (and sigma) fused.

    Gradient form: g(t,u,v) = p(v)·W(t,u) − Σ_arcs [v == sym]·post_arc,
    where W = exp(α+β−ll) = Σ_arcs post_arc (β is the LSE over outgoing
    arcs), p = softmax(acts) — the σ shift is constant w.r.t. acts so the
    softmax Jacobian is unchanged. FastEmit scales the emit posterior by
    (1+λ) everywhere it appears.
    """
    T, U, V = acts.shape
    K = len(durations)
    lam = float(fastemit_lambda)
    lp = log_softmax(acts) - sigma
    st = multiblank_single(lp, labels, durations, big_blank_indices,
                           blank=blank, delay_penalty=delay_penalty)
    a, b, ll = st["alphas"], st["betas"], st["ll_fwd"]
    lpb, lpe, lpB = st["lpb"], st["lpe"], st["lpB"]
    probs = np.exp(log_softmax(acts))

    ce = np.zeros((T, U), dtype=np.float64)
    for t in range(T):
        for u in range(U - 1):
            ce[t, u] = np.exp(a[t, u] + lpe[t, u] + b[t, u + 1] - ll)
    w = np.exp(a + b - ll) + lam * ce
    g = w[:, :, None] * probs
    for t in range(T):
        for u in range(U):
            if t < T - 1:
                g[t, u, blank] -= np.exp(a[t, u] + lpb[t, u] + b[t + 1, u] - ll)
            if u < U - 1:
                g[t, u, labels[u]] -= (1.0 + lam) * ce[t, u]
            for k, m in enumerate(durations):
                if t + m <= T - 1:
                    g[t, u, big_blank_indices[k]] -= np.exp(
                        a[t, u] + lpB[k, t, u] + b[t + m, u] - ll
                    )
    g[T - 1, U - 1, blank] -= np.exp(a[T - 1, U - 1] + lpb[T - 1, U - 1] - ll)
    for k, m in enumerate(durations):
        if m <= T:
            g[T - m, U - 1, big_blank_indices[k]] -= np.exp(
                a[T - m, U - 1] + lpB[k, T - m, U - 1] - ll
            )
    return -ll, g


def multiblank_batch(acts, labels, input_lengths, label_lengths, durations,
                     big_blank_indices=None, blank=0, sigma=0.0,
                     fastemit_lambda=0.0, delay_penalty=0.0):
    """Batched oracle over padded (B, T, U, V) raw activations.

    ``big_blank_indices`` defaults to the LAST K vocabulary entries
    (V-K .. V-1), the library convention."""
    acts = np.asarray(acts, dtype=np.float64)
    B, T, U, V = acts.shape
    K = len(durations)
    if big_blank_indices is None:
        big_blank_indices = tuple(range(V - K, V))
    costs = np.zeros((B,), dtype=np.float64)
    grads = np.zeros_like(acts)
    for i in range(B):
        t = int(input_lengths[i])
        u = int(label_lengths[i]) + 1
        sub = acts[i, :t, :u, :]
        lab = np.asarray(labels[i][: u - 1], dtype=np.int64)
        c, g = multiblank_grad_wrt_acts(
            sub, lab, tuple(durations), tuple(big_blank_indices),
            blank=blank, sigma=sigma, fastemit_lambda=fastemit_lambda,
            delay_penalty=delay_penalty,
        )
        costs[i] = c
        grads[i, :t, :u, :] = g
    return costs, grads
