"""Plain-NumPy RNN-Transducer loss oracle.

This is the test-only correctness oracle for the TPU-native engines: a
maximally simple, loop-based implementation of the RNN-T forward-backward
recursion (Graves 2012, arXiv:1211.3711) and both gradient conventions that
the reference library exposes:

* gradient w.r.t. *log-probabilities* — the reference CPU backend convention
  (``/root/reference/include/detail/cpu_rnnt.h:216-270``): non-zero only at
  the blank column and the per-row label column.
* gradient w.r.t. *raw activations* with the log-softmax fused into the loss
  — the reference GPU backend convention
  (``/root/reference/include/detail/gpu_rnnt_kernel.h:143-179``): dense over
  the alphabet.

It mirrors the *math* of the reference's own NumPy oracle
(``/root/reference/pytorch_binding/test/transducer_np.py``) but is written
independently (float64 accumulation, explicit conventions, length handling in
one place).  Used only by tests; never on the hot path.
"""
from __future__ import annotations

import numpy as np

NEG_INF = -np.inf


def log_softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    m = np.max(x, axis=axis, keepdims=True)
    s = x - m
    return s - np.log(np.sum(np.exp(s), axis=axis, keepdims=True))


def _alphas(lpb: np.ndarray, lpe: np.ndarray) -> tuple[np.ndarray, float]:
    """Forward lattice. lpb/lpe are (T, U) blank/emit log-prob caches.

    Row-vectorized: within row t the recursion
    ``a[t,u] = logaddexp(a[t-1,u] + lpb[t-1,u], a[t,u-1] + lpe[t,u-1])``
    is a first-order linear recurrence whose closed form is
    ``a[t,u] = cumd[u] + logcumsumexp_k(c[k] - cumd[k])`` with
    ``c = a[t-1] + lpb[t-1]`` and ``cumd`` the running sum of emit
    log-probs — one ``np.logaddexp.accumulate`` per row instead of a
    Python u-loop (the oracle's cost dominated the cold test gate).
    """
    T, U = lpb.shape
    a = np.full((T, U), NEG_INF, dtype=np.float64)
    a[0, :] = np.concatenate(([0.0], np.cumsum(lpe[0, : U - 1])))
    for t in range(1, T):
        c = a[t - 1] + lpb[t - 1]
        cumd = np.concatenate(([0.0], np.cumsum(lpe[t, : U - 1])))
        a[t] = np.logaddexp.accumulate(c - cumd) + cumd
    return a, a[T - 1, U - 1] + lpb[T - 1, U - 1]


def _betas(lpb: np.ndarray, lpe: np.ndarray) -> tuple[np.ndarray, float]:
    """Backward lattice (same row-vectorization as ``_alphas``, with
    suffix sums: ``b[t,u] = S[u] + logcumsumexp_{v>=u}(c[v] - S[v])``,
    ``c = b[t+1] + lpb[t]``, ``S[u] = sum_{j>=u} lpe[t,j]``)."""
    T, U = lpb.shape
    b = np.full((T, U), NEG_INF, dtype=np.float64)
    b[T - 1] = (np.concatenate((np.cumsum(lpe[T - 1, : U - 1][::-1])[::-1], [0.0]))
                + lpb[T - 1, U - 1])
    for t in range(T - 2, -1, -1):
        c = b[t + 1] + lpb[t]
        S = np.concatenate((np.cumsum(lpe[t, : U - 1][::-1])[::-1], [0.0]))
        b[t] = np.logaddexp.accumulate((c - S)[::-1])[::-1] + S
    return b, b[0, 0]


def rnnt_single(log_probs: np.ndarray, labels: np.ndarray, blank: int = 0,
                delay_penalty: float = 0.0):
    """Loss internals for one utterance.

    Args:
      log_probs: (T, U, V) already log-softmaxed joint outputs.
      labels: (U-1,) int label sequence.
      delay_penalty: λ of the delay-penalized transducer
        (arXiv:2211.00490): every emit arc at frame t gets
        + λ·((T-1)/2 - t) added to its log-weight, rewarding earlier
        emissions. Changes the OBJECTIVE (loss and gradients together,
        exactly differentiable), unlike FastEmit which is gradient-only.

    Returns:
      dict with alphas, betas, ll_fwd, ll_bwd, lpb, lpe (lpe shifted).
    """
    T, U, V = log_probs.shape
    lpb = log_probs[:, :, blank].astype(np.float64)
    lpe = np.full((T, U), NEG_INF, dtype=np.float64)
    if U > 1:
        lpe[:, : U - 1] = np.take_along_axis(
            log_probs[:, : U - 1, :], np.asarray(labels)[None, :, None], axis=2
        )[:, :, 0]
    if delay_penalty:
        shift = delay_penalty * ((T - 1) / 2.0 - np.arange(T, dtype=np.float64))
        lpe = lpe + shift[:, None]
    alphas, ll_fwd = _alphas(lpb, lpe)
    betas, ll_bwd = _betas(lpb, lpe)
    return dict(alphas=alphas, betas=betas, ll_fwd=ll_fwd, ll_bwd=ll_bwd, lpb=lpb, lpe=lpe)


def grad_wrt_log_probs(log_probs, labels, blank=0, fastemit_lambda=0.0,
                       delay_penalty=0.0):
    """Sparse gradient of cost = -ll w.r.t. the log-prob inputs.

    Matches the reference CPU convention (cpu_rnnt.h:253-267): only the blank
    column and label entries receive gradient. ``fastemit_lambda`` applies the
    FastEmit regularization (Yu et al., arXiv:2010.11148): the emit-arc
    gradient is scaled by (1 + λ), the blank arc is untouched.
    """
    T, U, V = log_probs.shape
    st = rnnt_single(log_probs, labels, blank, delay_penalty=delay_penalty)
    a, b, ll = st["alphas"], st["betas"], st["ll_fwd"]
    lpb, lpe = st["lpb"], st["lpe"]
    lam1 = 1.0 + float(fastemit_lambda)
    g = np.zeros((T, U, V), dtype=np.float64)
    gb = np.zeros((T, U), dtype=np.float64)
    gb[: T - 1] = -np.exp(lpb[: T - 1] + a[: T - 1] + b[1:] - ll)
    gb[T - 1, U - 1] = -np.exp(lpb[T - 1, U - 1] + a[T - 1, U - 1] - ll)
    g[:, :, blank] = gb
    if U > 1:
        # Label entries written AFTER the blank column, so a label equal to
        # blank overwrites — the reference CPU write order (cpu_rnnt.h:253-267).
        ge = -lam1 * np.exp(lpe[:, : U - 1] + a[:, : U - 1] + b[:, 1:] - ll)
        g[:, np.arange(U - 1), np.asarray(labels)] = ge
    return -st["ll_fwd"], g


def grad_wrt_acts(acts, labels, blank=0, fastemit_lambda=0.0,
                  delay_penalty=0.0):
    """Dense gradient of cost = -ll w.r.t. raw activations (fused log-softmax).

    Matches the reference GPU convention (gpu_rnnt_kernel.h:143-179).
    ``fastemit_lambda`` applies FastEmit (arXiv:2010.11148): the emit-arc
    posterior ce is scaled by (1 + λ) both in the sparse label term and in
    the per-cell softmax coefficient (which is exactly cb + ce), so the
    modified gradient stays a proper softmax-minus-targets form.
    """
    T, U, V = acts.shape
    lam = float(fastemit_lambda)
    lp = log_softmax(acts)
    st = rnnt_single(lp, labels, blank, delay_penalty=delay_penalty)
    a, b, ll = st["alphas"], st["betas"], st["ll_fwd"]
    lpe_s = st["lpe"]  # includes the delay shift
    probs = np.exp(lp)
    ce = np.zeros((T, U), dtype=np.float64)
    if U > 1:
        ce[:, : U - 1] = np.exp(a[:, : U - 1] + lpe_s[:, : U - 1] + b[:, 1:] - ll)
    w = np.exp(a + b - ll) + lam * ce
    g = w[:, :, None] * probs
    cb = np.zeros((T, U), dtype=np.float64)
    cb[: T - 1] = np.exp(a[: T - 1] + lp[: T - 1, :, blank] + b[1:] - ll)
    cb[T - 1, U - 1] = np.exp(a[T - 1, U - 1] + lp[T - 1, U - 1, blank] - ll)
    g[:, :, blank] -= cb
    if U > 1:
        g[:, np.arange(U - 1), np.asarray(labels)] -= (1.0 + lam) * ce[:, : U - 1]
    return -st["ll_fwd"], g


def rnnt_batch(acts, labels, input_lengths, label_lengths, blank=0,
               from_log_probs=False, fastemit_lambda=0.0,
               delay_penalty=0.0):
    """Batched oracle over padded (B, T, U, V) inputs.

    Returns (costs[B], grads[B,T,U,V]) with grads following the convention
    implied by ``from_log_probs`` (sparse log-prob grads when True, dense raw
    activation grads when False).
    """
    acts = np.asarray(acts, dtype=np.float64)
    B, T, U, V = acts.shape
    costs = np.zeros((B,), dtype=np.float64)
    grads = np.zeros_like(acts)
    for i in range(B):
        t = int(input_lengths[i])
        u = int(label_lengths[i]) + 1
        sub = acts[i, :t, :u, :]
        lab = np.asarray(labels[i][: u - 1], dtype=np.int64)
        if from_log_probs:
            c, g = grad_wrt_log_probs(sub, lab, blank,
                                      fastemit_lambda=fastemit_lambda,
                                      delay_penalty=delay_penalty)
        else:
            c, g = grad_wrt_acts(sub, lab, blank,
                                 fastemit_lambda=fastemit_lambda,
                                 delay_penalty=delay_penalty)
        costs[i] = c
        grads[i, :t, :u, :] = g
    return costs, grads
