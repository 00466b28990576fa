"""Analytic RNN-T gradients, computed during the forward pass.

Two conventions, matching the reference's two backends:

* ``grad_wrt_acts`` — dense gradient w.r.t. *raw* activations with the
  log-softmax fused into the loss (the reference GPU convention,
  ``/root/reference/include/detail/gpu_rnnt_kernel.h:143-179`` and the
  closed form in ``docs/rnnt_notes.tex:119-146``).
* ``grad_wrt_log_probs`` — sparse gradient w.r.t. already-log-softmaxed
  inputs, non-zero only at blank/label entries (the reference CPU
  convention, ``/root/reference/include/detail/cpu_rnnt.h:253-267``).

Both are single fused element-wise passes over (B, T, U, V) in XLA — the
TPU analog of ``compute_grad_kernel``'s one-block-per-cell sweep.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


def _beta_shifts(betas, alphas, input_lengths, label_lengths):
    """Build the two shifted beta terms used by both conventions.

    Returns (bshift_t, bshift_u) of shape (B, T, U):
      bshift_t[t,u] = betas[t+1,u] for t < T_b-1,
                      0            at the terminal cell (T_b-1, U_b-1),
                      -inf         elsewhere (no blank transition).
      bshift_u[t,u] = betas[t,u+1] for u < U_b-1, else -inf.
    """
    B, T, U = betas.shape
    dtype = betas.dtype
    neg = jnp.asarray(NEG_INF, dtype)
    Tb = input_lengths.astype(jnp.int32)[:, None, None]
    Ub = (label_lengths.astype(jnp.int32) + 1)[:, None, None]
    t_iota = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    u_iota = jnp.arange(U, dtype=jnp.int32)[None, None, :]

    bshift_t = jnp.concatenate([betas[:, 1:, :], jnp.full((B, 1, U), neg)], axis=1)
    bshift_t = jnp.where(t_iota < Tb - 1, bshift_t, neg)
    terminal = (t_iota == Tb - 1) & (u_iota == Ub - 1)
    bshift_t = jnp.where(terminal, jnp.zeros((), dtype), bshift_t)

    bshift_u = jnp.concatenate([betas[:, :, 1:], jnp.full((B, T, 1), neg)], axis=2)
    bshift_u = jnp.where(u_iota < Ub - 1, bshift_u, neg)
    return bshift_t, bshift_u


def _valid_cells(shape, input_lengths, label_lengths):
    B, T, U = shape
    Tb = input_lengths.astype(jnp.int32)[:, None, None]
    Ub = (label_lengths.astype(jnp.int32) + 1)[:, None, None]
    t_iota = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    u_iota = jnp.arange(U, dtype=jnp.int32)[None, None, :]
    return (t_iota < Tb) & (u_iota < Ub)


def grad_wrt_acts(
    acts, denom, lpb, lpe, alphas, betas, ll, labels_u,
    input_lengths, label_lengths, blank, out_dtype=None, scale=None,
    fastemit_lambda=0.0,
):
    """Dense d(cost)/d(acts), cost = -ll, log-softmax fused.

    grad[b,t,u,v] = exp(a+b-ll) * p(v)
                  - [v == blank]  * exp(a + lpb - ll + bshift_t)
                  - [v == y_u]    * exp(a + lpe - ll + bshift_u)

    ``scale`` ((B,) or None) folds an upstream cotangent into the small
    (B, T, U) coefficients so the big (B, T, U, V) pass needs no extra
    multiply — this is how the lazy backward rescales at zero cost.

    ``fastemit_lambda`` applies FastEmit (arXiv:2010.11148) at the same
    zero cost: the emit coefficient ce is scaled by (1 + λ) and the
    softmax coefficient — which is exactly cb + ce — picks up + λ·ce.
    """
    B, T, U, V = acts.shape
    dtype = alphas.dtype
    out_dtype = out_dtype or acts.dtype
    bshift_t, bshift_u = _beta_shifts(betas, alphas, input_lengths, label_lengths)
    valid = _valid_cells((B, T, U), input_lengths, label_lengths)

    a_ll = alphas - ll[:, None, None]
    coef = jnp.where(valid, jnp.exp(a_ll + betas), 0.0).astype(dtype)
    cb = jnp.where(valid, jnp.exp(a_ll + lpb + bshift_t), 0.0)
    ce = jnp.where(valid, jnp.exp(a_ll + lpe + bshift_u), 0.0)
    if fastemit_lambda:
        lam = jnp.asarray(fastemit_lambda, dtype)
        coef = coef + lam * ce
        ce = ce * (1.0 + lam)
    if scale is not None:
        s = scale.astype(dtype)[:, None, None]
        coef, cb, ce = coef * s, cb * s, ce * s

    # One fused element-wise pass over (B, T, U, V).
    logp = acts.astype(dtype) + denom[..., None]
    probs = jnp.exp(logp)
    v_iota = jnp.arange(V, dtype=jnp.int32)
    is_blank = v_iota[None, None, None, :] == blank
    is_label = v_iota[None, None, None, :] == labels_u[:, None, :, None]

    g = coef[..., None] * probs
    g = g - jnp.where(is_blank, cb[..., None], 0.0)
    g = g - jnp.where(is_label, ce[..., None], 0.0)
    g = jnp.where(valid[..., None], g, 0.0)
    return g.astype(out_dtype)


def grad_wrt_log_probs(
    lpb, lpe, alphas, betas, ll, labels_u,
    input_lengths, label_lengths, blank, shape_v, out_dtype, scale=None,
    fastemit_lambda=0.0,
):
    """Sparse d(cost)/d(log_probs): non-zero at blank and label entries only.

    Mirrors cpu_rnnt.h:253-267 including its write order: the label entry is
    written after the blank entry, so a label equal to ``blank`` overwrites.
    ``scale`` folds an upstream cotangent in, as in ``grad_wrt_acts``.
    ``fastemit_lambda`` scales the emit entries by (1 + λ) (FastEmit).
    """
    B, T, U = lpb.shape
    V = shape_v
    bshift_t, bshift_u = _beta_shifts(betas, alphas, input_lengths, label_lengths)
    valid = _valid_cells((B, T, U), input_lengths, label_lengths)

    a_ll = alphas - ll[:, None, None]
    gb = jnp.where(valid, -jnp.exp(a_ll + lpb + bshift_t), 0.0)
    ge = jnp.where(valid, -jnp.exp(a_ll + lpe + bshift_u), 0.0)
    if fastemit_lambda:
        ge = ge * (1.0 + jnp.asarray(fastemit_lambda, ge.dtype))
    if scale is not None:
        s = scale.astype(gb.dtype)[:, None, None]
        gb, ge = gb * s, ge * s
    has_label = valid & (
        jnp.arange(U, dtype=jnp.int32)[None, None, :]
        < (label_lengths.astype(jnp.int32)[:, None, None])
    )

    v_iota = jnp.arange(V, dtype=jnp.int32)
    is_blank = v_iota[None, None, None, :] == blank
    is_label = (v_iota[None, None, None, :] == labels_u[:, None, :, None]) & has_label[..., None]

    g = jnp.where(is_blank, gb[..., None], 0.0)
    g = jnp.where(is_label, ge[..., None], g)
    return g.astype(out_dtype)
