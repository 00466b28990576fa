"""Memory-lean "simple" RNN-T loss: joint = am ⊕ lm, no (B,T,U,V) tensor.

For the additive joiner ``logit[b,t,u,v] = am[b,t,v] + lm[b,u,v]`` (the
"trivial joint" of pruned-transducer training, Kuang et al., arXiv
2206.13236), every per-cell quantity the lattice needs factorises:

  logZ[t,u] = logsumexp_v(am[t]+lm[u])
            = Ma[t] + Ml[u] + log( (e^{am-Ma}) · (e^{lm-Ml})^T )[t,u]

— a single MXU matmul replaces the O(T·U·V) reduction, and the full joint
tensor is NEVER materialised: peak memory is O((T+U)·V + T·U) per
utterance instead of O(T·U·V). The gradients w.r.t. am and lm are the
u-/t-marginals of the dense gradient and also reduce to matmuls:

  d cost/d am[t,v] = A[t,v] ⊙ (W·B)[t,v] - [v=∅] Σ_u cb - (ce·onehot)[t,v]
  d cost/d lm[u,v] = B[u,v] ⊙ (Wᵀ·A)[u,v] - [v=∅] Σ_t cb - onehot ⊙ Σ_t ce

with W = coef / S (S the normalizer matmul), coef/cb/ce the same small
(B,T,U) coefficient fields the dense gradient uses (gradients.py).

This makes headline-scale large-vocabulary training possible on a single
chip where the dense loss cannot even allocate its gradient (e.g.
B=128,T=150,U=21,V=5000 f32: dense acts+grads = 16.1 GB > HBM; here
~1.7 GB). It is also stage 1 of pruned-transducer training.

Numerical caveat: the normalizer matmul underflows only if the am and lm
rows are simultaneously peaked (>~85 nats of dynamic range) on different
labels; S is clamped to a tiny floor.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import lattice as _lattice
from . import prep as _prep
from .gradients import _beta_shifts, _valid_cells
from .rnnt import _pick_implementation, _run_lattice

NEG_INF = -jnp.inf
_S_FLOOR = 1e-30


def _factorised_lattice_inputs(am, lm, labels_u, blank, precision):
    """Returns (lpb, lpe, S, A, Bm, onehot): the (B,T,U) blank/label caches,
    the raw normalizer matmul S (logZ = Ma + Ml + log S), the row-max
    exponentials A = e^{am-Ma} / Bm = e^{lm-Ml}, and the label one-hot."""
    B, T, V = am.shape
    U = lm.shape[1]
    f32 = jnp.float32
    am32, lm32 = am.astype(f32), lm.astype(f32)

    Ma = jnp.max(am32, axis=-1)  # (B, T)
    Ml = jnp.max(lm32, axis=-1)  # (B, U)
    A = jnp.exp(am32 - Ma[..., None])  # (B, T, V)
    Bm = jnp.exp(lm32 - Ml[..., None])  # (B, U, V)
    S = jnp.maximum(
        jnp.einsum("btv,buv->btu", A, Bm, precision=precision), _S_FLOOR
    )
    logZ = Ma[:, :, None] + Ml[:, None, :] + jnp.log(S)  # (B, T, U)

    lpb = am32[..., blank][:, :, None] + lm32[..., blank][:, None, :] - logZ

    onehot = jax.nn.one_hot(labels_u, V, dtype=f32)  # (B, U, V), col U-1 junk
    am_y = jnp.einsum("btv,buv->btu", am32, onehot,
                      precision=jax.lax.Precision.HIGHEST)
    lm_y = jnp.einsum("buv,buv->bu", lm32, onehot,
                      precision=jax.lax.Precision.HIGHEST)
    u_iota = jnp.arange(U)[None, None, :]
    lpe = jnp.where(u_iota == U - 1, NEG_INF, am_y + lm_y[:, None, :] - logZ)
    return lpb, lpe, S, A, Bm, onehot


def _coefs(lpb, lpe, alphas, betas, ll, input_lengths, label_lengths, scale,
           fastemit_lambda=0.0):
    """The three (B,T,U) gradient coefficient fields (cf. gradients.py).
    ``fastemit_lambda`` scales the emit coefficient by (1 + λ) and folds
    + λ·ce into the softmax coefficient (FastEmit, arXiv:2010.11148)."""
    valid = _valid_cells(lpb.shape, input_lengths, label_lengths)
    bshift_t, bshift_u = _beta_shifts(betas, alphas, input_lengths, label_lengths)
    a_ll = alphas - ll[:, None, None]
    coef = jnp.where(valid, jnp.exp(a_ll + betas), 0.0)
    cb = jnp.where(valid, jnp.exp(a_ll + lpb + bshift_t), 0.0)
    ce = jnp.where(valid, jnp.exp(a_ll + lpe + bshift_u), 0.0)
    if fastemit_lambda:
        lam = jnp.asarray(fastemit_lambda, coef.dtype)
        coef = coef + lam * ce
        ce = ce * (1.0 + lam)
    s = scale[:, None, None]
    return coef * s, cb * s, ce * s


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _simple_costs(am, lm, labels, input_lengths, label_lengths,
                  blank, implementation, precision, fastemit_lambda,
                  delay_penalty):
    # primal-only path (scoring under plain jit): alphas only, no betas
    U = lm.shape[1]
    labels_u = _prep._pad_labels(labels.astype(jnp.int32), U)
    labels_u = jnp.pad(labels_u, ((0, 0), (0, 1)), constant_values=0)
    lpb, lpe, _, _, _, _ = _factorised_lattice_inputs(
        am, lm, labels_u, blank, precision
    )
    if delay_penalty:
        lpe = _prep.delay_shift(lpe, input_lengths, delay_penalty)
    res = _run_lattice(implementation, _prep.PreparedInputs(lpb, lpe, None),
                       input_lengths, label_lengths, compute_betas=False)
    return (-res.ll_forward).astype(am.dtype)


def _simple_fwd(am, lm, labels, input_lengths, label_lengths,
                blank, implementation, precision, fastemit_lambda=0.0,
                delay_penalty=0.0):
    U = lm.shape[1]
    labels_u = _prep._pad_labels(labels.astype(jnp.int32), U)
    labels_u = jnp.pad(labels_u, ((0, 0), (0, 1)), constant_values=0)  # (B, U)
    lpb, lpe, S, A, Bm, onehot = _factorised_lattice_inputs(
        am, lm, labels_u, blank, precision
    )
    if delay_penalty:
        lpe = _prep.delay_shift(lpe, input_lengths, delay_penalty)
    res = _run_lattice(implementation, _prep.PreparedInputs(lpb, lpe, None),
                       input_lengths, label_lengths)
    costs = (-res.ll_forward).astype(am.dtype)
    residuals = (am, lm, labels, input_lengths, label_lengths,
                 lpb, lpe, S, res.alphas, res.betas, res.ll_forward)
    return costs, residuals


def _simple_bwd(blank, implementation, precision, fastemit_lambda,
                delay_penalty, residuals, g):
    (am, lm, labels, input_lengths, label_lengths,
     lpb, lpe, S, alphas, betas, ll) = residuals
    B, T, V = am.shape
    U = lm.shape[1]
    f32 = jnp.float32
    am32, lm32 = am.astype(f32), lm.astype(f32)

    # Recompute the cheap factorised pieces (O((T+U)V), no big tensors).
    Ma = jnp.max(am32, axis=-1)
    Ml = jnp.max(lm32, axis=-1)
    A = jnp.exp(am32 - Ma[..., None])
    Bm = jnp.exp(lm32 - Ml[..., None])
    labels_u = _prep._pad_labels(labels.astype(jnp.int32), U)
    labels_u = jnp.pad(labels_u, ((0, 0), (0, 1)), constant_values=0)
    onehot = jax.nn.one_hot(labels_u, V, dtype=f32)
    u_iota = jnp.arange(U)[None, :]
    has_label = u_iota < label_lengths.astype(jnp.int32)[:, None]  # (B, U)
    onehot = onehot * has_label[..., None]

    coef, cb, ce = _coefs(lpb, lpe, alphas.astype(f32), betas.astype(f32),
                          ll.astype(f32), input_lengths, label_lengths,
                          g.astype(f32), fastemit_lambda=fastemit_lambda)
    W = coef / S  # (B, T, U)

    dam = A * jnp.einsum("btu,buv->btv", W, Bm, precision=precision)
    dam = dam.at[..., blank].add(-jnp.sum(cb, axis=2))
    dam = dam - jnp.einsum("btu,buv->btv", ce, onehot,
                           precision=jax.lax.Precision.HIGHEST)

    dlm = Bm * jnp.einsum("btu,btv->buv", W, A, precision=precision)
    dlm = dlm.at[..., blank].add(-jnp.sum(cb, axis=1))
    dlm = dlm - onehot * jnp.sum(ce, axis=1)[..., None]

    def int_zero(x):
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    return (dam.astype(am.dtype), dlm.astype(lm.dtype), int_zero(labels),
            int_zero(input_lengths), int_zero(label_lengths))


_simple_costs.defvjp(_simple_fwd, _simple_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _simple_costs_with_ranges(am, lm, labels, input_lengths, label_lengths,
                              blank, implementation, precision, s_range,
                              fastemit_lambda, delay_penalty):
    (costs, ranges), _ = _simple_ranges_fwd(
        am, lm, labels, input_lengths, label_lengths,
        blank, implementation, precision, s_range, fastemit_lambda,
        delay_penalty,
    )
    return costs, ranges


def _simple_ranges_fwd(am, lm, labels, input_lengths, label_lengths,
                       blank, implementation, precision, s_range,
                       fastemit_lambda=0.0, delay_penalty=0.0):
    costs, residuals = _simple_fwd(am, lm, labels, input_lengths,
                                   label_lengths, blank, implementation,
                                   precision, delay_penalty=delay_penalty)
    # pruning band from the SAME lattice the loss just computed (the
    # alphas/betas sit in the residuals) — no second forward-backward
    from .pruned import ranges_from_posteriors

    alphas, betas, ll = residuals[8], residuals[9], residuals[10]
    ranges = ranges_from_posteriors(
        alphas, betas, ll, input_lengths, label_lengths, s_range
    )
    return (costs, ranges), residuals


def _simple_ranges_bwd(blank, implementation, precision, s_range,
                       fastemit_lambda, delay_penalty, residuals, g):
    g_costs, _g_ranges = g  # ranges are int32: float0 cotangent, ignored
    return _simple_bwd(blank, implementation, precision, fastemit_lambda,
                       delay_penalty, residuals, g_costs)


_simple_costs_with_ranges.defvjp(_simple_ranges_fwd, _simple_ranges_bwd)


def rnnt_loss_simple(
    am: jax.Array,
    lm: jax.Array,
    labels: jax.Array,
    input_lengths: jax.Array,
    label_lengths: jax.Array,
    blank: int = 0,
    reduction: str = "mean",
    implementation: str = "auto",
    precision=jax.lax.Precision.HIGHEST,
    prune_range: int | None = None,
    fastemit_lambda: float = 0.0,
    delay_penalty: float = 0.0,
) -> jax.Array:
    """RNN-T loss for the additive joiner, without the (B,T,U,V) tensor.

    Args:
      am: (B, T, V) encoder ("acoustic model") logits.
      lm: (B, U, V) prediction-network ("language model") logits, U = L+1.
      labels / input_lengths / label_lengths / blank / reduction: as in
        ``rnnt_loss``.
      precision: matmul precision for the normalizer/gradient contractions
        (HIGHEST ≈ exact f32; DEFAULT trades ~1e-3 relative error for
        speed on very large V).
      prune_range: when set, ALSO return the (B, T) pruning band starts
        (``rnnt_prune_ranges`` semantics) computed from the same lattice —
        return value becomes ``(loss, ranges)``.
      fastemit_lambda: FastEmit strength λ (arXiv:2010.11148): scales the
        emit-arc gradient by (1 + λ); the loss value is unchanged.
      delay_penalty: delay-penalized transducer strength (arXiv:2211.00490):
        emit arcs at frame t get + λ·((T_b-1)/2 - t) on their log-weight
        (changes the objective, exactly differentiable).

    Exactly equals ``rnnt_loss(am[:,:,None,:] + lm[:,None,:,:], ...)`` —
    same lattice, same math — but with O((T+U)·V) instead of O(T·U·V)
    memory, so large-vocabulary configs that cannot even allocate the dense
    gradient train on a single chip. Differentiable w.r.t. am and lm.
    """
    if reduction not in ("none", "sum", "mean"):
        raise ValueError(f"reduction must be none|sum|mean, got {reduction!r}")
    if am.ndim != 3 or lm.ndim != 3:
        raise ValueError(
            f"am must be (B, T, V) and lm (B, U, V); got {am.shape}, {lm.shape}"
        )
    if am.shape[0] != lm.shape[0] or am.shape[2] != lm.shape[2]:
        raise ValueError(f"am/lm batch or vocab mismatch: {am.shape} vs {lm.shape}")
    if labels.shape[1] < lm.shape[1] - 1:
        raise ValueError(
            f"labels length {labels.shape[1]} < U-1 = {lm.shape[1] - 1}"
        )
    if fastemit_lambda < 0:
        raise ValueError(f"fastemit_lambda must be >= 0, got {fastemit_lambda}")
    if delay_penalty < 0:
        raise ValueError(f"delay_penalty must be >= 0, got {delay_penalty}")
    impl = _pick_implementation(implementation)
    if prune_range is not None:
        costs, ranges = _simple_costs_with_ranges(
            am, lm, labels, input_lengths, label_lengths,
            int(blank), impl, precision, int(prune_range),
            float(fastemit_lambda), float(delay_penalty),
        )
    else:
        costs = _simple_costs(am, lm, labels, input_lengths, label_lengths,
                              int(blank), impl, precision,
                              float(fastemit_lambda), float(delay_penalty))
    if reduction == "sum":
        loss = jnp.sum(costs)
    elif reduction == "mean":
        loss = jnp.mean(costs)
    else:
        loss = costs
    return (loss, ranges) if prune_range is not None else loss
