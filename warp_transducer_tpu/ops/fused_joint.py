"""RNN-T loss fused into the joint network: the (B,T,U,V) tensor never exists.

``rnnt_loss_fused_joint(e, p, W, bias, labels, ...)`` computes the same
value as

    acts = tanh(e[:, :, None, :] + p[:, None, :, :]) @ W + bias
    rnnt_loss(acts, labels, ...)

but the joint logits are produced tile-wise in VMEM by the Pallas kernels
(``pallas/joint_fused.py``) and consumed in-register — forward reduces them
straight to the (B, T, U) lattice caches, backward recomputes each tile and
contracts the dense gradient into (de, dp, dW, db) on the spot. At
production large-V shapes this removes the dominant HBM cost of the dense
loss: the write+read+read-write of the O(B·T·U·V) activations/gradient
(measured at ~69% of streaming roofline with nothing left to fuse,
ROADMAP #8). Reference analog: ``compute_grad_kernel`` + ``reduce.h``
(/root/reference/include/detail/gpu_rnnt_kernel.h:143-179) fused one level
further, into their producer matmul.

Gradients flow to all four joint inputs (e, p, W, bias); the lattice
recursion itself runs on the (B, T, U) caches exactly as in ``rnnt_loss``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .gradients import _beta_shifts, _valid_cells
from .rnnt import _pick_implementation, _run_lattice
from . import prep as _prep


def _joint_coefs(lpb, lpe, alphas, betas, ll, input_lengths, label_lengths,
                 scale):
    """The three valid-masked, cotangent-scaled (B,T,U) coefficient fields
    of the dense gradient (cf. gradients.grad_wrt_acts)."""
    valid = _valid_cells(lpb.shape, input_lengths, label_lengths)
    bshift_t, bshift_u = _beta_shifts(betas, alphas, input_lengths,
                                      label_lengths)
    a_ll = alphas - ll[:, None, None]
    coef = jnp.where(valid, jnp.exp(a_ll + betas), 0.0)
    cb = jnp.where(valid, jnp.exp(a_ll + lpb + bshift_t), 0.0)
    ce = jnp.where(valid, jnp.exp(a_ll + lpe + bshift_u), 0.0)
    s = scale.astype(coef.dtype)[:, None, None]
    return coef * s, cb * s, ce * s


def _fused_prep(e, p, W, bias, labels, blank, interpret):
    from .pallas import joint_fused

    U = p.shape[1]
    lab_len = jnp.full((e.shape[0],), U - 1, jnp.int32)
    # V-chunked when W (+ the kernel's working set) exceeds VMEM; the
    # single-chunk case is exactly fused_prep.
    denom, lpb, lpe = joint_fused.fused_prep_chunked(
        e, p, W, bias, labels, lab_len, blank=blank, interpret=interpret
    )
    return denom, lpb, lpe


def _interpret_default():
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused_costs(e, p, W, bias, labels, input_lengths, label_lengths,
                 blank, implementation):
    denom, lpb, lpe = _fused_prep(e, p, W, bias, labels, blank,
                                  _interpret_default())
    res = _run_lattice(implementation, _prep.PreparedInputs(lpb, lpe, denom),
                       input_lengths, label_lengths, compute_betas=False)
    return (-res.ll_forward).astype(e.dtype)


def _fused_costs_fwd(e, p, W, bias, labels, input_lengths, label_lengths,
                     blank, implementation):
    denom, lpb, lpe = _fused_prep(e, p, W, bias, labels, blank,
                                  _interpret_default())
    res = _run_lattice(implementation, _prep.PreparedInputs(lpb, lpe, denom),
                       input_lengths, label_lengths)
    costs = (-res.ll_forward).astype(e.dtype)
    residuals = (e, p, W, bias, labels, input_lengths, label_lengths,
                 denom, lpb, lpe, res.alphas, res.betas, res.ll_forward)
    return costs, residuals


def _fused_costs_bwd(blank, implementation, residuals, g):
    from .pallas import joint_fused

    (e, p, W, bias, labels, input_lengths, label_lengths,
     denom, lpb, lpe, alphas, betas, ll) = residuals
    coef, cb, ce = _joint_coefs(
        lpb, lpe, alphas.astype(jnp.float32), betas.astype(jnp.float32),
        ll.astype(jnp.float32), input_lengths, label_lengths,
        g.astype(jnp.float32),
    )
    U = p.shape[1]
    lab_len = jnp.full((e.shape[0],), U - 1, jnp.int32)
    de, dp, dW, db = joint_fused.fused_grad_chunked(
        e, p, W, bias, labels, lab_len, denom, coef, cb, ce,
        blank=blank, interpret=_interpret_default(),
    )

    def int_zero(x):
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    return (de, dp, dW, db, int_zero(labels),
            int_zero(input_lengths), int_zero(label_lengths))


_fused_costs.defvjp(_fused_costs_fwd, _fused_costs_bwd)


def rnnt_loss_fused_joint(
    e: jax.Array,
    p: jax.Array,
    W: jax.Array,
    bias: jax.Array,
    labels: jax.Array,
    input_lengths: jax.Array,
    label_lengths: jax.Array,
    blank: int = 0,
    reduction: str = "mean",
    implementation: str = "auto",
) -> jax.Array:
    """RNN-T loss with the joint projection fused in.

    Args:
      e: (B, T, H) projected encoder activations (after ``enc_proj``).
      p: (B, U, H) projected prediction activations (after ``pred_proj``).
      W: (H, V) output-projection kernel; bias: (V,).
      labels / input_lengths / label_lengths / blank / reduction: as in
        ``rnnt_loss``.
      implementation: lattice engine for the (B, T, U) recursion.

    Equals ``rnnt_loss(tanh(e ⊕ p) @ W + bias, ...)`` without ever
    materialising the (B, T, U, V) logits or their gradient in HBM.
    Differentiable w.r.t. e, p, W and bias.
    """
    if reduction not in ("none", "sum", "mean"):
        raise ValueError(f"reduction must be none|sum|mean, got {reduction!r}")
    if e.ndim != 3 or p.ndim != 3 or W.ndim != 2 or bias.ndim != 1:
        raise ValueError(
            f"expected e (B,T,H), p (B,U,H), W (H,V), bias (V,); got "
            f"{e.shape}, {p.shape}, {W.shape}, {bias.shape}"
        )
    if e.shape[2] != p.shape[2] or e.shape[2] != W.shape[0] \
            or W.shape[1] != bias.shape[0]:
        raise ValueError(
            f"hidden/vocab dims disagree: e {e.shape}, p {p.shape}, "
            f"W {W.shape}, bias {bias.shape}"
        )
    if e.shape[0] != p.shape[0]:
        raise ValueError(
            f"batch dims disagree: e {e.shape} vs p {p.shape}"
        )
    U = p.shape[1]
    if labels.ndim != 2 or labels.shape[0] != e.shape[0] \
            or labels.shape[1] < U - 1:
        raise ValueError(
            f"labels must be (B, >={U - 1}) for U={U}; got {labels.shape}"
        )
    impl = _pick_implementation(implementation)
    costs = _fused_costs(e, p, W, bias, labels.astype(jnp.int32),
                         input_lengths, label_lengths, int(blank), impl)
    if reduction == "sum":
        return jnp.sum(costs)
    if reduction == "mean":
        return jnp.mean(costs)
    return costs
