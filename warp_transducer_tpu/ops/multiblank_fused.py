"""Multi-blank loss fused into the joint network: (B,T,U,V) never exists.

``rnnt_loss_multiblank_fused_joint(e, p, W, bias, labels, ...)`` computes
the same value as

    acts = tanh(e[:, :, None, :] + p[:, None, :, :]) @ W + bias
    rnnt_loss_multiblank(acts, labels, ...)

but the logits (and the (B,T,U,H) joint features) are produced
T-chunk-wise and consumed in place, forward and backward — the multi-blank
twin of ``rnnt_loss_fused_joint``. The only differences from the standard
fusion: the forward pass also caches the K big-blank columns (static
column reads), and the backward subtracts K extra coefficient fields at
those columns (``ops/multiblank.py::_mb_coefs``). Gradients flow to all
four joint inputs.

Engines: the portable T-chunked XLA sweep, and on TPU the fused Pallas
kernels with the K big-blank columns cached in-kernel
(``pallas/joint_fused.py::fused_prep_mb`` / ``fused_grad_mb``);
``implementation='auto'`` picks Pallas when the single-chunk kernel fits
VMEM, falling back to the XLA engine (V-chunked Pallas multi-blank is
not implemented).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import prep as _prep
from .fused_joint import NEG, _fused_grad_xla, _fused_prep_xla
from .multiblank import _mb_coefs, _multiblank_lattice, _resolve_indices


def _use_pallas(implementation, e, p, W, bb_indices):
    """'pallas' when requested/auto-on-TPU, the single-chunk kernel fits
    (incl. the big-blank column panel's VMEM), and there IS at least one
    big blank (K=0 uses the standard engines). V-chunked Pallas
    multi-blank is not implemented — oversize W falls back to the XLA
    engine even under explicit 'pallas'."""
    if implementation == "xla" or not bb_indices:
        return False
    from .fused_joint import _interpret_default
    from .pallas.joint_fused import fused_n_chunks, variant_extra_bytes

    if implementation == "auto" and _interpret_default():
        return False
    extra = variant_extra_bytes(e, p, W, n_panels=1, dur_head=False)
    return fused_n_chunks(e, p, W, backward=True, extra_bytes=extra) == 1


def _mb_prep_and_lattice(e, p, W, bias, labels, input_lengths,
                         label_lengths, blank, durations, bb_indices,
                         sigma, delay_penalty, implementation):
    if _use_pallas(implementation, e, p, W, bb_indices):
        from .fused_joint import _interpret_default
        from .pallas.joint_fused import fused_prep_mb

        U = p.shape[1]
        lab_len = jnp.full((e.shape[0],), U - 1, jnp.int32)
        denom, lpb, lpe, lpB = fused_prep_mb(
            e, p, W, bias, labels.astype(jnp.int32), lab_len, blank=blank,
            extra_cols=bb_indices, interpret=_interpret_default())
    else:
        out = _fused_prep_xla(e, p, W, bias, labels.astype(jnp.int32),
                              blank, extra_cols=bb_indices)
        if bb_indices:
            denom, lpb, lpe, lpB = out
        else:
            denom, lpb, lpe = out
            lpB = jnp.zeros(lpb.shape + (0,), lpb.dtype)
    sg = jnp.asarray(sigma, lpb.dtype)
    lpb = lpb - sg
    lpe = jnp.maximum(lpe - sg, NEG)
    lpB = lpB - sg
    if delay_penalty:
        lpe = _prep.delay_shift(lpe, input_lengths, delay_penalty)
    lat = _multiblank_lattice(lpb, lpe, lpB, durations, input_lengths,
                              label_lengths)
    return denom, lpb, lpe, lpB, lat


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(7, 8, 9, 10, 11, 12, 13))
def _mb_fused_costs(e, p, W, bias, labels, input_lengths, label_lengths,
                    blank, durations, bb_indices, sigma, fastemit_lambda,
                    delay_penalty, implementation):
    *_, lat = _mb_prep_and_lattice(e, p, W, bias, labels, input_lengths,
                                   label_lengths, blank, durations,
                                   bb_indices, sigma, delay_penalty,
                                   implementation)
    return (-lat.ll_forward).astype(e.dtype)


def _mb_fused_fwd(e, p, W, bias, labels, input_lengths, label_lengths,
                  blank, durations, bb_indices, sigma, fastemit_lambda,
                  delay_penalty, implementation):
    denom, lpb, lpe, lpB, lat = _mb_prep_and_lattice(
        e, p, W, bias, labels, input_lengths, label_lengths, blank,
        durations, bb_indices, sigma, delay_penalty, implementation)
    costs = (-lat.ll_forward).astype(e.dtype)
    residuals = (e, p, W, bias, labels, input_lengths, label_lengths,
                 denom, lpb, lpe, lpB, lat)
    return costs, residuals


def _mb_fused_bwd(blank, durations, bb_indices, sigma, fastemit_lambda,
                  delay_penalty, implementation, residuals, g):
    (e, p, W, bias, labels, input_lengths, label_lengths,
     denom, lpb, lpe, lpB, lat) = residuals
    coef, cb, ce, cBs = _mb_coefs(
        lpb, lpe, lpB, lat, durations, input_lengths, label_lengths,
        scale=g.astype(lat.alphas.dtype), fastemit_lambda=fastemit_lambda)
    if _use_pallas(implementation, e, p, W, bb_indices):
        from .fused_joint import _interpret_default
        from .pallas.joint_fused import fused_grad_mb

        U = p.shape[1]
        lab_len = jnp.full((e.shape[0],), U - 1, jnp.int32)
        de, dp, dW, db = fused_grad_mb(
            e, p, W, bias, labels.astype(jnp.int32), lab_len, denom, coef,
            cb, ce, jnp.stack(cBs, axis=-1), blank=blank,
            extra_cols=bb_indices, interpret=_interpret_default())
    else:
        extra = None
        if bb_indices:
            extra = (bb_indices, jnp.stack(cBs, axis=-1))
        de, dp, dW, db = _fused_grad_xla(
            e, p, W, bias, labels.astype(jnp.int32), denom, coef, cb, ce,
            blank, extra=extra)

    def int_zero(x):
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    return (de, dp, dW, db, int_zero(labels),
            int_zero(input_lengths), int_zero(label_lengths))


_mb_fused_costs.defvjp(_mb_fused_fwd, _mb_fused_bwd)


def rnnt_loss_multiblank_fused_joint(
    e: jax.Array,
    p: jax.Array,
    W: jax.Array,
    bias: jax.Array,
    labels: jax.Array,
    input_lengths: jax.Array,
    label_lengths: jax.Array,
    big_blank_durations,
    blank: int = 0,
    big_blank_indices=None,
    reduction: str = "mean",
    sigma: float = 0.0,
    fastemit_lambda: float = 0.0,
    delay_penalty: float = 0.0,
    implementation: str = "auto",
) -> jax.Array:
    """Multi-blank transducer loss with the joint projection fused in.

    Equals ``rnnt_loss_multiblank(tanh(e ⊕ p) @ W + bias, ...)`` without
    ever materialising the (B,T,U,V) logits or the (B,T,U,H) joint
    features. Differentiable w.r.t. e, p, W and bias. Arguments as in
    ``rnnt_loss_fused_joint`` + the multi-blank ones
    (``rnnt_loss_multiblank``).
    """
    if reduction not in ("none", "sum", "mean"):
        raise ValueError(f"reduction must be none|sum|mean, got {reduction!r}")
    if e.ndim != 3 or p.ndim != 3 or W.ndim != 2 or bias.ndim != 1:
        raise ValueError(
            f"expected e (B,T,H), p (B,U,H), W (H,V), bias (V,); got "
            f"{e.shape}, {p.shape}, {W.shape}, {bias.shape}")
    if e.shape[2] != p.shape[2] or e.shape[2] != W.shape[0] \
            or W.shape[1] != bias.shape[0]:
        raise ValueError(
            f"hidden/vocab dims disagree: e {e.shape}, p {p.shape}, "
            f"W {W.shape}, bias {bias.shape}")
    if fastemit_lambda < 0:
        raise ValueError(f"fastemit_lambda must be >= 0, got {fastemit_lambda}")
    if delay_penalty < 0:
        raise ValueError(f"delay_penalty must be >= 0, got {delay_penalty}")
    if implementation not in ("auto", "xla", "pallas"):
        raise ValueError(
            f"implementation must be auto|xla|pallas, got {implementation!r}")
    durs, idx = _resolve_indices(W.shape[1], int(blank),
                                 big_blank_durations, big_blank_indices)
    costs = _mb_fused_costs(
        e, p, W, bias, labels, input_lengths, label_lengths, int(blank),
        durs, idx, float(sigma), float(fastemit_lambda),
        float(delay_penalty), implementation)
    if reduction == "sum":
        return jnp.sum(costs)
    if reduction == "mean":
        return jnp.mean(costs)
    return costs
