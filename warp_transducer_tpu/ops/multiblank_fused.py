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

Engine: the portable T-chunked XLA sweep; a Pallas twin is future work.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import prep as _prep
from .fused_joint import (
    NEG, _chunk_t, _lab_full, _pad_t, _unchunk_t, _xla_t_chunk,
)
from .multiblank import _mb_coefs, _multiblank_lattice, _resolve_indices


def _mb_fused_prep_xla(e, p, W, bias, labels, blank, bb_indices):
    """(denom, lpb, lpe, lpB) with the logits consumed chunk-wise;
    all are logit + denom (no sigma yet); lpB (B,T,U,K)."""
    B, T, H = e.shape
    U = p.shape[1]
    V = W.shape[1]
    K = len(bb_indices)
    f32 = jnp.float32
    mm = jnp.bfloat16 if W.dtype == jnp.bfloat16 else f32
    Tc = _xla_t_chunk(B, T, U, H, V)
    nc = -(-T // Tc)
    ec = _chunk_t(_pad_t(e, nc * Tc), nc, Tc)
    p32 = p.astype(f32)
    W_mm = W.astype(mm)
    bias32 = bias.astype(f32)
    sel = _lab_full(labels, U)[..., None] == jnp.arange(V, dtype=jnp.int32)

    def one(ec_i):
        h = jnp.tanh(ec_i.astype(f32)[:, :, None, :] + p32[:, None, :, :])
        logits = lax.dot_general(
            h.astype(mm), W_mm, (((3,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + bias32
        m = jnp.max(logits, axis=-1)
        denom = -(m + jnp.log(
            jnp.sum(jnp.exp(logits - m[..., None]), axis=-1)
        ))
        lpb = logits[..., blank] + denom
        le = jnp.max(jnp.where(sel[:, None], logits, NEG), axis=-1)
        lpB = (jnp.stack([logits[..., i] for i in bb_indices], axis=-1)
               + denom[..., None]) if K else jnp.zeros(
                   logits.shape[:-1] + (0,), f32)
        return denom, lpb, le + denom, lpB

    denom, lpb, lpe, lpB = lax.map(one, ec)
    return tuple(_unchunk_t(x, T) for x in (denom, lpb, lpe, lpB))


def _mb_fused_grad_xla(e, p, W, bias, labels, denom, coef, cb, ce, cBs,
                       blank, bb_indices):
    """(de, dp, dW, db): ``fused_joint._fused_grad_xla`` with K extra
    static-column subtractions for the big blanks."""
    B, T, H = e.shape
    U = p.shape[1]
    V = W.shape[1]
    f32 = jnp.float32
    mm = jnp.bfloat16 if W.dtype == jnp.bfloat16 else f32
    Tc = _xla_t_chunk(B, T, U, H, V)
    nc = -(-T // Tc)
    T_pad = nc * Tc
    chunk = lambda x: _chunk_t(_pad_t(x.astype(f32), T_pad), nc, Tc)
    cB = (jnp.stack(cBs, axis=-1) if cBs
          else jnp.zeros(coef.shape + (0,), f32))
    xs = (_chunk_t(_pad_t(e, T_pad), nc, Tc), chunk(denom), chunk(coef),
          chunk(cb), chunk(ce), chunk(cB))
    p32 = p.astype(f32)
    W_mm = W.astype(mm)
    bias32 = bias.astype(f32)
    sel = _lab_full(labels, U)[..., None] == jnp.arange(V, dtype=jnp.int32)

    def step(carry, x):
        dp_a, dW_a, db_a = carry
        ec_i, den_i, coef_i, cb_i, ce_i, cB_i = x
        h = jnp.tanh(ec_i.astype(f32)[:, :, None, :] + p32[:, None, :, :])
        hm = h.astype(mm)
        logits = lax.dot_general(
            hm, W_mm, (((3,), (0,)), ((), ())), preferred_element_type=f32
        ) + bias32
        g = coef_i[..., None] * jnp.exp(logits + den_i[..., None])
        g = g.at[..., blank].add(-cb_i)
        g = g - jnp.where(sel[:, None], ce_i[..., None], 0.0)
        for k, idx in enumerate(bb_indices):
            g = g.at[..., idx].add(-cB_i[..., k])
        g_mm = g.astype(mm)
        dh = lax.dot_general(
            g_mm, W_mm, (((3,), (1,)), ((), ())), preferred_element_type=f32
        ) * (1.0 - h * h)
        dp_a = dp_a + jnp.sum(dh, axis=1)
        dW_a = dW_a + lax.dot_general(
            hm.reshape(-1, H), g_mm.reshape(-1, V),
            (((0,), (0,)), ((), ())), preferred_element_type=f32,
        )
        db_a = db_a + jnp.sum(g, axis=(0, 1, 2))
        return (dp_a, dW_a, db_a), jnp.sum(dh, axis=2)

    init = (jnp.zeros((B, U, H), f32), jnp.zeros((H, V), f32),
            jnp.zeros((V,), f32))
    (dp, dW, db), de = lax.scan(step, init, xs)
    return (_unchunk_t(de, T).astype(e.dtype), dp.astype(p.dtype),
            dW.astype(W.dtype), db.astype(bias.dtype))


def _mb_prep_and_lattice(e, p, W, bias, labels, input_lengths,
                         label_lengths, blank, durations, bb_indices,
                         sigma, delay_penalty):
    denom, lpb, lpe, lpB = _mb_fused_prep_xla(
        e, p, W, bias, labels.astype(jnp.int32), blank, bb_indices)
    sg = jnp.asarray(sigma, lpb.dtype)
    lpb = lpb - sg
    lpe = jnp.maximum(lpe - sg, NEG)
    lpB = lpB - sg
    if delay_penalty:
        lpe = _prep.delay_shift(lpe, input_lengths, delay_penalty)
    lat = _multiblank_lattice(lpb, lpe, lpB, durations, input_lengths,
                              label_lengths)
    return denom, lpb, lpe, lpB, lat


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def _mb_fused_costs(e, p, W, bias, labels, input_lengths, label_lengths,
                    blank, durations, bb_indices, sigma, fastemit_lambda,
                    delay_penalty):
    *_, lat = _mb_prep_and_lattice(e, p, W, bias, labels, input_lengths,
                                   label_lengths, blank, durations,
                                   bb_indices, sigma, delay_penalty)
    return (-lat.ll_forward).astype(e.dtype)


def _mb_fused_fwd(e, p, W, bias, labels, input_lengths, label_lengths,
                  blank, durations, bb_indices, sigma, fastemit_lambda,
                  delay_penalty):
    denom, lpb, lpe, lpB, lat = _mb_prep_and_lattice(
        e, p, W, bias, labels, input_lengths, label_lengths, blank,
        durations, bb_indices, sigma, delay_penalty)
    costs = (-lat.ll_forward).astype(e.dtype)
    residuals = (e, p, W, bias, labels, input_lengths, label_lengths,
                 denom, lpb, lpe, lpB, lat)
    return costs, residuals


def _mb_fused_bwd(blank, durations, bb_indices, sigma, fastemit_lambda,
                  delay_penalty, residuals, g):
    (e, p, W, bias, labels, input_lengths, label_lengths,
     denom, lpb, lpe, lpB, lat) = residuals
    coef, cb, ce, cBs = _mb_coefs(
        lpb, lpe, lpB, lat, durations, input_lengths, label_lengths,
        scale=g.astype(lat.alphas.dtype), fastemit_lambda=fastemit_lambda)
    de, dp, dW, db = _mb_fused_grad_xla(
        e, p, W, bias, labels.astype(jnp.int32), denom, coef, cb, ce, cBs,
        blank, bb_indices)

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
    durs, idx = _resolve_indices(W.shape[1], int(blank),
                                 big_blank_durations, big_blank_indices)
    costs = _mb_fused_costs(
        e, p, W, bias, labels, input_lengths, label_lengths, int(blank),
        durs, idx, float(sigma), float(fastemit_lambda),
        float(delay_penalty))
    if reduction == "sum":
        return jnp.sum(costs)
    if reduction == "mean":
        return jnp.mean(costs)
    return costs
