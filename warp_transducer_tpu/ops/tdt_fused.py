"""TDT loss fused into the joint network: (B,T,U,V) token logits never exist.

``rnnt_loss_tdt_fused_joint(e, p, W, bias, Wd, bias_d, labels, ...)``
computes the same value as

    h = tanh(e[:, :, None, :] + p[:, None, :, :])
    rnnt_loss_tdt(h @ W + bias, h @ Wd + bias_d, labels, ...)

but the token logits (and the (B,T,U,H) joint features) are produced
T-chunk-wise and consumed in place, forward and backward — the TDT twin of
``rnnt_loss_fused_joint``. The duration head is tiny (D <= 8 columns), so
its logits ARE materialised (B,T,U,D); the O(B·T·U·V) token tensor and the
O(B·T·U·H) features are not. Gradients flow to all six joint inputs.

Why the composition is exact: the TDT token-head gradient is
``p_tok·coef − [v=blank]·Σ_j cb_j − [v=y_u]·(1+λ)·Σ_j ce_j`` — the SAME
softmax-minus-selects form as the dense loss with the per-duration arc
posteriors summed, so the fused-joint gradient engine consumes the TDT
coefficient fields unchanged (see ``ops/tdt.py::_tdt_coefs`` and
``docs/rnnt_math.md``).

Engine: the portable T-chunked XLA sweep (``ops/fused_joint.py``'s 'xla'
engine, extended with the duration head). A Pallas twin is future work —
the token-head matmuls dominate and are MXU-bound either way.
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
from .tdt import _check_durations, _tdt_coefs, _tdt_lattice


def _tdt_fused_prep_xla(e, p, W, bias, Wd, bias_d, labels, blank):
    """(denom, lpb, lpe, dur_logits) with the token logits consumed
    chunk-wise; lpb/lpe are token log-probs + denom (no sigma yet)."""
    B, T, H = e.shape
    U = p.shape[1]
    V = W.shape[1]
    f32 = jnp.float32
    mm = jnp.bfloat16 if W.dtype == jnp.bfloat16 else f32
    Tc = _xla_t_chunk(B, T, U, H, V)
    nc = -(-T // Tc)
    ec = _chunk_t(_pad_t(e, nc * Tc), nc, Tc)
    p32 = p.astype(f32)
    W_mm = W.astype(mm)
    bias32 = bias.astype(f32)
    Wd32 = Wd.astype(f32)
    bias_d32 = bias_d.astype(f32)
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
        dlog = lax.dot_general(
            h, Wd32, (((3,), (0,)), ((), ())), preferred_element_type=f32,
        ) + bias_d32
        return denom, lpb, le + denom, dlog

    denom, lpb, lpe, dlog = lax.map(one, ec)
    return tuple(_unchunk_t(x, T) for x in (denom, lpb, lpe, dlog))


def _tdt_fused_grad_xla(e, p, W, bias, Wd, labels, denom, coef, cb, ce_eff,
                        g_dur, blank):
    """(de, dp, dW, db, dWd) — ``ops/fused_joint.py::_fused_grad_xla``
    extended with the duration head: each chunk's dh also collects
    g_dur @ Wd^T, and dWd accumulates h^T g_dur. d(bias_d) is the plain
    sum of g_dur (computed by the caller — no chunk state needed)."""
    B, T, H = e.shape
    U = p.shape[1]
    V = W.shape[1]
    D = Wd.shape[1]
    f32 = jnp.float32
    mm = jnp.bfloat16 if W.dtype == jnp.bfloat16 else f32
    Tc = _xla_t_chunk(B, T, U, H, V)
    nc = -(-T // Tc)
    T_pad = nc * Tc
    chunk = lambda x: _chunk_t(_pad_t(x.astype(f32), T_pad), nc, Tc)
    xs = (_chunk_t(_pad_t(e, T_pad), nc, Tc), chunk(denom), chunk(coef),
          chunk(cb), chunk(ce_eff), chunk(g_dur))
    p32 = p.astype(f32)
    W_mm = W.astype(mm)
    bias32 = bias.astype(f32)
    Wd32 = Wd.astype(f32)
    sel = _lab_full(labels, U)[..., None] == jnp.arange(V, dtype=jnp.int32)

    def step(carry, x):
        dp_a, dW_a, db_a, dWd_a = carry
        ec_i, den_i, coef_i, cb_i, ce_i, gd_i = x
        h = jnp.tanh(ec_i.astype(f32)[:, :, None, :] + p32[:, None, :, :])
        hm = h.astype(mm)
        logits = lax.dot_general(
            hm, W_mm, (((3,), (0,)), ((), ())), preferred_element_type=f32
        ) + bias32
        g = coef_i[..., None] * jnp.exp(logits + den_i[..., None])
        g = g.at[..., blank].add(-cb_i)
        g = g - jnp.where(sel[:, None], ce_i[..., None], 0.0)
        g_mm = g.astype(mm)
        dh = lax.dot_general(
            g_mm, W_mm, (((3,), (1,)), ((), ())), preferred_element_type=f32
        )
        dh = dh + lax.dot_general(
            gd_i, Wd32, (((3,), (1,)), ((), ())), preferred_element_type=f32
        )
        dh = dh * (1.0 - h * h)
        dp_a = dp_a + jnp.sum(dh, axis=1)
        dW_a = dW_a + lax.dot_general(
            hm.reshape(-1, H), g_mm.reshape(-1, V),
            (((0,), (0,)), ((), ())), preferred_element_type=f32,
        )
        db_a = db_a + jnp.sum(g, axis=(0, 1, 2))
        dWd_a = dWd_a + lax.dot_general(
            h.reshape(-1, H), gd_i.reshape(-1, D),
            (((0,), (0,)), ((), ())), preferred_element_type=f32,
        )
        return (dp_a, dW_a, db_a, dWd_a), jnp.sum(dh, axis=2)

    init = (jnp.zeros((B, U, H), f32), jnp.zeros((H, V), f32),
            jnp.zeros((V,), f32), jnp.zeros((H, D), f32))
    (dp, dW, db, dWd), de = lax.scan(step, init, xs)
    return (_unchunk_t(de, T).astype(e.dtype), dp.astype(p.dtype),
            dW.astype(W.dtype), db.astype(bias.dtype), dWd.astype(Wd.dtype))


def _lpd_from(dlog):
    m = jnp.max(dlog, axis=-1, keepdims=True)
    dden = -(m[..., 0] + jnp.log(jnp.sum(jnp.exp(dlog - m), axis=-1)))
    return dlog + dden[..., None]


def _prep_and_lattice(e, p, W, bias, Wd, bias_d, labels, input_lengths,
                      label_lengths, blank, durations, sigma, delay_penalty):
    denom, lpb, lpe, dlog = _tdt_fused_prep_xla(
        e, p, W, bias, Wd, bias_d, labels.astype(jnp.int32), blank)
    sg = jnp.asarray(sigma, lpb.dtype)
    lpb = lpb - sg
    lpe = jnp.maximum(lpe - sg, NEG)
    if delay_penalty:
        lpe = _prep.delay_shift(lpe, input_lengths, delay_penalty)
    lpd = _lpd_from(dlog)
    lat = _tdt_lattice(lpb, lpe, lpd, durations, input_lengths,
                       label_lengths)
    return denom, lpb, lpe, dlog, lpd, lat


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def _tdt_fused_costs(e, p, W, bias, Wd, bias_d, labels, input_lengths,
                     label_lengths, blank, durations, sigma, fastemit_lambda,
                     delay_penalty):
    *_, lat = _prep_and_lattice(e, p, W, bias, Wd, bias_d, labels,
                                input_lengths, label_lengths, blank,
                                durations, sigma, delay_penalty)
    return (-lat.ll_forward).astype(e.dtype)


def _tdt_fused_fwd(e, p, W, bias, Wd, bias_d, labels, input_lengths,
                   label_lengths, blank, durations, sigma, fastemit_lambda,
                   delay_penalty):
    denom, lpb, lpe, dlog, lpd, lat = _prep_and_lattice(
        e, p, W, bias, Wd, bias_d, labels, input_lengths, label_lengths,
        blank, durations, sigma, delay_penalty)
    costs = (-lat.ll_forward).astype(e.dtype)
    residuals = (e, p, W, bias, Wd, bias_d, labels, input_lengths,
                 label_lengths, denom, lpb, lpe, dlog, lat)
    return costs, residuals


def _tdt_fused_bwd(blank, durations, sigma, fastemit_lambda, delay_penalty,
                   residuals, g):
    (e, p, W, bias, Wd, bias_d, labels, input_lengths, label_lengths,
     denom, lpb, lpe, dlog, lat) = residuals
    lam = float(fastemit_lambda)
    lpd = _lpd_from(dlog)
    coef, cb, ce, cb_js, ce_js = _tdt_coefs(
        lpb, lpe, lpd, lat, durations, input_lengths, label_lengths,
        scale=g.astype(lat.alphas.dtype), fastemit_lambda=lam)
    ce_eff = (1.0 + lam) * ce
    # duration head: small, dense in XLA
    g_dur = coef[..., None] * jnp.exp(lpd) - jnp.stack(
        [cb_js[j] + (1.0 + lam) * ce_js[j] for j in range(len(durations))],
        axis=-1)
    dbd = jnp.sum(g_dur, axis=(0, 1, 2)).astype(bias_d.dtype)
    de, dp, dW, db, dWd = _tdt_fused_grad_xla(
        e, p, W, bias, Wd, labels.astype(jnp.int32), denom, coef, cb,
        ce_eff, g_dur, blank)

    def int_zero(x):
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    return (de, dp, dW, db, dWd, dbd, int_zero(labels),
            int_zero(input_lengths), int_zero(label_lengths))


_tdt_fused_costs.defvjp(_tdt_fused_fwd, _tdt_fused_bwd)


def rnnt_loss_tdt_fused_joint(
    e: jax.Array,
    p: jax.Array,
    W: jax.Array,
    bias: jax.Array,
    Wd: jax.Array,
    bias_d: jax.Array,
    labels: jax.Array,
    input_lengths: jax.Array,
    label_lengths: jax.Array,
    durations=(0, 1, 2, 3, 4),
    blank: int = 0,
    reduction: str = "mean",
    sigma: float = 0.0,
    fastemit_lambda: float = 0.0,
    delay_penalty: float = 0.0,
) -> jax.Array:
    """TDT loss with the joint projection fused in.

    Args:
      e: (B, T, H) projected encoder activations; p: (B, U, H) projected
        prediction activations.
      W: (H, V) token-head kernel; bias: (V,).
      Wd: (H, D) duration-head kernel; bias_d: (D,), column j for
        ``durations[j]``.
      labels / lengths / durations / blank / reduction / sigma /
      fastemit_lambda / delay_penalty: as in ``rnnt_loss_tdt``.

    Equals ``rnnt_loss_tdt(h @ W + bias, h @ Wd + bias_d, ...)`` with
    ``h = tanh(e ⊕ p)`` — without materialising the (B,T,U,V) token
    logits or the (B,T,U,H) joint features. Differentiable w.r.t. all six
    joint inputs.
    """
    if reduction not in ("none", "sum", "mean"):
        raise ValueError(f"reduction must be none|sum|mean, got {reduction!r}")
    if e.ndim != 3 or p.ndim != 3 or W.ndim != 2 or bias.ndim != 1 \
            or Wd.ndim != 2 or bias_d.ndim != 1:
        raise ValueError(
            f"expected e (B,T,H), p (B,U,H), W (H,V), bias (V,), Wd (H,D), "
            f"bias_d (D,); got {e.shape}, {p.shape}, {W.shape}, "
            f"{bias.shape}, {Wd.shape}, {bias_d.shape}")
    if e.shape[2] != p.shape[2] or e.shape[2] != W.shape[0] \
            or W.shape[0] != Wd.shape[0] or W.shape[1] != bias.shape[0] \
            or Wd.shape[1] != bias_d.shape[0]:
        raise ValueError(
            f"hidden/vocab/duration dims disagree: e {e.shape}, p {p.shape},"
            f" W {W.shape}, bias {bias.shape}, Wd {Wd.shape}, "
            f"bias_d {bias_d.shape}")
    durs = _check_durations(durations)
    if Wd.shape[1] != len(durs):
        raise ValueError(
            f"duration head has {Wd.shape[1]} columns for {len(durs)} "
            f"durations")
    if fastemit_lambda < 0:
        raise ValueError(f"fastemit_lambda must be >= 0, got {fastemit_lambda}")
    if delay_penalty < 0:
        raise ValueError(f"delay_penalty must be >= 0, got {delay_penalty}")
    costs = _tdt_fused_costs(
        e, p, W, bias, Wd, bias_d, labels, input_lengths, label_lengths,
        int(blank), durs, float(sigma), float(fastemit_lambda),
        float(delay_penalty))
    if reduction == "sum":
        return jnp.sum(costs)
    if reduction == "mean":
        return jnp.mean(costs)
    return costs
