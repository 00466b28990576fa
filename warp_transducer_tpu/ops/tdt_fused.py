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

Engines: the portable T-chunked XLA sweep (``ops/fused_joint.py``'s 'xla'
engine, extended with the duration head) and, on TPU, the fused Pallas
kernels with the duration head computed tile-wise
(``pallas/joint_fused.py::fused_prep_tdt`` / ``fused_grad_tdt``);
``implementation='auto'`` picks Pallas when the single-chunk kernel fits
VMEM and falls back to the XLA engine otherwise.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import prep as _prep
from .fused_joint import NEG, _fused_grad_xla, _fused_prep_xla
from .tdt import _check_durations, _tdt_coefs, _tdt_lattice


def _lpd_from(dlog):
    m = jnp.max(dlog, axis=-1, keepdims=True)
    dden = -(m[..., 0] + jnp.log(jnp.sum(jnp.exp(dlog - m), axis=-1)))
    return dlog + dden[..., None]


def _use_pallas(implementation):
    """'pallas' when requested, or on 'auto' when running on TPU. Any
    vocab size: single-chunk shapes use the integrated with_dur kernels;
    larger W composes the V-chunked token-head drivers with the
    standalone duration-head kernels (``pallas/joint_fused.py``)."""
    if implementation == "xla":
        return False
    if implementation == "pallas":
        return True
    from .fused_joint import _interpret_default

    return not _interpret_default()


def _tdt_single_chunk(e, p, W):
    """True when the integrated with_dur kernels fit VMEM (accounting for
    the duration-head buffers they add)."""
    from .pallas.joint_fused import fused_n_chunks, variant_extra_bytes

    extra = variant_extra_bytes(e, p, W, n_panels=1, dur_head=True)
    return fused_n_chunks(e, p, W, backward=True, extra_bytes=extra) == 1


def _prep_and_lattice(e, p, W, bias, Wd, bias_d, labels, input_lengths,
                      label_lengths, blank, durations, sigma, delay_penalty,
                      implementation):
    if _use_pallas(implementation):
        from .fused_joint import _interpret_default
        from .pallas.joint_fused import (
            dur_head_prep, fused_prep_chunked, fused_prep_tdt,
        )

        U = p.shape[1]
        lab_len = jnp.full((e.shape[0],), U - 1, jnp.int32)
        interp = _interpret_default()
        if _tdt_single_chunk(e, p, W):
            denom, lpb, lpe, dlog = fused_prep_tdt(
                e, p, W, bias, Wd, bias_d, labels.astype(jnp.int32),
                lab_len, blank=blank, interpret=interp)
        else:
            denom, lpb, lpe = fused_prep_chunked(
                e, p, W, bias, labels.astype(jnp.int32), lab_len,
                blank=blank, interpret=interp)
            dlog = dur_head_prep(e, p, Wd, bias_d, interpret=interp)
    else:
        denom, lpb, lpe, dlog = _fused_prep_xla(
            e, p, W, bias, labels.astype(jnp.int32), blank,
            dur_head=(Wd, bias_d))
    sg = jnp.asarray(sigma, lpb.dtype)
    lpb = lpb - sg
    lpe = jnp.maximum(lpe - sg, NEG)
    if delay_penalty:
        lpe = _prep.delay_shift(lpe, input_lengths, delay_penalty)
    lpd = _lpd_from(dlog)
    lat = _tdt_lattice(lpb, lpe, lpd, durations, input_lengths,
                       label_lengths)
    return denom, lpb, lpe, dlog, lpd, lat


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def _tdt_fused_costs(e, p, W, bias, Wd, bias_d, labels, input_lengths,
                     label_lengths, blank, durations, sigma, fastemit_lambda,
                     delay_penalty, implementation):
    *_, lat = _prep_and_lattice(e, p, W, bias, Wd, bias_d, labels,
                                input_lengths, label_lengths, blank,
                                durations, sigma, delay_penalty,
                                implementation)
    return (-lat.ll_forward).astype(e.dtype)


def _tdt_fused_fwd(e, p, W, bias, Wd, bias_d, labels, input_lengths,
                   label_lengths, blank, durations, sigma, fastemit_lambda,
                   delay_penalty, implementation):
    denom, lpb, lpe, dlog, lpd, lat = _prep_and_lattice(
        e, p, W, bias, Wd, bias_d, labels, input_lengths, label_lengths,
        blank, durations, sigma, delay_penalty, implementation)
    costs = (-lat.ll_forward).astype(e.dtype)
    residuals = (e, p, W, bias, Wd, bias_d, labels, input_lengths,
                 label_lengths, denom, lpb, lpe, dlog, lat)
    return costs, residuals


def _tdt_fused_bwd(blank, durations, sigma, fastemit_lambda, delay_penalty,
                   implementation, residuals, g):
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
    if _use_pallas(implementation):
        from .fused_joint import _interpret_default
        from .pallas.joint_fused import (
            dur_head_grad, fused_grad_chunked, fused_grad_tdt,
        )

        U = p.shape[1]
        lab_len = jnp.full((e.shape[0],), U - 1, jnp.int32)
        interp = _interpret_default()
        if _tdt_single_chunk(e, p, W):
            de, dp, dW, db, dWd = fused_grad_tdt(
                e, p, W, bias, Wd, labels.astype(jnp.int32), lab_len,
                denom, coef, cb, ce_eff, g_dur, blank=blank,
                interpret=interp)
        else:
            de, dp, dW, db = fused_grad_chunked(
                e, p, W, bias, labels.astype(jnp.int32), lab_len, denom,
                coef, cb, ce_eff, blank=blank, interpret=interp)
            de2, dp2, dWd = dur_head_grad(e, p, Wd, g_dur, interpret=interp)
            de = de + de2.astype(de.dtype)
            dp = dp + dp2.astype(dp.dtype)
    else:
        de, dp, dW, db, dWd = _fused_grad_xla(
            e, p, W, bias, labels.astype(jnp.int32), denom, coef, cb,
            ce_eff, blank, dur_head=(Wd, g_dur))

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
    implementation: str = "auto",
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
      implementation: 'auto' | 'xla' | 'pallas'. 'pallas' runs the fused
        Pallas kernels extended with the tiny duration head (the TPU fast
        path; the O(B·T·U) TDT lattice recursion itself stays the XLA
        scan); 'xla' is the portable T-chunked engine (what the TF
        binding serialises). 'auto' picks 'pallas' on TPU when the
        single-chunk kernel fits VMEM, else falls back to 'xla'.

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
    if implementation not in ("auto", "xla", "pallas"):
        raise ValueError(
            f"implementation must be auto|xla|pallas, got {implementation!r}")
    costs = _tdt_fused_costs(
        e, p, W, bias, Wd, bias_d, labels, input_lengths, label_lengths,
        int(blank), durs, float(sigma), float(fastemit_lambda),
        float(delay_penalty), implementation)
    if reduction == "sum":
        return jnp.sum(costs)
    if reduction == "mean":
        return jnp.mean(costs)
    return costs
