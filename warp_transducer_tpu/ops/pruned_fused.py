"""Pruned + fused joint: the joint projection evaluated ONLY on the band.

Stage 2 of pruned-transducer training with the joint network fused in:
``rnnt_loss_pruned`` takes precomputed banded logits (B, T, S, V), which
the caller must first materialise — at production scale that tensor is
the whole memory story (B=128, T=1500, S=5, V=5000 f32 is 19 GB: it does
not fit a chip even pruned). This op takes the projected trunk
activations instead — e (B, T, H), p (B, U, H), W (H, V), bias — and
produces the band loss + all four gradients with the banded logits
living only chunk-wise:

* **forward**: a T-chunked sweep gathers the band's prediction rows
  (p[ranges[t]+s]), regenerates each chunk's logits tile
  ``tanh(e ⊕ p_band) @ W + bias`` on the MXU, and reduces it to the
  (B, T, S) lpb/lpe/denom caches; the band recursion then runs on those
  (XLA scan or the single-invocation Pallas band kernel,
  ``pallas/band_stream.py``).
* **backward**: the closed-form band gradient's (B, T, S) coefficient
  fields (``pruned._band_coefs``) drive a second T-chunked sweep that
  recomputes each logits tile, forms
  ``g = coef·softmax − cb·1_blank − ce·1_label`` in registers, and
  contracts immediately: ``dW += h^T g``, ``db += Σg``, ``dh = g·W^T``,
  ``de`` by band-sum, ``dp`` by a per-batch scatter-add over the band's
  u indices (invalid cells carry zero coefficients, so their clipped
  indices add zero).

The composition of ``ops/pruned.py`` (band restriction) and
``ops/fused_joint.py`` (joint fusion); no reference analog — the
reference materialises the full (B, T, U, V) tensor unconditionally
(/root/reference/include/rnnt.h:104-113).
"""
from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import prep as _prep
from .fused_joint import _chunk_t, _pad_t, _unchunk_t
from .pruned import (NEG, _band_coefs, _band_labels, _band_lattice,
                     gather_banded, rnnt_loss_pruned)
from .rnnt import _pick_implementation

_XLA_CHUNK_MB = int(_os.environ.get("WTT_FUSED_XLA_CHUNK_MB", 256))

# Below this working-set size the chunked sweeps LOSE to simply
# materialising the banded joint and running the all-panels band pipeline
# (measured B=128,T=1500,S=5,V=50,H=256 on v5e: 25.2 ms materialised vs
# 66.0 ms swept — the sweep's per-chunk gather/scatter and thin matmuls
# dominate when V is small). Working set: acts+dacts (B,T,S,V) plus the
# gathered band rows and their tanh residual (B,T,S,H), all f32.
# WTT_PRUNED_FUSED_MAT_MB=0 forces the sweep (read per call: tests use it).


def _mat_limit_bytes():
    return int(_os.environ.get("WTT_PRUNED_FUSED_MAT_MB", 4096)) << 20


def _materialize_bytes(B, T, S, H, V):
    return 4 * B * T * S * (2 * V + 2 * H)


def _t_chunk(B, T, S, H, V):
    per_t = B * S * (V + 2 * H) * 4
    return max(1, min(T, (_XLA_CHUNK_MB << 20) // max(per_t, 1)))


def _band_index(ranges_i, S, U):
    """(B, Tc) band starts -> (B, Tc, S) clipped u indices."""
    return jnp.clip(
        ranges_i[:, :, None] + jnp.arange(S, dtype=jnp.int32), 0, U - 1
    )


def _gather_p(p32, idx):
    """p (B, U, H) gathered at (B, Tc, S) -> (B, Tc, S, H)."""
    return jax.vmap(lambda pu, ix: pu[ix])(p32, idx)


def _pruned_fused_prep_xla(e, p, W, bias, ranges, lab_band, blank):
    """(denom, lpb, lpe) (B, T, S) caches; logits live only chunk-wise."""
    B, T, H = e.shape
    U = p.shape[1]
    V = W.shape[1]
    S = lab_band.shape[2]
    f32 = jnp.float32
    mm = jnp.bfloat16 if W.dtype == jnp.bfloat16 else f32
    Tc = _t_chunk(B, T, S, H, V)
    nc = -(-T // Tc)
    T_pad = nc * Tc
    ec = _chunk_t(_pad_t(e, T_pad), nc, Tc)
    rc = _chunk_t(_pad_t(ranges.astype(jnp.int32), T_pad), nc, Tc)
    # lab == -1 matches no column -> masked max stays NEG -> lpe ~ NEG
    lc = _chunk_t(_pad_t(lab_band.astype(jnp.int32), T_pad, fill=-1), nc, Tc)
    p32 = p.astype(f32)
    W_mm = W.astype(mm)
    bias32 = bias.astype(f32)
    v_iota = jnp.arange(V, dtype=jnp.int32)

    def one(x):
        ec_i, rc_i, lc_i = x
        idx = _band_index(rc_i, S, U)
        h = jnp.tanh(ec_i.astype(f32)[:, :, None, :] + _gather_p(p32, idx))
        logits = lax.dot_general(
            h.astype(mm), W_mm, (((3,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + bias32  # (B, Tc, S, V)
        m = jnp.max(logits, axis=-1)
        denom = -(m + jnp.log(
            jnp.sum(jnp.exp(logits - m[..., None]), axis=-1)
        ))
        lpb = logits[..., blank] + denom
        sel = lc_i[..., None] == v_iota
        le = jnp.max(jnp.where(sel, logits, NEG), axis=-1)
        lpe = jnp.where(lc_i >= 0, le + denom, NEG)
        return denom, lpb, lpe

    denom, lpb, lpe = lax.map(one, (ec, rc, lc))
    return tuple(_unchunk_t(x, T) for x in (denom, lpb, lpe))


def _pruned_fused_grad_xla(e, p, W, bias, ranges, lab_band, denom,
                           coef, cb, ce, blank):
    """(de, dp, dW, db) in one T-chunked sweep; tiles recomputed, the
    (B, T, S, V) gradient is contracted in place and never stored."""
    B, T, H = e.shape
    U = p.shape[1]
    V = W.shape[1]
    S = lab_band.shape[2]
    f32 = jnp.float32
    mm = jnp.bfloat16 if W.dtype == jnp.bfloat16 else f32
    Tc = _t_chunk(B, T, S, H, V)
    nc = -(-T // Tc)
    T_pad = nc * Tc
    chunk = lambda x: _chunk_t(_pad_t(x.astype(f32), T_pad), nc, Tc)
    # padded-T rows: coef/cb/ce are zero there, so g vanishes and they
    # contribute nothing to any accumulator
    xs = (_chunk_t(_pad_t(e, T_pad), nc, Tc),
          _chunk_t(_pad_t(ranges.astype(jnp.int32), T_pad), nc, Tc),
          _chunk_t(_pad_t(lab_band.astype(jnp.int32), T_pad, fill=-1), nc, Tc),
          chunk(denom), chunk(coef), chunk(cb), chunk(ce))
    p32 = p.astype(f32)
    W_mm = W.astype(mm)
    bias32 = bias.astype(f32)
    v_iota = jnp.arange(V, dtype=jnp.int32)

    def step(carry, x):
        dp_a, dW_a, db_a = carry
        ec_i, rc_i, lc_i, den_i, coef_i, cb_i, ce_i = x
        idx = _band_index(rc_i, S, U)
        h = jnp.tanh(ec_i.astype(f32)[:, :, None, :] + _gather_p(p32, idx))
        hm = h.astype(mm)
        logits = lax.dot_general(
            hm, W_mm, (((3,), (0,)), ((), ())), preferred_element_type=f32
        ) + bias32
        g = coef_i[..., None] * jnp.exp(logits + den_i[..., None])
        g = g.at[..., blank].add(-cb_i)
        sel = lc_i[..., None] == v_iota
        g = g - jnp.where(sel, ce_i[..., None], 0.0)
        g_mm = g.astype(mm)
        dh = lax.dot_general(
            g_mm, W_mm, (((3,), (1,)), ((), ())), preferred_element_type=f32
        ) * (1.0 - h * h)  # (B, Tc, S, H)
        # dp: band rows summed back to their u positions as a one-hot
        # contraction — a batched MXU matmul instead of a scatter-add
        # (TPU scatter lowers to a serial loop). Out-of-lattice cells have
        # zero coefficients -> dh == 0 there, so clipped indices add zero.
        K = idx.shape[1] * idx.shape[2]
        onehot = (idx.reshape(B, K, 1)
                  == jnp.arange(U, dtype=jnp.int32)).astype(f32)
        dp_a = dp_a + lax.dot_general(
            onehot, dh.reshape(B, K, H),
            (((1,), (1,)), ((0,), (0,))), preferred_element_type=f32,
        )
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def _pruned_fused_costs(e, p, W, bias, ranges, labels, input_lengths,
                        label_lengths, blank, implementation,
                        fastemit_lambda, s_range, delay_penalty):
    costs, _ = _pruned_fused_fwd(e, p, W, bias, ranges, labels,
                                 input_lengths, label_lengths, blank,
                                 implementation, fastemit_lambda, s_range,
                                 delay_penalty)
    return costs


def _pruned_fused_fwd(e, p, W, bias, ranges, labels, input_lengths,
                      label_lengths, blank, implementation,
                      fastemit_lambda=0.0, s_range=2, delay_penalty=0.0):
    S = int(s_range)
    lab_band, has_lab = _band_labels(labels, ranges, S)
    denom, lpb, lpe = _pruned_fused_prep_xla(
        e, p, W, bias, ranges, jnp.where(has_lab, lab_band, -1), blank
    )
    if delay_penalty:
        lpe = _prep.delay_shift(lpe, input_lengths, delay_penalty)
    lat = _band_lattice(lpb, lpe, ranges, input_lengths, label_lengths,
                        implementation=implementation)
    # infeasible bands (ll == NEG sentinel): huge finite cost, zero grads
    ll = lat.ll_forward
    costs = jnp.where(ll > NEG / 2, -ll, -NEG).astype(e.dtype)
    residuals = (e, p, W, bias, ranges, labels, input_lengths,
                 label_lengths, denom, lpb, lpe, lat)
    return costs, residuals


def _pruned_fused_bwd(blank, implementation, fastemit_lambda, s_range,
                      delay_penalty, residuals, g):
    (e, p, W, bias, ranges, labels, input_lengths, label_lengths,
     denom, lpb, lpe, lat) = residuals
    S = lpb.shape[2]
    lab_band, has_lab = _band_labels(labels, ranges, S)
    coef, cb, ce, _ = _band_coefs(
        lpb, lpe, lat, ranges, has_lab, input_lengths, label_lengths,
        g.astype(jnp.float32), fastemit_lambda,
    )
    de, dp, dW, db = _pruned_fused_grad_xla(
        e, p, W, bias, ranges, jnp.where(has_lab, lab_band, -1), denom,
        coef, cb, ce, blank,
    )

    def int_zero(x):
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    return (de, dp, dW, db, int_zero(ranges), int_zero(labels),
            int_zero(input_lengths), int_zero(label_lengths))


_pruned_fused_costs.defvjp(_pruned_fused_fwd, _pruned_fused_bwd)


def rnnt_loss_pruned_fused(
    e: jax.Array,
    p: jax.Array,
    W: jax.Array,
    bias: jax.Array,
    ranges: jax.Array,
    labels: jax.Array,
    input_lengths: jax.Array,
    label_lengths: jax.Array,
    s_range: int,
    blank: int = 0,
    reduction: str = "mean",
    implementation: str = "auto",
    fastemit_lambda: float = 0.0,
    delay_penalty: float = 0.0,
) -> jax.Array:
    """Pruned RNN-T loss with the joint projection fused in.

    Args:
      e: (B, T, H) projected encoder activations.
      p: (B, U, H) projected prediction activations, U = L+1.
      W: (H, V) output-projection kernel; bias: (V,).
      ranges: (B, T) int32 band starts from ``rnnt_prune_ranges`` /
        ``rnnt_loss_simple(..., prune_range=S)``.
      labels / input_lengths / label_lengths / blank / reduction: as in
        ``rnnt_loss``.
      s_range: band width S (static; ranges carry only the starts).
      implementation: 'auto' | 'xla' | 'pallas' — the band-recursion
        engine ('pallas' = the single-invocation streamed band kernel;
        the chunked joint sweeps are XLA either way).
      fastemit_lambda: FastEmit strength λ (arXiv:2010.11148): scales the
        emit-arc gradient by (1 + λ); the loss value is unchanged.
      delay_penalty: delay-penalized transducer strength (arXiv:2211.00490):
        emit arcs at frame t get + λ·((T_b-1)/2 - t) on their log-weight
        (changes the objective, exactly differentiable).

    Equals ``rnnt_loss_pruned(tanh(e ⊕ p_band) @ W + bias, ranges, ...)``
    without ever materialising the (B, T, S, V) banded logits or their
    gradient — the configuration that makes long-T large-V pruned
    training fit on a chip (B=128, T=1500, S=5, V=5000 banded logits
    alone would be 19 GB). Differentiable w.r.t. e, p, W and bias.
    """
    if reduction not in ("none", "sum", "mean"):
        raise ValueError(f"reduction must be none|sum|mean, got {reduction!r}")
    if fastemit_lambda < 0:
        raise ValueError(f"fastemit_lambda must be >= 0, got {fastemit_lambda}")
    if delay_penalty < 0:
        raise ValueError(f"delay_penalty must be >= 0, got {delay_penalty}")
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
        raise ValueError(f"batch dims disagree: e {e.shape} vs p {p.shape}")
    if ranges.shape != (e.shape[0], e.shape[1]):
        raise ValueError(
            f"ranges must be (B, T) = {(e.shape[0], e.shape[1])}; "
            f"got {ranges.shape}"
        )
    S = int(s_range)
    if S < 2:
        raise ValueError(f"s_range must be >= 2, got {s_range}")
    U = p.shape[1]
    if labels.ndim != 2 or labels.shape[0] != e.shape[0] \
            or labels.shape[1] < U - 1:
        raise ValueError(
            f"labels must be (B, >={U - 1}) for U={U}; got {labels.shape}"
        )
    impl = _pick_implementation(implementation)
    B, T, H = e.shape
    V = W.shape[1]
    if _materialize_bytes(B, T, S, H, V) <= _mat_limit_bytes():
        # small-V fast path: materialise the banded joint (it is cheap at
        # this size) and train through the all-panels band pipeline —
        # identical objective by this op's defining identity (docstring).
        f32 = jnp.float32
        p_band = gather_banded(p.astype(f32), ranges.astype(jnp.int32), S)
        acts = jnp.tanh(e.astype(f32)[:, :, None, :] + p_band) \
            @ W.astype(f32) + bias.astype(f32)
        return rnnt_loss_pruned(
            acts, ranges, labels, input_lengths, label_lengths,
            blank=blank, reduction=reduction, implementation=impl,
            fastemit_lambda=float(fastemit_lambda),
            delay_penalty=float(delay_penalty),
        )
    costs = _pruned_fused_costs(
        e, p, W, bias, ranges.astype(jnp.int32), labels.astype(jnp.int32),
        input_lengths, label_lengths, int(blank), impl,
        float(fastemit_lambda), S, float(delay_penalty),
    )
    if reduction == "sum":
        return jnp.sum(costs)
    if reduction == "mean":
        return jnp.mean(costs)
    return costs
