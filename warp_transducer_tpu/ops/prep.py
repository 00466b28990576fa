"""Input preparation: fused log-softmax denominator and blank/label caches.

The reference GPU backend never materialises the log-softmaxed joint tensor;
it computes a per-cell denominator ``denom[b,t,u] = -max - log sum exp`` with
a two-pass CTA reduction (``/root/reference/include/detail/reduce.h``) and
re-adds it wherever a log-prob is read.  The reference CPU backend instead
caches only the blank and label log-probs per cell
(``log_probs2``, /root/reference/include/detail/cpu_rnnt.h:117-128) so the
O(T·U) recursion never touches the alphabet axis.

We combine both ideas: one XLA pass over the (B, T, U, V) activations
produces the (B, T, U) denominator plus the two (B, T, U) caches, shrinking
the recursion's working set from T·U·V to T·U·2 — XLA fuses the reduction
and gathers into a single read of the activations.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


class PreparedInputs(NamedTuple):
    lpb: jax.Array  # (B, T, U) blank log-probs
    lpe: jax.Array  # (B, T, U) label log-probs (column U-1 is -inf)
    denom: Optional[jax.Array]  # (B, T, U) -logsumexp(acts) or None


def _pad_labels(labels: jax.Array, U: int) -> jax.Array:
    """Pad/truncate (B, L) labels to exactly (B, U-1)."""
    B, L = labels.shape
    if L == U - 1:
        return labels
    if L > U - 1:
        return labels[:, : U - 1]
    return jnp.pad(labels, ((0, 0), (0, U - 1 - L)))


def prepare(
    acts: jax.Array,
    labels: jax.Array,
    blank: int,
    log_probs_input: bool,
    compute_dtype=jnp.float32,
) -> PreparedInputs:
    """Build blank/emit log-prob caches from the joint activations.

    Args:
      acts: (B, T, U, V) raw activations, or already log-softmaxed when
        ``log_probs_input`` (the reference CPU convention,
        /root/reference/pytorch_binding/warprnnt_pytorch/__init__.py:95-98).
      labels: (B, L) int32 target labels, zero padded, L >= max(label_lengths).
      blank: blank symbol index.
    """
    B, T, U, V = acts.shape

    from .pallas import prep_fused as _pf

    if _pf.use_fused_prep(V, compute_dtype, log_probs_input, U, T, B):
        # Large-V fast path: one read of the activations produces all three
        # caches (vs three XLA passes). Acts are passed in their NATIVE
        # dtype — the kernel converts per-tile in VMEM, so bf16 inputs are
        # read as bf16 (half the HBM traffic, no materialised f32 copy).
        labels_u = _pad_labels(labels.astype(jnp.int32), U)
        labels_full = jnp.pad(labels_u, ((0, 0), (0, 1)))  # (B, U)
        lpb, lpe, denom = _pf.fused_prep(acts, labels_full, blank)
        return PreparedInputs(lpb=lpb, lpe=lpe, denom=denom)

    x = acts.astype(compute_dtype)

    if (not log_probs_input and U > 1 and compute_dtype == jnp.float32):
        return _prepare_onepass(x, labels, blank)

    if log_probs_input:
        denom = None
        lp = x
    else:
        # denom = -logsumexp over the alphabet; log p(v) = acts[v] + denom.
        m = jnp.max(x, axis=-1, keepdims=True)
        denom = -(m[..., 0] + jnp.log(jnp.sum(jnp.exp(x - m), axis=-1)))
        lp = x  # log-prob of v is lp[..., v] + denom

    lpb = lp[..., blank]

    labels_u = _pad_labels(labels.astype(jnp.int32), U)  # (B, U-1)
    if U > 1:
        # Label log-prob extraction as a masked lane-reduction: on TPU a
        # gather over the alphabet axis (take_along_axis) is ~4x slower, and
        # this max-reduce shares its pass over the activations with the
        # log-softmax max reduction (XLA fuses the two horizontally),
        # measurably beating even a one-hot MXU matmul. Bit-exact selection;
        # a true -inf log-prob surfaces as the finite -1e30 sentinel.
        v_iota = jnp.arange(V, dtype=jnp.int32)
        sel = v_iota[None, None, :] == labels_u[:, :, None]  # (B, U-1, V)
        gathered = jnp.max(
            jnp.where(sel[:, None, :, :], lp[:, :, : U - 1, :],
                      jnp.asarray(-1e30, compute_dtype)),
            axis=-1,
        )  # (B, T, U-1)
        lpe = jnp.pad(gathered, ((0, 0), (0, 0), (0, 1)), constant_values=NEG_INF)
    else:
        lpe = jnp.full((B, T, U), NEG_INF, dtype=compute_dtype)

    if denom is not None:
        # -inf + finite denom stays -inf, so the plain adds are safe.
        lpb = lpb + denom
        lpe = lpe + denom
    return PreparedInputs(lpb=lpb, lpe=lpe, denom=denom)


def onepass_stats(x, labels_full, blank, extra_cols=()):
    """One-read prep reductions: a single variadic ``lax.reduce`` over V
    computes the streaming (online) log-softmax denominator AND any number
    of column selects in the same pass over the activations.

    The reference reads the activations twice for the denominator alone
    (max pass + sum-exp pass, /root/reference/include/detail/reduce.h:102-146,
    invoked gpu_rnnt.h:75-80); the streaming form carries (m, s) with
    s in units of exp(x - m) — the same renormalisation online-softmax
    uses — so one pass suffices, and the column selects (label, blank, any
    big-blank columns) ride along as max-components of the same reduce.
    Measured at B=64,T=1500,U=301,V=50 f32 on v5e: 9.3 ms (622 GB/s) vs
    44 ms for the fused two-pass formulation — XLA runs this at memory
    speed while the two-pass version's broadcast-against-packed-layout
    pattern ran at 131 GB/s.

    Args:
      x: (B, T, U, V) f32 activations.
      labels_full: (B, U) int32 per-row labels (column U-1 ignored), or
        None to skip the label component.
      blank: blank column index, or None to skip.
      extra_cols: static ints — extra column selects (e.g. big blanks).

    Returns:
      (denom, label_val?, blank_val?, *extra_vals) — each (B, T, U) f32;
      the optional components appear only when requested.
    """
    B, T, U, V = x.shape
    neg = jnp.float32(-1e30)
    v_iota = jax.lax.broadcasted_iota(jnp.int32, (B, T, U, V), 3)
    ins = [x, jnp.ones_like(x)]
    if labels_full is not None:
        ins.append(jnp.where(v_iota == labels_full[:, None, :, None], x, neg))
    if blank is not None:
        ins.append(jnp.where(v_iota == blank, x, neg))
    for c in extra_cols:
        ins.append(jnp.where(v_iota == int(c), x, neg))

    def comb(acc, elt):
        m = jnp.maximum(acc[0], elt[0])
        s = acc[1] * jnp.exp(acc[0] - m) + elt[1] * jnp.exp(elt[0] - m)
        return (m, s) + tuple(
            jnp.maximum(a, b) for a, b in zip(acc[2:], elt[2:]))

    init = (neg, jnp.float32(0.0)) + (neg,) * (len(ins) - 2)
    out = jax.lax.reduce(tuple(ins), init, comb, (3,))
    denom = -(out[0] + jnp.log(out[1]))
    return (denom,) + tuple(out[2:])


def _prepare_onepass(x, labels, blank):
    """Dense-loss prep via ``onepass_stats`` (one read of the activations)."""
    B, T, U, V = x.shape
    labels_u = _pad_labels(labels.astype(jnp.int32), U)  # (B, U-1)
    labels_full = jnp.pad(labels_u, ((0, 0), (0, 1)))  # (B, U); col U-1 unused
    denom, e, bv = onepass_stats(x, labels_full, blank)
    lpb = bv + denom
    u_iota = jnp.arange(U, dtype=jnp.int32)[None, None, :]
    lpe = jnp.where(u_iota == U - 1, NEG_INF, e + denom)
    return PreparedInputs(lpb=lpb, lpe=lpe, denom=denom)


def delay_shift(lpe, input_lengths, delay_penalty):
    """Delay-penalized transducer (arXiv:2211.00490): add
    λ·((T_b-1)/2 - t) to every emit log-weight — earlier emissions are
    rewarded, centered per utterance so the total stays scale-stable.
    Applied AFTER prep, so every engine's closed-form gradient remains
    exact (the shift is part of the arc weight the lattice and the
    coefficient fields both see). lpe: (B, T, ...); broadcast over
    trailing dims."""
    dtype = lpe.dtype
    T = lpe.shape[1]
    t = jnp.arange(T, dtype=dtype)
    mid = (input_lengths.astype(dtype) - 1) / 2
    shift = jnp.asarray(delay_penalty, dtype) * (mid[:, None] - t[None, :])
    return lpe + shift.reshape(shift.shape + (1,) * (lpe.ndim - 2))
