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
