"""Anti-diagonal (wavefront) RNN-T lattice engine in pure XLA.

The reference GPU backend parallelises the alpha/beta recursions over
anti-diagonals of the (T, U) lattice, with one CUDA thread per ``u`` and a
``__syncthreads`` per diagonal (``/root/reference/include/detail/
gpu_rnnt_kernel.h:11-113``).  On TPU we express the same wavefront as a
``lax.scan`` over diagonals where every step is a fully vectorised
(batch × lane) VPU update:

* the lattice is *skewed* into diagonal-major layout ``D[n, b, u] =
  X[b, n - u, u]`` so each scan step touches one contiguous (B, U) slice;
* the "emit" dependency (cell ``(t, u-1)``) becomes a one-lane shift of the
  previous diagonal; the "no-emit" dependency (cell ``(t-1, u)``) is the
  same lane — no gather/scatter in the hot loop;
* per-utterance lengths are handled by masking invalid cells to ``-inf``,
  which the ``logaddexp`` identities absorb (cf. the -inf short-circuits in
  ``/root/reference/include/detail/rnnt_helper.h:17-24``).

This module is backend-agnostic (runs on CPU/TPU under ``jit``) and serves
both as the default engine and as the ground truth the Pallas kernel is
tested against.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class LatticeResult(NamedTuple):
    alphas: jax.Array  # (B, T, U) forward log-probabilities
    betas: jax.Array  # (B, T, U) backward log-probabilities
    ll_forward: jax.Array  # (B,) total log-likelihood from alphas
    ll_backward: jax.Array  # (B,) total log-likelihood from betas


def _neg_inf(dtype) -> jax.Array:
    return jnp.asarray(-jnp.inf, dtype=dtype)


def skew(x: jax.Array, fill: float = -jnp.inf) -> jax.Array:
    """(B, T, U) -> diagonal-major (N, B, U) with D[n, b, u] = x[b, n-u, u].

    Implemented with the flatten-rechunk trick instead of a gather (~7x
    faster on TPU): rows of length N+1 flattened then re-chunked with row
    length N shift row u right by exactly u; the wrapped head elements land
    in the previous row's ``fill`` padding, which is exactly the invalid
    (t < 0 or t >= T) region.
    """
    B, T, U = x.shape
    N = T + U - 1
    xt = jnp.transpose(x, (2, 1, 0))  # (U, T, B)
    xt = jnp.pad(xt, ((0, 0), (0, N + 1 - T), (0, 0)),
                 constant_values=jnp.asarray(fill, x.dtype))
    d = xt.reshape(U * (N + 1), B)[: U * N].reshape(U, N, B)
    return jnp.transpose(d, (1, 2, 0))  # (N, B, U)


def unskew(d: jax.Array, T: int) -> jax.Array:
    """Diagonal-major (N, B, U) -> (B, T, U) with x[b, t, u] = d[t+u, b, u].

    Inverse flatten-rechunk: re-chunking rows of length N with row length
    N+1 shifts row u left by exactly u; only valid elements are ever read.
    """
    N, B, U = d.shape
    dt = jnp.transpose(d, (2, 0, 1))  # (U, N, B)
    flat = dt.reshape(U * N, B)
    flat = jnp.pad(flat, ((0, U), (0, 0)))
    x = flat.reshape(U, N + 1, B)[:, :T]
    return jnp.transpose(x, (2, 1, 0))  # (B, T, U)


def _shift_lanes_right(x: jax.Array, fill) -> jax.Array:
    """x[..., u] <- x[..., u-1]; lane 0 gets ``fill``."""
    pad = jnp.full(x.shape[:-1] + (1,), fill, dtype=x.dtype)
    return jnp.concatenate([pad, x[..., :-1]], axis=-1)


def _shift_lanes_left(x: jax.Array, fill) -> jax.Array:
    """x[..., u] <- x[..., u+1]; last lane gets ``fill``."""
    pad = jnp.full(x.shape[:-1] + (1,), fill, dtype=x.dtype)
    return jnp.concatenate([x[..., 1:], pad], axis=-1)


def forward_backward(
    lpb: jax.Array,
    lpe: jax.Array,
    input_lengths: jax.Array,
    label_lengths: jax.Array,
    compute_betas: bool = True,
) -> LatticeResult:
    """Run the wavefront alpha (and optionally beta) recursions.

    Args:
      lpb: (B, T, U) log-prob of emitting blank at each lattice cell.
      lpe: (B, T, U) log-prob of emitting the next reference label
        ``labels[u]`` at each cell; column ``U-1`` is ignored.
      input_lengths: (B,) int32 valid T per utterance.
      label_lengths: (B,) int32 label count per utterance (U_b = len + 1).
      compute_betas: skip the backward sweep for the scoring path
        (mirrors ``score_forward``, /root/reference/src/rnnt_entrypoint.cpp:70-72).
    """
    B, T, U = lpb.shape
    N = T + U - 1
    dtype = lpb.dtype
    neg = _neg_inf(dtype)

    Tb = input_lengths.astype(jnp.int32)  # (B,)
    Ub = label_lengths.astype(jnp.int32) + 1  # (B,)
    u_iota = jnp.arange(U, dtype=jnp.int32)[None, :]  # (1, U)

    lpb_d = skew(lpb)  # (N, B, U)
    lpe_d = skew(lpe)

    def valid_mask(n):
        t = n - u_iota  # (1, U)
        return (t >= 0) & (t < Tb[:, None]) & (u_iota < Ub[:, None])

    # ---- alphas: n = 1 .. N-1, each from diagonal n-1 ----------------------
    a0 = jnp.full((B, U), neg).at[:, 0].set(jnp.zeros((), dtype))

    def alpha_step(a_prev, xs):
        n, lpb_prev, lpe_prev = xs
        no_emit = a_prev + lpb_prev
        emit = _shift_lanes_right(a_prev + lpe_prev, neg)
        a_n = jnp.logaddexp(no_emit, emit)
        a_n = jnp.where(valid_mask(n), a_n, neg)
        return a_n, a_n

    ns = jnp.arange(1, N, dtype=jnp.int32)
    _, a_rest = lax.scan(alpha_step, a0, (ns, lpb_d[: N - 1], lpe_d[: N - 1]))
    alphas_d = jnp.concatenate([a0[None], a_rest], axis=0)  # (N, B, U)

    # Total log-likelihood: alpha + blank log-prob at the per-utterance
    # terminal cell (T_b-1, U_b-1)  (cpu_rnnt.h:209).
    batch_iota = jnp.arange(B)
    n_seed = Tb + Ub - 2  # (B,) diagonal of the terminal cell
    final_lpb = lpb[batch_iota, Tb - 1, Ub - 1]  # (B,)
    ll_forward = alphas_d[n_seed, batch_iota, Ub - 1] + final_lpb

    alphas = unskew(alphas_d, T)

    if not compute_betas:
        return LatticeResult(alphas, alphas, ll_forward, ll_forward)

    # ---- betas: n = N-2 .. 0, each from diagonal n+1 -----------------------
    # The terminal cell is the *only* valid cell on its diagonal, so seeding
    # is a masked overwrite during the sweep (handles ragged batches whose
    # terminal diagonals differ).
    corner = lambda n: (n == n_seed)[:, None] & (u_iota == (Ub - 1)[:, None])
    b_last = jnp.where(corner(N - 1), final_lpb[:, None], neg)

    def beta_step(b_next, xs):
        n, lpb_n, lpe_n = xs
        no_emit = b_next + lpb_n
        emit = _shift_lanes_left(b_next, neg) + lpe_n
        b_n = jnp.logaddexp(no_emit, emit)
        b_n = jnp.where(valid_mask(n), b_n, neg)
        b_n = jnp.where(corner(n), final_lpb[:, None], b_n)
        return b_n, b_n

    ns_rev = jnp.arange(N - 2, -1, -1, dtype=jnp.int32)
    _, b_rest = lax.scan(beta_step, b_last, (ns_rev, lpb_d[: N - 1][::-1], lpe_d[: N - 1][::-1]))
    betas_d = jnp.concatenate([b_rest[::-1], b_last[None]], axis=0)

    ll_backward = betas_d[0, :, 0]
    betas = unskew(betas_d, T)

    return LatticeResult(alphas, betas, ll_forward, ll_backward)
