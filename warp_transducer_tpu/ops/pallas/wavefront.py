"""Pallas TPU wavefront kernel for the RNN-T alpha/beta recursions.

TPU-native re-design of the reference's CUDA wavefront kernels
(``/root/reference/include/detail/gpu_rnnt_kernel.h:11-113``): where CUDA
assigns one thread per ``u`` and syncs per anti-diagonal, here each diagonal
is one fully vectorised VPU step over a (batch_tile × U_lanes) tile:

* inputs arrive pre-skewed into diagonal-major layout ``(N, B, U)`` with
  ``D[n, b, u] = X[b, n-u, u]`` so every step reads contiguous slices;
* the emit dependency (cell ``(t, u-1)``) is a one-lane roll; the no-emit
  dependency (cell ``(t-1, u)``) is the same lane;
* the alpha (forward) and beta (backward) sweeps share one ``fori_loop`` —
  step ``n`` advances alpha on diagonal ``n`` and beta on diagonal
  ``N-1-n`` — halving loop overhead vs two separate sweeps;
* per-utterance lengths are masked with a large finite negative sentinel
  (no ±inf arithmetic inside the kernel ⇒ no NaN paths), mirroring the
  -inf identities of ``rnnt_helper::log_sum_exp``
  (/root/reference/include/detail/rnnt_helper.h:17-24);
* total log-likelihoods are captured in-loop when a row's terminal diagonal
  is produced, so ragged batches need no post-hoc gather.

The grid tiles the batch; each grid step keeps its four ``(N, B_tile, U)``
diagonal panels resident in VMEM.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..lattice import LatticeResult, skew, unskew

# Large finite negative: behaves as -inf under log-sum-exp but keeps all
# arithmetic NaN-free (exp(NEG - x) flushes to 0, NEG + NEG stays finite).
NEG = -1.0e30

_LANES = 128
_SUBLANES = 8
# Per-grid-step VMEM budget for the diagonal panels (conservative slice of
# the ~16 MB/core VMEM, leaving room for double buffering).
_VMEM_BUDGET_BYTES = 6 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lse(a, b):
    """log(exp(a) + exp(b)) for finite inputs (sentinel NEG, never ±inf)."""
    m = jnp.maximum(a, b)
    return m + jnp.log1p(jnp.exp(-jnp.abs(a - b)))


def _shift_right(x, fill):
    """x[..., u] <- x[..., u-1] along lanes."""
    rolled = pltpu.roll(x, 1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == 0, fill, rolled)


def _shift_left(x, fill):
    """x[..., u] <- x[..., u+1] along lanes."""
    rolled = pltpu.roll(x, x.shape[1] - 1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == x.shape[1] - 1, fill, rolled)


def _kernel(tb_ref, ub_ref, lpb_ref, lpe_ref,
            alpha_ref, beta_ref, llf_ref, llb_ref,
            *, n_diag: int, compute_betas: bool):
    Bt, U = lpb_ref.shape[1], lpb_ref.shape[2]
    N = n_diag
    f32 = jnp.float32
    neg = jnp.asarray(NEG, f32)

    Tb = tb_ref[...]  # (Bt, 1) int32
    Ub = ub_ref[...]
    n_seed = Tb + Ub - 2  # (Bt, 1) diagonal of the terminal cell
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (Bt, U), 1)
    is_final_lane = u_iota == Ub - 1

    def valid(n):
        t = n - u_iota
        return (t >= 0) & (t < Tb) & (u_iota < Ub)

    def capture_ll(n, a_n, lpb_n, llf):
        """When diagonal n is a row's terminal diagonal, record its ll."""
        cand = jnp.sum(jnp.where(is_final_lane, a_n + lpb_n, 0.0), axis=1, keepdims=True)
        return jnp.where(n == n_seed, cand, llf)

    # --- diagonal 0 -----------------------------------------------------
    lpb0 = lpb_ref[0]
    a0 = jnp.where((u_iota == 0) & valid(0), 0.0, neg)
    alpha_ref[0] = a0
    llf0 = capture_ll(0, a0, lpb0, jnp.full((Bt, 1), neg, f32))

    if compute_betas:
        lpb_last = lpb_ref[N - 1]
        corner_last = (n_seed == N - 1) & is_final_lane
        b_last = jnp.where(corner_last, lpb_last, neg)
        beta_ref[N - 1] = b_last
    else:
        b_last = a0  # unused carry placeholder

    # --- fused forward/backward sweep ----------------------------------
    def body(n, carry):
        a_prev, b_next, llf = carry

        # alpha on diagonal n (reads diagonal n-1 panels)
        lpb_prev = lpb_ref[pl.ds(n - 1, 1)][0]
        lpe_prev = lpe_ref[pl.ds(n - 1, 1)][0]
        no_emit = a_prev + lpb_prev
        emit = _shift_right(a_prev + lpe_prev, neg)
        a_n = jnp.where(valid(n), _lse(no_emit, emit), neg)
        alpha_ref[pl.ds(n, 1)] = a_n[None]
        lpb_n = lpb_ref[pl.ds(n, 1)][0]
        llf = capture_ll(n, a_n, lpb_n, llf)

        if compute_betas:
            # beta on diagonal m = N-1-n (reads diagonal m+1 carry)
            m = N - 1 - n
            lpb_m = lpb_ref[pl.ds(m, 1)][0]
            lpe_m = lpe_ref[pl.ds(m, 1)][0]
            b_no_emit = b_next + lpb_m
            b_emit = _shift_left(b_next, neg) + lpe_m
            b_m = jnp.where(valid(m), _lse(b_no_emit, b_emit), neg)
            b_m = jnp.where((m == n_seed) & is_final_lane, lpb_m, b_m)
            beta_ref[pl.ds(m, 1)] = b_m[None]
        else:
            b_m = b_next

        return a_n, b_m, llf

    _, b_final, llf = jax.lax.fori_loop(1, N, body, (a0, b_last, llf0))

    llf_ref[...] = llf
    if compute_betas:
        llb_ref[...] = b_final[:, 0:1]
    else:
        llb_ref[...] = llf


def _pick_batch_tile(B: int, N: int, U_pad: int) -> int:
    panel_bytes = 4 * N * U_pad * 4  # lpb, lpe, alpha, beta — f32
    tile = max(1, _VMEM_BUDGET_BYTES // max(panel_bytes, 1))
    tile = min(tile, B, 64)
    if tile >= _SUBLANES:
        tile = (tile // _SUBLANES) * _SUBLANES
    return max(tile, 1)


@functools.partial(
    jax.jit, static_argnames=("compute_betas", "interpret", "batch_tile")
)
def _wavefront(lpb, lpe, input_lengths, label_lengths, compute_betas,
               interpret, batch_tile):
    B, T, U = lpb.shape
    N = T + U - 1
    U_pad = _round_up(U, _LANES)

    # sanitise: the kernel is ±inf-free
    lpb32 = jnp.maximum(lpb.astype(jnp.float32), NEG)
    lpe32 = jnp.maximum(lpe.astype(jnp.float32), NEG)

    lpb_d = skew(lpb32, fill=NEG)  # (N, B, U)
    lpe_d = skew(lpe32, fill=NEG)
    pad_u = U_pad - U
    Bt = batch_tile if batch_tile else _pick_batch_tile(B, N, U_pad)
    pad_b = _round_up(B, Bt) - B
    if pad_u or pad_b:
        lpb_d = jnp.pad(lpb_d, ((0, 0), (0, pad_b), (0, pad_u)), constant_values=NEG)
        lpe_d = jnp.pad(lpe_d, ((0, 0), (0, pad_b), (0, pad_u)), constant_values=NEG)
    Bp = B + pad_b

    tb = jnp.pad(input_lengths.astype(jnp.int32), (0, pad_b), constant_values=1)[:, None]
    ub = jnp.pad(label_lengths.astype(jnp.int32) + 1, (0, pad_b), constant_values=1)[:, None]

    grid = (Bp // Bt,)
    panel_spec = pl.BlockSpec((N, Bt, U_pad), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((Bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ll_spec = pl.BlockSpec((Bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    # Scoring path: no beta output at all — a 1-diagonal stub replaces the
    # (N, B, U) array, halving output HBM (the reference's score_forward
    # likewise skips all beta work, gpu_rnnt.h:237-253).
    n_beta = N if compute_betas else 1
    beta_spec = pl.BlockSpec((n_beta, Bt, U_pad), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, n_diag=N, compute_betas=compute_betas)
    alpha_d, beta_d, llf, llb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[len_spec, len_spec, panel_spec, panel_spec],
        out_specs=(panel_spec, beta_spec, ll_spec, ll_spec),
        out_shape=(
            jax.ShapeDtypeStruct((N, Bp, U_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_beta, Bp, U_pad), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
        ),
        interpret=interpret,
    )(tb, ub, lpb_d, lpe_d)

    alphas = unskew(alpha_d[:, :B, :U], T)
    betas = unskew(beta_d[:, :B, :U], T) if compute_betas else alphas
    return LatticeResult(
        alphas.astype(lpb.dtype),
        betas.astype(lpb.dtype),
        llf[:B, 0].astype(lpb.dtype),
        llb[:B, 0].astype(lpb.dtype),
    )


def forward_backward(lpb, lpe, input_lengths, label_lengths,
                     compute_betas: bool = True, interpret: bool | None = None,
                     batch_tile: int | None = None) -> LatticeResult:
    """Pallas-accelerated drop-in for ``lattice.forward_backward``."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _wavefront(
        lpb, lpe, input_lengths, label_lengths, compute_betas, interpret,
        batch_tile,
    )
