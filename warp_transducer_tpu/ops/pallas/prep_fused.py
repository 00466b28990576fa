"""Fused single-pass prep kernel for large alphabets.

The XLA prep path reads the (B, T, U, V) activations three times (max
reduction, sum-exp reduction, label selection). For large V the activation
tensor dominates everything else the loss does, so this Pallas kernel
produces the log-softmax denominator and both blank/label caches in ONE
read — the TPU analog of the reference's two-pass CTA reduction
(/root/reference/include/detail/reduce.h) collapsed to a single pass, plus
the CPU backend's ``log_probs2`` gather (cpu_rnnt.h:117-128), fused.

Label selection is a masked lane reduction (iota == label), not a gather —
lane-dynamic gathers are slow on TPU.

Only used when V is large enough that the (8, 128) tiling of the V-minor
layout is dense (see ``MIN_FUSED_V``); for small V the padded reads would
cost more than the extra XLA passes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
MIN_FUSED_V = 512  # lane padding <= 25% and usually 0 for multiples of 128


def _kernel(acts_ref, labels_ref, lpb_ref, lpe_ref, denom_ref, *, blank, U):
    # Convert per-tile in VMEM: accepting bf16/f16 directly halves the HBM
    # read AND avoids XLA materialising a full f32 copy of the (B,T,U,V)
    # tensor just to feed this kernel (measured: that copy made bf16 slower
    # than f32 end-to-end at B=64,V=5000).
    x = acts_ref[0].astype(jnp.float32)  # (Tt, U, V)
    Tt, _, V = x.shape
    m = jnp.max(x, axis=-1)  # (Tt, U)
    s = jnp.sum(jnp.exp(x - m[..., None]), axis=-1)
    denom = -(m + jnp.log(s))

    lab = labels_ref[0, 0]  # (U,) int32
    v_iota = jax.lax.broadcasted_iota(jnp.int32, (Tt, U, V), 2)
    is_lab = v_iota == lab[None, :, None]
    e = jnp.max(jnp.where(is_lab, x, NEG), axis=-1)  # (Tt, U)

    u_iota = jax.lax.broadcasted_iota(jnp.int32, (Tt, U), 1)
    last_col = u_iota == U - 1

    denom_ref[0] = denom
    lpb_ref[0] = x[..., blank] + denom
    lpe_ref[0] = jnp.where(last_col, NEG, e + denom)


@functools.partial(jax.jit, static_argnames=("blank", "interpret"))
def _fused_prep(acts, labels_u, blank, interpret):
    B, T, U, V = acts.shape
    # Output blocks are (1, Tt, U): mosaic requires the last two block dims
    # to be (8, 128)-divisible OR equal to the array dims, so Tt must be a
    # multiple of 8 unless it covers all of T.
    budget_rows = max(1, int(2 * 1024 * 1024) // (U * V * 4))
    Tt = T if budget_rows >= T else max(8, budget_rows // 8 * 8)
    grid = (B, pl.cdiv(T, Tt))
    kernel = functools.partial(_kernel, blank=blank, U=U)
    lpb, lpe, denom = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Tt, U, V), lambda b, t: (b, t, 0, 0)),
            # (B, 1, U) so the block's last two dims equal the array's —
            # a (1, U) block would violate the (8, 128) tiling rule.
            pl.BlockSpec((1, 1, U), lambda b, t: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, Tt, U), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, Tt, U), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, Tt, U), lambda b, t: (b, t, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, U), jnp.float32),
            jax.ShapeDtypeStruct((B, T, U), jnp.float32),
            jax.ShapeDtypeStruct((B, T, U), jnp.float32),
        ),
        interpret=interpret,
    )(acts, labels_u[:, None, :])
    return lpb, lpe, denom


def fused_prep(acts, labels_u, blank, interpret=None):
    """One-pass (lpb, lpe, denom) from raw activations (f32/bf16/f16 —
    converted to f32 per-tile inside the kernel; outputs are always f32).

    ``labels_u``: (B, U) int32, column U-1 ignored. lpe column U-1 is the
    -inf sentinel (as a finite NEG, matching the Pallas lattice kernels).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fused_prep(acts, labels_u, int(blank), interpret)


def use_fused_prep(V: int, dtype, log_probs_input: bool, U: int = 1,
                   T: int = 1, B: int = 1) -> bool:
    # The minimum (Tt=8) input block must fit VMEM WITH pallas's
    # double-buffering and the exp(x-m) intermediate (~3x the block), so
    # gate at 4 MB per block; larger U*V falls back to the XLA prep path.
    #
    # Large V only: the (8, 128) lane tiling of the V-minor layout is
    # dense there, and the kernel reads bf16 acts natively (half the HBM
    # traffic). At SMALL V this kernel is a dead end, r4-measured two
    # ways: the default 4-D layout pads V to 128 lanes (2.6x physical at
    # V=50 — an OOM, scripts/probe_dense_smallv.py), and the XLA gradient
    # pass's preferred layout forces a full-size relayout copy of the
    # activations. Small V is instead served by the one-pass variadic
    # XLA reduce (prep.onepass_stats, r5): one read at ~620 GB/s with no
    # layout constraint at all — which retired the r4 WTT_PREP_FUSED_SMALL_V
    # experiment gate.
    return (
        not log_probs_input
        and V >= MIN_FUSED_V
        and dtype != jnp.float64
        and 8 * U * V * 4 <= 4 * 1024 * 1024
        and jax.default_backend() == "tpu"
    )
