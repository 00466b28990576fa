"""Public RNN-Transducer loss op for JAX on TPU.

Drop-in equivalent of the reference's framework APIs
(``/root/reference/pytorch_binding/warprnnt_pytorch/__init__.py:53-100`` and
``tensorflow_binding/warprnnt_tensorflow/__init__.py:9-48``) re-designed for
XLA: one ``jax.custom_vjp`` op. The forward pass runs prep + the wavefront
lattice and keeps only the small (B, T, U) arrays as residuals; the dense
O(B·T·U·V) analytic gradient runs in the backward with the upstream
cotangent folded into its coefficients. (The reference instead computes the
gradient during forward and rescales it in backward, ``__init__.py:43-50`` —
on TPU that costs an extra full read+write of the big tensor, so we invert
the split while keeping the same closed-form math.)

Conventions:
* default (``log_probs_input=False``): raw activations in, log-softmax fused
  into the loss, dense gradient w.r.t. activations — the reference GPU path.
* ``log_probs_input=True``: caller provides log-probs, sparse gradient — the
  reference CPU path, kept for bit-parity testing against
  ``tests/test_cpu.cpp``.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import gradients as _gradients
from . import lattice as _lattice
from . import prep as _prep

_IMPLEMENTATIONS = ("auto", "xla", "pallas")

# Below this vocabulary size, bf16/f16 inputs are upcast to f32 on the
# "auto" path: the recursion dominates at small V and the per-tile dtype
# conversion costs more than the halved HBM traffic saves (measured 0.61 ms
# bf16 vs 0.45 ms f32 at the headline B=128,T=150,L=40,V=28 shape).
_MIN_LOWP_V = 512
# ...unless the lattice is LONG: past this many T*U cells the prep/grad
# passes over the big tensor dominate the recursion, and halving their HBM
# traffic wins regardless of V (r5 measurement at B=64,T=1500,L=300,V=50
# in the docstring of ``rnnt_loss``).
_LOWP_KEEP_CELLS = 1 << 16


def _pick_implementation(implementation: str) -> str:
    if implementation not in _IMPLEMENTATIONS:
        raise ValueError(
            f"implementation must be one of {_IMPLEMENTATIONS}, got {implementation!r}"
        )
    if implementation == "auto":
        try:
            platform = jax.default_backend()
        except RuntimeError:  # pragma: no cover
            platform = "cpu"
        return "pallas" if platform == "tpu" else "xla"
    return implementation


def _certify_inputs(acts, labels, input_lengths, label_lengths):
    """Static shape/dtype validation mirroring ``certify_inputs``
    (/root/reference/pytorch_binding/warprnnt_pytorch/__init__.py:115-140).

    Data-dependent checks (T == max(input_lengths)) cannot run under jit and
    are intentionally omitted; padding beyond the lengths is simply masked.
    """
    if acts.ndim != 4:
        raise ValueError(f"acts must be 4-D (B, T, U, V); got shape {acts.shape}")
    if labels.ndim != 2:
        raise ValueError(f"labels must be 2-D (B, L); got shape {labels.shape}")
    if input_lengths.ndim != 1 or label_lengths.ndim != 1:
        raise ValueError("input_lengths and label_lengths must be 1-D")
    B = acts.shape[0]
    for name, arr in (
        ("labels", labels),
        ("input_lengths", input_lengths),
        ("label_lengths", label_lengths),
    ):
        if arr.shape[0] != B:
            raise ValueError(f"{name} batch dim {arr.shape[0]} != acts batch dim {B}")
        if not jnp.issubdtype(arr.dtype, jnp.integer):
            raise TypeError(f"{name} must be an integer array; got {arr.dtype}")
    if labels.shape[1] < acts.shape[2] - 1:
        raise ValueError(
            f"labels length {labels.shape[1]} is smaller than U-1={acts.shape[2]-1}"
        )


def _compute_dtype(acts_dtype):
    if acts_dtype == jnp.float64:
        return jnp.float64
    return jnp.float32  # bf16/f16 inputs are promoted for the recursion


def _steer_dtype(acts, implementation):
    """On the auto path, upcast low-precision inputs at small V where bf16
    measured slower than f32 (no HBM relief, extra convert); at large V —
    or at long T·U, where the big-tensor passes dominate the recursion —
    the native-dtype path halves big-tensor traffic and wins."""
    B, T, U, V = acts.shape
    if (implementation == "auto" and V < _MIN_LOWP_V
            and T * U <= _LOWP_KEEP_CELLS
            and acts.dtype in (jnp.bfloat16, jnp.float16)):
        return acts.astype(jnp.float32)
    return acts


def _maybe_check_mismatch(res, tol):
    """Optional numerical self-check: warn when |ll_fwd - ll_bwd| > tol.

    The TPU analog of the reference CPU backend's mismatch warning
    (/root/reference/include/detail/cpu_rnnt.h:167-169). Runs under jit via
    ``jax.debug.print``; costs one extra (B,) comparison, nothing more.
    """
    if tol is None:
        return
    diff = jnp.max(jnp.abs(res.ll_forward - res.ll_backward))
    jax.lax.cond(
        diff > tol,
        lambda d: jax.debug.print(
            "WARNING: forward backward likelihood mismatch {d} (tol {t})",
            d=d, t=tol,
        ),
        lambda d: None,
        diff,
    )


def _run_lattice(implementation, prepped, input_lengths, label_lengths, compute_betas=True):
    if prepped.lpb.dtype == jnp.float64:
        # The Pallas kernel is fp32-only (the TPU VPU has no native f64
        # path), so fp64 requests take the XLA engine. The reference's fp64
        # entry point dispatches to BOTH backends (compute_rnnt_loss_fp64,
        # rnnt_entrypoint.cpp:165-178) — our accelerator-resident fp64
        # story is the XLA engine under jax_enable_x64: on TPU, XLA lowers
        # f64 arithmetic to software-emulated double-double, keeping data
        # and compute on-device (covered under WTT_TEST_TPU=1 by
        # tests/test_golden.py::test_fp64_tpu_xla_engine).
        implementation = "xla"
    if implementation == "pallas":
        from . import pallas as _wavefront

        return _wavefront.forward_backward(
            prepped.lpb, prepped.lpe, input_lengths, label_lengths,
            compute_betas=compute_betas,
        )
    return _lattice.forward_backward(
        prepped.lpb, prepped.lpe, input_lengths, label_lengths,
        compute_betas=compute_betas,
    )


def _forward(acts, labels, input_lengths, label_lengths, blank, log_probs_input, implementation, fastemit_lambda=0.0, delay_penalty=0.0):
    """Compute (costs, grads). The heart of the library."""
    B, T, U, V = acts.shape
    cdtype = _compute_dtype(acts.dtype)
    prepped = _prep.prepare(acts, labels, blank, log_probs_input, compute_dtype=cdtype)
    if delay_penalty:
        prepped = prepped._replace(
            lpe=_prep.delay_shift(prepped.lpe, input_lengths, delay_penalty))
    res = _run_lattice(implementation, prepped, input_lengths, label_lengths)

    labels_u = _prep._pad_labels(labels.astype(jnp.int32), U)  # (B, U-1)
    labels_u = jnp.pad(labels_u, ((0, 0), (0, 1)), constant_values=0)  # (B, U)

    if log_probs_input:
        grads = _gradients.grad_wrt_log_probs(
            prepped.lpb, prepped.lpe, res.alphas, res.betas, res.ll_forward,
            labels_u, input_lengths, label_lengths, blank, V, acts.dtype,
            fastemit_lambda=fastemit_lambda,
        )
    else:
        grads = _gradients.grad_wrt_acts(
            acts, prepped.denom, prepped.lpb, prepped.lpe, res.alphas, res.betas,
            res.ll_forward, labels_u, input_lengths, label_lengths, blank,
            out_dtype=acts.dtype, fastemit_lambda=fastemit_lambda,
        )
    costs = (-res.ll_forward).astype(acts.dtype)
    return costs, grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _rnnt_costs(acts, labels, input_lengths, label_lengths, blank, log_probs_input, implementation, check_tol, fastemit_lambda, delay_penalty):
    # Primal-only path: no gradient work at all (scoring under plain jit).
    # The optional self-check needs betas, so it forces the full sweep.
    B, T, U, V = acts.shape
    cdtype = _compute_dtype(acts.dtype)
    prepped = _prep.prepare(acts, labels, blank, log_probs_input, compute_dtype=cdtype)
    if delay_penalty:
        prepped = prepped._replace(
            lpe=_prep.delay_shift(prepped.lpe, input_lengths, delay_penalty))
    res = _run_lattice(implementation, prepped, input_lengths, label_lengths,
                       compute_betas=check_tol is not None)
    _maybe_check_mismatch(res, check_tol)
    return (-res.ll_forward).astype(acts.dtype)


def _rnnt_costs_fwd(acts, labels, input_lengths, label_lengths, blank, log_probs_input, implementation, check_tol, fastemit_lambda, delay_penalty):
    """Forward: lattice only. The dense O(B·T·U·V) gradient pass runs in the
    BACKWARD, with the upstream cotangent folded into its small (B, T, U)
    coefficients — unlike the reference (which computes the gradient during
    forward and has backward rescale it, costing an extra full read+write of
    the big tensor, pytorch __init__.py:43-50), the big tensor is touched
    exactly twice per training step: one read at prep, one read+write at the
    fused gradient pass. Residuals are the (B, T, U) lattice arrays.
    """
    cdtype = _compute_dtype(acts.dtype)
    prepped = _prep.prepare(acts, labels, blank, log_probs_input, compute_dtype=cdtype)
    if delay_penalty:
        prepped = prepped._replace(
            lpe=_prep.delay_shift(prepped.lpe, input_lengths, delay_penalty))
    res = _run_lattice(implementation, prepped, input_lengths, label_lengths)
    _maybe_check_mismatch(res, check_tol)
    costs = (-res.ll_forward).astype(acts.dtype)
    residuals = (
        acts, prepped.lpb, prepped.lpe, prepped.denom,
        res.alphas, res.betas, res.ll_forward,
        labels, input_lengths, label_lengths,
    )
    return costs, residuals


def _rnnt_costs_bwd(blank, log_probs_input, implementation, check_tol, fastemit_lambda, delay_penalty, residuals, g):
    (acts, lpb, lpe, denom, alphas, betas, ll,
     labels, input_lengths, label_lengths) = residuals
    B, T, U, V = acts.shape
    labels_u = _prep._pad_labels(labels.astype(jnp.int32), U)
    labels_u = jnp.pad(labels_u, ((0, 0), (0, 1)), constant_values=0)
    scale = g.astype(alphas.dtype)

    if log_probs_input:
        d_acts = _gradients.grad_wrt_log_probs(
            lpb, lpe, alphas, betas, ll, labels_u,
            input_lengths, label_lengths, blank, V, acts.dtype, scale=scale,
            fastemit_lambda=fastemit_lambda,
        )
    else:
        d_acts = _gradients.grad_wrt_acts(
            acts, denom, lpb, lpe, alphas, betas, ll, labels_u,
            input_lengths, label_lengths, blank, out_dtype=acts.dtype, scale=scale,
            fastemit_lambda=fastemit_lambda,
        )

    def int_zero(x):
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    return (d_acts, int_zero(labels), int_zero(input_lengths), int_zero(label_lengths))


_rnnt_costs.defvjp(_rnnt_costs_fwd, _rnnt_costs_bwd)


def rnnt_loss(
    acts: jax.Array,
    labels: jax.Array,
    input_lengths: jax.Array,
    label_lengths: jax.Array,
    blank: int = 0,
    reduction: str = "mean",
    log_probs_input: bool = False,
    implementation: str = "auto",
    fastemit_lambda: float = 0.0,
    delay_penalty: float = 0.0,
    options=None,
) -> jax.Array:
    """RNN-Transducer loss.

    Args:
      acts: (B, T, U, V) joint-network outputs — raw activations by default
        (log-softmax is fused into the loss), or log-probs when
        ``log_probs_input``. (B, T, U, V) is the one canonical layout; the
        reference's T-major ``batch_first=false`` option
        (/root/reference/include/rnnt.h:59-63) is intentionally not carried —
        transpose at the caller (XLA folds it into the producer).
      labels: (B, L) int32 zero-padded targets, L >= U-1.
      input_lengths: (B,) int32 valid encoder lengths.
      label_lengths: (B,) int32 label counts (U_b = label_lengths + 1).
      blank: blank symbol index (default 0).
      reduction: 'none' | 'sum' | 'mean' (mean divides by batch size, matching
        /root/reference/pytorch_binding/warprnnt_pytorch/__init__.py:36-41).
      log_probs_input: use the reference-CPU convention (inputs already
        log-softmaxed; sparse gradient).
      implementation: 'auto' | 'xla' | 'pallas'. On 'auto', bf16/f16 acts at
        V < 512 are upcast to f32 (bf16 measured slower there — no HBM
        relief, extra converts); at large V the native dtype is kept and
        halves the big-tensor traffic.
      fastemit_lambda: FastEmit regularization strength λ (Yu et al.,
        arXiv:2010.11148). Affects only the GRADIENT: the emit-arc
        posterior is scaled by (1 + λ), biasing training toward earlier
        emissions for lower streaming latency. The returned loss value is
        the unmodified negative log-likelihood. 0 (default) disables.
      delay_penalty: delay-penalized transducer strength λ
        (arXiv:2211.00490): every emit arc at frame t has
        λ·((T_b-1)/2 - t) added to its log-weight, rewarding earlier
        emissions. Unlike FastEmit this changes the OBJECTIVE (loss value
        and gradients together, exactly differentiable). 0 disables.
      options: optional ``RNNTOptions``; when given its fields take
        precedence over the individual kwargs, and its
        ``fwd_bwd_check_tol`` arms the forward/backward likelihood
        self-check (reference mismatch warning, cpu_rnnt.h:167-169).

    Returns:
      (B,) costs for reduction='none', scalar otherwise. Differentiable
      w.r.t. ``acts``.
    """
    check_tol = None
    if options is not None:
        blank = options.blank
        reduction = options.reduction
        log_probs_input = options.log_probs_input
        implementation = options.implementation
        check_tol = options.fwd_bwd_check_tol
        fastemit_lambda = options.fastemit_lambda
        delay_penalty = options.delay_penalty
    _certify_inputs(acts, labels, input_lengths, label_lengths)
    if reduction not in ("none", "sum", "mean"):
        raise ValueError(f"reduction must be none|sum|mean, got {reduction!r}")
    if fastemit_lambda < 0:
        raise ValueError(f"fastemit_lambda must be >= 0, got {fastemit_lambda}")
    if delay_penalty < 0:
        raise ValueError(f"delay_penalty must be >= 0, got {delay_penalty}")
    acts = _steer_dtype(acts, implementation)
    impl = _pick_implementation(implementation)
    costs = _rnnt_costs(
        acts, labels, input_lengths, label_lengths, int(blank),
        bool(log_probs_input), impl,
        None if check_tol is None else float(check_tol),
        float(fastemit_lambda), float(delay_penalty),
    )
    if reduction == "sum":
        return jnp.sum(costs)
    if reduction == "mean":
        return jnp.mean(costs)
    return costs


def rnnt_loss_and_grad(
    acts, labels, input_lengths, label_lengths, blank=0,
    log_probs_input=False, implementation="auto", fastemit_lambda=0.0,
    delay_penalty=0.0,
):
    """Return (costs[B], grads[B,T,U,V]) in one call — the ``cost_and_grad``
    entry point of the C API (/root/reference/include/rnnt.h:104-113)."""
    _certify_inputs(acts, labels, input_lengths, label_lengths)
    impl = _pick_implementation(implementation)
    return _forward(
        acts, labels, input_lengths, label_lengths, int(blank),
        bool(log_probs_input), impl, fastemit_lambda=float(fastemit_lambda),
        delay_penalty=float(delay_penalty),
    )


def rnnt_score(
    acts, labels, input_lengths, label_lengths, blank=0,
    log_probs_input=False, implementation="auto",
):
    """Loss-only scoring path: alphas only, no betas/gradient — the
    ``score_forward`` fast path (/root/reference/src/rnnt_entrypoint.cpp:70-72).
    Not differentiable; wrap ``rnnt_loss`` for gradients."""
    _certify_inputs(acts, labels, input_lengths, label_lengths)
    impl = _pick_implementation(implementation)
    cdtype = _compute_dtype(acts.dtype)
    prepped = _prep.prepare(acts, labels, int(blank), bool(log_probs_input), compute_dtype=cdtype)
    res = _run_lattice(impl, prepped, input_lengths, label_lengths, compute_betas=False)
    return (-res.ll_forward).astype(acts.dtype)


def rnnt_forward_backward(
    acts, labels, input_lengths, label_lengths, blank=0,
    log_probs_input=False, implementation="auto",
):
    """Debug introspection: return the full lattice state.

    The TPU analog of the reference's ``DEBUG_KERNEL`` alpha/beta dumps
    (/root/reference/include/detail/cpu_rnnt.h:197-207, gpu_rnnt.h:136-156):
    returns a ``LatticeResult`` with (B, T, U) alphas/betas and per-utterance
    forward/backward log-likelihoods. Invalid cells hold a large negative
    sentinel (or -inf in the XLA engine).
    """
    _certify_inputs(acts, labels, input_lengths, label_lengths)
    impl = _pick_implementation(implementation)
    cdtype = _compute_dtype(acts.dtype)
    prepped = _prep.prepare(acts, labels, int(blank), bool(log_probs_input), compute_dtype=cdtype)
    return _run_lattice(impl, prepped, input_lengths, label_lengths)


def forward_backward_mismatch(
    acts, labels, input_lengths, label_lengths, blank=0,
    log_probs_input=False, implementation="auto",
):
    """Numerical self-check: per-utterance |ll_forward - ll_backward|.

    The reference warns when this exceeds 0.1 (cpu_rnnt.h:167-169); here the
    caller gets the actual residual to assert on or log.
    """
    res = rnnt_forward_backward(
        acts, labels, input_lengths, label_lengths, blank=blank,
        log_probs_input=log_probs_input, implementation=implementation,
    )
    return jnp.abs(res.ll_forward - res.ll_backward)


class RNNTLoss:
    """Module-style wrapper mirroring ``RNNTLoss``
    (/root/reference/pytorch_binding/warprnnt_pytorch/__init__.py:73-100).

    Accepts either the individual kwargs or a full ``RNNTOptions`` bundle
    (``RNNTLoss(options=RNNTOptions(...))``), the JAX mirror of constructing
    the reference's ``rnntOptions`` struct once and reusing it per call.
    """

    def __init__(self, blank: int = 0, reduction: str = "mean",
                 log_probs_input: bool = False, implementation: str = "auto",
                 fastemit_lambda: float = 0.0, options=None):
        if options is None:
            from ..utils.options import RNNTOptions

            options = RNNTOptions(
                blank=blank, reduction=reduction,
                log_probs_input=log_probs_input, implementation=implementation,
                fastemit_lambda=fastemit_lambda,
            )
        self.options = options
        self.blank = options.blank
        self.reduction = options.reduction
        self.log_probs_input = options.log_probs_input
        self.implementation = options.implementation

    def __call__(self, acts, labels, input_lengths, label_lengths):
        return rnnt_loss(
            acts, labels, input_lengths, label_lengths, options=self.options
        )
