"""TensorFlow binding: the JAX RNN-T loss lowered into TF via jax2tf.

Capability parity with the reference's compiled TF custom op
(/root/reference/tensorflow_binding/src/warprnnt_op.cc:13-191 and
``warprnnt_tensorflow/__init__.py:9-48``), redesigned the TPU-native way:
instead of a hand-built C++ kernel + registered gradient, the *same*
``jax.custom_vjp`` op that serves JAX users is converted with
``jax2tf.convert(with_gradient=True)``:

* graph-compatible: the op lowers to a single ``XlaCallModule`` (StableHLO)
  node — works under ``tf.function``, serializes into a SavedModel, and
  runs on any TF device with an XLA backend (the reference op is CPU/GPU
  kernels compiled per framework build);
* the registered gradient is the real analytic VJP (lazy backward pass),
  not a cached-grads rescale, so TF training steps get the same
  memory/performance profile as JAX ones;
* dtype fidelity: f32 and bf16 pass straight through (the reference op
  registers float32 only and silently rejects everything else,
  warprnnt_op.cc:136-150).

TensorFlow is an optional dependency; this module imports it lazily.
The legacy native-CPU path (``tf.numpy_function`` over the C backend) is
kept as ``rnnt_loss_native_op`` for environments without an XLA-capable
TF runtime.
"""
from __future__ import annotations

import functools

import numpy as np

from .native import rnnt_loss_native


def _tf():
    try:
        import tensorflow as tf  # noqa: F401
        return tf
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "tensorflow is not installed; the tf binding requires it. "
            "Use the JAX API (warp_transducer_tpu.rnnt_loss) instead."
        ) from e


@functools.lru_cache(maxsize=None)
def _converted_loss(blank: int, log_probs_input: bool,
                    platforms: tuple = ("cpu",),
                    fastemit_lambda: float = 0.0,
                    delay_penalty: float = 0.0):
    from jax.experimental import jax2tf

    from ..ops.rnnt import rnnt_loss as jax_rnnt_loss

    def fn(acts, labels, input_lengths, label_lengths):
        # implementation='xla': the portable engine — a Pallas custom call
        # would pin the StableHLO payload to one backend, and the lowering
        # platform must be chosen HERE (TF's runtime device), not inherited
        # from whatever jax.default_backend() happens to be.
        return jax_rnnt_loss(
            acts, labels, input_lengths, label_lengths,
            blank=blank, reduction="none", log_probs_input=log_probs_input,
            implementation="xla", fastemit_lambda=fastemit_lambda,
            delay_penalty=delay_penalty,
        )

    return jax2tf.convert(
        fn, with_gradient=True, native_serialization_platforms=platforms
    )


def rnnt_loss(acts, labels, input_lengths, label_lengths, blank=0,
              from_log_probs=False, platforms=("cpu",),
              fastemit_lambda=0.0, delay_penalty=0.0):
    """RNN-T loss for TF graphs: per-utterance costs (B,), differentiable
    w.r.t. ``acts`` — the drop-in for ``warprnnt_tensorflow.rnnt_loss``
    (/root/reference/tensorflow_binding/warprnnt_tensorflow/__init__.py:9-34).

    Args:
      acts: (B, T, U, V) float32/bfloat16 joint activations (raw by
        default; log-softmax is fused into the loss).
      labels: (B, L) int32 targets, L >= U-1.
      input_lengths / label_lengths: (B,) int32.
      blank: blank index.
      from_log_probs: inputs already log-softmaxed (reference CPU
        convention; sparse gradient).
      platforms: lowering targets baked into the StableHLO payload
        (default CPU; pass ("cpu", "tpu") for a module that runs on both).
      fastemit_lambda: FastEmit strength λ (arXiv:2010.11148): scales the
        emit-arc gradient by (1 + λ); the loss value is unchanged.
    """
    tf = _tf()
    fn = _converted_loss(int(blank), bool(from_log_probs), tuple(platforms),
                         float(fastemit_lambda), float(delay_penalty))
    return fn(
        acts,
        tf.cast(labels, tf.int32),
        tf.cast(input_lengths, tf.int32),
        tf.cast(label_lengths, tf.int32),
    )


@functools.lru_cache(maxsize=None)
def _converted_simple(blank: int, platforms: tuple,
                      fastemit_lambda: float = 0.0,
                      delay_penalty: float = 0.0):
    from jax.experimental import jax2tf

    from ..ops.simple import rnnt_loss_simple as jax_simple

    def fn(am, lm, labels, input_lengths, label_lengths):
        return jax_simple(
            am, lm, labels, input_lengths, label_lengths,
            blank=blank, reduction="none", implementation="xla",
            fastemit_lambda=fastemit_lambda, delay_penalty=delay_penalty,
        )

    return jax2tf.convert(
        fn, with_gradient=True, native_serialization_platforms=platforms
    )


def rnnt_loss_simple(am, lm, labels, input_lengths, label_lengths, blank=0,
                     platforms=("cpu",), fastemit_lambda=0.0,
                     delay_penalty=0.0):
    """Factorised additive-joiner loss for TF graphs: am (B, T, V) +
    lm (B, U, V), never materialising (B, T, U, V); differentiable w.r.t.
    both. Same jax2tf lowering as ``rnnt_loss``."""
    tf = _tf()
    fn = _converted_simple(int(blank), tuple(platforms),
                           float(fastemit_lambda), float(delay_penalty))
    return fn(
        am, lm,
        tf.cast(labels, tf.int32),
        tf.cast(input_lengths, tf.int32),
        tf.cast(label_lengths, tf.int32),
    )


@functools.lru_cache(maxsize=None)
def _converted_pruned(blank: int, platforms: tuple,
                      fastemit_lambda: float = 0.0,
                      delay_penalty: float = 0.0):
    from jax.experimental import jax2tf

    from ..ops.pruned import rnnt_loss_pruned as jax_pruned

    def fn(acts, ranges, labels, input_lengths, label_lengths):
        return jax_pruned(
            acts, ranges, labels, input_lengths, label_lengths,
            blank=blank, reduction="none", implementation="xla",
            fastemit_lambda=fastemit_lambda, delay_penalty=delay_penalty,
        )

    return jax2tf.convert(
        fn, with_gradient=True, native_serialization_platforms=platforms
    )


def rnnt_loss_pruned(acts, ranges, labels, input_lengths, label_lengths,
                     blank=0, platforms=("cpu",), fastemit_lambda=0.0,
                     delay_penalty=0.0):
    """Banded (pruned) loss for TF graphs: acts (B, T, S, V) on the band
    whose starts are ``ranges`` (B, T) from the JAX ``rnnt_prune_ranges``;
    differentiable w.r.t. acts. Same jax2tf lowering as ``rnnt_loss``."""
    tf = _tf()
    fn = _converted_pruned(int(blank), tuple(platforms),
                           float(fastemit_lambda), float(delay_penalty))
    return fn(
        acts,
        tf.cast(ranges, tf.int32),
        tf.cast(labels, tf.int32),
        tf.cast(input_lengths, tf.int32),
        tf.cast(label_lengths, tf.int32),
    )


@functools.lru_cache(maxsize=None)
def _converted_fused(blank: int, platforms: tuple,
                     fastemit_lambda: float = 0.0,
                     delay_penalty: float = 0.0):
    from jax.experimental import jax2tf

    from ..ops.fused_joint import rnnt_loss_fused_joint as jax_fused

    def fn(e, p, W, bias, labels, input_lengths, label_lengths):
        # implementation='xla': the T-chunked portable engine — the Pallas
        # kernels would pin the StableHLO payload to TPU
        return jax_fused(
            e, p, W, bias, labels, input_lengths, label_lengths,
            blank=blank, reduction="none", implementation="xla",
            fastemit_lambda=fastemit_lambda, delay_penalty=delay_penalty,
        )

    return jax2tf.convert(
        fn, with_gradient=True, native_serialization_platforms=platforms
    )


def rnnt_loss_fused_joint(e, p, W, bias, labels, input_lengths,
                          label_lengths, blank=0, platforms=("cpu",),
                          fastemit_lambda=0.0, delay_penalty=0.0):
    """Joint-fused loss for TF graphs: e (B, T, H) and p (B, U, H) projected
    trunk activations plus the output projection (W (H, V), bias (V,)) —
    the (B, T, U, V) logits are never materialised (a T-chunked lowering;
    see ``ops/fused_joint.py``). Differentiable w.r.t. e, p, W and bias."""
    tf = _tf()
    fn = _converted_fused(int(blank), tuple(platforms),
                          float(fastemit_lambda), float(delay_penalty))
    return fn(
        e, p, W, bias,
        tf.cast(labels, tf.int32),
        tf.cast(input_lengths, tf.int32),
        tf.cast(label_lengths, tf.int32),
    )


@functools.lru_cache(maxsize=None)
def _converted_pruned_fused(blank: int, platforms: tuple, s_range: int,
                            fastemit_lambda: float = 0.0,
                            delay_penalty: float = 0.0):
    from jax.experimental import jax2tf

    from ..ops.pruned_fused import rnnt_loss_pruned_fused as jax_pf

    def fn(e, p, W, bias, ranges, labels, input_lengths, label_lengths):
        return jax_pf(
            e, p, W, bias, ranges, labels, input_lengths, label_lengths,
            s_range=s_range, blank=blank, reduction="none",
            implementation="xla", fastemit_lambda=fastemit_lambda,
            delay_penalty=delay_penalty,
        )

    return jax2tf.convert(
        fn, with_gradient=True, native_serialization_platforms=platforms
    )


def rnnt_loss_pruned_fused(e, p, W, bias, ranges, labels, input_lengths,
                           label_lengths, s_range, blank=0,
                           platforms=("cpu",), fastemit_lambda=0.0,
                           delay_penalty=0.0):
    """Pruned fused joint+loss for TF graphs: the banded (B, T, S, V)
    logits never materialise (see ``ops/pruned_fused.py``). Differentiable
    w.r.t. e, p, W and bias."""
    tf = _tf()
    fn = _converted_pruned_fused(int(blank), tuple(platforms), int(s_range),
                                 float(fastemit_lambda),
                                 float(delay_penalty))
    return fn(
        e, p, W, bias,
        tf.cast(ranges, tf.int32),
        tf.cast(labels, tf.int32),
        tf.cast(input_lengths, tf.int32),
        tf.cast(label_lengths, tf.int32),
    )


@functools.lru_cache(maxsize=None)
def _converted_multiblank(blank: int, durations: tuple, indices, sigma: float,
                          platforms: tuple, fastemit_lambda: float,
                          delay_penalty: float):
    from jax.experimental import jax2tf

    from ..ops.multiblank import rnnt_loss_multiblank as jax_mb

    def fn(acts, labels, input_lengths, label_lengths):
        return jax_mb(
            acts, labels, input_lengths, label_lengths, durations,
            blank=blank, big_blank_indices=indices, sigma=sigma,
            reduction="none", fastemit_lambda=fastemit_lambda,
            delay_penalty=delay_penalty,
        )

    return jax2tf.convert(
        fn, with_gradient=True, native_serialization_platforms=platforms
    )


def rnnt_loss_multiblank(acts, labels, input_lengths, label_lengths,
                         big_blank_durations, blank=0,
                         big_blank_indices=None, sigma=0.0,
                         platforms=("cpu",), fastemit_lambda=0.0,
                         delay_penalty=0.0):
    """Multi-blank transducer loss (arXiv 2211.03541) for TF graphs;
    differentiable w.r.t. ``acts``. Same jax2tf lowering as ``rnnt_loss``;
    see ``ops/multiblank.py`` for semantics."""
    tf = _tf()
    fn = _converted_multiblank(
        int(blank), tuple(int(m) for m in big_blank_durations),
        None if big_blank_indices is None
        else tuple(int(i) for i in big_blank_indices),
        float(sigma), tuple(platforms), float(fastemit_lambda),
        float(delay_penalty))
    return fn(
        acts,
        tf.cast(labels, tf.int32),
        tf.cast(input_lengths, tf.int32),
        tf.cast(label_lengths, tf.int32),
    )


@functools.lru_cache(maxsize=None)
def _converted_tdt(blank: int, durations: tuple, sigma: float,
                   platforms: tuple, fastemit_lambda: float,
                   delay_penalty: float):
    from jax.experimental import jax2tf

    from ..ops.tdt import rnnt_loss_tdt as jax_tdt

    def fn(token_logits, duration_logits, labels, input_lengths,
           label_lengths):
        return jax_tdt(
            token_logits, duration_logits, labels, input_lengths,
            label_lengths, durations, blank=blank, sigma=sigma,
            reduction="none", fastemit_lambda=fastemit_lambda,
            delay_penalty=delay_penalty,
        )

    return jax2tf.convert(
        fn, with_gradient=True, native_serialization_platforms=platforms
    )


def rnnt_loss_tdt(token_logits, duration_logits, labels, input_lengths,
                  label_lengths, durations=(0, 1, 2, 3, 4), blank=0,
                  sigma=0.0, platforms=("cpu",), fastemit_lambda=0.0,
                  delay_penalty=0.0):
    """Token-and-Duration Transducer loss (arXiv 2304.06795) for TF
    graphs; differentiable w.r.t. BOTH logits tensors. Same jax2tf
    lowering as ``rnnt_loss``; see ``ops/tdt.py`` for semantics."""
    tf = _tf()
    fn = _converted_tdt(int(blank), tuple(int(d) for d in durations),
                        float(sigma), tuple(platforms),
                        float(fastemit_lambda), float(delay_penalty))
    return fn(
        token_logits, duration_logits,
        tf.cast(labels, tf.int32),
        tf.cast(input_lengths, tf.int32),
        tf.cast(label_lengths, tf.int32),
    )


def make_rnnt_loss_module(blank: int = 0, from_log_probs: bool = False,
                          platforms=("cpu",)):
    """A ``tf.Module`` wrapping the loss in a ``tf.function`` — ready for
    ``tf.saved_model.save`` (the SavedModel carries the StableHLO payload,
    no Python or JAX needed at serving time)."""
    tf = _tf()
    fn = _converted_loss(int(blank), bool(from_log_probs), tuple(platforms))

    class RNNTLossModule(tf.Module):
        @tf.function(autograph=False)
        def __call__(self, acts, labels, input_lengths, label_lengths):
            return fn(acts, labels, input_lengths, label_lengths)

    return RNNTLossModule()


def rnnt_loss_native_op(acts, labels, input_lengths, label_lengths, blank=0,
                        from_log_probs=False):
    """Legacy eager-only fallback over the native CPU backend
    (``tf.numpy_function``; not graph-serializable — prefer ``rnnt_loss``)."""
    tf = _tf()

    @tf.custom_gradient
    def _loss(acts_t):
        def _forward(a, l, il, ll):
            costs, grads = rnnt_loss_native(
                np.asarray(a), np.asarray(l), np.asarray(il), np.asarray(ll),
                blank=blank, from_log_probs=from_log_probs,
            )
            return costs.astype(np.float32), grads.astype(np.float32)

        costs, grads = tf.numpy_function(
            _forward, [acts_t, labels, input_lengths, label_lengths],
            [tf.float32, tf.float32],
        )
        costs.set_shape([acts_t.shape[0]])
        grads.set_shape(acts_t.shape)

        def grad_fn(dy):
            return tf.reshape(dy, [-1, 1, 1, 1]) * grads

        return costs, grad_fn

    return _loss(acts)


@functools.lru_cache(maxsize=None)
def _converted_tdt_fused(blank: int, durations: tuple, sigma: float,
                         platforms: tuple, fastemit_lambda: float,
                         delay_penalty: float):
    from jax.experimental import jax2tf

    from ..ops.tdt_fused import rnnt_loss_tdt_fused_joint as jax_tdt_fused

    def fn(e, p, W, bias, Wd, bias_d, labels, input_lengths, label_lengths):
        # implementation='xla': the portable engine — the Pallas kernels
        # would pin the StableHLO payload to TPU
        return jax_tdt_fused(
            e, p, W, bias, Wd, bias_d, labels, input_lengths, label_lengths,
            durations, blank=blank, sigma=sigma, reduction="none",
            fastemit_lambda=fastemit_lambda, delay_penalty=delay_penalty,
            implementation="xla",
        )

    return jax2tf.convert(
        fn, with_gradient=True, native_serialization_platforms=platforms
    )


def rnnt_loss_tdt_fused_joint(e, p, W, bias, Wd, bias_d, labels,
                              input_lengths, label_lengths,
                              durations=(0, 1, 2, 3, 4), blank=0, sigma=0.0,
                              platforms=("cpu",), fastemit_lambda=0.0,
                              delay_penalty=0.0):
    """Fused TDT joint+loss for TF graphs: the (B,T,U,V) token logits and
    (B,T,U,H) joint features never materialise (ops/tdt_fused.py).
    Differentiable w.r.t. e, p, W, bias, Wd and bias_d."""
    tf = _tf()
    fn = _converted_tdt_fused(int(blank), tuple(int(d) for d in durations),
                              float(sigma), tuple(platforms),
                              float(fastemit_lambda), float(delay_penalty))
    return fn(
        e, p, W, bias, Wd, bias_d,
        tf.cast(labels, tf.int32),
        tf.cast(input_lengths, tf.int32),
        tf.cast(label_lengths, tf.int32),
    )
