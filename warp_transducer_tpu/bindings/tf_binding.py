"""TensorFlow binding over the native CPU backend.

Capability parity with the reference's TF custom op
(/root/reference/tensorflow_binding/): a ``tf.custom_gradient`` function
computing costs in forward and replaying the cached analytic gradient in
backward (the reference op likewise returns grads as a second output and its
registered gradient only rescales them, tf ``__init__.py:37-42``).

TensorFlow is an optional dependency; this module imports lazily and raises
a clear error if TF is absent.  CPU-only — the TPU path is the JAX API.
"""
from __future__ import annotations

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


def rnnt_loss(acts, labels, input_lengths, label_lengths, blank=0,
              from_log_probs=False):
    """RNN-T loss for TF graphs: returns per-utterance costs (B,),
    differentiable w.r.t. ``acts``."""
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
