"""PyTorch autograd binding over the native CPU backend.

Drop-in for the reference's ``warprnnt_pytorch``
(/root/reference/pytorch_binding/warprnnt_pytorch/__init__.py): an
autograd ``Function`` whose forward computes costs + caches the analytic
gradient, a functional ``rnnt_loss`` and a module ``RNNTLoss`` with
none|sum|mean reductions.  CPU tensors only — the TPU path is the JAX API.
"""
from __future__ import annotations

import numpy as np

try:
    import torch
    from torch.autograd import Function
except ImportError as e:  # pragma: no cover
    raise ImportError("torch is required for warp_transducer_tpu.bindings.torch_binding") from e

from .native import rnnt_loss_native


def _certify(acts, labels, act_lens, label_lens):
    if acts.dim() != 4:
        raise ValueError("acts must be 4-D (B, T, U, V)")
    if labels.dim() != 2:
        raise ValueError("labels must be 2-D (B, L)")
    for name, t in (("labels", labels), ("act_lens", act_lens), ("label_lens", label_lens)):
        if t.dtype != torch.int32:
            raise TypeError(f"{name} must be int32")
    if not acts.is_contiguous():
        raise ValueError("acts must be contiguous")
    if acts.is_cuda:
        raise ValueError(
            "torch binding is CPU-only; use the JAX API for accelerators"
        )


class _RNNTFunction(Function):
    @staticmethod
    def forward(ctx, acts, labels, act_lens, label_lens, blank, reduction, from_log_probs):
        _certify(acts, labels, act_lens, label_lens)
        costs_np, grads_np = rnnt_loss_native(
            acts.detach().numpy(),
            labels.numpy(),
            act_lens.numpy(),
            label_lens.numpy(),
            blank=blank,
            from_log_probs=from_log_probs,
            compute_grads=acts.requires_grad,
        )
        costs = torch.from_numpy(np.asarray(costs_np)).to(acts.dtype)
        grads = (
            torch.from_numpy(grads_np).to(acts.dtype)
            if grads_np is not None
            else torch.zeros(0, dtype=acts.dtype)
        )
        if reduction in ("sum", "mean"):
            costs = costs.sum().unsqueeze(-1)
            if reduction == "mean":
                costs = costs / acts.size(0)
                if grads.numel():
                    grads = grads / acts.size(0)
        ctx.grads = grads
        return costs

    @staticmethod
    def backward(ctx, grad_output):
        g = grad_output.view(-1, 1, 1, 1).to(ctx.grads)
        return ctx.grads.mul(g), None, None, None, None, None, None


def rnnt_loss(acts, labels, act_lens, label_lens, blank=0, reduction="mean",
              from_log_probs=False):
    """Functional RNN-T loss on CPU torch tensors.

    Unlike the reference, the log-softmax is fused by default (gradients are
    w.r.t. raw activations); pass ``from_log_probs=True`` for pre-normalised
    inputs with sparse gradients.
    """
    if reduction not in ("none", "sum", "mean"):
        raise ValueError(f"reduction must be none|sum|mean, got {reduction!r}")
    return _RNNTFunction.apply(
        acts, labels, act_lens, label_lens, blank, reduction, from_log_probs
    )


class RNNTLoss(torch.nn.Module):
    def __init__(self, blank=0, reduction="mean", from_log_probs=False):
        super().__init__()
        self.blank = blank
        self.reduction = reduction
        self.from_log_probs = from_log_probs

    def forward(self, acts, labels, act_lens, label_lens):
        return rnnt_loss(
            acts, labels, act_lens, label_lens,
            blank=self.blank, reduction=self.reduction,
            from_log_probs=self.from_log_probs,
        )
