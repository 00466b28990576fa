"""PyTorch autograd binding over the native CPU backend (or the JAX op).

Drop-in for the reference's ``warprnnt_pytorch``
(/root/reference/pytorch_binding/warprnnt_pytorch/__init__.py): an
autograd ``Function`` whose forward computes costs + caches the analytic
gradient, a functional ``rnnt_loss`` and a module ``RNNTLoss`` with
none|sum|mean reductions.

Two backends (the reference's CPU/GPU dispatch analog,
``binding.cpp:46-156``):

* ``backend="native"`` (default) — the C++ OpenMP engine via ctypes;
  CPU tensors, zero Python in the hot loop.
* ``backend="jax"`` — torch tensors bridged through dlpack (zero-copy on
  CPU) into the JAX op, which runs on JAX's default device: on a TPU
  host this IS the accelerator-resident torch path (the XLA/Pallas
  engines compute, only the host<->device transfer is paid — exactly
  what the reference's ``gpu_rnnt`` binding does with CUDA memcpys).
"""
from __future__ import annotations

import numpy as np

try:
    import torch
    from torch.autograd import Function
except ImportError as e:  # pragma: no cover
    raise ImportError("torch is required for warp_transducer_tpu.bindings.torch_binding") from e

from .native import (
    rnnt_loss_fused_joint_native,
    rnnt_loss_multiblank_fused_native,
    rnnt_loss_multiblank_native,
    rnnt_loss_tdt_fused_native,
    rnnt_loss_tdt_native,
    rnnt_loss_native,
    rnnt_loss_pruned_fused_native,
    rnnt_loss_pruned_native,
    rnnt_loss_simple_native,
)


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


def _to_jax(t):
    """torch CPU tensor -> JAX array; dlpack zero-copy when the CPU
    platform is available, numpy fallback otherwise."""
    import jax
    import jax.numpy as jnp

    t = t.detach().contiguous()
    try:
        return jax.dlpack.from_dlpack(t)
    except Exception:
        return jnp.asarray(t.numpy())


def _jax_compute(compute_grads, blank, from_log_probs, fastemit_lambda,
                 delay_penalty):
    """Shape-polymorphic jitted (costs, grads) on JAX's default device;
    one cache entry per static-config tuple (jit handles shape specialisation)."""
    import jax

    key = (compute_grads, blank, from_log_probs, fastemit_lambda,
           delay_penalty)
    fn = _jax_compute._cache.get(key)
    if fn is None:
        from ..ops.rnnt import rnnt_loss, rnnt_loss_and_grad

        if compute_grads:
            def f(a, l, il, ll):
                return rnnt_loss_and_grad(
                    a, l, il, ll, blank=blank,
                    log_probs_input=from_log_probs,
                    fastemit_lambda=fastemit_lambda,
                    delay_penalty=delay_penalty)
        else:
            def f(a, l, il, ll):
                return rnnt_loss(
                    a, l, il, ll, blank=blank, reduction="none",
                    log_probs_input=from_log_probs,
                    fastemit_lambda=fastemit_lambda,
                    delay_penalty=delay_penalty), None
        fn = _jax_compute._cache[key] = jax.jit(f)
    return fn


_jax_compute._cache = {}


class _RNNTFunctionJax(Function):
    """The JAX-backend twin of ``_RNNTFunction``: same contract, compute
    runs through the XLA/Pallas engines on JAX's default device."""

    @staticmethod
    def forward(ctx, acts, labels, act_lens, label_lens, blank, reduction,
                from_log_probs, fastemit_lambda, delay_penalty):
        _certify(acts, labels, act_lens, label_lens)
        fn = _jax_compute(acts.requires_grad, blank, from_log_probs,
                          fastemit_lambda, delay_penalty)
        costs_j, grads_j = fn(_to_jax(acts), _to_jax(labels),
                              _to_jax(act_lens), _to_jax(label_lens))

        def to_torch(x):
            try:  # zero-copy when devices line up
                return torch.from_dlpack(x).to(acts.dtype)
            except Exception:
                return torch.from_numpy(np.asarray(x).copy()).to(acts.dtype)

        costs = to_torch(costs_j)
        grads = (to_torch(grads_j) if grads_j is not None
                 else torch.zeros(0, dtype=acts.dtype))
        costs, (grads,) = _reduce(costs, [grads], reduction, acts.size(0))
        ctx.grads = grads
        return costs

    @staticmethod
    def backward(ctx, grad_output):
        g = grad_output.view(-1, 1, 1, 1).to(ctx.grads)
        return ctx.grads.mul(g), None, None, None, None, None, None, None, None


class _RNNTFunction(Function):
    @staticmethod
    def forward(ctx, acts, labels, act_lens, label_lens, blank, reduction,
                from_log_probs, fastemit_lambda, delay_penalty):
        _certify(acts, labels, act_lens, label_lens)
        costs_np, grads_np = rnnt_loss_native(
            acts.detach().numpy(),
            labels.numpy(),
            act_lens.numpy(),
            label_lens.numpy(),
            blank=blank,
            from_log_probs=from_log_probs,
            compute_grads=acts.requires_grad,
            fastemit_lambda=fastemit_lambda,
            delay_penalty=delay_penalty,
        )
        costs = torch.from_numpy(np.asarray(costs_np)).to(acts.dtype)
        grads = (
            torch.from_numpy(grads_np).to(acts.dtype)
            if grads_np is not None
            else torch.zeros(0, dtype=acts.dtype)
        )
        costs, (grads,) = _reduce(costs, [grads], reduction, acts.size(0))
        ctx.grads = grads
        return costs

    @staticmethod
    def backward(ctx, grad_output):
        g = grad_output.view(-1, 1, 1, 1).to(ctx.grads)
        return ctx.grads.mul(g), None, None, None, None, None, None, None, None


def rnnt_loss(acts, labels, act_lens, label_lens, blank=0, reduction="mean",
              from_log_probs=False, fastemit_lambda=0.0, delay_penalty=0.0,
              backend="native"):
    """Functional RNN-T loss on CPU torch tensors.

    Unlike the reference, the log-softmax is fused by default (gradients are
    w.r.t. raw activations); pass ``from_log_probs=True`` for pre-normalised
    inputs with sparse gradients. ``fastemit_lambda`` scales the emit-arc
    gradient by (1 + λ) (FastEmit, arXiv:2010.11148); the loss value is
    unchanged. ``backend="jax"`` routes through the JAX op (dlpack bridge);
    on a TPU host the loss then computes on the accelerator.
    """
    if reduction not in ("none", "sum", "mean"):
        raise ValueError(f"reduction must be none|sum|mean, got {reduction!r}")
    if backend not in ("native", "jax"):
        raise ValueError(f"backend must be native|jax, got {backend!r}")
    fn = _RNNTFunctionJax if backend == "jax" else _RNNTFunction
    return fn.apply(
        acts, labels, act_lens, label_lens, blank, reduction, from_log_probs,
        fastemit_lambda, delay_penalty,
    )


class RNNTLoss(torch.nn.Module):
    def __init__(self, blank=0, reduction="mean", from_log_probs=False,
                 fastemit_lambda=0.0, delay_penalty=0.0, backend="native"):
        super().__init__()
        self.blank = blank
        self.reduction = reduction
        self.from_log_probs = from_log_probs
        self.fastemit_lambda = fastemit_lambda
        self.delay_penalty = delay_penalty
        self.backend = backend

    def forward(self, acts, labels, act_lens, label_lens):
        return rnnt_loss(
            acts, labels, act_lens, label_lens,
            blank=self.blank, reduction=self.reduction,
            from_log_probs=self.from_log_probs,
            fastemit_lambda=self.fastemit_lambda,
            delay_penalty=self.delay_penalty,
            backend=self.backend,
        )


def _reduce(costs, grads_list, reduction, B):
    if reduction in ("sum", "mean"):
        costs = costs.sum().unsqueeze(-1)
        if reduction == "mean":
            costs = costs / B
            grads_list = [g / B if g.numel() else g for g in grads_list]
    return costs, grads_list


class _RNNTSimpleFunction(Function):
    @staticmethod
    def forward(ctx, am, lm, labels, act_lens, label_lens, blank, reduction,
                fastemit_lambda, delay_penalty):
        needs_grad = am.requires_grad or lm.requires_grad
        costs_np, gam_np, glm_np = rnnt_loss_simple_native(
            am.detach().numpy(), lm.detach().numpy(), labels.numpy(),
            act_lens.numpy(), label_lens.numpy(), blank=blank,
            compute_grads=needs_grad, fastemit_lambda=fastemit_lambda,
            delay_penalty=delay_penalty,
        )
        costs = torch.from_numpy(np.asarray(costs_np)).to(am.dtype)
        z = torch.zeros(0, dtype=am.dtype)
        gam = torch.from_numpy(gam_np).to(am.dtype) if gam_np is not None else z
        glm = torch.from_numpy(glm_np).to(lm.dtype) if glm_np is not None else z
        costs, (gam, glm) = _reduce(costs, [gam, glm], reduction, am.size(0))
        ctx.gam, ctx.glm = gam, glm
        return costs

    @staticmethod
    def backward(ctx, grad_output):
        ga = ctx.gam.mul(grad_output.view(-1, 1, 1).to(ctx.gam))
        gl = ctx.glm.mul(grad_output.view(-1, 1, 1).to(ctx.glm))
        return ga, gl, None, None, None, None, None, None, None


def rnnt_loss_simple(am, lm, labels, act_lens, label_lens, blank=0,
                     reduction="mean", fastemit_lambda=0.0,
                     delay_penalty=0.0):
    """Factorised additive-joiner loss on CPU torch tensors: am (B, T, V) +
    lm (B, U, V), never materialising (B, T, U, V) — torch twin of the JAX
    ``rnnt_loss_simple`` over the native engine."""
    if reduction not in ("none", "sum", "mean"):
        raise ValueError(f"reduction must be none|sum|mean, got {reduction!r}")
    return _RNNTSimpleFunction.apply(
        am, lm, labels, act_lens, label_lens, blank, reduction,
        fastemit_lambda, delay_penalty,
    )


class _RNNTFusedFunction(Function):
    @staticmethod
    def forward(ctx, e, p, W, bias, labels, act_lens, label_lens, blank,
                reduction, fastemit_lambda, delay_penalty):
        needs_grad = any(t.requires_grad for t in (e, p, W, bias))
        costs_np, gs = rnnt_loss_fused_joint_native(
            e.detach().numpy(), p.detach().numpy(), W.detach().numpy(),
            bias.detach().numpy(), labels.numpy(), act_lens.numpy(),
            label_lens.numpy(), blank=blank, compute_grads=needs_grad,
            fastemit_lambda=fastemit_lambda, delay_penalty=delay_penalty,
        )
        costs = torch.from_numpy(np.asarray(costs_np)).to(e.dtype)
        z = torch.zeros(0, dtype=e.dtype)
        gts = ([torch.from_numpy(np.asarray(g)).to(e.dtype) for g in gs]
               if gs is not None else [z] * 4)
        costs, gts = _reduce(costs, gts, reduction, e.size(0))
        ctx.gts = gts
        return costs

    @staticmethod
    def backward(ctx, grad_output):
        # sum/mean only: one scalar cotangent scales all four gradients
        s = grad_output.sum().to(ctx.gts[0].dtype)
        return tuple(g * s for g in ctx.gts) + (None,) * 7


def rnnt_loss_fused_joint(e, p, W, bias, labels, act_lens, label_lens,
                          blank=0, reduction="mean", fastemit_lambda=0.0,
                          delay_penalty=0.0):
    """Joint-fused loss on CPU torch tensors: e (B, T, H), p (B, U, H)
    projected trunk activations, W (H, V)/bias (V,) output projection — the
    (B, T, U, V) logits are never materialised (torch twin of the JAX
    ``rnnt_loss_fused_joint`` over the native engine). Differentiable
    w.r.t. all four inputs.

    Only ``reduction='sum'|'mean'``: dW/db come back minibatch-summed from
    the native engine, so per-utterance cotangents (``'none'``) cannot be
    applied exactly."""
    if reduction not in ("sum", "mean"):
        raise ValueError(
            "fused joint supports reduction sum|mean only (dW/db are "
            f"minibatch-summed), got {reduction!r}"
        )
    return _RNNTFusedFunction.apply(
        e, p, W, bias, labels, act_lens, label_lens, blank, reduction,
        fastemit_lambda, delay_penalty,
    )


class _RNNTPrunedFunction(Function):
    @staticmethod
    def forward(ctx, acts, ranges, labels, act_lens, label_lens, blank,
                reduction, fastemit_lambda, delay_penalty):
        costs_np, grads_np = rnnt_loss_pruned_native(
            acts.detach().numpy(), ranges.numpy(), labels.numpy(),
            act_lens.numpy(), label_lens.numpy(), blank=blank,
            compute_grads=acts.requires_grad,
            fastemit_lambda=fastemit_lambda, delay_penalty=delay_penalty,
        )
        costs = torch.from_numpy(np.asarray(costs_np)).to(acts.dtype)
        grads = (torch.from_numpy(grads_np).to(acts.dtype)
                 if grads_np is not None else torch.zeros(0, dtype=acts.dtype))
        costs, (grads,) = _reduce(costs, [grads], reduction, acts.size(0))
        ctx.grads = grads
        return costs

    @staticmethod
    def backward(ctx, grad_output):
        g = grad_output.view(-1, 1, 1, 1).to(ctx.grads)
        return ctx.grads.mul(g), None, None, None, None, None, None, None, None


def rnnt_loss_pruned(acts, ranges, labels, act_lens, label_lens, blank=0,
                     reduction="mean", fastemit_lambda=0.0,
                     delay_penalty=0.0):
    """Banded (pruned) loss on CPU torch tensors: acts (B, T, S, V) on the
    band, ranges (B, T) band starts — torch twin of the JAX
    ``rnnt_loss_pruned`` over the native engine."""
    if reduction not in ("none", "sum", "mean"):
        raise ValueError(f"reduction must be none|sum|mean, got {reduction!r}")
    return _RNNTPrunedFunction.apply(
        acts, ranges, labels, act_lens, label_lens, blank, reduction,
        fastemit_lambda, delay_penalty,
    )


class _RNNTPrunedFusedFunction(Function):
    @staticmethod
    def forward(ctx, e, p, W, bias, ranges, labels, act_lens, label_lens,
                s_range, blank, reduction, fastemit_lambda, delay_penalty):
        needs_grad = any(t.requires_grad for t in (e, p, W, bias))
        costs_np, gs = rnnt_loss_pruned_fused_native(
            e.detach().numpy(), p.detach().numpy(), W.detach().numpy(),
            bias.detach().numpy(), ranges.numpy(), labels.numpy(),
            act_lens.numpy(), label_lens.numpy(), s_range=s_range,
            blank=blank, compute_grads=needs_grad,
            fastemit_lambda=fastemit_lambda, delay_penalty=delay_penalty,
        )
        costs = torch.from_numpy(np.asarray(costs_np)).to(e.dtype)
        z = torch.zeros(0, dtype=e.dtype)
        gts = ([torch.from_numpy(np.asarray(g)).to(e.dtype) for g in gs]
               if gs is not None else [z] * 4)
        costs, gts = _reduce(costs, gts, reduction, e.size(0))
        ctx.gts = gts
        return costs

    @staticmethod
    def backward(ctx, grad_output):
        # sum/mean only: one scalar cotangent scales all four gradients
        s = grad_output.sum().to(ctx.gts[0].dtype)
        return tuple(g * s for g in ctx.gts) + (None,) * 9


def rnnt_loss_pruned_fused(e, p, W, bias, ranges, labels, act_lens,
                           label_lens, s_range, blank=0, reduction="mean",
                           fastemit_lambda=0.0, delay_penalty=0.0):
    """Pruned fused joint+loss on CPU torch tensors: the banded (B,T,S,V)
    logits never materialise (torch twin of the JAX
    ``rnnt_loss_pruned_fused`` over the native engine). Differentiable
    w.r.t. e, p, W and bias.

    Only ``reduction='sum'|'mean'`` (dW/db come back minibatch-summed)."""
    if reduction not in ("sum", "mean"):
        raise ValueError(
            "pruned fused joint supports reduction sum|mean only (dW/db "
            f"are minibatch-summed), got {reduction!r}"
        )
    return _RNNTPrunedFusedFunction.apply(
        e, p, W, bias, ranges, labels, act_lens, label_lens, s_range,
        blank, reduction, fastemit_lambda, delay_penalty,
    )


class _RNNTMultiblankFunction(Function):
    @staticmethod
    def forward(ctx, acts, labels, act_lens, label_lens, durations, indices,
                blank, sigma, reduction, from_log_probs, fastemit_lambda,
                delay_penalty):
        _certify(acts, labels, act_lens, label_lens)
        costs_np, grads_np = rnnt_loss_multiblank_native(
            acts.detach().numpy(),
            labels.numpy(),
            act_lens.numpy(),
            label_lens.numpy(),
            durations,
            blank=blank,
            big_blank_indices=indices,
            sigma=sigma,
            from_log_probs=from_log_probs,
            compute_grads=acts.requires_grad,
            fastemit_lambda=fastemit_lambda,
            delay_penalty=delay_penalty,
        )
        costs = torch.from_numpy(np.asarray(costs_np)).to(acts.dtype)
        grads = (
            torch.from_numpy(grads_np).to(acts.dtype)
            if grads_np is not None
            else torch.zeros(0, dtype=acts.dtype)
        )
        costs, (grads,) = _reduce(costs, [grads], reduction, acts.size(0))
        ctx.grads = grads
        return costs

    @staticmethod
    def backward(ctx, grad_output):
        g = grad_output.view(-1, 1, 1, 1).to(ctx.grads)
        return (ctx.grads.mul(g),) + (None,) * 11


def rnnt_loss_multiblank(acts, labels, act_lens, label_lens,
                         big_blank_durations, blank=0,
                         big_blank_indices=None, sigma=0.0,
                         reduction="mean", from_log_probs=False,
                         fastemit_lambda=0.0, delay_penalty=0.0):
    """Multi-blank transducer loss (arXiv 2211.03541) on CPU torch
    tensors; semantics match the JAX ``rnnt_loss_multiblank`` (big blanks
    default to the LAST K vocab columns; ``sigma`` is the paper's logit
    under-normalization)."""
    if reduction not in ("none", "sum", "mean"):
        raise ValueError(f"reduction must be none|sum|mean, got {reduction!r}")
    durs = tuple(int(m) for m in big_blank_durations)
    idx = (None if big_blank_indices is None
           else tuple(int(i) for i in big_blank_indices))
    return _RNNTMultiblankFunction.apply(
        acts, labels, act_lens, label_lens, durs, idx, blank, float(sigma),
        reduction, from_log_probs, fastemit_lambda, delay_penalty,
    )


class _RNNTTDTFunction(Function):
    @staticmethod
    def forward(ctx, tok, dur, labels, act_lens, label_lens, durations,
                blank, sigma, reduction, fastemit_lambda, delay_penalty):
        _certify(tok, labels, act_lens, label_lens)
        needs_grad = tok.requires_grad or dur.requires_grad
        costs_np, gt_np, gd_np = rnnt_loss_tdt_native(
            tok.detach().numpy(),
            dur.detach().numpy(),
            labels.numpy(),
            act_lens.numpy(),
            label_lens.numpy(),
            durations,
            blank=blank,
            sigma=sigma,
            compute_grads=needs_grad,
            fastemit_lambda=fastemit_lambda,
            delay_penalty=delay_penalty,
        )
        costs = torch.from_numpy(np.asarray(costs_np)).to(tok.dtype)
        z = torch.zeros(0, dtype=tok.dtype)
        gt = torch.from_numpy(gt_np).to(tok.dtype) if gt_np is not None else z
        gd = torch.from_numpy(gd_np).to(dur.dtype) if gd_np is not None else z
        costs, (gt, gd) = _reduce(costs, [gt, gd], reduction, tok.size(0))
        ctx.gt, ctx.gd = gt, gd
        return costs

    @staticmethod
    def backward(ctx, grad_output):
        g = grad_output.view(-1, 1, 1, 1)
        return (ctx.gt.mul(g.to(ctx.gt)), ctx.gd.mul(g.to(ctx.gd))) \
            + (None,) * 9


def rnnt_loss_tdt(token_logits, duration_logits, labels, act_lens,
                  label_lens, durations=(0, 1, 2, 3, 4), blank=0, sigma=0.0,
                  reduction="mean", fastemit_lambda=0.0, delay_penalty=0.0):
    """Token-and-Duration Transducer loss (arXiv 2304.06795) on CPU torch
    tensors; differentiable w.r.t. BOTH logits tensors (semantics match
    the JAX ``rnnt_loss_tdt``)."""
    if reduction not in ("none", "sum", "mean"):
        raise ValueError(f"reduction must be none|sum|mean, got {reduction!r}")
    return _RNNTTDTFunction.apply(
        token_logits, duration_logits, labels, act_lens, label_lens,
        tuple(int(d) for d in durations), blank, float(sigma), reduction,
        fastemit_lambda, delay_penalty,
    )


class _RNNTMultiblankFusedFunction(Function):
    @staticmethod
    def forward(ctx, e, p, W, bias, labels, act_lens, label_lens, durations,
                indices, blank, sigma, reduction, fastemit_lambda,
                delay_penalty):
        needs_grad = any(t.requires_grad for t in (e, p, W, bias))
        costs_np, gs = rnnt_loss_multiblank_fused_native(
            e.detach().numpy(), p.detach().numpy(), W.detach().numpy(),
            bias.detach().numpy(), labels.numpy(), act_lens.numpy(),
            label_lens.numpy(), durations, blank=blank,
            big_blank_indices=indices, sigma=sigma,
            compute_grads=needs_grad, fastemit_lambda=fastemit_lambda,
            delay_penalty=delay_penalty,
        )
        costs = torch.from_numpy(np.asarray(costs_np)).to(e.dtype)
        z = torch.zeros(0, dtype=e.dtype)
        gts = ([torch.from_numpy(np.asarray(g)).to(e.dtype) for g in gs]
               if gs is not None else [z] * 4)
        costs, gts = _reduce(costs, gts, reduction, e.size(0))
        ctx.gts = gts
        return costs

    @staticmethod
    def backward(ctx, grad_output):
        s = grad_output.sum().to(ctx.gts[0].dtype)
        return tuple(g * s for g in ctx.gts) + (None,) * 10


def rnnt_loss_multiblank_fused(e, p, W, bias, labels, act_lens, label_lens,
                               big_blank_durations, blank=0,
                               big_blank_indices=None, sigma=0.0,
                               reduction="mean", fastemit_lambda=0.0,
                               delay_penalty=0.0):
    """Fused multi-blank joint+loss on CPU torch tensors — the (T, U, V)
    logits never materialise (native engine; semantics match the JAX
    ``rnnt_loss_multiblank_fused_joint``)."""
    if reduction not in ("sum", "mean"):
        raise ValueError(
            f"reduction must be sum|mean for the fused op, got {reduction!r}")
    durs = tuple(int(m) for m in big_blank_durations)
    idx = (None if big_blank_indices is None
           else tuple(int(i) for i in big_blank_indices))
    return _RNNTMultiblankFusedFunction.apply(
        e, p, W, bias, labels, act_lens, label_lens, durs, idx, blank,
        float(sigma), reduction, fastemit_lambda, delay_penalty,
    )


class _RNNTTDTFusedFunction(Function):
    @staticmethod
    def forward(ctx, e, p, W, bias, Wd, bias_d, labels, act_lens,
                label_lens, durations, blank, sigma, reduction,
                fastemit_lambda, delay_penalty):
        needs_grad = any(t.requires_grad for t in (e, p, W, bias, Wd, bias_d))
        costs_np, gs = rnnt_loss_tdt_fused_native(
            e.detach().numpy(), p.detach().numpy(), W.detach().numpy(),
            bias.detach().numpy(), Wd.detach().numpy(),
            bias_d.detach().numpy(), labels.numpy(), act_lens.numpy(),
            label_lens.numpy(), durations, blank=blank, sigma=sigma,
            compute_grads=needs_grad, fastemit_lambda=fastemit_lambda,
            delay_penalty=delay_penalty,
        )
        costs = torch.from_numpy(np.asarray(costs_np)).to(e.dtype)
        z = torch.zeros(0, dtype=e.dtype)
        gts = ([torch.from_numpy(np.asarray(g)).to(e.dtype) for g in gs]
               if gs is not None else [z] * 6)
        costs, gts = _reduce(costs, gts, reduction, e.size(0))
        ctx.gts = gts
        return costs

    @staticmethod
    def backward(ctx, grad_output):
        s = grad_output.sum().to(ctx.gts[0].dtype)
        return tuple(g * s for g in ctx.gts) + (None,) * 9


def rnnt_loss_tdt_fused(e, p, W, bias, Wd, bias_d, labels, act_lens,
                        label_lens, durations=(0, 1, 2, 3, 4), blank=0,
                        sigma=0.0, reduction="mean", fastemit_lambda=0.0,
                        delay_penalty=0.0):
    """Fused TDT joint+loss on CPU torch tensors; differentiable w.r.t.
    all six joint inputs (native engine; semantics match the JAX
    ``rnnt_loss_tdt_fused_joint``)."""
    if reduction not in ("sum", "mean"):
        raise ValueError(
            f"reduction must be sum|mean for the fused op, got {reduction!r}")
    return _RNNTTDTFusedFunction.apply(
        e, p, W, bias, Wd, bias_d, labels, act_lens, label_lens,
        tuple(int(d) for d in durations), blank, float(sigma), reduction,
        fastemit_lambda, delay_penalty,
    )
