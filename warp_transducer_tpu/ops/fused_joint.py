"""RNN-T loss fused into the joint network: the (B,T,U,V) tensor never exists.

``rnnt_loss_fused_joint(e, p, W, bias, labels, ...)`` computes the same
value as

    acts = tanh(e[:, :, None, :] + p[:, None, :, :]) @ W + bias
    rnnt_loss(acts, labels, ...)

but the joint logits are produced tile-wise in VMEM by the Pallas kernels
(``pallas/joint_fused.py``) and consumed in-register — forward reduces them
straight to the (B, T, U) lattice caches, backward recomputes each tile and
contracts the dense gradient into (de, dp, dW, db) on the spot. At
production large-V shapes this removes the dominant HBM cost of the dense
loss: the write+read+read-write of the O(B·T·U·V) activations/gradient
(measured at ~69% of streaming roofline with nothing left to fuse,
ROADMAP #8). Reference analog: ``compute_grad_kernel`` + ``reduce.h``
(/root/reference/include/detail/gpu_rnnt_kernel.h:143-179) fused one level
further, into their producer matmul.

Gradients flow to all four joint inputs (e, p, W, bias); the lattice
recursion itself runs on the (B, T, U) caches exactly as in ``rnnt_loss``.
"""
from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .gradients import _beta_shifts, _valid_cells
from .rnnt import _pick_implementation, _run_lattice
from . import prep as _prep

NEG = -1.0e30


def _joint_coefs(lpb, lpe, alphas, betas, ll, input_lengths, label_lengths,
                 scale, fastemit_lambda=0.0):
    """The three valid-masked, cotangent-scaled (B,T,U) coefficient fields
    of the dense gradient (cf. gradients.grad_wrt_acts).
    ``fastemit_lambda`` scales the emit coefficient by (1 + λ) and folds
    + λ·ce into the softmax coefficient (FastEmit, arXiv:2010.11148)."""
    valid = _valid_cells(lpb.shape, input_lengths, label_lengths)
    bshift_t, bshift_u = _beta_shifts(betas, alphas, input_lengths,
                                      label_lengths)
    a_ll = alphas - ll[:, None, None]
    coef = jnp.where(valid, jnp.exp(a_ll + betas), 0.0)
    cb = jnp.where(valid, jnp.exp(a_ll + lpb + bshift_t), 0.0)
    ce = jnp.where(valid, jnp.exp(a_ll + lpe + bshift_u), 0.0)
    if fastemit_lambda:
        lam = jnp.asarray(fastemit_lambda, coef.dtype)
        coef = coef + lam * ce
        ce = ce * (1.0 + lam)
    s = scale.astype(coef.dtype)[:, None, None]
    return coef * s, cb * s, ce * s


def _fused_prep(e, p, W, bias, labels, blank, implementation):
    if implementation == "xla":
        return _fused_prep_xla(e, p, W, bias, labels, blank)
    from .pallas import joint_fused

    U = p.shape[1]
    lab_len = jnp.full((e.shape[0],), U - 1, jnp.int32)
    # V-chunked when W (+ the kernel's working set) exceeds VMEM; the
    # single-chunk case is exactly fused_prep.
    denom, lpb, lpe = joint_fused.fused_prep_chunked(
        e, p, W, bias, labels, lab_len, blank=blank,
        interpret=_interpret_default(),
    )
    return denom, lpb, lpe


def _interpret_default():
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Portable XLA engine (implementation='xla'): the same fusion expressed as a
# T-chunked lax.map/lax.scan — only O(B·Tc·U·(V+2H)) lives at once.  This is
# the fast path off-TPU (the Pallas kernels fall back to the interpreter
# there), the engine the TF binding serialises (a Pallas custom call would
# pin the StableHLO payload to one backend), and an independent oracle for
# the kernels.
# ---------------------------------------------------------------------------

_XLA_CHUNK_MB = int(_os.environ.get("WTT_FUSED_XLA_CHUNK_MB", 256))


def _xla_t_chunk(B, T, U, H, V):
    per_t = B * U * (V + 2 * H) * 4
    return max(1, min(T, (_XLA_CHUNK_MB << 20) // max(per_t, 1)))


def _lab_full(labels, U):
    """(B, U) int32: labels[u] for u < U-1, else -1 (no emit defined)."""
    B = labels.shape[0]
    lab = jnp.full((B, U), -1, jnp.int32)
    if U > 1:
        lab = lax.dynamic_update_slice(
            lab, labels[:, : U - 1].astype(jnp.int32), (0, 0)
        )
    return lab


def _chunk_t(x, nc, Tc):
    """(B, T_pad, ...) -> (nc, B, Tc, ...) leading-axis chunks."""
    B = x.shape[0]
    return jnp.moveaxis(x.reshape((B, nc, Tc) + x.shape[2:]), 1, 0)


def _unchunk_t(x, T):
    """(nc, B, Tc, ...) -> (B, T, ...)."""
    x = jnp.moveaxis(x, 0, 1)
    return x.reshape((x.shape[0], -1) + x.shape[3:])[:, :T]


def _pad_t(x, T_pad, fill=0.0):
    T = x.shape[1]
    if T_pad == T:
        return x
    pad = [(0, 0)] * x.ndim
    pad[1] = (0, T_pad - T)
    return jnp.pad(x, pad, constant_values=fill)


def _fused_prep_xla(e, p, W, bias, labels, blank, extra_cols=(),
                    dur_head=None):
    """T-chunked fused prep. Base outputs (denom, lpb, lpe); the two
    optional hooks serve the duration-arc loss families:

    * ``extra_cols``: K static vocab columns whose log-probs are also
      cached — appends lpX (B, T, U, K) (multi-blank's big blanks);
    * ``dur_head``: (Wd, bias_d) — a second tiny head on the same joint
      features; appends its raw logits (B, T, U, D) (TDT).
    """
    B, T, H = e.shape
    U = p.shape[1]
    V = W.shape[1]
    K = len(extra_cols)
    f32 = jnp.float32
    mm = jnp.bfloat16 if W.dtype == jnp.bfloat16 else f32
    Tc = _xla_t_chunk(B, T, U, H, V)
    nc = -(-T // Tc)
    ec = _chunk_t(_pad_t(e, nc * Tc), nc, Tc)
    p32 = p.astype(f32)
    W_mm = W.astype(mm)
    bias32 = bias.astype(f32)
    if dur_head is not None:
        Wd32 = dur_head[0].astype(f32)
        bias_d32 = dur_head[1].astype(f32)
    # lab == -1 matches no column -> masked max stays NEG -> lpe ~ NEG
    sel = _lab_full(labels, U)[..., None] == jnp.arange(V, dtype=jnp.int32)

    def one(ec_i):
        h = jnp.tanh(ec_i.astype(f32)[:, :, None, :] + p32[:, None, :, :])
        logits = lax.dot_general(
            h.astype(mm), W_mm, (((3,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + bias32
        m = jnp.max(logits, axis=-1)
        denom = -(m + jnp.log(
            jnp.sum(jnp.exp(logits - m[..., None]), axis=-1)
        ))
        lpb = logits[..., blank] + denom
        le = jnp.max(jnp.where(sel[:, None], logits, NEG), axis=-1)
        out = (denom, lpb, le + denom)
        if K:
            out += ((jnp.stack([logits[..., i] for i in extra_cols],
                               axis=-1) + denom[..., None]),)
        if dur_head is not None:
            out += (lax.dot_general(
                h, Wd32, (((3,), (0,)), ((), ())),
                preferred_element_type=f32) + bias_d32,)
        return out

    outs = lax.map(one, ec)
    return tuple(_unchunk_t(x, T) for x in outs)


def _fused_grad_xla(e, p, W, bias, labels, denom, coef, cb, ce, blank,
                    extra=None, dur_head=None):
    """T-chunked fused gradient. Base returns (de, dp, dW, db); the two
    optional hooks mirror ``_fused_prep_xla``:

    * ``extra``: (indices, cX (B, T, U, K)) — K more coefficient fields
      subtracted at static columns (multi-blank);
    * ``dur_head``: (Wd, g_dur (B, T, U, D)) — the duration head's
      cotangent joins dh before the tanh backprop and dWd is accumulated
      per chunk; appends dWd to the return (TDT)."""
    B, T, H = e.shape
    U = p.shape[1]
    V = W.shape[1]
    f32 = jnp.float32
    mm = jnp.bfloat16 if W.dtype == jnp.bfloat16 else f32
    Tc = _xla_t_chunk(B, T, U, H, V)
    nc = -(-T // Tc)
    T_pad = nc * Tc
    chunk = lambda x: _chunk_t(_pad_t(x.astype(f32), T_pad), nc, Tc)
    # padded-T rows: coef/cb/ce are zero there, so g vanishes and they
    # contribute nothing to any accumulator
    xs = [_chunk_t(_pad_t(e, T_pad), nc, Tc), chunk(denom), chunk(coef),
          chunk(cb), chunk(ce)]
    bb_indices = ()
    if extra is not None:
        bb_indices, cX = extra
        xs.append(chunk(cX))
    else:
        xs.append(chunk(jnp.zeros(coef.shape + (0,), f32)))
    if dur_head is not None:
        Wd, g_dur = dur_head
        Wd32 = Wd.astype(f32)
        D = Wd.shape[1]
        xs.append(chunk(g_dur))
    else:
        D = 0
        xs.append(chunk(jnp.zeros(coef.shape + (0,), f32)))
    p32 = p.astype(f32)
    W_mm = W.astype(mm)
    bias32 = bias.astype(f32)
    sel = _lab_full(labels, U)[..., None] == jnp.arange(V, dtype=jnp.int32)

    def step(carry, x):
        dp_a, dW_a, db_a, dWd_a = carry
        ec_i, den_i, coef_i, cb_i, ce_i, cX_i, gd_i = x
        h = jnp.tanh(ec_i.astype(f32)[:, :, None, :] + p32[:, None, :, :])
        hm = h.astype(mm)
        logits = lax.dot_general(
            hm, W_mm, (((3,), (0,)), ((), ())), preferred_element_type=f32
        ) + bias32
        g = coef_i[..., None] * jnp.exp(logits + den_i[..., None])
        g = g.at[..., blank].add(-cb_i)
        g = g - jnp.where(sel[:, None], ce_i[..., None], 0.0)
        for k, idx in enumerate(bb_indices):
            g = g.at[..., idx].add(-cX_i[..., k])
        g_mm = g.astype(mm)
        dh = lax.dot_general(
            g_mm, W_mm, (((3,), (1,)), ((), ())), preferred_element_type=f32
        )
        if D:
            dh = dh + lax.dot_general(
                gd_i, Wd32, (((3,), (1,)), ((), ())),
                preferred_element_type=f32)
            dWd_a = dWd_a + lax.dot_general(
                h.reshape(-1, H), gd_i.reshape(-1, D),
                (((0,), (0,)), ((), ())), preferred_element_type=f32,
            )
        dh = dh * (1.0 - h * h)
        dp_a = dp_a + jnp.sum(dh, axis=1)
        dW_a = dW_a + lax.dot_general(
            hm.reshape(-1, H), g_mm.reshape(-1, V),
            (((0,), (0,)), ((), ())), preferred_element_type=f32,
        )
        db_a = db_a + jnp.sum(g, axis=(0, 1, 2))
        return (dp_a, dW_a, db_a, dWd_a), jnp.sum(dh, axis=2)

    init = (jnp.zeros((B, U, H), f32), jnp.zeros((H, V), f32),
            jnp.zeros((V,), f32), jnp.zeros((H, D), f32))
    (dp, dW, db, dWd), de = lax.scan(step, init, tuple(xs))
    out = (_unchunk_t(de, T).astype(e.dtype), dp.astype(p.dtype),
           dW.astype(W.dtype), db.astype(bias.dtype))
    if dur_head is not None:
        out += (dWd.astype(dur_head[0].dtype),)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _fused_costs(e, p, W, bias, labels, input_lengths, label_lengths,
                 blank, implementation, fastemit_lambda, delay_penalty):
    denom, lpb, lpe = _fused_prep(e, p, W, bias, labels, blank,
                                  implementation)
    if delay_penalty:
        lpe = _prep.delay_shift(lpe, input_lengths, delay_penalty)
    res = _run_lattice(implementation, _prep.PreparedInputs(lpb, lpe, denom),
                       input_lengths, label_lengths, compute_betas=False)
    return (-res.ll_forward).astype(e.dtype)


def _fused_costs_fwd(e, p, W, bias, labels, input_lengths, label_lengths,
                     blank, implementation, fastemit_lambda=0.0,
                     delay_penalty=0.0):
    denom, lpb, lpe = _fused_prep(e, p, W, bias, labels, blank,
                                  implementation)
    if delay_penalty:
        lpe = _prep.delay_shift(lpe, input_lengths, delay_penalty)
    res = _run_lattice(implementation, _prep.PreparedInputs(lpb, lpe, denom),
                       input_lengths, label_lengths)
    costs = (-res.ll_forward).astype(e.dtype)
    residuals = (e, p, W, bias, labels, input_lengths, label_lengths,
                 denom, lpb, lpe, res.alphas, res.betas, res.ll_forward)
    return costs, residuals


def _fused_costs_bwd(blank, implementation, fastemit_lambda, delay_penalty,
                     residuals, g):
    (e, p, W, bias, labels, input_lengths, label_lengths,
     denom, lpb, lpe, alphas, betas, ll) = residuals
    coef, cb, ce = _joint_coefs(
        lpb, lpe, alphas.astype(jnp.float32), betas.astype(jnp.float32),
        ll.astype(jnp.float32), input_lengths, label_lengths,
        g.astype(jnp.float32), fastemit_lambda=fastemit_lambda,
    )
    if implementation == "xla":
        de, dp, dW, db = _fused_grad_xla(
            e, p, W, bias, labels, denom, coef, cb, ce, blank
        )
    else:
        from .pallas import joint_fused

        U = p.shape[1]
        lab_len = jnp.full((e.shape[0],), U - 1, jnp.int32)
        de, dp, dW, db = joint_fused.fused_grad_chunked(
            e, p, W, bias, labels, lab_len, denom, coef, cb, ce,
            blank=blank, interpret=_interpret_default(),
        )

    def int_zero(x):
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    return (de, dp, dW, db, int_zero(labels),
            int_zero(input_lengths), int_zero(label_lengths))


_fused_costs.defvjp(_fused_costs_fwd, _fused_costs_bwd)


def rnnt_loss_fused_joint(
    e: jax.Array,
    p: jax.Array,
    W: jax.Array,
    bias: jax.Array,
    labels: jax.Array,
    input_lengths: jax.Array,
    label_lengths: jax.Array,
    blank: int = 0,
    reduction: str = "mean",
    implementation: str = "auto",
    fastemit_lambda: float = 0.0,
    delay_penalty: float = 0.0,
) -> jax.Array:
    """RNN-T loss with the joint projection fused in.

    Args:
      e: (B, T, H) projected encoder activations (after ``enc_proj``).
      p: (B, U, H) projected prediction activations (after ``pred_proj``).
      W: (H, V) output-projection kernel; bias: (V,).
      labels / input_lengths / label_lengths / blank / reduction: as in
        ``rnnt_loss``.
      implementation: 'auto' | 'pallas' | 'xla'. 'pallas' runs the fused
        Pallas kernels (the TPU fast path) and the Pallas lattice; 'xla'
        is the portable engine — a T-chunked ``lax.map``/``lax.scan`` that
        keeps only O(B·Tc·U·V) live (fast off-TPU, and what the TF binding
        serialises). 'auto' picks 'pallas' on TPU.
      fastemit_lambda: FastEmit strength λ (arXiv:2010.11148): scales the
        emit-arc gradient by (1 + λ); the loss value is unchanged.
      delay_penalty: delay-penalized transducer strength (arXiv:2211.00490):
        emit arcs at frame t get + λ·((T_b-1)/2 - t) on their log-weight
        (changes the objective, exactly differentiable).

    Equals ``rnnt_loss(tanh(e ⊕ p) @ W + bias, ...)`` without ever
    materialising the (B, T, U, V) logits or their gradient in HBM.
    Differentiable w.r.t. e, p, W and bias.
    """
    if reduction not in ("none", "sum", "mean"):
        raise ValueError(f"reduction must be none|sum|mean, got {reduction!r}")
    if e.ndim != 3 or p.ndim != 3 or W.ndim != 2 or bias.ndim != 1:
        raise ValueError(
            f"expected e (B,T,H), p (B,U,H), W (H,V), bias (V,); got "
            f"{e.shape}, {p.shape}, {W.shape}, {bias.shape}"
        )
    if e.shape[2] != p.shape[2] or e.shape[2] != W.shape[0] \
            or W.shape[1] != bias.shape[0]:
        raise ValueError(
            f"hidden/vocab dims disagree: e {e.shape}, p {p.shape}, "
            f"W {W.shape}, bias {bias.shape}"
        )
    if e.shape[0] != p.shape[0]:
        raise ValueError(
            f"batch dims disagree: e {e.shape} vs p {p.shape}"
        )
    U = p.shape[1]
    if labels.ndim != 2 or labels.shape[0] != e.shape[0] \
            or labels.shape[1] < U - 1:
        raise ValueError(
            f"labels must be (B, >={U - 1}) for U={U}; got {labels.shape}"
        )
    if fastemit_lambda < 0:
        raise ValueError(f"fastemit_lambda must be >= 0, got {fastemit_lambda}")
    if delay_penalty < 0:
        raise ValueError(f"delay_penalty must be >= 0, got {delay_penalty}")
    impl = _pick_implementation(implementation)
    costs = _fused_costs(e, p, W, bias, labels.astype(jnp.int32),
                         input_lengths, label_lengths, int(blank), impl,
                         float(fastemit_lambda), float(delay_penalty))
    if reduction == "sum":
        return jnp.sum(costs)
    if reduction == "mean":
        return jnp.mean(costs)
    return costs
