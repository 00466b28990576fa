"""Flagship RNN-Transducer model (encoder + prediction + joint) in Flax.

The reference ships no model (it is a loss library), but its benchmark
harness models exactly this stack — ``trans.unsqueeze(2) + pred.unsqueeze(1)``
through a joint projection (/root/reference/pytorch_binding/test/test_time.py:45-99).
This module provides the full TPU-idiomatic training stack around the loss:

* Conformer-lite encoder (MHSA + conv module + FFN) — large fused matmuls
  that map onto the MXU, static shapes, no data-dependent control flow;
* embedding + unidirectional LSTM prediction network (``nn.scan`` over U);
* additive joint network producing the (B, T, U, V) lattice;
* a jittable training step using ``rnnt_loss`` + optax, with sharding
  annotations for data/model parallel meshes (see ``parallel/sharding.py``).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ..ops.rnnt import rnnt_loss


@dataclasses.dataclass(frozen=True)
class TransducerConfig:
    vocab_size: int = 128  # includes blank
    blank: int = 0
    encoder_dim: int = 256
    encoder_layers: int = 4
    encoder_heads: int = 4
    conv_kernel: int = 15
    prediction_dim: int = 256
    joint_dim: int = 256
    input_dim: int = 80  # e.g. log-mel features
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16  # activations; params stay fp32
    # Token-and-Duration Transducer (arXiv:2304.06795): non-empty enables a
    # duration head on the joint; train with tdt_loss_fn / decode with
    # greedy_decode_tdt. () = standard transducer, no extra parameters.
    tdt_durations: tuple = ()


class FeedForward(nn.Module):
    dim: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(4 * self.dim, dtype=self.dtype)(x)
        h = nn.swish(h)
        return nn.Dense(self.dim, dtype=self.dtype)(h)


class ConvModule(nn.Module):
    dim: int
    kernel: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        # pointwise-GLU -> depthwise conv -> pointwise, the conformer recipe
        h = nn.Dense(2 * self.dim, dtype=self.dtype)(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)
        h = nn.Conv(
            self.dim, (self.kernel,), feature_group_count=self.dim,
            padding="SAME", dtype=self.dtype,
        )(h)
        h = nn.swish(nn.LayerNorm(dtype=self.dtype)(h))
        return nn.Dense(self.dim, dtype=self.dtype)(h)


class ConformerBlock(nn.Module):
    dim: int
    heads: int
    kernel: int
    dtype: Any

    @nn.compact
    def __call__(self, x, mask):
        x = x + 0.5 * FeedForward(self.dim, self.dtype)(nn.LayerNorm(dtype=self.dtype)(x))
        attn_mask = mask[:, None, None, :]  # (B, 1, 1, T)
        x = x + nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype
        )(nn.LayerNorm(dtype=self.dtype)(x), mask=attn_mask)
        x = x + ConvModule(self.dim, self.kernel, self.dtype)(nn.LayerNorm(dtype=self.dtype)(x))
        x = x + 0.5 * FeedForward(self.dim, self.dtype)(nn.LayerNorm(dtype=self.dtype)(x))
        return nn.LayerNorm(dtype=self.dtype)(x)


class Encoder(nn.Module):
    cfg: TransducerConfig

    @nn.compact
    def __call__(self, feats, lengths):
        c = self.cfg
        T = feats.shape[1]
        mask = jnp.arange(T)[None, :] < lengths[:, None]
        x = nn.Dense(c.encoder_dim, dtype=c.dtype)(feats.astype(c.dtype))
        x = jnp.where(mask[..., None], x, 0)
        for _ in range(c.encoder_layers):
            x = ConformerBlock(c.encoder_dim, c.encoder_heads, c.conv_kernel, c.dtype)(x, mask)
        return jnp.where(mask[..., None], x, 0)


class Prediction(nn.Module):
    """Embedding + unidirectional LSTM over the (blank-prefixed) labels.

    Exposes single-step methods (``initial_state`` / ``step``) so decoders
    drive it through ``model.apply(..., method=...)`` instead of reaching
    into the parameter dict — renaming or restructuring layers cannot
    silently break decoding.
    """

    cfg: TransducerConfig

    def setup(self):
        c = self.cfg
        # names pinned to the pre-refactor auto-generated ones so existing
        # checkpoints load unchanged
        self.embed = nn.Embed(c.vocab_size, c.prediction_dim, dtype=c.dtype,
                              name="Embed_0")
        self.cell = nn.OptimizedLSTMCell(c.prediction_dim, dtype=c.dtype,
                                         name="ScanOptimizedLSTMCell_0")

    def __call__(self, labels):
        c = self.cfg
        B = labels.shape[0]
        # prefix with start-of-sequence (blank) token: U = L + 1 positions
        tokens = jnp.pad(labels, ((0, 0), (1, 0)), constant_values=c.blank)
        emb = self.embed(tokens)
        scan = nn.transforms.scan(
            lambda cell, carry, x: cell(carry, x),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        _, out = scan(self.cell, self.initial_state(B), emb)
        return out  # (B, U, H)

    def initial_state(self, *batch_dims: int):
        """LSTM carry for a decode loop; ``batch_dims`` may be (B,) or (B, K)."""
        return self.cell.initialize_carry(
            jax.random.PRNGKey(0), (*batch_dims, self.cfg.prediction_dim)
        )

    def step(self, state, tokens):
        """One decode step: tokens (...,) int32 -> (new_state, out (..., H))."""
        return self.cell(state, self.embed(tokens))


class Joint(nn.Module):
    cfg: TransducerConfig

    def setup(self):
        c = self.cfg
        self.enc_proj = nn.Dense(c.joint_dim, dtype=c.dtype, name="Dense_0")
        self.pred_proj = nn.Dense(c.joint_dim, dtype=c.dtype, name="Dense_1")
        self.out_proj = nn.Dense(c.vocab_size, dtype=c.dtype, name="Dense_2")
        if c.tdt_durations:
            self.dur_proj = nn.Dense(len(c.tdt_durations), dtype=c.dtype,
                                     name="DurHead_0")

    def __call__(self, enc, pred):
        e = self.enc_proj(enc)  # (B, T, H)
        p = self.pred_proj(pred)  # (B, U, H)
        joint = jnp.tanh(e[:, :, None, :] + p[:, None, :, :])  # (B, T, U, H)
        return self.out_proj(joint)  # (B, T, U, V)

    def banded(self, enc, pred_banded):
        """Joint on a pruned band: pred_banded (B, T, S, H_pred)."""
        e = self.enc_proj(enc)  # (B, T, H)
        p = self.pred_proj(pred_banded)  # (B, T, S, H)
        joint = jnp.tanh(e[:, :, None, :] + p)  # (B, T, S, H)
        return self.out_proj(joint)  # (B, T, S, V)

    def step(self, enc_frame, pred_out):
        """Decode-time joint: enc_frame (B, H_enc), pred_out (B, ..., H_pred)
        -> logits (B, ..., V); enc broadcasts over any beam dims."""
        e = self.enc_proj(enc_frame)
        p = self.pred_proj(pred_out)
        while e.ndim < p.ndim:
            e = jnp.expand_dims(e, -2)
        return self.out_proj(jnp.tanh(e + p))

    def tdt(self, enc, pred):
        """(token_logits (B,T,U,V), duration_logits (B,T,U,D)) — the two
        TDT heads share the tanh joint features (arXiv:2304.06795)."""
        e = self.enc_proj(enc)
        p = self.pred_proj(pred)
        joint = jnp.tanh(e[:, :, None, :] + p[:, None, :, :])
        return self.out_proj(joint), self.dur_proj(joint)

    def tdt_step(self, enc_frame, pred_out):
        """Decode-time TDT joint -> (token logits, duration logits)."""
        e = self.enc_proj(enc_frame)
        p = self.pred_proj(pred_out)
        while e.ndim < p.ndim:
            e = jnp.expand_dims(e, -2)
        joint = jnp.tanh(e + p)
        return self.out_proj(joint), self.dur_proj(joint)

    def multiblank_fused_loss(self, enc, pred, labels, input_lengths,
                              label_lengths, big_blank_durations,
                              reduction="mean", sigma=0.0,
                              fastemit_lambda=0.0, delay_penalty=0.0):
        """Multi-blank loss with the joint projection fused in (the big
        blanks live on the last K vocab columns of the standard joint;
        ops/multiblank_fused.py)."""
        from ..ops.multiblank_fused import rnnt_loss_multiblank_fused_joint

        c = self.cfg
        e = self.enc_proj(enc)
        p = self.pred_proj(pred)
        if self.is_initializing():
            self.out_proj(jnp.zeros((1, c.joint_dim), c.dtype))
        W = self.out_proj.variables["params"]["kernel"]
        b = self.out_proj.variables["params"]["bias"]
        return rnnt_loss_multiblank_fused_joint(
            e.astype(c.dtype), p.astype(c.dtype),
            W.astype(c.dtype), b.astype(jnp.float32),
            labels, input_lengths, label_lengths, big_blank_durations,
            blank=c.blank, reduction=reduction, sigma=sigma,
            fastemit_lambda=fastemit_lambda, delay_penalty=delay_penalty,
        )

    def tdt_fused_loss(self, enc, pred, labels, input_lengths,
                       label_lengths, reduction="mean", sigma=0.0,
                       fastemit_lambda=0.0, delay_penalty=0.0):
        """TDT loss with the joint projection fused in: the (B,T,U,V)
        token logits and the (B,T,U,H) joint features never materialise
        (ops/tdt_fused.py). Requires ``cfg.tdt_durations``."""
        from ..ops.tdt_fused import rnnt_loss_tdt_fused_joint

        c = self.cfg
        e = self.enc_proj(enc)
        p = self.pred_proj(pred)
        if self.is_initializing():
            z = jnp.zeros((1, c.joint_dim), c.dtype)
            self.out_proj(z)
            self.dur_proj(z)
        W = self.out_proj.variables["params"]["kernel"]
        b = self.out_proj.variables["params"]["bias"]
        Wd = self.dur_proj.variables["params"]["kernel"]
        bd = self.dur_proj.variables["params"]["bias"]
        return rnnt_loss_tdt_fused_joint(
            e.astype(c.dtype), p.astype(c.dtype),
            W.astype(c.dtype), b.astype(jnp.float32),
            Wd.astype(jnp.float32), bd.astype(jnp.float32),
            labels, input_lengths, label_lengths,
            durations=c.tdt_durations, blank=c.blank, reduction=reduction,
            sigma=sigma, fastemit_lambda=fastemit_lambda,
            delay_penalty=delay_penalty,
        )

    def fused_loss(self, enc, pred, labels, input_lengths, label_lengths,
                   reduction="mean", implementation="auto"):
        """RNN-T loss with the output projection fused in: the (B,T,U,V)
        logits are never materialised (ops/fused_joint.py)."""
        from ..ops.fused_joint import rnnt_loss_fused_joint

        c = self.cfg
        e = self.enc_proj(enc)
        p = self.pred_proj(pred)
        if self.is_initializing():
            # out_proj is bypassed here (its kernel feeds the fused op
            # directly); touch it once so init through this method still
            # creates its params
            self.out_proj(jnp.zeros((1, c.joint_dim), c.dtype))
        W = self.out_proj.variables["params"]["kernel"]
        b = self.out_proj.variables["params"]["bias"]
        return rnnt_loss_fused_joint(
            e.astype(c.dtype), p.astype(c.dtype), W.astype(c.dtype),
            b.astype(jnp.float32), labels, input_lengths, label_lengths,
            blank=c.blank, reduction=reduction, implementation=implementation,
        )

    def pruned_fused_loss(self, enc, pred, ranges, labels, input_lengths,
                          label_lengths, s_range: int, reduction="mean",
                          implementation="auto"):
        """Pruned band loss with the output projection fused in: the
        (B,T,S,V) banded logits are never materialised
        (ops/pruned_fused.py) — the production path for long-T large-V."""
        from ..ops.pruned_fused import rnnt_loss_pruned_fused

        c = self.cfg
        e = self.enc_proj(enc)
        p = self.pred_proj(pred)
        if self.is_initializing():
            self.out_proj(jnp.zeros((1, c.joint_dim), c.dtype))
        W = self.out_proj.variables["params"]["kernel"]
        b = self.out_proj.variables["params"]["bias"]
        return rnnt_loss_pruned_fused(
            e.astype(c.dtype), p.astype(c.dtype), W.astype(c.dtype),
            b.astype(jnp.float32), ranges, labels, input_lengths,
            label_lengths, s_range=s_range, blank=c.blank,
            reduction=reduction, implementation=implementation,
        )


class Transducer(nn.Module):
    cfg: TransducerConfig

    def setup(self):
        self.encoder = Encoder(self.cfg, name="Encoder_0")
        self.prediction = Prediction(self.cfg, name="Prediction_0")
        self.joint = Joint(self.cfg, name="Joint_0")
        # small linear heads for the factorised (simple/pruned stage-1) loss
        self.am_head = nn.Dense(self.cfg.vocab_size, dtype=self.cfg.dtype,
                                name="AmHead_0")
        self.lm_head = nn.Dense(self.cfg.vocab_size, dtype=self.cfg.dtype,
                                name="LmHead_0")

    def __call__(self, feats, feat_lengths, labels):
        enc = self.encoder(feats, feat_lengths)
        pred = self.prediction(labels)
        return self.joint(enc, pred)

    def encode(self, feats, feat_lengths):
        return self.encoder(feats, feat_lengths)

    # --- decode-facing single-step methods (used via model.apply(...,
    # method=...); decoders never touch the raw param dict) ---------------
    def predict_init(self, *batch_dims: int):
        return self.prediction.initial_state(*batch_dims)

    def predict_step(self, state, tokens):
        return self.prediction.step(state, tokens)

    def joint_step(self, enc_frame, pred_out):
        return self.joint.step(enc_frame, pred_out)

    def tdt_logits(self, feats, feat_lengths, labels):
        """(token_logits, duration_logits) for ``rnnt_loss_tdt``; requires
        ``cfg.tdt_durations`` non-empty."""
        enc = self.encoder(feats, feat_lengths)
        pred = self.prediction(labels)
        return self.joint.tdt(enc, pred)

    def tdt_joint_step(self, enc_frame, pred_out):
        return self.joint.tdt_step(enc_frame, pred_out)

    def factorised(self, feats, feat_lengths, labels):
        """(am (B,T,V), lm (B,U,V)) for rnnt_loss_simple / pruning."""
        enc = self.encoder(feats, feat_lengths)
        pred = self.prediction(labels)
        return self.am_head(enc), self.lm_head(pred)

    def factorised_full(self, feats, feat_lengths, labels):
        """(am, lm, enc, pred) — expose the trunk activations so a pruned
        training step runs the encoder/prediction networks exactly once."""
        enc = self.encoder(feats, feat_lengths)
        pred = self.prediction(labels)
        return self.am_head(enc), self.lm_head(pred), enc, pred

    def banded_joint_from(self, enc, pred_banded):
        """Joint on precomputed trunk activations (pruned band)."""
        return self.joint.banded(enc, pred_banded)

    def banded_joint(self, feats, feat_lengths, labels, ranges, s_range: int):
        """(B, T, S, V) joint logits on the pruned band."""
        from ..ops.pruned import gather_banded

        enc = self.encoder(feats, feat_lengths)
        pred = self.prediction(labels)  # (B, U, H)
        pred_band = gather_banded(pred, ranges, s_range)  # (B, T, S, H)
        return self.joint.banded(enc, pred_band)

    def fused_loss(self, feats, feat_lengths, labels, label_lengths,
                   reduction="mean", implementation="auto"):
        """End-to-end loss with the joint projection fused into the loss
        kernels — the dense-training path for large vocabularies."""
        enc = self.encoder(feats, feat_lengths)
        pred = self.prediction(labels)
        return self.joint.fused_loss(
            enc, pred, labels, feat_lengths, label_lengths,
            reduction=reduction, implementation=implementation,
        )

    def tdt_fused_loss(self, feats, feat_lengths, labels, label_lengths,
                       reduction="mean", sigma=0.0, fastemit_lambda=0.0,
                       delay_penalty=0.0):
        """End-to-end TDT loss with the joint projection fused in — the
        large-vocab TDT training path (requires ``cfg.tdt_durations``)."""
        enc = self.encoder(feats, feat_lengths)
        pred = self.prediction(labels)
        return self.joint.tdt_fused_loss(
            enc, pred, labels, feat_lengths, label_lengths,
            reduction=reduction, sigma=sigma,
            fastemit_lambda=fastemit_lambda, delay_penalty=delay_penalty,
        )

    def pruned_fused_loss(self, enc, pred, ranges, labels, input_lengths,
                          label_lengths, s_range: int, reduction="mean",
                          implementation="auto"):
        """Banded loss on precomputed trunk activations, joint fused in."""
        return self.joint.pruned_fused_loss(
            enc, pred, ranges, labels, input_lengths, label_lengths,
            s_range, reduction=reduction, implementation=implementation,
        )

    def multiblank_fused_loss(self, feats, feat_lengths, labels,
                              label_lengths, big_blank_durations,
                              reduction="mean", sigma=0.0,
                              fastemit_lambda=0.0, delay_penalty=0.0):
        """End-to-end multi-blank loss with the joint projection fused in —
        the big blanks live on the last K vocab columns
        (ops/multiblank_fused.py)."""
        enc = self.encoder(feats, feat_lengths)
        pred = self.prediction(labels)
        return self.joint.multiblank_fused_loss(
            enc, pred, labels, feat_lengths, label_lengths,
            big_blank_durations, reduction=reduction, sigma=sigma,
            fastemit_lambda=fastemit_lambda, delay_penalty=delay_penalty,
        )


def make_model(cfg: TransducerConfig) -> Transducer:
    return Transducer(cfg)


def init_params(cfg: TransducerConfig, rng, B=2, T=8, U=3):
    model = make_model(cfg)
    feats = jnp.zeros((B, T, cfg.input_dim), jnp.float32)
    lengths = jnp.full((B,), T, jnp.int32)
    labels = jnp.zeros((B, U - 1), jnp.int32)

    # touch every path (dense joint, factorised heads, TDT duration head
    # when configured) so flax creates all parameters — setup() submodules
    # are materialised lazily
    def init_all(self, f, l, lab):
        out = (self(f, l, lab), self.factorised(f, l, lab))
        if cfg.tdt_durations:
            out += (self.tdt_logits(f, l, lab),)
        return out

    return model.init(rng, feats, lengths, labels, method=init_all)


def loss_fn(params, model, batch, blank=0, implementation="auto"):
    acts = model.apply(
        params, batch["feats"], batch["feat_lengths"], batch["labels"]
    )
    return rnnt_loss(
        acts.astype(jnp.float32),
        batch["labels"],
        batch["feat_lengths"],
        batch["label_lengths"],
        blank=blank,
        reduction="mean",
        implementation=implementation,
    )


def make_train_step(model, optimizer, blank=0, implementation="auto"):
    """Return a jittable (params, opt_state, batch) -> (params, opt_state, loss)."""

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, model, batch, blank=blank, implementation=implementation
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_fused_train_step(model, optimizer, implementation="auto"):
    """Jittable train step over the fused joint+loss op: the (B, T, U, V)
    logits and their gradient never touch HBM (ops/fused_joint.py)."""

    def loss(params, batch):
        return model.apply(
            params, batch["feats"], batch["feat_lengths"], batch["labels"],
            batch["label_lengths"], implementation=implementation,
            method=model.fused_loss,
        )

    def step(params, opt_state, batch):
        l, grads = jax.value_and_grad(loss)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, l

    return step


def tdt_loss_fn(params, model, batch, blank=0, sigma=0.0,
                fastemit_lambda=0.0, delay_penalty=0.0):
    """Token-and-Duration Transducer objective (arXiv:2304.06795); requires
    ``cfg.tdt_durations`` non-empty."""
    from ..ops.tdt import rnnt_loss_tdt

    tok, dur = model.apply(
        params, batch["feats"], batch["feat_lengths"], batch["labels"],
        method=model.tdt_logits,
    )
    return rnnt_loss_tdt(
        tok.astype(jnp.float32), dur.astype(jnp.float32), batch["labels"],
        batch["feat_lengths"], batch["label_lengths"],
        durations=model.cfg.tdt_durations, blank=blank, sigma=sigma,
        reduction="mean", fastemit_lambda=fastemit_lambda,
        delay_penalty=delay_penalty,
    )


def make_tdt_train_step(model, optimizer, blank=0, sigma=0.0,
                        fastemit_lambda=0.0, delay_penalty=0.0):
    """Jittable TDT train step (both heads trained through the fused
    two-head gradient of ``rnnt_loss_tdt``)."""

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(tdt_loss_fn)(
            params, model, batch, blank=blank, sigma=sigma,
            fastemit_lambda=fastemit_lambda, delay_penalty=delay_penalty)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_tdt_fused_train_step(model, optimizer, sigma=0.0):
    """Jittable TDT train step over the fused joint+loss op: the (B,T,U,V)
    token logits and the (B,T,U,H) joint features never touch HBM
    (ops/tdt_fused.py)."""

    def loss(params, batch):
        return model.apply(
            params, batch["feats"], batch["feat_lengths"], batch["labels"],
            batch["label_lengths"], sigma=sigma,
            method=model.tdt_fused_loss,
        )

    def step(params, opt_state, batch):
        l, grads = jax.value_and_grad(loss)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, l

    return step


def multiblank_loss_fn(params, model, batch, big_blank_durations, blank=0,
                       sigma=0.0, fastemit_lambda=0.0, delay_penalty=0.0):
    """Multi-blank transducer objective (arXiv:2211.03541) on the dense
    joint — the K big blanks use the last K vocab columns, so labels must
    stay below V-K."""
    from ..ops.multiblank import rnnt_loss_multiblank

    acts = model.apply(
        params, batch["feats"], batch["feat_lengths"], batch["labels"]
    )
    return rnnt_loss_multiblank(
        acts.astype(jnp.float32), batch["labels"], batch["feat_lengths"],
        batch["label_lengths"], big_blank_durations, blank=blank,
        sigma=sigma, reduction="mean", fastemit_lambda=fastemit_lambda,
        delay_penalty=delay_penalty,
    )


def make_multiblank_train_step(model, optimizer, big_blank_durations,
                               blank=0, sigma=0.0, fastemit_lambda=0.0,
                               delay_penalty=0.0):
    """Jittable multi-blank train step (dense joint; fused-softmax gradient
    with one correction per big blank)."""

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(multiblank_loss_fn)(
            params, model, batch, big_blank_durations, blank=blank,
            sigma=sigma, fastemit_lambda=fastemit_lambda,
            delay_penalty=delay_penalty)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_multiblank_fused_train_step(model, optimizer, big_blank_durations,
                                     sigma=0.0):
    """Jittable multi-blank train step over the fused joint+loss op: the
    (B,T,U,V) logits never touch HBM (ops/multiblank_fused.py)."""

    def loss(params, batch):
        return model.apply(
            params, batch["feats"], batch["feat_lengths"], batch["labels"],
            batch["label_lengths"], big_blank_durations, sigma=sigma,
            method=model.multiblank_fused_loss,
        )

    def step(params, opt_state, batch):
        l, grads = jax.value_and_grad(loss)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, l

    return step


def pruned_loss_fn(params, model, batch, s_range, blank=0, simple_scale=0.5,
                   implementation="auto"):
    """Two-stage pruned-transducer objective (arXiv 2206.13236):
    simple_scale * simple(am, lm) + pruned(joint on band).

    The encoder/prediction trunk runs ONCE (factorised_full) and the
    pruning band comes out of the same lattice the simple loss computes
    (prune_range=...), so neither the trunk nor the stage-1 recursion is
    duplicated."""
    from ..ops.pruned import gather_banded, rnnt_loss_pruned
    from ..ops.simple import rnnt_loss_simple

    feats, fl = batch["feats"], batch["feat_lengths"]
    labels, ll = batch["labels"], batch["label_lengths"]
    am, lm, enc, pred = model.apply(
        params, feats, fl, labels, method=model.factorised_full
    )
    simple, ranges = rnnt_loss_simple(
        am.astype(jnp.float32), lm.astype(jnp.float32), labels, fl, ll,
        blank=blank, reduction="mean", implementation=implementation,
        prune_range=s_range,
    )
    pred_band = gather_banded(pred, ranges, s_range)
    acts_band = model.apply(params, enc, pred_band,
                            method=model.banded_joint_from)
    pruned = rnnt_loss_pruned(acts_band.astype(jnp.float32), ranges, labels,
                              fl, ll, blank=blank, reduction="mean")
    return simple_scale * simple + pruned


def pruned_fused_loss_fn(params, model, batch, s_range, blank=0,
                         simple_scale=0.5, implementation="auto"):
    """Two-stage pruned objective with the stage-2 joint FUSED into the
    band loss: neither (B, T, U, V) nor even (B, T, S, V) is ever
    materialised — the minimal-memory production objective."""
    from ..ops.simple import rnnt_loss_simple

    feats, fl = batch["feats"], batch["feat_lengths"]
    labels, ll = batch["labels"], batch["label_lengths"]
    am, lm, enc, pred = model.apply(
        params, feats, fl, labels, method=model.factorised_full
    )
    simple, ranges = rnnt_loss_simple(
        am.astype(jnp.float32), lm.astype(jnp.float32), labels, fl, ll,
        blank=blank, reduction="mean", implementation=implementation,
        prune_range=s_range,
    )
    pruned = model.apply(
        params, enc, pred, ranges, labels, fl, ll, s_range,
        implementation=implementation, method=model.pruned_fused_loss,
    )
    return simple_scale * simple + pruned


def make_pruned_fused_train_step(model, optimizer, s_range, blank=0,
                                 simple_scale=0.5, implementation="auto"):
    """Jittable train step over the pruned fused objective."""

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(pruned_fused_loss_fn)(
            params, model, batch, s_range, blank=blank,
            simple_scale=simple_scale, implementation=implementation,
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_pruned_train_step(model, optimizer, s_range, blank=0,
                           simple_scale=0.5, implementation="auto"):
    """Jittable pruned-transducer train step: the joint runs only on a
    (B, T, S, V) band, never materialising (B, T, U, V)."""

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(pruned_loss_fn)(
            params, model, batch, s_range, blank=blank,
            simple_scale=simple_scale, implementation=implementation,
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
