"""Greedy RNN-T decoding for the flagship Transducer model.

Jittable, static-shape greedy decode: at each step either emit the argmax
label (advancing the prediction network) or consume the next encoder frame
on blank.  The loop runs a fixed ``T + max_symbols`` steps with masking —
no data-dependent Python control flow (XLA-friendly).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def greedy_decode(
    model,
    params,
    feats: jax.Array,
    feat_lengths: jax.Array,
    max_symbols: int,
    blank: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy decode a batch.

    Returns (tokens, token_lengths): tokens is (B, max_symbols) int32 padded
    with ``blank``.
    """
    cfg = model.cfg
    B, T = feats.shape[0], feats.shape[1]

    enc = model.apply(params, feats, feat_lengths, method=model.encode)  # (B, T, H)

    import flax.linen as nn

    cell = nn.OptimizedLSTMCell(cfg.prediction_dim, dtype=cfg.dtype)

    def pred_step(carry_state, token):
        """One prediction-network step for a (B,) token batch."""
        emb_tbl = params["params"]["Prediction_0"]["Embed_0"]["embedding"]
        emb = jnp.take(emb_tbl, token, axis=0).astype(cfg.dtype)
        lstm_params = {"params": params["params"]["Prediction_0"]["ScanOptimizedLSTMCell_0"]}
        new_state, out = cell.apply(lstm_params, carry_state, emb)
        return new_state, out

    def joint_step(e_frame, p_out):
        jp = params["params"]["Joint_0"]
        e = e_frame @ jp["Dense_0"]["kernel"].astype(cfg.dtype) + jp["Dense_0"]["bias"].astype(cfg.dtype)
        p = p_out @ jp["Dense_1"]["kernel"].astype(cfg.dtype) + jp["Dense_1"]["bias"].astype(cfg.dtype)
        h = jnp.tanh(e + p)
        return h @ jp["Dense_2"]["kernel"].astype(cfg.dtype) + jp["Dense_2"]["bias"].astype(cfg.dtype)

    state0 = cell.initialize_carry(jax.random.PRNGKey(0), (B, cfg.prediction_dim))
    state0, pred0 = pred_step(state0, jnp.full((B,), blank, jnp.int32))

    def body(carry, _):
        t, n_sym, state, pred_out, tokens = carry
        e_frame = jnp.take_along_axis(
            enc, jnp.clip(t, 0, T - 1)[:, None, None], axis=1
        )[:, 0, :]
        logits = joint_step(e_frame, pred_out)
        best = jnp.argmax(logits, axis=-1).astype(jnp.int32)

        active = (t < feat_lengths) & (n_sym < max_symbols)
        is_blank = (best == blank) | ~active

        # on emit: record token, step the prediction net
        new_state, new_pred = pred_step(state, best)
        state = jax.tree.map(
            lambda a, b: jnp.where(is_blank[:, None], a, b), state, new_state
        )
        pred_out = jnp.where(is_blank[:, None], pred_out, new_pred)
        tokens = jnp.where(
            (~is_blank[:, None]) & (jnp.arange(max_symbols)[None] == n_sym[:, None]),
            best[:, None],
            tokens,
        )
        n_sym = jnp.where(is_blank, n_sym, n_sym + 1)
        t = jnp.where(is_blank & active, t + 1, t)
        return (t, n_sym, state, pred_out, tokens), None

    tokens0 = jnp.full((B, max_symbols), blank, jnp.int32)
    n_steps = T + max_symbols
    (t, n_sym, _, _, tokens), _ = lax.scan(
        body,
        (jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32), state0, pred0, tokens0),
        None,
        length=n_steps,
    )
    return tokens, n_sym
