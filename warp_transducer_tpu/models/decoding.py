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


def beam_search_decode(
    model,
    params,
    feats: jax.Array,
    feat_lengths: jax.Array,
    max_symbols: int,
    beam: int = 4,
    expansions: int = 3,
    blank: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Time-synchronous beam search (no prefix merging) — jittable, static
    shapes. The reference library ships no decoding at all.

    Per frame, each of ``beam`` hypotheses may emit up to ``expansions``
    labels before consuming the frame with a blank; the K best blank-closed
    hypotheses survive to the next frame.

    Returns (tokens (B, K, max_symbols), token_lengths (B, K),
    scores (B, K)), beams sorted best-first. ``beam=1, expansions`` large
    reduces to greedy decoding.
    """
    cfg = model.cfg
    B, T = feats.shape[0], feats.shape[1]
    K = beam
    NEG = jnp.asarray(-1e30, jnp.float32)

    enc = model.apply(params, feats, feat_lengths, method=model.encode)

    import flax.linen as nn

    cell = nn.OptimizedLSTMCell(cfg.prediction_dim, dtype=cfg.dtype)
    emb_tbl = params["params"]["Prediction_0"]["Embed_0"]["embedding"]
    lstm_params = {"params": params["params"]["Prediction_0"]["ScanOptimizedLSTMCell_0"]}
    jp = params["params"]["Joint_0"]

    def pred_step(state, token):
        """(B, K) tokens -> new lstm state, (B, K, H) output."""
        emb = jnp.take(emb_tbl, token, axis=0).astype(cfg.dtype)  # (B, K, E)
        flat = lambda x: x.reshape((B * K,) + x.shape[2:])
        st_flat = jax.tree.map(flat, state)
        new_flat, out = cell.apply(lstm_params, st_flat, flat(emb))
        unflat = lambda x: x.reshape((B, K) + x.shape[1:])
        return jax.tree.map(unflat, new_flat), unflat(out)

    def joint_logp(e_frame, p_out):
        """e_frame (B, H), p_out (B, K, H) -> log-probs (B, K, V)."""
        e = e_frame @ jp["Dense_0"]["kernel"].astype(cfg.dtype) + jp["Dense_0"]["bias"].astype(cfg.dtype)
        p = p_out @ jp["Dense_1"]["kernel"].astype(cfg.dtype) + jp["Dense_1"]["bias"].astype(cfg.dtype)
        h = jnp.tanh(e[:, None, :] + p)
        logits = h @ jp["Dense_2"]["kernel"].astype(cfg.dtype) + jp["Dense_2"]["bias"].astype(cfg.dtype)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    def gather_k(tree, idx):
        """Select beams: idx (B, K') into axis 1 of every (B, K, ...) leaf."""
        def g(x):
            ix = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
            return jnp.take_along_axis(x, ix.astype(jnp.int32), axis=1)
        return jax.tree.map(g, tree)

    # initial beams: beam 0 live at score 0, rest dead
    state0 = cell.initialize_carry(jax.random.PRNGKey(0), (B * K, cfg.prediction_dim))
    state0 = jax.tree.map(lambda x: x.reshape(B, K, -1), state0)
    state0, pred0 = pred_step(state0, jnp.full((B, K), blank, jnp.int32))
    beams0 = {
        "score": jnp.full((B, K), NEG).at[:, 0].set(0.0),
        "tokens": jnp.full((B, K, max_symbols), blank, jnp.int32),
        "n": jnp.zeros((B, K), jnp.int32),
        "state": state0,
        "pred": pred0,
    }

    def frame(beams, t):
        e_frame = jnp.take_along_axis(
            enc, jnp.clip(t, 0, T - 1)[None, None, None].repeat(B, 0), axis=1
        )[:, 0, :]
        active_frame = t < feat_lengths  # (B,)

        # closed pool: hypotheses that consumed this frame via blank
        closed = {
            "score": jnp.full((B, K), NEG),
            "tokens": beams["tokens"],
            "n": beams["n"],
            "state": beams["state"],
            "pred": beams["pred"],
        }
        open_b = beams

        for _ in range(expansions):
            lp = joint_logp(e_frame, open_b["pred"])  # (B, K, V)
            # close with blank: merge into the closed pool (2K -> K)
            blank_sc = open_b["score"] + lp[:, :, blank]
            pool_scores = jnp.concatenate([closed["score"], blank_sc], axis=1)
            pool = jax.tree.map(
                lambda c, o: jnp.concatenate([c, o], axis=1),
                {k: v for k, v in closed.items() if k != "score"},
                {k: v for k, v in open_b.items() if k != "score"},
            )
            top_sc, top_ix = jax.lax.top_k(pool_scores, K)
            closed = {"score": top_sc, **gather_k(pool, top_ix)}

            # expand with labels: top-K over (K * V) non-blank continuations
            lab_sc = open_b["score"][:, :, None] + lp  # (B, K, V)
            lab_sc = lab_sc.at[:, :, blank].set(NEG)
            # cap by symbol budget
            lab_sc = jnp.where((open_b["n"] < max_symbols)[:, :, None], lab_sc, NEG)
            V = lab_sc.shape[-1]
            sc, ix = jax.lax.top_k(lab_sc.reshape(B, K * V), K)
            parent, token = ix // V, (ix % V).astype(jnp.int32)
            sel = gather_k({k: v for k, v in open_b.items() if k != "score"}, parent)
            new_state, new_pred = pred_step(sel["state"], token)
            tokens = jnp.where(
                jnp.arange(max_symbols)[None, None, :] == sel["n"][:, :, None],
                token[:, :, None],
                sel["tokens"],
            )
            open_b = {
                "score": sc,
                "tokens": tokens,
                "n": sel["n"] + 1,
                "state": new_state,
                "pred": new_pred,
            }

        # force-close any surviving open hypotheses with a final blank
        lp = joint_logp(e_frame, open_b["pred"])
        blank_sc = open_b["score"] + lp[:, :, blank]
        pool_scores = jnp.concatenate([closed["score"], blank_sc], axis=1)
        pool = jax.tree.map(
            lambda c, o: jnp.concatenate([c, o], axis=1),
            {k: v for k, v in closed.items() if k != "score"},
            {k: v for k, v in open_b.items() if k != "score"},
        )
        top_sc, top_ix = jax.lax.top_k(pool_scores, K)
        closed = {"score": top_sc, **gather_k(pool, top_ix)}

        # inactive frames pass the beams through untouched
        out = jax.tree.map(
            lambda new, old: jnp.where(
                active_frame.reshape((B,) + (1,) * (new.ndim - 1)), new, old
            ),
            closed, beams,
        )
        return out, None

    beams, _ = lax.scan(frame, beams0, jnp.arange(T, dtype=jnp.int32))
    order = jnp.argsort(-beams["score"], axis=1)
    final = gather_k({k: v for k, v in beams.items() if k != "score"}, order)
    scores = jnp.take_along_axis(beams["score"], order, axis=1)
    return final["tokens"], final["n"], scores
