"""Greedy and beam-search RNN-T decoding for the flagship Transducer model.

Jittable, static-shape decoders: no data-dependent Python control flow
(XLA-friendly ``lax.scan`` loops with masking). All prediction-network and
joint-network access goes through module methods
(``model.predict_init / predict_step / joint_step`` via ``model.apply``) —
never through raw parameter-dict paths — so renaming or restructuring
layers inside the model cannot silently break decoding.

The reference library ships no decoding at all; this is beyond-reference
functionality.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

NEG = -1.0e30


def greedy_decode(
    model,
    params,
    feats: jax.Array,
    feat_lengths: jax.Array,
    max_symbols: int,
    blank: int = 0,
    big_blank_durations: Tuple[int, ...] = (),
    big_blank_indices=None,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy decode a batch.

    At each step either emit the argmax label (advancing the prediction
    network) or consume the next encoder frame on blank; the loop runs a
    fixed ``T + max_symbols`` steps with masking.

    For a model trained with ``rnnt_loss_multiblank``, pass the same
    ``big_blank_durations`` (and ``big_blank_indices``, default: the last
    K vocab entries): a big-blank argmax consumes m_k frames in one step —
    the multi-blank decode speed-up (arXiv:2211.03541). Big blanks are
    never recorded as tokens.

    Returns (tokens, token_lengths): tokens is (B, max_symbols) int32 padded
    with ``blank``.
    """
    B, T = feats.shape[0], feats.shape[1]

    enc = model.apply(params, feats, feat_lengths, method=model.encode)  # (B, T, H)

    def pred_step(state, token):
        return model.apply(params, state, token, method=model.predict_step)

    def joint_step(e_frame, p_out):
        return model.apply(params, e_frame, p_out, method=model.joint_step)

    state0 = model.apply(params, B, method=model.predict_init)
    state0, pred0 = pred_step(state0, jnp.full((B,), blank, jnp.int32))

    durs = tuple(int(m) for m in big_blank_durations)
    if durs:
        from ..ops.multiblank import _resolve_indices

        V = getattr(getattr(model, "cfg", None), "vocab_size", None)
        if V is None:  # fallback: learn V from a traced joint eval
            V = joint_step(enc[:, 0, :], pred0).shape[-1]
        durs, bb_idx = _resolve_indices(V, blank, durs, big_blank_indices)
    else:
        bb_idx = ()

    def body(carry, _):
        t, n_sym, state, pred_out, tokens = carry
        e_frame = jnp.take_along_axis(
            enc, jnp.clip(t, 0, T - 1)[:, None, None], axis=1
        )[:, 0, :]
        logits = joint_step(e_frame, pred_out)
        best = jnp.argmax(logits, axis=-1).astype(jnp.int32)

        active = (t < feat_lengths) & (n_sym < max_symbols)
        adv = jnp.ones((B,), jnp.int32)
        is_big = jnp.zeros((B,), bool)
        for m, idx in zip(durs, bb_idx):
            hit = best == idx
            is_big |= hit
            adv = jnp.where(hit, m, adv)
        is_blank = (best == blank) | is_big | ~active

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
        t = jnp.where(is_blank & active, t + adv, t)
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


def greedy_decode_tdt(
    model,
    params,
    feats: jax.Array,
    feat_lengths: jax.Array,
    max_symbols: int,
    blank: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy decode for a Token-and-Duration Transducer model
    (``cfg.tdt_durations`` non-empty, trained with ``rnnt_loss_tdt``).

    At each step the duration head's argmax d decides how many frames the
    emission consumes: a token advances the prediction network and t by d
    (possibly 0), a blank advances t by max(d, 1) — the frame-skipping
    decode speed-up of arXiv:2304.06795.

    Returns (tokens (B, max_symbols) int32 blank-padded, token_lengths).
    """
    B, T = feats.shape[0], feats.shape[1]
    durs = jnp.asarray(model.cfg.tdt_durations, jnp.int32)

    enc = model.apply(params, feats, feat_lengths, method=model.encode)

    def pred_step(state, token):
        return model.apply(params, state, token, method=model.predict_step)

    def joint_step(e_frame, p_out):
        return model.apply(params, e_frame, p_out,
                           method=model.tdt_joint_step)

    state0 = model.apply(params, B, method=model.predict_init)
    state0, pred0 = pred_step(state0, jnp.full((B,), blank, jnp.int32))

    def body(carry, _):
        t, n_sym, state, pred_out, tokens = carry
        e_frame = jnp.take_along_axis(
            enc, jnp.clip(t, 0, T - 1)[:, None, None], axis=1
        )[:, 0, :]
        logits, dur_logits = joint_step(e_frame, pred_out)
        best = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        d = durs[jnp.argmax(dur_logits, axis=-1)]

        active = (t < feat_lengths) & (n_sym < max_symbols)
        is_blank = (best == blank) | ~active
        adv = jnp.where(is_blank, jnp.maximum(d, 1), d)

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
        t = jnp.where(active, t + adv, t)
        return (t, n_sym, state, pred_out, tokens), None

    tokens0 = jnp.full((B, max_symbols), blank, jnp.int32)
    (t, n_sym, _, _, tokens), _ = lax.scan(
        body,
        (jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32), state0,
         pred0, tokens0),
        None,
        length=T + max_symbols,
    )
    return tokens, n_sym


def _merge_duplicate_hyps(scores, tokens, n):
    """Pool the probability of duplicate hypotheses (equal token strings).

    Hypotheses with the same emitted token sequence are the same hypothesis
    reached along different lattice paths; their probabilities add. The
    prediction-network state is a deterministic function of the token
    string, so keeping the lowest-index (canonical) member's state is exact.

    scores (B, M), tokens (B, M, L) blank-padded, n (B, M) emission counts.
    Returns scores with each duplicate class's log-prob pooled onto its
    canonical member and all other members masked to NEG.
    """
    M = scores.shape[1]
    same = (n[:, :, None] == n[:, None, :]) & jnp.all(
        tokens[:, :, None, :] == tokens[:, None, :, :], axis=-1
    )  # (B, M, M); diagonal is True
    idx = jnp.arange(M)
    first = jnp.argmax(same, axis=-1)  # lowest j equal to i
    is_canon = first == idx[None, :]
    # log-sum-exp over each duplicate class (finite NEG sentinel: NaN-free)
    m = jnp.max(jnp.where(same, scores[:, None, :], NEG), axis=-1)
    pooled = m + jnp.log(
        jnp.sum(jnp.where(same, jnp.exp(scores[:, None, :] - m[..., None]), 0.0),
                axis=-1)
    )
    return jnp.where(is_canon, pooled, NEG)


def beam_search_decode(
    model,
    params,
    feats: jax.Array,
    feat_lengths: jax.Array,
    max_symbols: int,
    beam: int = 4,
    expansions: int = 3,
    blank: int = 0,
    merge: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Time-synchronous beam search — jittable, static shapes.

    Per frame, each of ``beam`` hypotheses may emit up to ``expansions``
    labels before consuming the frame with a blank; the K best blank-closed
    hypotheses survive to the next frame. With ``merge`` (default), closed
    hypotheses with identical token strings pool their probability
    (log-sum-exp) instead of occupying duplicate beam slots.

    Returns (tokens (B, K, max_symbols), token_lengths (B, K),
    scores (B, K)), beams sorted best-first. ``beam=1, expansions`` large
    reduces to greedy decoding.
    """
    B, T = feats.shape[0], feats.shape[1]
    K = beam

    enc = model.apply(params, feats, feat_lengths, method=model.encode)

    def pred_step(state, token):
        """(B, K) tokens -> new lstm state, (B, K, H) output."""
        return model.apply(params, state, token, method=model.predict_step)

    def joint_logp(e_frame, p_out):
        """e_frame (B, H), p_out (B, K, H) -> log-probs (B, K, V)."""
        logits = model.apply(params, e_frame, p_out, method=model.joint_step)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    def gather_k(tree, idx):
        """Select beams: idx (B, K') into axis 1 of every (B, K, ...) leaf."""
        def g(x):
            ix = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
            return jnp.take_along_axis(x, ix.astype(jnp.int32), axis=1)
        return jax.tree.map(g, tree)

    def close_pool(closed, open_b, blank_sc):
        """Merge blank-closed open hypotheses into the closed pool (2K -> K)."""
        pool_scores = jnp.concatenate([closed["score"], blank_sc], axis=1)
        pool = jax.tree.map(
            lambda c, o: jnp.concatenate([c, o], axis=1),
            {k: v for k, v in closed.items() if k != "score"},
            {k: v for k, v in open_b.items() if k != "score"},
        )
        if merge:
            pool_scores = _merge_duplicate_hyps(
                pool_scores, pool["tokens"], pool["n"]
            )
        top_sc, top_ix = jax.lax.top_k(pool_scores, K)
        return {"score": top_sc, **gather_k(pool, top_ix)}

    # initial beams: beam 0 live at score 0, rest dead
    state0 = model.apply(params, B, K, method=model.predict_init)
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
            closed = close_pool(closed, open_b, open_b["score"] + lp[:, :, blank])

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
        closed = close_pool(closed, open_b, open_b["score"] + lp[:, :, blank])

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
