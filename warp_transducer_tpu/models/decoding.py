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


def _merge_duplicate_hyps(scores, tokens, n, extra_keys=()):
    """Pool the probability of duplicate hypotheses (equal token strings).

    Hypotheses with the same emitted token sequence are the same hypothesis
    reached along different lattice paths; their probabilities add. The
    prediction-network state is a deterministic function of the token
    string, so keeping the lowest-index (canonical) member's state is exact.

    scores (B, M), tokens (B, M, L) blank-padded, n (B, M) emission counts.
    ``extra_keys``: additional (B, M) arrays that must ALSO match for two
    hypotheses to be the same search state (the variant beam searches pass
    the per-beam time pointer and done flag: same tokens at different t are
    different lattice nodes and must NOT pool).
    Returns scores with each duplicate class's log-prob pooled onto its
    canonical member and all other members masked to NEG.
    """
    M = scores.shape[1]
    same = (n[:, :, None] == n[:, None, :]) & jnp.all(
        tokens[:, :, None, :] == tokens[:, None, :, :], axis=-1
    )  # (B, M, M); diagonal is True
    for k in extra_keys:
        same &= k[:, :, None] == k[:, None, :]
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


# ---------------------------------------------------------------------------
# Alignment-length-synchronous beam search (duration-arc topologies)
# ---------------------------------------------------------------------------
#
# The frame-synchronous search above assumes every blank consumes exactly one
# frame, so all hypotheses in the beam share t. Multi-blank and TDT arcs
# advance t by variable amounts, so hypotheses desynchronise; the natural
# jittable generalisation is alignment-length-synchronous decoding (ALSD,
# Saon et al. 2020): every live hypothesis takes exactly ONE arc per scan
# step and carries its own time pointer. A hypothesis finishes when a
# blank-family arc lands exactly on its utterance length. T + max_symbols
# steps bound the search (every arc advances t by >= 1 or emits a symbol).


def _alsd_search(model, params, enc, feat_lengths, max_symbols, K, blank,
                 merge, score_arcs):
    """Shared ALSD machinery.

    ``score_arcs(beams, e_frames, live) -> (blank_classes, tok_sc,
    token_of, dt_of)``:
      * blank_classes: list of (scores (B,K), advance m) — blank-family arcs
        advancing t by m, already masked to NEG where invalid;
      * tok_sc (B, K, C): token-arc candidate scores (masked); candidate c
        emits ``token_of[c]`` (C,) and advances t by ``dt_of[c]`` (C,).

    Two pools: the LIVE beam of K unfinished hypotheses (every member takes
    exactly one arc per step) and a FINISHED pool of the K best complete
    hypotheses. Keeping them separate is essential: a finished hypothesis
    carries its final score while partials still have log-prob factors left
    to pay, so mixing the pools lets soon-to-be-worse partials evict
    already-complete results.
    """
    B, T = enc.shape[0], enc.shape[1]
    len_b = feat_lengths.astype(jnp.int32)[:, None]

    def pred_step(state, token):
        return model.apply(params, state, token, method=model.predict_step)

    def gather_k(tree, idx):
        def g(x):
            ix = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
            return jnp.take_along_axis(x, ix.astype(jnp.int32), axis=1)
        return jax.tree.map(g, tree)

    state0 = model.apply(params, B, K, method=model.predict_init)
    state0, pred0 = pred_step(state0, jnp.full((B, K), blank, jnp.int32))
    t0 = jnp.zeros((B, K), jnp.int32)
    beams = {
        "score": jnp.full((B, K), NEG).at[:, 0].set(0.0),
        "tokens": jnp.full((B, K, max_symbols), blank, jnp.int32),
        "n": jnp.zeros((B, K), jnp.int32),
        "t": t0,
        "state": state0,
        "pred": pred0,
    }
    fin = {
        "score": jnp.full((B, K), NEG),
        "tokens": jnp.full((B, K, max_symbols), blank, jnp.int32),
        "n": jnp.zeros((B, K), jnp.int32),
    }

    def step(carry, _):
        beams, fin = carry
        e_frames = jnp.take_along_axis(
            enc, jnp.clip(beams["t"], 0, T - 1)[:, :, None], axis=1
        )  # (B, K, H)
        live = (beams["score"] > NEG / 2) & (beams["t"] < len_b)
        blank_classes, tok_sc, token_of, dt_of = score_arcs(
            beams, e_frames, live)

        carried = {k: v for k, v in beams.items() if k != "score"}
        live_parts = []   # (score, fields) continuing hypotheses
        fin_scores = [fin["score"]]
        fin_tokens = [fin["tokens"]]
        fin_n = [fin["n"]]

        for sc, adv in blank_classes:
            t_new = beams["t"] + adv
            finished = t_new >= len_b  # valid arcs land at exactly len
            live_parts.append((jnp.where(finished, NEG, sc),
                               {**carried, "t": t_new}))
            fin_scores.append(jnp.where(finished, sc, NEG))
            fin_tokens.append(beams["tokens"])
            fin_n.append(beams["n"])

        # token expansions: top-K over all (beam, candidate) pairs
        C = tok_sc.shape[-1]
        tok_sc = jnp.where((beams["n"] < max_symbols)[:, :, None],
                           tok_sc, NEG)
        sc, ix = jax.lax.top_k(tok_sc.reshape(B, K * C), K)
        parent, c = ix // C, ix % C
        token = token_of[c].astype(jnp.int32)
        dt = dt_of[c].astype(jnp.int32)
        sel = gather_k(carried, parent)
        new_state, new_pred = pred_step(sel["state"], token)
        tokens = jnp.where(
            jnp.arange(max_symbols)[None, None, :] == sel["n"][:, :, None],
            token[:, :, None],
            sel["tokens"],
        )
        # token arcs land on a frame (t+dt < len), never finishing a path
        live_parts.append((sc, {
            "tokens": tokens, "n": sel["n"] + 1, "t": sel["t"] + dt,
            "state": new_state, "pred": new_pred,
        }))

        pool_scores = jnp.concatenate([p[0] for p in live_parts], axis=1)
        pool = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=1),
            *[p[1] for p in live_parts])
        if merge:
            pool_scores = _merge_duplicate_hyps(
                pool_scores, pool["tokens"], pool["n"],
                extra_keys=(pool["t"],),
            )
        top_sc, top_ix = jax.lax.top_k(pool_scores, K)
        beams = {"score": top_sc, **gather_k(pool, top_ix)}

        # fold newly finished hypotheses into the finished pool (complete
        # paths with the same token string are the same hypothesis: pool)
        f_sc = jnp.concatenate(fin_scores, axis=1)
        f_tok = jnp.concatenate(fin_tokens, axis=1)
        f_n = jnp.concatenate(fin_n, axis=1)
        if merge:
            f_sc = _merge_duplicate_hyps(f_sc, f_tok, f_n)
        f_top, f_ix = jax.lax.top_k(f_sc, K)
        fin = {
            "score": f_top,
            **gather_k({"tokens": f_tok, "n": f_n}, f_ix),
        }
        return (beams, fin), None

    (beams, fin), _ = lax.scan(step, (beams, fin), None,
                               length=T + max_symbols)
    order = jnp.argsort(-fin["score"], axis=1)
    final = gather_k({k: fin[k] for k in ("tokens", "n")}, order)
    scores = jnp.take_along_axis(fin["score"], order, axis=1)
    return final["tokens"], final["n"], scores


def beam_search_decode_multiblank(
    model,
    params,
    feats: jax.Array,
    feat_lengths: jax.Array,
    max_symbols: int,
    beam: int = 4,
    blank: int = 0,
    big_blank_durations: Tuple[int, ...] = (),
    big_blank_indices=None,
    sigma: float = 0.0,
    merge: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """ALSD beam search for a multi-blank model (arXiv:2211.03541).

    Arc semantics match ``rnnt_loss_multiblank``: a token keeps t, the
    standard blank advances 1 frame, big blank k advances m_k, and a path
    finishes when a blank-family arc lands EXACTLY on the utterance length.
    ``sigma`` applies the same logit under-normalization used in training
    (each arc's log-prob shifted by -sigma — with variable path lengths this
    changes the ranking, unlike in greedy).

    Returns (tokens (B, K, max_symbols), token_lengths (B, K),
    scores (B, K)), beams sorted best-first; unfinished beams score NEG.
    """
    from ..ops.multiblank import _resolve_indices

    B, T = feats.shape[0], feats.shape[1]
    enc = model.apply(params, feats, feat_lengths, method=model.encode)

    V = getattr(getattr(model, "cfg", None), "vocab_size", None)
    if V is None:
        pred_probe = model.apply(
            params, model.apply(params, B, 1, method=model.predict_init),
            jnp.full((B, 1), blank, jnp.int32), method=model.predict_step)[1]
        V = model.apply(params, enc[:, :1, :][:, 0], pred_probe,
                        method=model.joint_step).shape[-1]
    durs, bb_idx = _resolve_indices(V, blank, tuple(big_blank_durations),
                                    big_blank_indices)
    len_b = feat_lengths.astype(jnp.int32)[:, None]

    def score_arcs(beams, e_frames, live):
        logits = model.apply(params, e_frames, beams["pred"],
                             method=model.joint_step)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1) - sigma

        blank_classes = []
        for m, idx in ((1, blank),) + tuple(zip(durs, bb_idx)):
            ok = live & (beams["t"] + m <= len_b)
            blank_classes.append(
                (jnp.where(ok, beams["score"] + lp[:, :, idx], NEG), m))

        tok_sc = beams["score"][:, :, None] + lp
        for idx in (blank,) + tuple(bb_idx):
            tok_sc = tok_sc.at[:, :, idx].set(NEG)
        tok_sc = jnp.where(live[:, :, None], tok_sc, NEG)
        token_of = jnp.arange(V, dtype=jnp.int32)
        dt_of = jnp.zeros((V,), jnp.int32)
        return blank_classes, tok_sc, token_of, dt_of

    return _alsd_search(model, params, enc, feat_lengths, max_symbols,
                        beam, blank, merge, score_arcs)


def beam_search_decode_tdt(
    model,
    params,
    feats: jax.Array,
    feat_lengths: jax.Array,
    max_symbols: int,
    beam: int = 4,
    blank: int = 0,
    sigma: float = 0.0,
    merge: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """ALSD beam search for a Token-and-Duration Transducer model
    (``cfg.tdt_durations`` non-empty; arXiv:2304.06795).

    Arc semantics match ``rnnt_loss_tdt``: every arc scores
    token-head + duration-head log-probs; a token with duration d lands on
    frame t+d (so needs t+d < len; d may be 0), a blank needs d >= 1 and
    finishes the path when t+d == len. ``sigma`` under-normalizes the token
    head exactly as in training.

    Returns (tokens (B, K, max_symbols), token_lengths (B, K),
    scores (B, K)), beams sorted best-first; unfinished beams score NEG.
    """
    B, T = feats.shape[0], feats.shape[1]
    durs = tuple(int(d) for d in model.cfg.tdt_durations)
    D = len(durs)
    dur_arr = jnp.asarray(durs, jnp.int32)
    enc = model.apply(params, feats, feat_lengths, method=model.encode)
    len_b = feat_lengths.astype(jnp.int32)[:, None]

    def score_arcs(beams, e_frames, live):
        logits, dur_logits = model.apply(params, e_frames, beams["pred"],
                                         method=model.tdt_joint_step)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1) - sigma
        lpd = jax.nn.log_softmax(dur_logits.astype(jnp.float32), axis=-1)

        blank_classes = []
        for j, d in enumerate(durs):
            if d < 1:
                continue  # blank arcs need d >= 1 (no self-loop)
            ok = live & (beams["t"] + d <= len_b)
            sc = beams["score"] + lp[:, :, blank] + lpd[:, :, j]
            blank_classes.append((jnp.where(ok, sc, NEG), d))

        # token candidates: (v, d) pairs, flattened C = V * D
        V = lp.shape[-1]
        pair = lp[:, :, :, None] + lpd[:, :, None, :]  # (B, K, V, D)
        pair = pair.at[:, :, blank, :].set(NEG)
        # token arcs must LAND on a frame: t + d < len
        ok_d = beams["t"][:, :, None] + dur_arr[None, None, :] < len_b[..., None]
        pair = jnp.where(ok_d[:, :, None, :], pair, NEG)
        tok_sc = jnp.where(live[:, :, None],
                           (beams["score"][:, :, None, None] + pair)
                           .reshape(*beams["score"].shape, V * D), NEG)
        token_of = jnp.repeat(jnp.arange(V, dtype=jnp.int32), D)
        dt_of = jnp.tile(dur_arr, V)
        return blank_classes, tok_sc, token_of, dt_of

    return _alsd_search(model, params, enc, feat_lengths, max_symbols,
                        beam, blank, merge, score_arcs)
