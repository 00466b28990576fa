"""Viterbi forced alignment vs brute-force path enumeration."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warp_transducer_tpu import rnnt_loss
from warp_transducer_tpu.ops.alignment import rnnt_viterbi_align


def _log_softmax(x):
    m = x.max(-1, keepdims=True)
    return x - m - np.log(np.exp(x - m).sum(-1, keepdims=True))


def _brute_force_best(acts_b, labels_b, T, U, blank):
    """Enumerate all monotonic (t, u) paths; return (best score, emit frames)."""
    lp = _log_softmax(acts_b.astype(np.float64))
    best = (-np.inf, None)
    # path = sequence of moves from (0,0) to (T-1,U-1) then final blank;
    # choose which of the T-1+U-1 steps are emits (positions of u-advances)
    n_moves = (T - 1) + (U - 1)
    for emit_positions in itertools.combinations(range(n_moves), U - 1):
        t, u, score = 0, 0, 0.0
        frames = []
        for k in range(n_moves):
            if k in emit_positions:
                score += lp[t, u, labels_b[u]]
                frames.append(t)
                u += 1
            else:
                score += lp[t, u, blank]
                t += 1
        score += lp[T - 1, U - 1, blank]
        if score > best[0]:
            best = (score, frames)
    return best


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_viterbi_matches_brute_force(seed):
    rng = np.random.RandomState(seed)
    B, T, U, V = 2, 4, 3, 5
    acts = rng.randn(B, T, U, V).astype(np.float32) * 2.0
    labels = rng.randint(1, V, (B, U - 1)).astype(np.int32)
    il = np.full((B,), T, np.int32)
    ll = np.full((B,), U - 1, np.int32)

    out = rnnt_viterbi_align(
        jnp.asarray(acts), jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll)
    )
    for b in range(B):
        want_score, want_frames = _brute_force_best(acts[b], labels[b], T, U, 0)
        np.testing.assert_allclose(float(out.score[b]), want_score, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(out.emit_frames[b]), want_frames)


def test_viterbi_ragged_and_bounds():
    rng = np.random.RandomState(3)
    B, T, U, V = 3, 6, 4, 7
    acts = jnp.asarray(rng.randn(B, T, U, V), jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
    il = jnp.asarray([6, 4, 2], jnp.int32)
    ll = jnp.asarray([3, 2, 1], jnp.int32)

    out = jax.jit(rnnt_viterbi_align)(acts, labels, il, ll)
    costs = rnnt_loss(acts, labels, il, ll, reduction="none")
    for b in range(B):
        Tb, Lb = int(il[b]), int(ll[b])
        # Viterbi score <= total log-likelihood (sum over all paths)
        assert float(out.score[b]) <= -float(costs[b]) + 1e-4
        ef = np.asarray(out.emit_frames[b])
        assert np.all(ef[:Lb] >= 0) and np.all(ef[:Lb] < Tb)
        assert np.all(np.diff(ef[:Lb]) >= 0)  # monotonic
        assert np.all(ef[Lb:] == -1)
        # path has exactly Lb emits and Tb-1 advances within its length
        p = np.asarray(out.path[b])
        n_b = Tb + Lb  # path decisions = (Tb-1) + Lb, recorded at 0..n_b-2
        assert (p[: n_b - 1] >= 0).all()
        assert p[: n_b - 1].sum() == Lb or (p[: n_b - 1] == 1).sum() == Lb


def test_viterbi_single_cell():
    acts = jnp.asarray(np.random.RandomState(0).randn(1, 1, 1, 4), jnp.float32)
    out = rnnt_viterbi_align(
        acts, jnp.zeros((1, 0), jnp.int32), jnp.ones((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    want = float(jax.nn.log_softmax(acts[0, 0, 0])[0])
    np.testing.assert_allclose(float(out.score[0]), want, rtol=1e-6)
