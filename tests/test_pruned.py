"""Pruned (banded) RNN-T loss tests.

Key invariant: with a band covering the whole lattice (S = U, ranges = 0)
the pruned loss and its gradient EQUAL the dense loss. Narrower bands are
their own well-defined objective (paths within the band), checked by
central differences and by near-equality on peaked inputs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warp_transducer_tpu import rnnt_loss
from warp_transducer_tpu.ops.pruned import (
    gather_banded, rnnt_loss_pruned, rnnt_prune_ranges,
)


def _setup(seed, B=3, T=6, U=4, V=5, ragged=True, scale=1.0):
    rng = np.random.RandomState(seed)
    acts = jnp.asarray(rng.randn(B, T, U, V) * scale, jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
    if ragged:
        il = jnp.asarray(rng.randint(2, T + 1, (B,)), jnp.int32).at[0].set(T)
        ll = jnp.asarray(rng.randint(1, U, (B,)), jnp.int32).at[0].set(U - 1)
    else:
        il = jnp.full((B,), T, jnp.int32)
        ll = jnp.full((B,), U - 1, jnp.int32)
    return acts, labels, il, ll


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("ragged", [False, True])
def test_full_band_equals_dense(seed, ragged):
    acts, labels, il, ll = _setup(seed, ragged=ragged)
    B, T, U, V = acts.shape
    ranges = jnp.zeros((B, T), jnp.int32)

    dense = rnnt_loss(acts, labels, il, ll, reduction="none", implementation="xla")
    pruned = rnnt_loss_pruned(acts, ranges, labels, il, ll, reduction="none")
    np.testing.assert_allclose(np.asarray(pruned), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)

    gd = jax.grad(lambda a: rnnt_loss(a, labels, il, ll, reduction="sum",
                                      implementation="xla"))(acts)
    gp = jax.grad(lambda a: rnnt_loss_pruned(a, ranges, labels, il, ll,
                                             reduction="sum"))(acts)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gd),
                               rtol=1e-4, atol=1e-5)


def test_prune_ranges_properties():
    rng = np.random.RandomState(0)
    B, T, U, V, S = 4, 12, 8, 6, 3
    am = jnp.asarray(rng.randn(B, T, V), jnp.float32)
    lm = jnp.asarray(rng.randn(B, U, V), jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
    il = jnp.asarray([12, 9, 5, 12], jnp.int32)
    ll = jnp.asarray([7, 4, 2, 1], jnp.int32)

    r = np.asarray(rnnt_prune_ranges(am, lm, labels, il, ll, S))
    assert r.shape == (B, T)
    assert np.all(r[:, 0] == 0)
    d = np.diff(r, axis=1)
    assert np.all(d >= 0) and np.all(d <= S - 1)
    for b in range(B):
        Tb, Ub = int(il[b]), int(ll[b]) + 1
        # terminal cell inside the band at the last frame
        assert r[b, Tb - 1] <= Ub - 1 <= r[b, Tb - 1] + S - 1
        assert np.all(r[b, :Tb] <= max(0, Ub - S))


def test_pruned_grad_central_difference():
    """The banded loss is its own objective; its gradient must match FD."""
    acts, labels, il, ll = _setup(3, B=2, T=5, U=4, V=4, ragged=False)
    B, T, U, V = acts.shape
    S = 2
    # a simple valid band: advance every other frame, clipped
    base = np.minimum(np.arange(T) // 2, U - S)
    ranges = jnp.asarray(np.tile(base, (B, 1)), jnp.int32)

    f = lambda a: rnnt_loss_pruned(a, ranges, labels, il, ll, reduction="sum")
    # band acts: (B, T, S, V)
    acts_band = jnp.asarray(
        np.random.RandomState(7).randn(B, T, S, V), jnp.float32
    )
    g = jax.grad(f)(acts_band)
    eps = 1e-2
    rng = np.random.RandomState(5)
    for _ in range(6):
        idx = tuple(rng.randint(0, d) for d in acts_band.shape)
        xp = acts_band.at[idx].add(eps)
        xm = acts_band.at[idx].add(-eps)
        fd = (float(f(xp)) - float(f(xm))) / (2 * eps)
        np.testing.assert_allclose(fd, float(g[idx]), rtol=2e-2, atol=2e-3)


def test_pruned_close_to_dense_on_peaked_acts():
    """When the posterior is concentrated, a narrow band captures it."""
    rng = np.random.RandomState(4)
    B, T, U, V, S = 2, 8, 5, 6, 3
    labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
    il = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), U - 1, jnp.int32)
    # construct acts peaked along a diagonal alignment: emit label u near
    # frame t = u * T/U, blank elsewhere
    acts = np.full((B, T, U, V), 0.0, np.float32)
    for b in range(B):
        for t in range(T):
            for u in range(U):
                target_t = int(u * T / U)
                if u < U - 1 and abs(t - target_t) < 1:
                    acts[b, t, u, int(labels[b, u])] = 8.0
                else:
                    acts[b, t, u, 0] = 8.0
    acts = jnp.asarray(acts)
    dense = rnnt_loss(acts, labels, il, ll, reduction="none", implementation="xla")

    # ranges from the dense lattice posteriors via the factorised helper is
    # stage-1's job; here hand a band that follows the diagonal
    # band that follows the peaked path u(t) = [0,1,2,2,3,4,4,4] (before the
    # frame's emit), clipped to the max start U-S
    base = np.clip([0, 1, 2, 2, 3, 4, 4, 4], 0, U - S)
    ranges = jnp.asarray(np.tile(base, (B, 1)), jnp.int32).at[:, 0].set(0)
    ab = np.zeros((B, T, S, V), np.float32)
    rn = np.asarray(ranges)
    for b in range(B):
        for t in range(T):
            for s in range(S):
                u = min(rn[b, t] + s, U - 1)
                ab[b, t, s] = np.asarray(acts)[b, t, u]
    pruned = rnnt_loss_pruned(jnp.asarray(ab), ranges, labels, il, ll,
                              reduction="none")
    np.testing.assert_allclose(np.asarray(pruned), np.asarray(dense),
                               rtol=0.02, atol=0.05)


def test_gather_banded():
    rng = np.random.RandomState(6)
    B, U, H, T, S = 2, 6, 3, 4, 2
    x = jnp.asarray(rng.randn(B, U, H), jnp.float32)
    ranges = jnp.asarray([[0, 1, 3, 4], [0, 0, 2, 2]], jnp.int32)
    out = np.asarray(gather_banded(x, ranges, S))
    for b in range(B):
        for t in range(T):
            for s in range(S):
                u = min(int(ranges[b, t]) + s, U - 1)
                np.testing.assert_array_equal(out[b, t, s], np.asarray(x)[b, u])


def test_pruned_validation():
    acts_band = jnp.zeros((2, 4, 2, 5))
    ranges = jnp.zeros((2, 4), jnp.int32)
    labels = jnp.zeros((2, 3), jnp.int32)
    il = jnp.full((2,), 4, jnp.int32)
    ll = jnp.full((2,), 2, jnp.int32)
    with pytest.raises(ValueError):
        rnnt_loss_pruned(acts_band[0], ranges, labels, il, ll)
    with pytest.raises(ValueError):
        rnnt_loss_pruned(acts_band, ranges[:, :2], labels, il, ll)
    with pytest.raises(ValueError):
        rnnt_loss_pruned(acts_band, ranges, labels, il, ll, reduction="x")


def test_prune_ranges_fuzz_contract_and_no_nan():
    """40 random ragged configs: the ranges contract must hold
    unconditionally and gradients must never be NaN (infeasible
    utterances — U_b-1 > T_b*(S-1) — get a huge cost and zero grads)."""
    from warp_transducer_tpu.ops.simple import rnnt_loss_simple

    B, T, U, V, S = 2, 10, 8, 6, 3
    for seed in range(40):
        rng = np.random.RandomState(seed)
        am = jnp.asarray(rng.randn(B, T, V), jnp.float32)
        lm = jnp.asarray(rng.randn(B, U, V), jnp.float32)
        labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
        il = jnp.asarray(rng.randint(1, T + 1, (B,)), jnp.int32)
        ll = jnp.asarray(rng.randint(1, U, (B,)), jnp.int32)

        r = np.asarray(rnnt_prune_ranges(am, lm, labels, il, ll, S))
        d = np.diff(r, axis=1)
        assert np.all(r[:, 0] == 0), (seed, r)
        assert np.all(d >= 0), (seed, r)
        assert np.all(d <= S - 1), (seed, r)
        for b in range(B):
            Ub = int(ll[b]) + 1
            assert np.all(r[b] <= max(0, Ub - 1)), (seed, r)

        acts_band = jnp.asarray(rng.randn(B, T, S, V), jnp.float32)
        loss, g = jax.value_and_grad(
            lambda a: rnnt_loss_pruned(a, jnp.asarray(r), labels, il, ll,
                                       reduction="sum")
        )(acts_band)
        assert np.isfinite(np.asarray(g)).all(), (seed, "NaN/inf grads")
        for b in range(B):
            Tb, Ub = int(il[b]), int(ll[b]) + 1
            feasible = (Ub - 1) <= Tb * (S - 1)
            costs = rnnt_loss_pruned(acts_band, jnp.asarray(r), labels, il, ll,
                                     reduction="none")
            if feasible:
                assert float(costs[b]) < 1e29, (seed, b, float(costs[b]))
            else:
                assert float(costs[b]) > 1e29, (seed, b, float(costs[b]))


def test_simple_loss_prune_range_matches_standalone():
    from warp_transducer_tpu.ops.simple import rnnt_loss_simple

    rng = np.random.RandomState(8)
    B, T, U, V, S = 3, 9, 5, 6, 3
    am = jnp.asarray(rng.randn(B, T, V), jnp.float32)
    lm = jnp.asarray(rng.randn(B, U, V), jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
    il = jnp.asarray([9, 6, 4], jnp.int32)
    ll = jnp.asarray([4, 3, 2], jnp.int32)

    loss_a = rnnt_loss_simple(am, lm, labels, il, ll, reduction="sum",
                              implementation="xla")
    loss_b, ranges = rnnt_loss_simple(am, lm, labels, il, ll, reduction="sum",
                                      implementation="xla", prune_range=S)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    ranges_ref = rnnt_prune_ranges(am, lm, labels, il, ll, S,
                                   implementation="xla")
    np.testing.assert_array_equal(np.asarray(ranges), np.asarray(ranges_ref))

    # gradient flows through the loss output of the tuple form
    g = jax.grad(
        lambda a: rnnt_loss_simple(a, lm, labels, il, ll, reduction="sum",
                                   implementation="xla", prune_range=S)[0]
    )(am)
    g_ref = jax.grad(
        lambda a: rnnt_loss_simple(a, lm, labels, il, ll, reduction="sum",
                                   implementation="xla")
    )(am)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-6)
