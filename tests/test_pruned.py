"""Pruned (banded) RNN-T loss tests.

Key invariant: with a band covering the whole lattice (S = U, ranges = 0)
the pruned loss and its gradient EQUAL the dense loss. Narrower bands are
their own well-defined objective (paths within the band), checked by
central differences and by near-equality on peaked inputs.
"""
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warp_transducer_tpu import rnnt_loss
from warp_transducer_tpu.ops.pruned import (
    gather_banded, rnnt_loss_pruned, rnnt_prune_ranges,
)

# On the real chip the band pipeline (its own max/exp/log reduction order)
# and the dense XLA path drift at accumulated-f32-roundoff scale (~5e-5 on
# O(1) gradients); on CPU both are bit-stable at 1e-5. The f64 oracles pin
# exactness — this is a cross-engine parity bound, not an accuracy bound.
_GRTOL, _GATOL = ((5e-4, 1e-4) if _os.environ.get("WTT_TEST_TPU") == "1"
                  else (1e-4, 1e-5))
# Same story for cross-engine COST comparisons: measured drift on v5e is
# ~1.6e-5 relative on O(10) costs (band pipeline vs dense XLA).
_CRTOL, _CATOL = ((1e-4, 1e-4) if _os.environ.get("WTT_TEST_TPU") == "1"
                  else (1e-5, 1e-5))


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
                               rtol=_CRTOL, atol=_CATOL)

    gd = jax.grad(lambda a: rnnt_loss(a, labels, il, ll, reduction="sum",
                                      implementation="xla"))(acts)
    gp = jax.grad(lambda a: rnnt_loss_pruned(a, ranges, labels, il, ll,
                                             reduction="sum"))(acts)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gd),
                               rtol=_GRTOL, atol=_GATOL)


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

    # jitted once: the unjitted form re-traces the loss per FD probe
    f = jax.jit(
        lambda a: rnnt_loss_pruned(a, ranges, labels, il, ll,
                                   reduction="sum"))
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


def test_gather_banded_grad_matches_scatter_transpose(monkeypatch):
    """gather_banded's custom VJP (one-hot MXU contraction) must equal the
    autodiff scatter-add transpose, including duplicate clipped indices —
    both in one shot and T-chunked (forced via the env knob)."""
    rng = np.random.RandomState(7)
    B, U, H, T, S = 3, 9, 5, 17, 4

    def naive(x_u, ranges, s):
        idx = jnp.clip(
            ranges[:, :, None] + jnp.arange(s, dtype=ranges.dtype), 0, U - 1
        )
        return jax.vmap(lambda xu, ix: xu[ix])(x_u, idx)

    x = jnp.asarray(rng.randn(B, U, H), jnp.float32)
    starts = np.sort(rng.randint(0, U, (B, T)), axis=1)
    ranges = jnp.asarray(np.minimum(starts, U - 1), jnp.int32)
    ct = jnp.asarray(rng.randn(B, T, S, H), jnp.float32)
    want = jax.grad(lambda xx: jnp.vdot(naive(xx, ranges, S), ct))(x)
    for chunk_mb in ("256", "0"):  # one-shot / forced T-chunked scan
        monkeypatch.setenv("WTT_GATHER_BWD_ONEHOT_MB", chunk_mb)
        got = jax.grad(lambda xx: jnp.vdot(gather_banded(xx, ranges, S), ct))(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)
    # no-trailing-dims form (B, U)
    ct2 = ct[..., 0]
    want2 = jax.grad(lambda xx: jnp.vdot(naive(xx, ranges, S), ct2))(x[..., 0])
    got2 = jax.grad(
        lambda xx: jnp.vdot(gather_banded(xx, ranges, S), ct2))(x[..., 0])
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=1e-6, atol=1e-6)


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

    import os as _os

    B, T, U, V, S = 2, 10, 8, 6, 3
    n_seeds = 40 if _os.environ.get("WTT_FULL_SUITE") == "1" else 6
    # one jitted loss+grad shared by every seed (a fresh closure per seed
    # meant a fresh trace per seed — ~6x the test's cost)
    lg = jax.jit(jax.value_and_grad(
        lambda a, r, lab, il_, ll_: rnnt_loss_pruned(
            a, r, lab, il_, ll_, reduction="sum")))
    ranges_fn = jax.jit(
        lambda am, lm, lab, il_, ll_: rnnt_prune_ranges(
            am, lm, lab, il_, ll_, S))
    for seed in range(n_seeds):
        rng = np.random.RandomState(seed)
        am = jnp.asarray(rng.randn(B, T, V), jnp.float32)
        lm = jnp.asarray(rng.randn(B, U, V), jnp.float32)
        labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
        il = jnp.asarray(rng.randint(1, T + 1, (B,)), jnp.int32)
        ll = jnp.asarray(rng.randint(1, U, (B,)), jnp.int32)

        r = np.asarray(ranges_fn(am, lm, labels, il, ll))
        d = np.diff(r, axis=1)
        assert np.all(r[:, 0] == 0), (seed, r)
        assert np.all(d >= 0), (seed, r)
        assert np.all(d <= S - 1), (seed, r)
        for b in range(B):
            Ub = int(ll[b]) + 1
            assert np.all(r[b] <= max(0, Ub - 1)), (seed, r)

        acts_band = jnp.asarray(rng.randn(B, T, S, V), jnp.float32)
        loss, g = lg(acts_band, jnp.asarray(r), labels, il, ll)
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


class TestBandStreamKernel:
    """The Pallas band kernel (pallas/band_stream.py) must match the XLA
    band scan cell-for-cell, including sentinels and infeasible bands."""

    def _lattice_inputs(self, seed, B, T, U, V, S, ragged=True):
        from warp_transducer_tpu.ops.pruned import _band_prep

        rng = np.random.RandomState(seed)
        acts = jnp.asarray(rng.randn(B, T, S, V), jnp.float32)
        labels = jnp.asarray(rng.randint(1, V, (B, max(U - 1, 1))), jnp.int32)
        if ragged:
            il = jnp.asarray(rng.randint(1, T + 1, (B,)), jnp.int32).at[0].set(T)
            ll = jnp.asarray(rng.randint(0, U, (B,)), jnp.int32).at[0].set(U - 1)
        else:
            il = jnp.full((B,), T, jnp.int32)
            ll = jnp.full((B,), U - 1, jnp.int32)
        # random contract-abiding ranges: monotone, steps <= S-1, start 0
        steps = rng.randint(0, S, size=(B, T))
        steps[:, 0] = 0
        r = np.minimum(np.cumsum(steps, axis=1),
                       np.maximum(np.asarray(ll)[:, None] + 1 - S, 0))
        ranges = jnp.asarray(r, jnp.int32)
        lpb, lpe, _, _, _ = _band_prep(acts, labels, ranges, 0)
        return lpb, lpe, ranges, il, ll

    @pytest.mark.parametrize("seed,B,T,U,V,S", [
        (0, 3, 9, 6, 5, 3),
        (1, 2, 5, 9, 4, 5),
        (2, 4, 12, 7, 6, 8),   # S == sublane tile boundary
        (3, 1, 1, 1, 3, 2),    # T = 1 degenerate
        (4, 2, 17, 12, 5, 11), # S > 8: two sublane tiles
    ])
    def test_matches_xla_band_lattice(self, seed, B, T, U, V, S):
        from warp_transducer_tpu.ops.pallas import band_stream
        from warp_transducer_tpu.ops.pruned import _band_lattice

        lpb, lpe, ranges, il, ll = self._lattice_inputs(seed, B, T, U, V, S)
        ref = _band_lattice(lpb, lpe, ranges, il, ll, implementation="xla")
        a, b, llf, llb = band_stream.band_forward_backward(
            lpb, lpe, ranges, il, ll, interpret=True
        )
        np.testing.assert_allclose(np.asarray(llf), np.asarray(ref.ll_forward),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(llb), np.asarray(ref.ll_backward),
                                   rtol=1e-5, atol=1e-5)
        # compare lattices only where valid (sentinel cells are exact NEG in
        # both engines)
        Tb = np.asarray(il); Ub = np.asarray(ll) + 1
        r = np.asarray(ranges)
        va, vb = np.asarray(a), np.asarray(b)
        ra, rb = np.asarray(ref.alphas), np.asarray(ref.betas)
        for bb in range(lpb.shape[0]):
            for t in range(int(Tb[bb])):
                for s in range(lpb.shape[2]):
                    if r[bb, t] + s < Ub[bb]:
                        np.testing.assert_allclose(
                            va[bb, t, s], ra[bb, t, s], rtol=1e-4, atol=1e-4,
                            err_msg=f"alpha b={bb} t={t} s={s}")
                        np.testing.assert_allclose(
                            vb[bb, t, s], rb[bb, t, s], rtol=1e-4, atol=1e-4,
                            err_msg=f"beta b={bb} t={t} s={s}")

    def test_infeasible_band_sentinel(self):
        """A band too narrow to reach the terminal must give ll == NEG in
        both engines (and thus the same huge finite cost downstream)."""
        from warp_transducer_tpu.ops.pallas import band_stream
        from warp_transducer_tpu.ops.pruned import _band_lattice

        B, T, U, V, S = 1, 3, 8, 4, 2  # U-1=7 > T*(S-1)=3: infeasible
        rng = np.random.RandomState(5)
        acts = jnp.asarray(rng.randn(B, T, S, V), jnp.float32)
        labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
        il = jnp.full((B,), T, jnp.int32)
        ll = jnp.full((B,), U - 1, jnp.int32)
        ranges = jnp.asarray([[0, 1, 2]], jnp.int32)

        from warp_transducer_tpu.ops.pruned import _band_prep
        lpb, lpe, _, _, _ = _band_prep(acts, labels, ranges, 0)
        ref = _band_lattice(lpb, lpe, ranges, il, ll, implementation="xla")
        _, _, llf, _ = band_stream.band_forward_backward(
            lpb, lpe, ranges, il, ll, interpret=True
        )
        assert float(ref.ll_forward[0]) < -1e29
        assert float(llf[0]) < -1e29

    def test_pruned_loss_pallas_impl_end_to_end(self):
        """rnnt_loss_pruned(implementation='pallas') == 'xla' incl. grads."""
        from warp_transducer_tpu.ops.pruned import _band_prep  # noqa: F401

        acts, labels, il, ll = _setup(7, B=2, T=8, U=5, V=6, ragged=True)
        B, T, U, V = acts.shape
        S = 3
        rng = np.random.RandomState(8)
        steps = rng.randint(0, S, size=(B, T)); steps[:, 0] = 0
        r = np.minimum(np.cumsum(steps, axis=1),
                       np.maximum(np.asarray(ll)[:, None] + 1 - S, 0))
        ranges = jnp.asarray(r, jnp.int32)
        band = jnp.asarray(rng.randn(B, T, S, V), jnp.float32)

        cx = rnnt_loss_pruned(band, ranges, labels, il, ll, reduction="none",
                              implementation="xla")
        cp = rnnt_loss_pruned(band, ranges, labels, il, ll, reduction="none",
                              implementation="pallas")
        np.testing.assert_allclose(np.asarray(cp), np.asarray(cx),
                                   rtol=_CRTOL, atol=_CATOL)
        gx = jax.grad(lambda a: rnnt_loss_pruned(
            a, ranges, labels, il, ll, reduction="sum",
            implementation="xla"))(band)
        gp = jax.grad(lambda a: rnnt_loss_pruned(
            a, ranges, labels, il, ll, reduction="sum",
            implementation="pallas"))(band)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=_GRTOL, atol=_GATOL)

