"""rnnt_loss_simple (factorised additive joiner) vs the dense loss.

The simple loss must EQUAL rnnt_loss(am ⊕ lm) — same lattice, same math —
and its (dam, dlm) must equal the u-/t-marginals of the dense gradient
(chain rule through the broadcast add).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warp_transducer_tpu import rnnt_loss
from warp_transducer_tpu.ops.simple import rnnt_loss_simple


def _setup(seed, B=3, T=6, U=4, V=7, ragged=True):
    rng = np.random.RandomState(seed)
    am = jnp.asarray(rng.randn(B, T, V) * 2, jnp.float32)
    lm = jnp.asarray(rng.randn(B, U, V) * 2, jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
    if ragged:
        il = jnp.asarray(rng.randint(2, T + 1, (B,)), jnp.int32).at[0].set(T)
        ll = jnp.asarray(rng.randint(1, U, (B,)), jnp.int32).at[0].set(U - 1)
    else:
        il = jnp.full((B,), T, jnp.int32)
        ll = jnp.full((B,), U - 1, jnp.int32)
    return am, lm, labels, il, ll


@pytest.mark.parametrize("seed", [0, 1])
def test_simple_equals_dense(seed, implementation):
    am, lm, labels, il, ll = _setup(seed)
    acts = am[:, :, None, :] + lm[:, None, :, :]
    dense = rnnt_loss(acts, labels, il, ll, reduction="none",
                      implementation=implementation)
    simple = rnnt_loss_simple(am, lm, labels, il, ll, reduction="none",
                              implementation=implementation)
    np.testing.assert_allclose(np.asarray(simple), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_simple_grads_equal_dense_marginals(seed, implementation):
    am, lm, labels, il, ll = _setup(seed)

    def dense_loss(am_, lm_):
        acts = am_[:, :, None, :] + lm_[:, None, :, :]
        return rnnt_loss(acts, labels, il, ll, reduction="sum",
                         implementation=implementation)

    def simple_loss(am_, lm_):
        return rnnt_loss_simple(am_, lm_, labels, il, ll, reduction="sum",
                                implementation=implementation)

    gd = jax.grad(dense_loss, argnums=(0, 1))(am, lm)
    gs = jax.grad(simple_loss, argnums=(0, 1))(am, lm)
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(gd[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(gd[1]),
                               rtol=1e-4, atol=1e-5)


def test_simple_mean_reduction_and_blank():
    am, lm, labels, il, ll = _setup(2, V=6)
    blank = 5
    labels = jnp.where(labels == blank, 1, labels)
    acts = am[:, :, None, :] + lm[:, None, :, :]
    d = rnnt_loss(acts, labels, il, ll, blank=blank, reduction="mean")
    s = rnnt_loss_simple(am, lm, labels, il, ll, blank=blank, reduction="mean")
    np.testing.assert_allclose(float(s), float(d), rtol=1e-5)


def test_simple_shape_validation():
    am = jnp.zeros((2, 5, 7))
    lm = jnp.zeros((2, 3, 7))
    labels = jnp.zeros((2, 2), jnp.int32)
    il = jnp.full((2,), 5, jnp.int32)
    ll = jnp.full((2,), 2, jnp.int32)
    with pytest.raises(ValueError):
        rnnt_loss_simple(am[0], lm, labels, il, ll)
    with pytest.raises(ValueError):
        rnnt_loss_simple(am, lm[:, :, :5], labels, il, ll)
    with pytest.raises(ValueError):
        rnnt_loss_simple(am, lm, labels[:, :1], il, ll)
    with pytest.raises(ValueError):
        rnnt_loss_simple(am, lm, labels, il, ll, reduction="avg")


def test_simple_training_converges():
    """Overfit a tiny factorised model with adam."""
    import optax

    rng = np.random.RandomState(9)
    B, T, U, V, H = 4, 8, 4, 6, 16
    enc = jnp.asarray(rng.randn(B, T, H), jnp.float32)
    pred = jnp.asarray(rng.randn(B, U, H), jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
    il = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), U - 1, jnp.int32)
    W = jnp.asarray(rng.randn(H, V) * 0.1, jnp.float32)

    def loss_fn(W):
        am = jnp.einsum("bth,hv->btv", enc, W)
        lm = jnp.einsum("buh,hv->buv", pred, W)
        return rnnt_loss_simple(am, lm, labels, il, ll)

    opt = optax.adam(0.05)
    st = opt.init(W)

    @jax.jit
    def step(W, st):
        g = jax.grad(loss_fn)(W)
        up, st = opt.update(g, st)
        return optax.apply_updates(W, up), st

    l0 = float(loss_fn(W))
    for _ in range(150):
        W, st = step(W, st)
    assert float(loss_fn(W)) < l0 / 2
