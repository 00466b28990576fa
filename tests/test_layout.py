"""Unit tests for the diagonal-layout transforms and the lazy-backward
cotangent scaling.

``skew``/``unskew`` use the flatten-rechunk reshape trick; these tests pin
them to the direct index-definition D[n, b, u] = x[b, n-u, u] across edge
shapes (U=1, T=1, T<U, T>U).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warp_transducer_tpu import rnnt_loss
from warp_transducer_tpu.ops.lattice import skew, unskew


def _skew_direct(x, fill):
    B, T, U = x.shape
    N = T + U - 1
    out = np.full((N, B, U), fill, dtype=x.dtype)
    for n in range(N):
        for u in range(U):
            t = n - u
            if 0 <= t < T:
                out[n, :, u] = x[:, t, u]
    return out


@pytest.mark.parametrize("B,T,U", [(2, 5, 3), (1, 1, 4), (3, 6, 1), (2, 2, 7), (4, 9, 9)])
def test_skew_matches_direct_definition(B, T, U):
    rng = np.random.RandomState(0)
    x = rng.randn(B, T, U).astype(np.float32)
    fill = -1e30
    got = np.asarray(jax.jit(lambda a: skew(a, fill=fill))(x))
    want = _skew_direct(x, fill)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("B,T,U", [(2, 5, 3), (1, 1, 4), (3, 6, 1), (2, 2, 7), (4, 9, 9)])
def test_unskew_roundtrip(B, T, U):
    rng = np.random.RandomState(1)
    x = rng.randn(B, T, U).astype(np.float32)
    d = jax.jit(lambda a: skew(a, fill=-1e30))(x)
    back = np.asarray(jax.jit(lambda a: unskew(a, T))(d))
    np.testing.assert_array_equal(back, x)


def test_per_utterance_cotangent_scaling(implementation):
    """grad of sum(w * costs) must equal the w-scaled per-utterance grads —
    exercises the scale folding in the lazy backward."""
    rng = np.random.RandomState(2)
    B, T, U, V = 3, 5, 4, 6
    acts = jnp.asarray(rng.randn(B, T, U, V), jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
    il = jnp.asarray([5, 4, 3], jnp.int32)
    ll = jnp.asarray([3, 2, 1], jnp.int32)
    w = jnp.asarray([0.5, -2.0, 3.25], jnp.float32)

    def weighted(a):
        costs = rnnt_loss(a, labels, il, ll, reduction="none",
                          implementation=implementation)
        return jnp.sum(w * costs)

    def unweighted(a):
        return rnnt_loss(a, labels, il, ll, reduction="none",
                         implementation=implementation)

    g_w = jax.grad(weighted)(acts)
    g_per = jax.jacrev(unweighted)(acts)  # (B, B, T, U, V); diag over batch
    g_manual = jnp.einsum("b,bbtuv->btuv", w, g_per)
    np.testing.assert_allclose(np.asarray(g_w), np.asarray(g_manual),
                               rtol=1e-5, atol=1e-6)
