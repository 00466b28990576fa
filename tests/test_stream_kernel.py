"""Streamed Pallas kernel (interpret mode) vs the XLA engine, edge cases."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warp_transducer_tpu.ops import lattice, prep
from warp_transducer_tpu.ops.pallas import wavefront_stream


def _compare(B, T, U, V, il, ll, seed=0):
    rng = np.random.RandomState(seed)
    acts = jnp.asarray(rng.randn(B, T, U, V), jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, (B, max(U - 1, 1))), jnp.int32)
    il = jnp.asarray(il, jnp.int32)
    ll = jnp.asarray(ll, jnp.int32)
    p = prep.prepare(acts, labels, 0, False)
    rx = lattice.forward_backward(p.lpb, p.lpe, il, ll)
    rs = wavefront_stream.forward_backward(p.lpb, p.lpe, il, ll)
    np.testing.assert_allclose(
        np.asarray(rs.ll_forward), np.asarray(rx.ll_forward), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(rs.ll_backward), np.asarray(rx.ll_backward), rtol=1e-5
    )
    for name in ("alphas", "betas"):
        a, b = np.asarray(getattr(rs, name)), np.asarray(getattr(rx, name))
        mask = np.isfinite(b) & (b > -1e29)
        np.testing.assert_allclose(
            np.where(mask, a, 0), np.where(mask, b, 0), rtol=1e-4, atol=1e-5,
            err_msg=name,
        )


class TestStreamKernel:
    def test_ragged(self):
        _compare(5, 12, 7, 9, [12, 5, 9, 3, 12], [6, 2, 4, 0, 6])

    def test_batch_one(self):
        _compare(1, 9, 4, 6, [9], [3])

    def test_t_equals_one(self):
        _compare(2, 1, 3, 5, [1, 1], [2, 1])

    def test_u_equals_one(self):
        _compare(3, 7, 1, 5, [7, 4, 2], [0, 0, 0])

    def test_chunk_boundary_shapes(self):
        # N = T+U-1 deliberately not divisible by typical chunk sizes
        _compare(2, 13, 5, 4, [13, 11], [4, 3], seed=3)
        _compare(2, 16, 2, 4, [16, 9], [1, 0], seed=4)

    def test_score_only(self):
        rng = np.random.RandomState(1)
        B, T, U, V = 3, 10, 5, 7
        acts = jnp.asarray(rng.randn(B, T, U, V), jnp.float32)
        labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
        il = jnp.asarray([10, 6, 4], jnp.int32)
        ll = jnp.asarray([4, 2, 1], jnp.int32)
        p = prep.prepare(acts, labels, 0, False)
        rx = lattice.forward_backward(p.lpb, p.lpe, il, ll, compute_betas=False)
        rs = wavefront_stream.forward_backward(p.lpb, p.lpe, il, ll, compute_betas=False)
        np.testing.assert_allclose(
            np.asarray(rs.ll_forward), np.asarray(rx.ll_forward), rtol=1e-5
        )


class TestDebugAPI:
    def test_forward_backward_debug(self):
        from warp_transducer_tpu.ops.rnnt import (
            forward_backward_mismatch, rnnt_forward_backward,
        )
        rng = np.random.RandomState(2)
        B, T, U, V = 2, 8, 4, 6
        acts = jnp.asarray(rng.randn(B, T, U, V), jnp.float32)
        labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
        il = jnp.full((B,), T, jnp.int32)
        ll = jnp.full((B,), U - 1, jnp.int32)
        res = rnnt_forward_backward(acts, labels, il, ll, implementation="xla")
        assert res.alphas.shape == (B, T, U)
        mism = forward_backward_mismatch(acts, labels, il, ll, implementation="xla")
        assert np.all(np.asarray(mism) < 1e-3)
