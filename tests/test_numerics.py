"""Numerical robustness + gradient checks.

Mirrors the reference's inf_test and central-difference grad_check
(/root/reference/tests/test_cpu.cpp:181-379) at sizes that keep the
finite-difference loop tractable, plus the reference's exact inf_test shape.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warp_transducer_tpu import rnnt_loss_and_grad, rnnt_score


def _random_problem(rng, B, T, U, V):
    acts = rng.uniform(0, 1, size=(B, T, U, V)).astype(np.float32)
    labels = rng.randint(1, V, size=(B, U - 1)).astype(np.int32)
    # force mid-sequence label repeats, like the reference generator
    # (/root/reference/tests/random.cpp:32-36)
    if U - 1 >= 3:
        mid = (U - 1) // 2
        labels[:, mid] = labels[:, mid - 1]
    il = np.full((B,), T, np.int32)
    ll = np.full((B,), U - 1, np.int32)
    return acts, labels, il, ll


class TestInf:
    def test_inf_test_reference_shape(self):
        """T=50, L=10, V=15 un-normalised acts: finite cost, NaN-free grads
        (test_cpu.cpp:181-240)."""
        rng = np.random.RandomState(0)
        acts, labels, il, ll = _random_problem(rng, 1, 50, 10, 15)
        c, g = rnnt_loss_and_grad(
            jnp.asarray(acts), jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll),
            implementation="xla",
        )
        assert np.isfinite(np.asarray(c)).all()
        assert not np.isnan(np.asarray(g)).any()

    def test_large_magnitude_acts(self):
        rng = np.random.RandomState(1)
        acts, labels, il, ll = _random_problem(rng, 2, 10, 5, 8)
        acts = acts * 50.0 - 25.0
        c, g = rnnt_loss_and_grad(
            jnp.asarray(acts), jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll),
            implementation="xla",
        )
        assert np.isfinite(np.asarray(c)).all()
        assert not np.isnan(np.asarray(g)).any()


class TestGradCheck:
    """Second-order central differences vs the analytic gradient, with the
    reference's epsilon and relative sum-of-squares metric
    (/root/reference/tests/test.h:22-32, test_cpu.cpp:242-345)."""

    @pytest.mark.parametrize(
        "B,T,U,V,tol",
        [
            (1, 6, 4, 5, 1e-2),
            (2, 4, 3, 3, 1e-2),
        ],
    )
    def test_central_difference(self, B, T, U, V, tol):
        rng = np.random.RandomState(2)
        acts, labels, il, ll = _random_problem(rng, B, T, U, V)
        jl, jil, jll = jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll)

        costs_fn = jax.jit(
            lambda a: rnnt_score(a, jl, jil, jll, implementation="xla").sum()
        )
        _, grads = rnnt_loss_and_grad(
            jnp.asarray(acts), jl, jil, jll, implementation="xla"
        )
        grads = np.asarray(grads)

        eps = 1e-2
        num = np.zeros_like(acts)
        flat = acts.reshape(-1)
        for i in range(flat.size):
            orig = flat[i]
            flat[i] = orig + eps
            cp = float(costs_fn(jnp.asarray(acts)))
            flat[i] = orig - eps
            cm = float(costs_fn(jnp.asarray(acts)))
            flat[i] = orig
            num.reshape(-1)[i] = (cp - cm) / (2 * eps)

        # rel_diff: sqrt(sum((a-b)^2)) / sqrt(sum(a^2))  (test.h:22-32)
        rel = np.sqrt(((grads - num) ** 2).sum()) / np.sqrt((grads**2).sum())
        assert rel < tol, f"relative grad error {rel}"

    def test_fp64_grad_check_tight(self):
        """fp64 allows the reference CPU tolerance of 1e-4."""
        rng = np.random.RandomState(4)
        B, T, U, V = 1, 5, 4, 4
        acts, labels, il, ll = _random_problem(rng, B, T, U, V)
        acts = acts.astype(np.float64)
        jl, jil, jll = jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll)
        costs_fn = jax.jit(
            lambda a: rnnt_score(a, jl, jil, jll, implementation="xla").sum()
        )
        _, grads = rnnt_loss_and_grad(jnp.asarray(acts), jl, jil, jll, implementation="xla")
        grads = np.asarray(grads)
        eps = 1e-4
        num = np.zeros_like(acts)
        flat = acts.reshape(-1)
        for i in range(flat.size):
            orig = flat[i]
            flat[i] = orig + eps
            cp = float(costs_fn(jnp.asarray(acts)))
            flat[i] = orig - eps
            cm = float(costs_fn(jnp.asarray(acts)))
            flat[i] = orig
            num.reshape(-1)[i] = (cp - cm) / (2 * eps)
        rel = np.sqrt(((grads - num) ** 2).sum()) / np.sqrt((grads**2).sum())
        assert rel < 1e-4, f"relative grad error {rel}"
