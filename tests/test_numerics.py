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
    def test_inf_test_reference_shape(self, implementation):
        """T=50, L=10, V=15 un-normalised acts: finite cost, NaN-free grads
        (test_cpu.cpp:181-240), on BOTH engines — the streamed Pallas
        kernel's −1e30 sentinel must survive raw (un-normalised) inputs."""
        rng = np.random.RandomState(0)
        acts, labels, il, ll = _random_problem(rng, 1, 50, 10, 15)
        c, g = rnnt_loss_and_grad(
            jnp.asarray(acts), jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll),
            implementation=implementation,
        )
        assert np.isfinite(np.asarray(c)).all()
        assert not np.isnan(np.asarray(g)).any()

    def test_large_magnitude_acts(self, implementation):
        rng = np.random.RandomState(1)
        acts, labels, il, ll = _random_problem(rng, 2, 10, 5, 8)
        acts = acts * 50.0 - 25.0
        c, g = rnnt_loss_and_grad(
            jnp.asarray(acts), jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll),
            implementation=implementation,
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

    @pytest.mark.parametrize(
        "B,T,U,V",
        [
            (1, 50, 15, 20),  # reference grad-check problem 1 (test_cpu.cpp:349)
            (65, 10, 5, 5),   # reference grad-check problem 2 (test_cpu.cpp:360)
        ],
    )
    def test_central_difference_reference_shapes(self, implementation, B, T, U, V):
        """The reference's own grad-check problem sizes
        (/root/reference/tests/test_cpu.cpp:287-379: (A=20,T=50,U=15,B=1) and
        (A=5,T=10,U=5,B=65)), made affordable with sampled-coordinate central
        differences: 512 random coordinates, each priced by stacking its ±ε
        perturbed copies along the batch axis of one jitted score call.

        Tolerances mirror the reference: 1e-4 when the analytic gradient is
        fp64 (CPU tol, test_cpu.cpp:345) and 1e-2 for fp32 engines (the GPU
        tol, test_gpu.cu:443-445).
        """
        rng = np.random.RandomState(7)
        acts, labels, il, ll = _random_problem(rng, B, T, U, V)
        x64 = bool(jax.config.jax_enable_x64)
        f64 = x64 and implementation == "xla"
        dtype = np.float64 if f64 else np.float32
        tol = 1e-4 if f64 else 1e-2
        acts = acts.astype(dtype)
        jl, jil, jll = jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll)

        _, grads = rnnt_loss_and_grad(
            jnp.asarray(acts), jl, jil, jll, implementation=implementation
        )
        grads = np.asarray(grads)

        # FD in fp64 whenever available (the f32 values embed exactly); with
        # f32-only backends (TPU) widen ε instead so the cost's ~1e-5·|cost|
        # rounding noise stays well under the difference quotient.
        fd_dtype = np.float64 if x64 else np.float32
        n_coords, eps, chunk = 512, (1e-2 if x64 else 5e-2), 128
        flat_idx = rng.choice(acts.size, size=n_coords, replace=False)
        b_idx, t_idx, u_idx, v_idx = np.unravel_index(flat_idx, acts.shape)

        # A perturbation at (b,t,u,v) only moves utterance b's cost, so the
        # ± copies of acts[b] stack along the batch axis; FD always uses the
        # (oracle-verified) fp64-capable XLA engine.
        score = jax.jit(
            lambda a, lab, ilc, llc: rnnt_score(a, lab, ilc, llc,
                                                implementation="xla")
        )
        num = np.zeros(n_coords, dtype=np.float64)
        for lo in range(0, n_coords, chunk):
            sel = slice(lo, min(lo + chunk, n_coords))
            bs, ts, us, vs = b_idx[sel], t_idx[sel], u_idx[sel], v_idx[sel]
            base = acts[bs].astype(fd_dtype)  # (C, T, U, V) copies
            r = np.arange(len(bs))
            plus, minus = base.copy(), base.copy()
            plus[r, ts, us, vs] += eps
            minus[r, ts, us, vs] -= eps
            stacked = jnp.asarray(np.concatenate([plus, minus], axis=0))
            lab2 = jnp.asarray(np.concatenate([labels[bs]] * 2, axis=0))
            il2 = jnp.asarray(np.concatenate([il[bs]] * 2, axis=0))
            ll2 = jnp.asarray(np.concatenate([ll[bs]] * 2, axis=0))
            costs = np.asarray(score(stacked, lab2, il2, ll2), np.float64)
            num[sel] = (costs[: len(bs)] - costs[len(bs):]) / (2 * eps)

        ana = grads[b_idx, t_idx, u_idx, v_idx].astype(np.float64)
        # rel_diff over the sampled coordinates (test.h:22-32)
        rel = np.sqrt(((ana - num) ** 2).sum()) / np.sqrt((ana**2).sum())
        assert rel < tol, f"relative grad error {rel} (tol {tol})"

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
