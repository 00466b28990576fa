"""Delay-penalized transducer (arXiv:2211.00490) across the loss families.

The penalty adds λ·((T_b-1)/2 - t) to every emit arc's log-weight — a
genuine modified objective (loss and gradients change together), so the
gradients admit a finite-difference check in addition to the float64
oracle differential.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warp_transducer_tpu import (
    gather_banded,
    rnnt_loss,
    rnnt_loss_fused_joint,
    rnnt_loss_pruned,
    rnnt_loss_pruned_fused,
    rnnt_loss_simple,
    RNNTOptions,
)
from warp_transducer_tpu.utils import numpy_oracle as oracle

PEN = 0.1


def _problem(seed=0, B=3, T=6, U=4, V=7):
    rng = np.random.RandomState(seed)
    acts = rng.randn(B, T, U, V).astype(np.float32)
    labels = rng.randint(1, V, (B, U - 1)).astype(np.int32)
    il = np.array([T, T - 1, T - 2][:B], np.int32)
    ll = np.array([U - 1, U - 2, U - 1][:B], np.int32)
    return acts, labels, il, ll


@pytest.mark.parametrize("log_probs_input", [False, True])
def test_dense_matches_oracle(implementation, log_probs_input):
    acts, labels, il, ll = _problem()
    a_in = (oracle.log_softmax(acts).astype(np.float32)
            if log_probs_input else acts)
    c_o, g_o = oracle.rnnt_batch(a_in, labels, il, ll, blank=0,
                                 from_log_probs=log_probs_input,
                                 delay_penalty=PEN)

    loss, g = jax.value_and_grad(lambda a: rnnt_loss(
        a, jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll),
        reduction="sum", log_probs_input=log_probs_input,
        implementation=implementation, delay_penalty=PEN))(jnp.asarray(a_in))
    np.testing.assert_allclose(float(loss), c_o.sum(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g), g_o, atol=1e-5)


def test_finite_difference(implementation):
    """The penalty is part of the objective: FD must match the analytic
    gradient (which FastEmit, being gradient-only, cannot pass)."""
    acts, labels, il, ll = _problem(seed=1, B=2, T=4, U=3, V=5)
    args = (jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll))
    # jitted once: the unjitted form re-traces the loss per FD probe
    f = jax.jit(lambda a: rnnt_loss(a, *args, reduction="sum",
                                    implementation=implementation,
                                    delay_penalty=0.3))
    a64 = jnp.asarray(acts, jnp.float64)
    g = np.asarray(jax.grad(f)(a64))
    rng = np.random.RandomState(2)
    eps = 1e-6
    for _ in range(8):
        i = tuple(rng.randint(0, s) for s in acts.shape)
        d = np.zeros_like(acts, np.float64)
        d[i] = eps
        fd = (float(f(a64 + d)) - float(f(a64 - d))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-4, atol=1e-7)


def test_zero_penalty_exact(implementation):
    acts, labels, il, ll = _problem(seed=2)
    args = (jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll))
    l0 = rnnt_loss(jnp.asarray(acts), *args, reduction="none",
                   implementation=implementation)
    l1 = rnnt_loss(jnp.asarray(acts), *args, reduction="none",
                   implementation=implementation, delay_penalty=0.0)
    assert bool(jnp.all(l0 == l1))


def test_penalty_changes_loss_value():
    acts, labels, il, ll = _problem(seed=3)
    args = (jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll))
    l0 = rnnt_loss(jnp.asarray(acts), *args, reduction="none")
    l1 = rnnt_loss(jnp.asarray(acts), *args, reduction="none",
                   delay_penalty=0.5)
    assert not np.allclose(np.asarray(l0), np.asarray(l1))


def test_options_carry_penalty():
    acts, labels, il, ll = _problem(seed=4)
    args = (jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll))
    opt = RNNTOptions(reduction="sum", delay_penalty=PEN)
    a = jnp.asarray(acts)
    np.testing.assert_allclose(
        float(rnnt_loss(a, *args, options=opt)),
        float(rnnt_loss(a, *args, reduction="sum", delay_penalty=PEN)))
    with pytest.raises(ValueError, match="delay_penalty"):
        rnnt_loss(a, *args, delay_penalty=-0.1)


def test_simple_pruned_fused_match_dense():
    """All factorised/banded/fused families must implement the SAME
    objective: equal losses and e-grads on equivalent inputs."""
    rng = np.random.RandomState(5)
    B, T, U, V, H, S = 2, 5, 4, 6, 8, 4
    am = rng.randn(B, T, V).astype(np.float32)
    lm = rng.randn(B, U, V).astype(np.float32)
    labels = rng.randint(1, V, (B, U - 1)).astype(np.int32)
    il = np.array([T, T - 1], np.int32)
    ll = np.array([U - 1, U - 2], np.int32)
    args = (jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll))

    # simple == dense on am ⊕ lm
    acts = jnp.asarray(am[:, :, None, :] + lm[:, None, :, :])
    l_dense = rnnt_loss(acts, *args, reduction="none", delay_penalty=PEN)
    l_simple = rnnt_loss_simple(jnp.asarray(am), jnp.asarray(lm), *args,
                                reduction="none", implementation="xla",
                                delay_penalty=PEN)
    np.testing.assert_allclose(np.asarray(l_simple), np.asarray(l_dense),
                               rtol=1e-5)

    # pruned (full band) == dense
    acts4 = jnp.asarray(rng.randn(B, T, U, V).astype(np.float32))
    ranges = jnp.zeros((B, T), jnp.int32)
    for impl in ("xla", "pallas"):
        l_p = rnnt_loss_pruned(acts4, ranges, *args, reduction="none",
                               implementation=impl, delay_penalty=PEN)
        l_d = rnnt_loss(acts4, *args, reduction="none", delay_penalty=PEN)
        np.testing.assert_allclose(np.asarray(l_p), np.asarray(l_d),
                                   rtol=1e-5, err_msg=impl)
        g_p = jax.grad(lambda a: rnnt_loss_pruned(
            a, ranges, *args, reduction="sum", implementation=impl,
            delay_penalty=PEN))(acts4)
        g_d = jax.grad(lambda a: rnnt_loss(
            a, *args, reduction="sum", delay_penalty=PEN))(acts4)
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_d),
                                   atol=1e-5, err_msg=impl)

    # fused joint == dense on materialised joint; pruned_fused == fused
    e = (rng.randn(B, T, H) * 0.5).astype(np.float32)
    p = (rng.randn(B, U, H) * 0.5).astype(np.float32)
    W = (rng.randn(H, V) / np.sqrt(H)).astype(np.float32)
    b = (rng.randn(V) * 0.1).astype(np.float32)
    ten = tuple(map(jnp.asarray, (e, p, W, b)))
    acts_j = jnp.tanh(ten[0][:, :, None, :] + ten[1][:, None, :, :]) @ ten[2] + ten[3]
    for impl in ("xla", "pallas"):
        l_f = rnnt_loss_fused_joint(*ten, *args, reduction="none",
                                    implementation=impl, delay_penalty=PEN)
        l_d = rnnt_loss(acts_j, *args, reduction="none", delay_penalty=PEN)
        np.testing.assert_allclose(np.asarray(l_f), np.asarray(l_d),
                                   rtol=1e-5, err_msg=impl)
    gf = jax.grad(lambda e_: rnnt_loss_fused_joint(
        e_, *ten[1:], *args, reduction="sum", implementation="xla",
        delay_penalty=PEN))(ten[0])
    gd = jax.grad(lambda e_: rnnt_loss(
        jnp.tanh(e_[:, :, None, :] + ten[1][:, None, :, :]) @ ten[2] + ten[3],
        *args, reduction="sum", delay_penalty=PEN))(ten[0])
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gd), atol=2e-5)

    l_pf = rnnt_loss_pruned_fused(*ten, ranges, *args, s_range=U,
                                  reduction="none", implementation="xla",
                                  delay_penalty=PEN)
    l_fj = rnnt_loss_fused_joint(*ten, *args, reduction="none",
                                 implementation="xla", delay_penalty=PEN)
    np.testing.assert_allclose(np.asarray(l_pf), np.asarray(l_fj), rtol=1e-5)
    g_pf = jax.grad(lambda e_: rnnt_loss_pruned_fused(
        e_, *ten[1:], ranges, *args, s_range=U, reduction="sum",
        implementation="xla", delay_penalty=PEN))(ten[0])
    np.testing.assert_allclose(np.asarray(g_pf), np.asarray(gf), atol=2e-5)


def test_penalty_shifts_viterbi_alignment_earlier():
    """Optimizing with the penalty must move emissions to earlier frames:
    compare the best path before/after a few gradient steps."""
    from warp_transducer_tpu import rnnt_viterbi_align

    rng = np.random.RandomState(7)
    B, T, U, V = 1, 10, 3, 5
    acts = jnp.asarray(rng.randn(B, T, U, V).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
    il = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), U - 1, jnp.int32)

    def train(pen, steps=60, lr=0.5):
        a = acts
        f = jax.jit(jax.grad(lambda a_: rnnt_loss(
            a_, labels, il, ll, reduction="sum", delay_penalty=pen)))
        for _ in range(steps):
            a = a - lr * f(a)
        return a

    al0 = rnnt_viterbi_align(train(0.0), labels, il, ll)
    al1 = rnnt_viterbi_align(train(1.0), labels, il, ll)
    t0 = float(jnp.sum(al0.emit_frames[0][:2]))
    t1 = float(jnp.sum(al1.emit_frames[0][:2]))
    assert t1 <= t0, (t0, t1)


# ---------------------------------------------------------------------------
# Native backend + bindings
# ---------------------------------------------------------------------------

def _native_available():
    from warp_transducer_tpu.bindings import native
    return native.available()


@pytest.mark.skipif(not _native_available(), reason="native lib not built")
@pytest.mark.parametrize("from_log_probs", [False, True])
def test_native_dense_matches_oracle(from_log_probs):
    from warp_transducer_tpu.bindings.native import rnnt_loss_native

    acts, labels, il, ll = _problem(seed=8)
    a_in = (oracle.log_softmax(acts).astype(np.float32)
            if from_log_probs else acts)
    c_o, g_o = oracle.rnnt_batch(a_in, labels, il, ll, blank=0,
                                 from_log_probs=from_log_probs,
                                 delay_penalty=PEN)
    costs, grads = rnnt_loss_native(a_in, labels, il, ll, blank=0,
                                    from_log_probs=from_log_probs,
                                    delay_penalty=PEN)
    np.testing.assert_allclose(costs, c_o, rtol=1e-5)
    np.testing.assert_allclose(grads, g_o, atol=1e-5)


@pytest.mark.skipif(not _native_available(), reason="native lib not built")
def test_native_families_match_jax():
    from warp_transducer_tpu.bindings.native import (
        rnnt_loss_fused_joint_native, rnnt_loss_pruned_fused_native,
        rnnt_loss_pruned_native, rnnt_loss_simple_native,
    )

    rng = np.random.RandomState(9)
    B, T, U, V, H, S = 2, 5, 4, 6, 8, 4
    labels = rng.randint(1, V, (B, U - 1)).astype(np.int32)
    il = np.array([T, T - 1], np.int32)
    ll = np.array([U - 1, U - 2], np.int32)
    jargs = (jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll))
    ranges = np.zeros((B, T), np.int32)

    am = rng.randn(B, T, V).astype(np.float32)
    lm = rng.randn(B, U, V).astype(np.float32)
    c_n, _, _ = rnnt_loss_simple_native(am, lm, labels, il, ll,
                                        delay_penalty=PEN)
    c_j = rnnt_loss_simple(jnp.asarray(am), jnp.asarray(lm), *jargs,
                           reduction="none", implementation="xla",
                           delay_penalty=PEN)
    np.testing.assert_allclose(c_n, np.asarray(c_j), rtol=1e-5)

    acts_b = rng.randn(B, T, S, V).astype(np.float32)
    c_n, g_n = rnnt_loss_pruned_native(acts_b, ranges, labels, il, ll,
                                       delay_penalty=PEN)
    c_j = rnnt_loss_pruned(jnp.asarray(acts_b), jnp.asarray(ranges), *jargs,
                           reduction="none", implementation="xla",
                           delay_penalty=PEN)
    np.testing.assert_allclose(c_n, np.asarray(c_j), rtol=1e-5)
    g_j = jax.grad(lambda a: rnnt_loss_pruned(
        a, jnp.asarray(ranges), *jargs, reduction="sum",
        implementation="xla", delay_penalty=PEN))(jnp.asarray(acts_b))
    np.testing.assert_allclose(g_n, np.asarray(g_j), atol=1e-5)

    e = (rng.randn(B, T, H) * 0.5).astype(np.float32)
    p = (rng.randn(B, U, H) * 0.5).astype(np.float32)
    W = (rng.randn(H, V) / np.sqrt(H)).astype(np.float32)
    b_ = (rng.randn(V) * 0.1).astype(np.float32)
    c_n, gs_n = rnnt_loss_fused_joint_native(e, p, W, b_, labels, il, ll,
                                             delay_penalty=PEN)
    c_j = rnnt_loss_fused_joint(*map(jnp.asarray, (e, p, W, b_)), *jargs,
                                reduction="none", implementation="xla",
                                delay_penalty=PEN)
    np.testing.assert_allclose(c_n, np.asarray(c_j), rtol=1e-5)
    gs_j = jax.grad(lambda *a: rnnt_loss_fused_joint(
        *a, *jargs, reduction="sum", implementation="xla",
        delay_penalty=PEN), argnums=(0, 1, 2, 3))(
            *map(jnp.asarray, (e, p, W, b_)))
    for a, c in zip(gs_n, gs_j):
        np.testing.assert_allclose(a, np.asarray(c), atol=1e-4)

    c_n, _ = rnnt_loss_pruned_fused_native(e, p, W, b_, ranges, labels,
                                           il, ll, s_range=U,
                                           delay_penalty=PEN)
    np.testing.assert_allclose(c_n, np.asarray(c_j), rtol=1e-5)


def test_torch_and_tf_bindings_carry_penalty():
    acts, labels, il, ll = _problem(seed=10)
    c_o, g_o = oracle.rnnt_batch(acts, labels, il, ll, blank=0,
                                 delay_penalty=PEN)

    torch = pytest.importorskip("torch")
    if _native_available():
        from warp_transducer_tpu.bindings.torch_binding import (
            rnnt_loss as trnnt,
        )
        at = torch.tensor(acts, requires_grad=True)
        loss = trnnt(at, torch.tensor(labels), torch.tensor(il),
                     torch.tensor(ll), reduction="sum", delay_penalty=PEN)
        loss.backward()
        np.testing.assert_allclose(float(loss.detach()), c_o.sum(), rtol=1e-5)
        np.testing.assert_allclose(at.grad.numpy(), g_o, atol=1e-5)

    tf = pytest.importorskip("tensorflow")
    from warp_transducer_tpu.bindings.tf_binding import rnnt_loss as tf_rnnt
    at = tf.constant(acts)
    with tf.GradientTape() as tape:
        tape.watch(at)
        costs = tf_rnnt(at, labels, il, ll, delay_penalty=PEN)
        total = tf.reduce_sum(costs)
    np.testing.assert_allclose(costs.numpy(), c_o, rtol=1e-5)
    np.testing.assert_allclose(tape.gradient(total, at).numpy(), g_o,
                               atol=1e-5)
