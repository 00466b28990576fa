"""FastEmit regularization (arXiv:2010.11148) across the loss families.

FastEmit scales the emit-arc posterior by (1 + λ) in the GRADIENT only;
the loss value stays the unmodified negative log-likelihood. The oracle
implements the same formula independently in float64
(utils/numpy_oracle.py); every engine must match it, and λ=0 must be
bit-identical to the unregularized path.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warp_transducer_tpu import rnnt_loss, RNNTLoss, RNNTOptions
from warp_transducer_tpu.utils import numpy_oracle as oracle

LAM = 0.3


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
                                 fastemit_lambda=LAM)

    def f(a):
        return rnnt_loss(a, jnp.asarray(labels), jnp.asarray(il),
                         jnp.asarray(ll), reduction="sum",
                         log_probs_input=log_probs_input,
                         implementation=implementation,
                         fastemit_lambda=LAM)

    loss, g = jax.value_and_grad(f)(jnp.asarray(a_in))
    # loss value is the unmodified NLL
    np.testing.assert_allclose(float(loss), c_o.sum(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g), g_o, atol=1e-5)


def test_lambda_zero_is_exact(implementation):
    acts, labels, il, ll = _problem(seed=1)
    args = (jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll))
    g0 = jax.grad(lambda a: rnnt_loss(
        a, *args, reduction="sum", implementation=implementation))(
            jnp.asarray(acts))
    gl = jax.grad(lambda a: rnnt_loss(
        a, *args, reduction="sum", implementation=implementation,
        fastemit_lambda=0.0))(jnp.asarray(acts))
    assert bool(jnp.all(g0 == gl))


def test_loss_value_unchanged_by_lambda(implementation):
    acts, labels, il, ll = _problem(seed=2)
    args = (jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll))
    l0 = rnnt_loss(jnp.asarray(acts), *args, reduction="none",
                   implementation=implementation)
    l1 = rnnt_loss(jnp.asarray(acts), *args, reduction="none",
                   implementation=implementation, fastemit_lambda=0.7)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1))


def test_options_and_module_carry_lambda():
    acts, labels, il, ll = _problem(seed=3)
    args = (jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll))
    opt = RNNTOptions(reduction="sum", fastemit_lambda=LAM)
    g_opt = jax.grad(lambda a: rnnt_loss(a, *args, options=opt))(
        jnp.asarray(acts))
    mod = RNNTLoss(reduction="sum", fastemit_lambda=LAM)
    g_mod = jax.grad(lambda a: mod(a, *args))(jnp.asarray(acts))
    g_kw = jax.grad(lambda a: rnnt_loss(
        a, *args, reduction="sum", fastemit_lambda=LAM))(jnp.asarray(acts))
    assert bool(jnp.all(g_opt == g_kw))
    assert bool(jnp.all(g_mod == g_kw))


def test_negative_lambda_rejected():
    acts, labels, il, ll = _problem()
    with pytest.raises(ValueError, match="fastemit_lambda"):
        rnnt_loss(jnp.asarray(acts), jnp.asarray(labels), jnp.asarray(il),
                  jnp.asarray(ll), fastemit_lambda=-0.1)


def test_fastemit_shifts_emissions_earlier():
    """Directional sanity: a gradient step along -grad with λ>0 raises the
    probability of emitting early relative to the unregularized step."""
    acts, labels, il, ll = _problem(seed=4, B=1, T=8, U=3, V=5)
    args = (jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll))
    g0 = np.asarray(jax.grad(lambda a: rnnt_loss(
        a, *args, reduction="sum"))(jnp.asarray(acts)))
    g1 = np.asarray(jax.grad(lambda a: rnnt_loss(
        a, *args, reduction="sum", fastemit_lambda=1.0))(jnp.asarray(acts)))
    # the λ gradient pushes label logits up (more negative gradient) at
    # every cell where an emit transition exists
    lab = labels[0]
    emit_g0 = sum(g0[0, t, u, lab[u]] for t in range(8) for u in range(2))
    emit_g1 = sum(g1[0, t, u, lab[u]] for t in range(8) for u in range(2))
    assert emit_g1 < emit_g0


# ---------------------------------------------------------------------------
# Other loss families
# ---------------------------------------------------------------------------

def test_simple_loss_fastemit(implementation):
    """Factorised loss: dense-equivalent acts are am ⊕ lm, so the FastEmit
    gradients must marginalize the oracle's dense gradient over u / t."""
    from warp_transducer_tpu import rnnt_loss_simple

    rng = np.random.RandomState(5)
    B, T, U, V = 2, 5, 4, 6
    am = rng.randn(B, T, V).astype(np.float32)
    lm = rng.randn(B, U, V).astype(np.float32)
    labels = rng.randint(1, V, (B, U - 1)).astype(np.int32)
    il = np.array([T, T - 1], np.int32)
    ll = np.array([U - 1, U - 2], np.int32)

    acts = am[:, :, None, :] + lm[:, None, :, :]
    c_o, g_o = oracle.rnnt_batch(acts, labels, il, ll, blank=0,
                                 fastemit_lambda=LAM)

    def f(a, m):
        return rnnt_loss_simple(a, m, jnp.asarray(labels), jnp.asarray(il),
                                jnp.asarray(ll), reduction="sum",
                                implementation=implementation,
                                fastemit_lambda=LAM)

    loss, (dam, dlm) = jax.value_and_grad(f, argnums=(0, 1))(
        jnp.asarray(am), jnp.asarray(lm))
    np.testing.assert_allclose(float(loss), c_o.sum(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dam), g_o.sum(axis=2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dlm), g_o.sum(axis=1), atol=1e-5)


def test_pruned_loss_fastemit(implementation):
    """Band covering the whole lattice (S = U, ranges = 0): the pruned
    FastEmit gradient must equal the dense oracle's."""
    from warp_transducer_tpu import rnnt_loss_pruned

    rng = np.random.RandomState(6)
    B, T, U, V = 2, 5, 4, 6
    acts = rng.randn(B, T, U, V).astype(np.float32)
    labels = rng.randint(1, V, (B, U - 1)).astype(np.int32)
    il = np.array([T, T - 1], np.int32)
    ll = np.array([U - 1, U - 2], np.int32)
    ranges = jnp.zeros((B, T), jnp.int32)

    c_o, g_o = oracle.rnnt_batch(acts, labels, il, ll, blank=0,
                                 fastemit_lambda=LAM)

    def f(a):
        return rnnt_loss_pruned(a, ranges, jnp.asarray(labels),
                                jnp.asarray(il), jnp.asarray(ll),
                                reduction="sum",
                                implementation=implementation,
                                fastemit_lambda=LAM)

    loss, g = jax.value_and_grad(f)(jnp.asarray(acts))
    np.testing.assert_allclose(float(loss), c_o.sum(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g), g_o, atol=1e-5)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_fused_joint_fastemit(impl):
    """Fused joint: reference gradients are the oracle's dense FastEmit
    gradient pulled back through acts = tanh(e ⊕ p) @ W + b."""
    from warp_transducer_tpu import rnnt_loss_fused_joint

    rng = np.random.RandomState(7)
    B, T, U, V, H = 2, 4, 3, 6, 8
    e = rng.randn(B, T, H).astype(np.float32)
    p = rng.randn(B, U, H).astype(np.float32)
    W = (rng.randn(H, V) / np.sqrt(H)).astype(np.float32)
    b = rng.randn(V).astype(np.float32)
    labels = rng.randint(1, V, (B, U - 1)).astype(np.int32)
    il = np.array([T, T - 1], np.int32)
    ll = np.array([U - 1, U - 2], np.int32)

    def build_acts(e_, p_, W_, b_):
        return jnp.tanh(e_[:, :, None, :] + p_[:, None, :, :]) @ W_ + b_

    acts = np.asarray(build_acts(*map(jnp.asarray, (e, p, W, b))))
    c_o, g_o = oracle.rnnt_batch(acts, labels, il, ll, blank=0,
                                 fastemit_lambda=LAM)
    _, vjp = jax.vjp(build_acts, *map(jnp.asarray, (e, p, W, b)))
    de_o, dp_o, dW_o, db_o = vjp(jnp.asarray(g_o, jnp.float32))

    def f(e_, p_, W_, b_):
        return rnnt_loss_fused_joint(e_, p_, W_, b_, jnp.asarray(labels),
                                     jnp.asarray(il), jnp.asarray(ll),
                                     reduction="sum", implementation=impl,
                                     fastemit_lambda=LAM)

    loss, (de, dp, dW, db) = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(
        *map(jnp.asarray, (e, p, W, b)))
    np.testing.assert_allclose(float(loss), c_o.sum(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(de), np.asarray(de_o), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dp_o), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dW), np.asarray(dW_o), atol=2e-5)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_o), atol=2e-5)


# ---------------------------------------------------------------------------
# Native backend + bindings
# ---------------------------------------------------------------------------

def _native_available():
    from warp_transducer_tpu.bindings import native
    return native.available()


@pytest.mark.skipif(not _native_available(), reason="native lib not built")
@pytest.mark.parametrize("from_log_probs", [False, True])
def test_native_dense_fastemit_matches_oracle(from_log_probs):
    from warp_transducer_tpu.bindings.native import rnnt_loss_native

    acts, labels, il, ll = _problem(seed=8)
    a_in = (oracle.log_softmax(acts).astype(np.float32)
            if from_log_probs else acts)
    c_o, g_o = oracle.rnnt_batch(a_in, labels, il, ll, blank=0,
                                 from_log_probs=from_log_probs,
                                 fastemit_lambda=LAM)
    costs, grads = rnnt_loss_native(a_in, labels, il, ll, blank=0,
                                    from_log_probs=from_log_probs,
                                    fastemit_lambda=LAM)
    np.testing.assert_allclose(costs, c_o, rtol=1e-5)
    np.testing.assert_allclose(grads, g_o, atol=1e-5)


@pytest.mark.skipif(not _native_available(), reason="native lib not built")
def test_native_negative_lambda_rejected():
    from warp_transducer_tpu.bindings.native import rnnt_loss_native

    acts, labels, il, ll = _problem(seed=9)
    with pytest.raises(RuntimeError):
        rnnt_loss_native(acts, labels, il, ll, fastemit_lambda=-0.5)


@pytest.mark.skipif(not _native_available(), reason="native lib not built")
def test_native_simple_pruned_fused_fastemit_match_jax():
    """The native engines' FastEmit gradients must match the (oracle-verified)
    JAX engines on the same inputs."""
    from warp_transducer_tpu import (
        rnnt_loss_fused_joint, rnnt_loss_pruned, rnnt_loss_simple,
    )
    from warp_transducer_tpu.bindings.native import (
        rnnt_loss_fused_joint_native, rnnt_loss_pruned_native,
        rnnt_loss_simple_native,
    )

    rng = np.random.RandomState(10)
    B, T, U, V, H, S = 2, 5, 4, 6, 8, 3
    labels = rng.randint(1, V, (B, U - 1)).astype(np.int32)
    il = np.array([T, T - 1], np.int32)
    ll = np.array([U - 1, U - 2], np.int32)
    jargs = (jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll))

    # simple
    am = rng.randn(B, T, V).astype(np.float32)
    lm = rng.randn(B, U, V).astype(np.float32)
    _, gam_n, glm_n = rnnt_loss_simple_native(am, lm, labels, il, ll,
                                              fastemit_lambda=LAM)
    dam_j, dlm_j = jax.grad(
        lambda a, m: rnnt_loss_simple(a, m, *jargs, reduction="sum",
                                      fastemit_lambda=LAM),
        argnums=(0, 1))(jnp.asarray(am), jnp.asarray(lm))
    np.testing.assert_allclose(gam_n, np.asarray(dam_j), atol=1e-5)
    np.testing.assert_allclose(glm_n, np.asarray(dlm_j), atol=1e-5)

    # pruned (random contract-obeying band)
    acts_b = rng.randn(B, T, S, V).astype(np.float32)
    steps = rng.randint(0, S, size=(B, T)).astype(np.int32)
    steps[:, 0] = 0
    hi = np.maximum((ll + 1) - S, 0)[:, None]
    ranges = np.minimum(np.cumsum(steps, axis=1), hi).astype(np.int32)
    ranges[np.arange(B), np.maximum(il - 1, 0)] = hi[:, 0]
    for b in range(B):  # repair the jump-limit after the terminal raise
        for t in range(il[b] - 1, 0, -1):
            ranges[b, t - 1] = max(ranges[b, t - 1], ranges[b, t] - (S - 1))
        ranges[b, il[b]:] = ranges[b, il[b] - 1]
    ranges[:, 0] = 0
    _, gp_n = rnnt_loss_pruned_native(acts_b, ranges, labels, il, ll,
                                      fastemit_lambda=LAM)
    gp_j = jax.grad(
        lambda a: rnnt_loss_pruned(a, jnp.asarray(ranges), *jargs,
                                   reduction="sum", implementation="xla",
                                   fastemit_lambda=LAM))(jnp.asarray(acts_b))
    np.testing.assert_allclose(gp_n, np.asarray(gp_j), atol=1e-5)

    # fused joint
    e = rng.randn(B, T, H).astype(np.float32)
    p = rng.randn(B, U, H).astype(np.float32)
    W = (rng.randn(H, V) / np.sqrt(H)).astype(np.float32)
    b_ = rng.randn(V).astype(np.float32)
    _, (de_n, dp_n, dW_n, db_n) = rnnt_loss_fused_joint_native(
        e, p, W, b_, labels, il, ll, fastemit_lambda=LAM)
    de_j, dp_j, dW_j, db_j = jax.grad(
        lambda *a: rnnt_loss_fused_joint(*a, *jargs, reduction="sum",
                                         implementation="xla",
                                         fastemit_lambda=LAM),
        argnums=(0, 1, 2, 3))(*map(jnp.asarray, (e, p, W, b_)))
    np.testing.assert_allclose(de_n, np.asarray(de_j), atol=1e-5)
    np.testing.assert_allclose(dp_n, np.asarray(dp_j), atol=1e-5)
    np.testing.assert_allclose(dW_n, np.asarray(dW_j), atol=1e-4)
    np.testing.assert_allclose(db_n, np.asarray(db_j), atol=1e-4)


def test_torch_binding_fastemit_matches_oracle():
    torch = pytest.importorskip("torch")
    if not _native_available():
        pytest.skip("native lib not built")
    from warp_transducer_tpu.bindings.torch_binding import rnnt_loss as trnnt

    acts, labels, il, ll = _problem(seed=11)
    _, g_o = oracle.rnnt_batch(acts, labels, il, ll, blank=0,
                               fastemit_lambda=LAM)
    at = torch.tensor(acts, requires_grad=True)
    loss = trnnt(at, torch.tensor(labels), torch.tensor(il),
                 torch.tensor(ll), reduction="sum", fastemit_lambda=LAM)
    loss.backward()
    np.testing.assert_allclose(at.grad.numpy(), g_o, atol=1e-5)


def test_tf_binding_fastemit_matches_oracle():
    tf = pytest.importorskip("tensorflow")
    from warp_transducer_tpu.bindings.tf_binding import rnnt_loss as tf_rnnt

    acts, labels, il, ll = _problem(seed=12)
    _, g_o = oracle.rnnt_batch(acts, labels, il, ll, blank=0,
                               fastemit_lambda=LAM)
    at = tf.constant(acts)
    with tf.GradientTape() as tape:
        tape.watch(at)
        costs = tf_rnnt(at, labels, il, ll, fastemit_lambda=LAM)
        total = tf.reduce_sum(costs)
    g = tape.gradient(total, at)
    np.testing.assert_allclose(g.numpy(), g_o, atol=1e-5)
