"""rnnt_loss_pruned_fused: the banded joint + loss without the (B,T,S,V)
logits tensor. Reference semantics: must equal the composition
``rnnt_loss_pruned(tanh(e ⊕ p_band) @ W + bias, ranges, ...)`` exactly —
losses AND all four gradients (the unfused path differentiates through
the band gather with standard autodiff, so its e/p/W/bias gradients are
the ground truth).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warp_transducer_tpu import (
    gather_banded,
    rnnt_loss_fused_joint,
    rnnt_loss_pruned,
    rnnt_loss_pruned_fused,
)


@pytest.fixture(autouse=True)
def _force_sweep(monkeypatch):
    """Test shapes are tiny, so the small-V materialise fast path would
    otherwise shadow the chunked sweeps this file exists to validate.
    test_materialize_path_matches_sweep covers the dispatch itself."""
    monkeypatch.setenv("WTT_PRUNED_FUSED_MAT_MB", "0")


def _mk_ranges(rng, B, T, U, S, il, ll):
    """Random contract-obeying band starts."""
    steps = rng.randint(0, S, size=(B, T)).astype(np.int32)
    steps[:, 0] = 0
    hi = np.maximum((ll + 1) - S, 0)[:, None]
    ranges = np.minimum(np.cumsum(steps, axis=1), hi).astype(np.int32)
    ranges[np.arange(B), np.maximum(il - 1, 0)] = hi[:, 0]
    for b in range(B):
        for t in range(il[b] - 1, 0, -1):
            ranges[b, t - 1] = max(ranges[b, t - 1], ranges[b, t] - (S - 1))
        ranges[b, il[b]:] = ranges[b, il[b] - 1]
    ranges[:, 0] = 0
    return ranges


def _problem(seed=0, B=2, T=7, U=5, V=6, H=8, S=3, ragged=True):
    rng = np.random.RandomState(seed)
    e = (rng.randn(B, T, H) * 0.5).astype(np.float32)
    p = (rng.randn(B, U, H) * 0.5).astype(np.float32)
    W = (rng.randn(H, V) / np.sqrt(H)).astype(np.float32)
    b = (rng.randn(V) * 0.1).astype(np.float32)
    labels = rng.randint(1, V, (B, U - 1)).astype(np.int32)
    if ragged:
        il = np.array([T] + list(rng.randint(max(T - 2, 1), T + 1, B - 1)),
                      np.int32)
        ll = np.array([U - 1] + list(rng.randint(max(U - 3, 0), U, B - 1)),
                      np.int32)
    else:
        il = np.full(B, T, np.int32)
        ll = np.full(B, U - 1, np.int32)
    ranges = _mk_ranges(rng, B, T, U, S, il, ll)
    return e, p, W, b, labels, il, ll, ranges, S


def _unfused(e, p, W, b, ranges, labels, il, ll, S, blank=0, lam=0.0):
    p_band = gather_banded(p, ranges, S)  # (B, T, S, H)
    acts = jnp.tanh(e[:, :, None, :] + p_band) @ W + b
    return rnnt_loss_pruned(acts, ranges, labels, il, ll, blank=blank,
                            reduction="sum", implementation="xla",
                            fastemit_lambda=lam)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_matches_unfused_composition(seed, impl):
    e, p, W, b, labels, il, ll, ranges, S = _problem(seed=seed)
    args = (jnp.asarray(ranges), jnp.asarray(labels), jnp.asarray(il),
            jnp.asarray(ll))

    def fused(e_, p_, W_, b_):
        return rnnt_loss_pruned_fused(
            e_, p_, W_, b_, *args, s_range=S, reduction="sum",
            implementation=impl)

    def unfused(e_, p_, W_, b_):
        return _unfused(e_, p_, W_, b_, args[0], args[1], args[2],
                        args[3], S)

    ten = tuple(map(jnp.asarray, (e, p, W, b)))
    lf, gf = jax.value_and_grad(fused, argnums=(0, 1, 2, 3))(*ten)
    lu, gu = jax.value_and_grad(unfused, argnums=(0, 1, 2, 3))(*ten)
    np.testing.assert_allclose(float(lf), float(lu), rtol=1e-5)
    for name, a, c in zip(("de", "dp", "dW", "db"), gf, gu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-5,
                                   err_msg=name)


def test_full_band_equals_dense_fused():
    """S = U, ranges = 0: the band covers the lattice, so the loss and all
    gradients equal the dense fused joint's."""
    e, p, W, b, labels, il, ll, _, _ = _problem(seed=3, ragged=False)
    B, T, _ = e.shape
    U = p.shape[1]
    ranges = jnp.zeros((B, T), jnp.int32)
    args = (jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll))
    ten = tuple(map(jnp.asarray, (e, p, W, b)))

    lf, gf = jax.value_and_grad(
        lambda *a: rnnt_loss_pruned_fused(
            *a, ranges, *args, s_range=U, reduction="sum",
            implementation="xla"),
        argnums=(0, 1, 2, 3))(*ten)
    ld, gd = jax.value_and_grad(
        lambda *a: rnnt_loss_fused_joint(
            *a, *args, reduction="sum", implementation="xla"),
        argnums=(0, 1, 2, 3))(*ten)
    np.testing.assert_allclose(float(lf), float(ld), rtol=1e-5)
    for name, a, c in zip(("de", "dp", "dW", "db"), gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-5,
                                   err_msg=name)


def test_materialize_path_matches_sweep(monkeypatch):
    """The small-V dispatch (materialised banded joint + band pipeline)
    must equal the chunked sweep in loss and all four gradients."""
    e, p, W, b, labels, il, ll, ranges, S = _problem(seed=7)
    args = (jnp.asarray(ranges), jnp.asarray(labels), jnp.asarray(il),
            jnp.asarray(ll))
    ten = tuple(map(jnp.asarray, (e, p, W, b)))

    def loss(e_, p_, W_, b_):
        return rnnt_loss_pruned_fused(
            e_, p_, W_, b_, *args, s_range=S, reduction="sum",
            implementation="xla")

    monkeypatch.setenv("WTT_PRUNED_FUSED_MAT_MB", "0")
    ls, gs = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(*ten)
    monkeypatch.setenv("WTT_PRUNED_FUSED_MAT_MB", "4096")
    lm, gm = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(*ten)
    np.testing.assert_allclose(float(lm), float(ls), rtol=1e-5)
    for name, a, c in zip(("de", "dp", "dW", "db"), gm, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-5,
                                   err_msg=name)


def test_fastemit_matches_unfused():
    e, p, W, b, labels, il, ll, ranges, S = _problem(seed=4)
    args = (jnp.asarray(ranges), jnp.asarray(labels), jnp.asarray(il),
            jnp.asarray(ll))
    ten = tuple(map(jnp.asarray, (e, p, W, b)))
    lam = 0.4
    gf = jax.grad(lambda *a: rnnt_loss_pruned_fused(
        *a, *args, s_range=S, reduction="sum", implementation="xla",
        fastemit_lambda=lam), argnums=(0, 1, 2, 3))(*ten)
    gu = jax.grad(lambda *a: _unfused(
        *a, args[0], args[1], args[2], args[3], S, lam=lam),
        argnums=(0, 1, 2, 3))(*ten)
    for name, a, c in zip(("de", "dp", "dW", "db"), gf, gu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-5,
                                   err_msg=name)


def test_nonzero_blank():
    e, p, W, b, _, il, ll, ranges, S = _problem(seed=5)
    V = W.shape[1]
    rng = np.random.RandomState(55)
    labels = rng.randint(0, V - 1, (e.shape[0], p.shape[1] - 1)).astype(np.int32)
    args = (jnp.asarray(ranges), jnp.asarray(labels), jnp.asarray(il),
            jnp.asarray(ll))
    ten = tuple(map(jnp.asarray, (e, p, W, b)))
    blank = V - 1
    lf, gf = jax.value_and_grad(
        lambda *a: rnnt_loss_pruned_fused(
            *a, *args, s_range=S, blank=blank, reduction="sum",
            implementation="xla"),
        argnums=(0, 1, 2, 3))(*ten)
    lu, gu = jax.value_and_grad(
        lambda *a: _unfused(*a, args[0], args[1], args[2], args[3], S,
                            blank=blank),
        argnums=(0, 1, 2, 3))(*ten)
    np.testing.assert_allclose(float(lf), float(lu), rtol=1e-5)
    for name, a, c in zip(("de", "dp", "dW", "db"), gf, gu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-5,
                                   err_msg=name)


def test_reductions_and_validation():
    e, p, W, b, labels, il, ll, ranges, S = _problem(seed=6)
    args = (jnp.asarray(ranges), jnp.asarray(labels), jnp.asarray(il),
            jnp.asarray(ll))
    ten = tuple(map(jnp.asarray, (e, p, W, b)))
    none = rnnt_loss_pruned_fused(*ten, *args, s_range=S, reduction="none")
    assert none.shape == (e.shape[0],)
    total = rnnt_loss_pruned_fused(*ten, *args, s_range=S, reduction="sum")
    np.testing.assert_allclose(float(total), float(jnp.sum(none)), rtol=1e-6)
    with pytest.raises(ValueError, match="reduction"):
        rnnt_loss_pruned_fused(*ten, *args, s_range=S, reduction="avg")
    with pytest.raises(ValueError, match="s_range"):
        rnnt_loss_pruned_fused(*ten, *args, s_range=1)
    with pytest.raises(ValueError, match="ranges"):
        rnnt_loss_pruned_fused(*ten, args[0][:, :2], *args[1:], s_range=S)
    with pytest.raises(ValueError, match="fastemit"):
        rnnt_loss_pruned_fused(*ten, *args, s_range=S, fastemit_lambda=-1)


def test_multiple_chunks():
    """Force Tc < T so the lax.scan actually iterates."""
    import warp_transducer_tpu.ops.pruned_fused as pf

    e, p, W, b, labels, il, ll, ranges, S = _problem(seed=7, T=12)
    args = (jnp.asarray(ranges), jnp.asarray(labels), jnp.asarray(il),
            jnp.asarray(ll))
    ten = tuple(map(jnp.asarray, (e, p, W, b)))
    ref = jax.value_and_grad(
        lambda *a: rnnt_loss_pruned_fused(*a, *args, s_range=S,
                                          reduction="sum"),
        argnums=(0, 1, 2, 3))(*ten)
    orig = pf._t_chunk
    pf._t_chunk = lambda *a: 5  # 12 -> chunks of 5 (ragged last chunk)
    try:
        got = jax.value_and_grad(
            lambda *a: rnnt_loss_pruned_fused(*a, *args, s_range=S,
                                              reduction="sum"),
            argnums=(0, 1, 2, 3))(*ten)
    finally:
        pf._t_chunk = orig
    np.testing.assert_allclose(float(got[0]), float(ref[0]), rtol=1e-6)
    for a, c in zip(got[1], ref[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)


def test_tf_binding_pruned_fused():
    tf = pytest.importorskip("tensorflow")
    from warp_transducer_tpu.bindings.tf_binding import (
        rnnt_loss_pruned_fused as tf_pf,
    )

    e, p, W, b, labels, il, ll, ranges, S = _problem(seed=9)
    ref = np.asarray(rnnt_loss_pruned_fused(
        *map(jnp.asarray, (e, p, W, b)), jnp.asarray(ranges),
        jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll), s_range=S,
        reduction="none", implementation="xla"))

    et = tf.constant(e)
    with tf.GradientTape() as tape:
        tape.watch(et)
        costs = tf_pf(et, p, W, b, ranges, labels, il, ll, s_range=S)
        total = tf.reduce_sum(costs)
    np.testing.assert_allclose(costs.numpy(), ref, rtol=1e-5)
    g_tf = tape.gradient(total, et).numpy()
    g_jax = np.asarray(jax.grad(lambda e_: rnnt_loss_pruned_fused(
        e_, *map(jnp.asarray, (p, W, b)), jnp.asarray(ranges),
        jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll), s_range=S,
        reduction="sum", implementation="xla"))(jnp.asarray(e)))
    np.testing.assert_allclose(g_tf, g_jax, atol=1e-5)


# ---------------------------------------------------------------------------
# Native backend + torch binding
# ---------------------------------------------------------------------------

def _native_available():
    from warp_transducer_tpu.bindings import native
    return native.available()


@pytest.mark.skipif(not _native_available(), reason="native lib not built")
@pytest.mark.parametrize("lam", [0.0, 0.3])
def test_native_matches_jax(lam):
    from warp_transducer_tpu.bindings.native import (
        rnnt_loss_pruned_fused_native,
    )

    e, p, W, b, labels, il, ll, ranges, S = _problem(seed=20)
    costs_n, gs_n = rnnt_loss_pruned_fused_native(
        e, p, W, b, ranges, labels, il, ll, s_range=S, fastemit_lambda=lam)

    jargs = (jnp.asarray(ranges), jnp.asarray(labels), jnp.asarray(il),
             jnp.asarray(ll))
    costs_j = np.asarray(rnnt_loss_pruned_fused(
        *map(jnp.asarray, (e, p, W, b)), *jargs, s_range=S,
        reduction="none", implementation="xla", fastemit_lambda=lam))
    np.testing.assert_allclose(costs_n, costs_j, rtol=1e-5)
    gs_j = jax.grad(lambda *a: rnnt_loss_pruned_fused(
        *a, *jargs, s_range=S, reduction="sum", implementation="xla",
        fastemit_lambda=lam), argnums=(0, 1, 2, 3))(
            *map(jnp.asarray, (e, p, W, b)))
    for name, a, c in zip(("de", "dp", "dW", "db"), gs_n, gs_j):
        np.testing.assert_allclose(a, np.asarray(c), atol=2e-5, err_msg=name)


@pytest.mark.skipif(not _native_available(), reason="native lib not built")
def test_native_score_only_and_fp64():
    from warp_transducer_tpu.bindings.native import (
        rnnt_loss_pruned_fused_native,
    )

    e, p, W, b, labels, il, ll, ranges, S = _problem(seed=21)
    costs32, gs = rnnt_loss_pruned_fused_native(
        e, p, W, b, ranges, labels, il, ll, s_range=S, compute_grads=False)
    assert gs is None
    costs64, _ = rnnt_loss_pruned_fused_native(
        e.astype(np.float64), p.astype(np.float64), W.astype(np.float64),
        b.astype(np.float64), ranges, labels, il, ll, s_range=S,
        compute_grads=False)
    np.testing.assert_allclose(costs32, costs64, rtol=1e-5)


def test_torch_binding_pruned_fused():
    torch = pytest.importorskip("torch")
    if not _native_available():
        pytest.skip("native lib not built")
    from warp_transducer_tpu.bindings.torch_binding import (
        rnnt_loss_pruned_fused as t_pf,
    )

    e, p, W, b, labels, il, ll, ranges, S = _problem(seed=22)
    te = torch.tensor(e, requires_grad=True)
    tp = torch.tensor(p, requires_grad=True)
    tW = torch.tensor(W, requires_grad=True)
    tb = torch.tensor(b, requires_grad=True)
    loss = t_pf(te, tp, tW, tb, torch.tensor(ranges), torch.tensor(labels),
                torch.tensor(il), torch.tensor(ll), s_range=S,
                reduction="sum")
    loss.backward()

    jargs = (jnp.asarray(ranges), jnp.asarray(labels), jnp.asarray(il),
             jnp.asarray(ll))
    lj, gj = jax.value_and_grad(lambda *a: rnnt_loss_pruned_fused(
        *a, *jargs, s_range=S, reduction="sum", implementation="xla"),
        argnums=(0, 1, 2, 3))(*map(jnp.asarray, (e, p, W, b)))
    np.testing.assert_allclose(float(loss), float(lj), rtol=1e-5)
    for name, t_, j_ in zip(("de", "dp", "dW", "db"),
                            (te.grad, tp.grad, tW.grad, tb.grad), gj):
        np.testing.assert_allclose(t_.numpy(), np.asarray(j_), atol=2e-5,
                                   err_msg=name)
