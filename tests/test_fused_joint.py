"""Fused joint+loss tests: the Pallas-fused op must equal the unfused
pipeline (materialise acts = tanh(e ⊕ p) @ W + bias, then rnnt_loss) in
costs AND in gradients w.r.t. all four joint inputs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warp_transducer_tpu.ops.fused_joint import rnnt_loss_fused_joint
from warp_transducer_tpu.ops.rnnt import rnnt_loss


def _problem(seed, B, T, U, V, H, ragged=True, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    e = jnp.asarray(rng.randn(B, T, H) * 0.5, dtype)
    p = jnp.asarray(rng.randn(B, U, H) * 0.5, dtype)
    W = jnp.asarray(rng.randn(H, V) / np.sqrt(H), dtype)
    bias = jnp.asarray(rng.randn(V) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
    if ragged:
        il = jnp.asarray(rng.randint(1, T + 1, (B,)), jnp.int32).at[0].set(T)
        ll = jnp.asarray(rng.randint(0, U, (B,)), jnp.int32).at[0].set(U - 1)
    else:
        il = jnp.full((B,), T, jnp.int32)
        ll = jnp.full((B,), U - 1, jnp.int32)
    return e, p, W, bias, labels, il, ll


def _unfused(e, p, W, bias, labels, il, ll, blank=0, reduction="none"):
    acts = jnp.tanh(
        e.astype(jnp.float32)[:, :, None, :] + p.astype(jnp.float32)[:, None, :, :]
    ) @ W.astype(jnp.float32) + bias
    return rnnt_loss(acts, labels, il, ll, blank=blank, reduction=reduction,
                     implementation="xla")


@pytest.mark.parametrize("seed,B,T,U,V,H,ragged", [
    (0, 2, 6, 4, 9, 16, False),
    (1, 3, 7, 5, 11, 8, True),
    (2, 2, 9, 3, 150, 16, True),  # multi-V-tile path at padded V
])
def test_costs_match_unfused(seed, B, T, U, V, H, ragged):
    e, p, W, bias, labels, il, ll = _problem(seed, B, T, U, V, H, ragged)
    ref = _unfused(e, p, W, bias, labels, il, ll)
    out = rnnt_loss_fused_joint(e, p, W, bias, labels, il, ll,
                                reduction="none", implementation="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed,ragged", [(3, False), (4, True)])
def test_gradients_match_unfused(seed, ragged):
    B, T, U, V, H = 2, 6, 4, 10, 16
    e, p, W, bias, labels, il, ll = _problem(seed, B, T, U, V, H, ragged)

    def f_fused(e, p, W, bias):
        return rnnt_loss_fused_joint(e, p, W, bias, labels, il, ll,
                                     reduction="sum", implementation="xla")

    def f_ref(e, p, W, bias):
        return _unfused(e, p, W, bias, labels, il, ll, reduction="sum")

    gf = jax.grad(f_fused, argnums=(0, 1, 2, 3))(e, p, W, bias)
    gr = jax.grad(f_ref, argnums=(0, 1, 2, 3))(e, p, W, bias)
    for name, a, b in zip(("de", "dp", "dW", "db"), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_nonzero_blank():
    B, T, U, V, H = 2, 5, 3, 7, 8
    e, p, W, bias, labels, il, ll = _problem(5, B, T, U, V, H, ragged=True)
    blank = V - 1
    labels = jnp.where(labels == blank, 1, labels)
    ref = _unfused(e, p, W, bias, labels, il, ll, blank=blank)
    out = rnnt_loss_fused_joint(e, p, W, bias, labels, il, ll, blank=blank,
                                reduction="none", implementation="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    g = jax.grad(lambda *a: rnnt_loss_fused_joint(
        *a, labels, il, ll, blank=blank, reduction="sum",
        implementation="xla"), argnums=(0, 1, 2, 3))(e, p, W, bias)
    gr = jax.grad(lambda *a: _unfused(
        *a, labels, il, ll, blank=blank, reduction="sum"),
        argnums=(0, 1, 2, 3))(e, p, W, bias)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_mean_reduction_scales():
    B, T, U, V, H = 2, 4, 3, 6, 8
    e, p, W, bias, labels, il, ll = _problem(6, B, T, U, V, H, ragged=False)
    s = rnnt_loss_fused_joint(e, p, W, bias, labels, il, ll, reduction="sum",
                              implementation="xla")
    m = rnnt_loss_fused_joint(e, p, W, bias, labels, il, ll, reduction="mean",
                              implementation="xla")
    np.testing.assert_allclose(float(m), float(s) / B, rtol=1e-6)


def test_bf16_weights_close():
    B, T, U, V, H = 2, 5, 4, 9, 16
    e, p, W, bias, labels, il, ll = _problem(7, B, T, U, V, H, ragged=False,
                                             dtype=jnp.bfloat16)
    ref = _unfused(e, p, W, bias, labels, il, ll)
    out = rnnt_loss_fused_joint(e, p, W, bias, labels, il, ll,
                                reduction="none", implementation="xla")
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), rtol=3e-2)


def test_validation():
    e, p, W, bias, labels, il, ll = _problem(8, 2, 4, 3, 6, 8)
    with pytest.raises(ValueError, match="expected"):
        rnnt_loss_fused_joint(e[0], p, W, bias, labels, il, ll)
    with pytest.raises(ValueError, match="disagree"):
        rnnt_loss_fused_joint(e, p[:, :, :4], W, bias, labels, il, ll)
    with pytest.raises(ValueError, match="reduction"):
        rnnt_loss_fused_joint(e, p, W, bias, labels, il, ll, reduction="x")
