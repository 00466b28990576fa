"""Fused single-pass prep kernel (pallas/prep_fused.py) vs the XLA prep
path, in interpreter mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warp_transducer_tpu.ops import prep as P
from warp_transducer_tpu.ops.pallas import prep_fused as PF


@pytest.mark.parametrize("B,T,U,V", [(2, 7, 4, 512), (1, 3, 2, 640), (3, 8, 5, 520)])
def test_fused_prep_matches_xla(B, T, U, V):
    rng = np.random.RandomState(0)
    acts = jnp.asarray(rng.randn(B, T, U, V) * 3.0, jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
    blank = 0

    ref = P.prepare(acts, labels, blank, log_probs_input=False)
    labels_full = jnp.pad(labels, ((0, 0), (0, 1)))
    lpb, lpe, denom = PF.fused_prep(acts, labels_full, blank, interpret=True)

    np.testing.assert_allclose(np.asarray(lpb), np.asarray(ref.lpb), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(denom), np.asarray(ref.denom), rtol=1e-6, atol=1e-6)
    # valid label columns match; column U-1 is the finite NEG sentinel
    np.testing.assert_allclose(
        np.asarray(lpe[:, :, : U - 1]), np.asarray(ref.lpe[:, :, : U - 1]),
        rtol=1e-6, atol=1e-6,
    )
    assert np.all(np.asarray(lpe[:, :, U - 1]) <= -1e29)


def test_fused_prep_nonzero_blank():
    rng = np.random.RandomState(1)
    B, T, U, V = 2, 4, 3, 512
    acts = jnp.asarray(rng.randn(B, T, U, V), jnp.float32)
    labels = jnp.asarray(rng.randint(0, V - 1, (B, U - 1)), jnp.int32)
    blank = V - 1
    ref = P.prepare(acts, labels, blank, log_probs_input=False)
    labels_full = jnp.pad(labels, ((0, 0), (0, 1)))
    lpb, lpe, denom = PF.fused_prep(acts, labels_full, blank, interpret=True)
    np.testing.assert_allclose(np.asarray(lpb), np.asarray(ref.lpb), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(lpe[:, :, : U - 1]), np.asarray(ref.lpe[:, :, : U - 1]),
        rtol=1e-6, atol=1e-6,
    )


def test_loss_and_grad_with_fused_prep(monkeypatch):
    """Force the fused-prep path through the full loss+grad pipeline."""
    from warp_transducer_tpu import rnnt_loss

    monkeypatch.setattr(
        PF, "use_fused_prep",
        lambda V, dtype, lp, U=1, T=1, B=1: not lp and V >= 512,
    )
    rng = np.random.RandomState(3)
    B, T, U, V = 2, 6, 4, 512
    acts = jnp.asarray(rng.randn(B, T, U, V), jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
    il = jnp.asarray([6, 4], jnp.int32)
    ll = jnp.asarray([3, 2], jnp.int32)

    f = lambda a: rnnt_loss(a, labels, il, ll, reduction="sum", implementation="xla")
    loss_fused, g_fused = jax.value_and_grad(f)(acts)

    monkeypatch.setattr(
        PF, "use_fused_prep", lambda V, dtype, lp, U=1, T=1, B=1: False
    )
    loss_ref, g_ref = jax.value_and_grad(f)(acts)
    np.testing.assert_allclose(float(loss_fused), float(loss_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-5, atol=1e-6)


def test_fused_prep_bf16_input():
    """bf16 acts go into the kernel UNCONVERTED (per-tile VMEM convert);
    outputs are f32 and must match converting the whole tensor up front."""
    rng = np.random.RandomState(4)
    B, T, U, V = 2, 6, 4, 512
    acts_bf = jnp.asarray(rng.randn(B, T, U, V) * 3.0, jnp.bfloat16)
    labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
    labels_full = jnp.pad(labels, ((0, 0), (0, 1)))

    lpb, lpe, denom = PF.fused_prep(acts_bf, labels_full, 0, interpret=True)
    assert lpb.dtype == denom.dtype == jnp.float32

    ref = P.prepare(acts_bf.astype(jnp.float32), labels, 0, log_probs_input=False)
    np.testing.assert_allclose(np.asarray(lpb), np.asarray(ref.lpb), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(denom), np.asarray(ref.denom), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(lpe[:, :, : U - 1]), np.asarray(ref.lpe[:, :, : U - 1]),
        rtol=1e-6, atol=1e-6,
    )


def test_fused_prep_ragged_T_tile():
    """T not divisible by the tile: edge rows must still be exact."""
    rng = np.random.RandomState(2)
    B, T, U, V = 2, 5, 3, 512  # Tt will be 2MB/(3*512*4)=341 -> clamped to T
    acts = jnp.asarray(rng.randn(B, T, U, V), jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
    ref = P.prepare(acts, labels, 0, log_probs_input=False)
    labels_full = jnp.pad(labels, ((0, 0), (0, 1)))
    lpb, lpe, denom = PF.fused_prep(acts, labels_full, 0, interpret=True)
    np.testing.assert_allclose(np.asarray(denom), np.asarray(ref.denom), rtol=1e-6, atol=1e-6)
