"""API surface tests: reductions, blank index, validation, options.

Mirrors the behavioural spec of the reference Python APIs
(/root/reference/pytorch_binding/warprnnt_pytorch/__init__.py).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import golden as G
from warp_transducer_tpu import RNNTLoss, RNNTOptions, rnnt_loss, rnnt_loss_and_grad
from warp_transducer_tpu.utils import numpy_oracle as O


def _fixture():
    acts = jnp.asarray(G.BIG_ACTS, jnp.float32)
    return (
        acts,
        jnp.asarray(G.BIG_LABELS, jnp.int32),
        jnp.asarray(G.BIG_INPUT_LENGTHS, jnp.int32),
        jnp.asarray(G.BIG_LABEL_LENGTHS, jnp.int32),
    )


class TestReductions:
    def test_none(self):
        acts, labels, il, ll = _fixture()
        out = rnnt_loss(acts, labels, il, ll, reduction="none", implementation="xla")
        assert out.shape == (2,)
        np.testing.assert_allclose(np.asarray(out), G.BIG_COSTS, rtol=1e-5)

    def test_sum(self):
        acts, labels, il, ll = _fixture()
        out = rnnt_loss(acts, labels, il, ll, reduction="sum", implementation="xla")
        assert out.shape == ()
        np.testing.assert_allclose(float(out), G.BIG_COSTS.sum(), rtol=1e-5)

    def test_mean_scales_gradient(self):
        """mean divides both loss and gradients by B (__init__.py:36-41)."""
        acts, labels, il, ll = _fixture()
        g_mean = jax.grad(
            lambda a: rnnt_loss(a, labels, il, ll, reduction="mean", implementation="xla")
        )(acts)
        np.testing.assert_allclose(
            np.asarray(g_mean), G.BIG_GRADS_ACTS / 2.0, atol=1e-6
        )

    def test_invalid_reduction(self):
        acts, labels, il, ll = _fixture()
        with pytest.raises(ValueError, match="reduction"):
            rnnt_loss(acts, labels, il, ll, reduction="max")


class TestBlankIndex:
    def test_nonzero_blank_matches_permuted_alphabet(self):
        """Moving the blank symbol to another index permutes the gradient."""
        rng = np.random.RandomState(3)
        B, T, U, V = 2, 5, 4, 6
        acts = rng.randn(B, T, U, V).astype(np.float32)
        labels = rng.randint(1, V, size=(B, U - 1)).astype(np.int32)
        il = np.full((B,), T, np.int32)
        ll = np.full((B,), U - 1, np.int32)

        c0, g0 = rnnt_loss_and_grad(
            jnp.asarray(acts), jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll),
            blank=0, implementation="xla",
        )
        # swap columns 0 <-> V-1 and use blank = V-1 with relabelled targets
        perm = np.arange(V); perm[0], perm[V - 1] = V - 1, 0
        acts_p = acts[..., perm]
        labels_p = np.where(labels == V - 1, 0, labels).astype(np.int32)
        c1, g1 = rnnt_loss_and_grad(
            jnp.asarray(acts_p), jnp.asarray(labels_p), jnp.asarray(il), jnp.asarray(ll),
            blank=V - 1, implementation="xla",
        )
        np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g0), np.asarray(g1)[..., perm], atol=1e-6
        )


class TestValidation:
    def test_bad_rank(self):
        acts, labels, il, ll = _fixture()
        with pytest.raises(ValueError, match="4-D"):
            rnnt_loss(acts[0], labels, il, ll)

    def test_bad_labels_rank(self):
        acts, labels, il, ll = _fixture()
        with pytest.raises(ValueError, match="2-D"):
            rnnt_loss(acts, labels[0], il, ll)

    def test_bad_batch(self):
        acts, labels, il, ll = _fixture()
        with pytest.raises(ValueError, match="batch"):
            rnnt_loss(acts, labels, il[:1], ll)

    def test_float_lengths_rejected(self):
        acts, labels, il, ll = _fixture()
        with pytest.raises(TypeError, match="integer"):
            rnnt_loss(acts, labels, il.astype(jnp.float32), ll)

    def test_short_labels_rejected(self):
        acts, labels, il, ll = _fixture()
        with pytest.raises(ValueError, match="labels length"):
            rnnt_loss(acts, labels[:, :1], il, ll)

    def test_bad_implementation(self):
        acts, labels, il, ll = _fixture()
        with pytest.raises(ValueError, match="implementation"):
            rnnt_loss(acts, labels, il, ll, implementation="cuda")


class TestModuleWrapper:
    def test_rnntloss_class(self):
        acts, labels, il, ll = _fixture()
        mod = RNNTLoss(reduction="sum", implementation="xla")
        out = mod(acts, labels, il, ll)
        np.testing.assert_allclose(float(out), G.BIG_COSTS.sum(), rtol=1e-5)

    def test_options_dataclass(self):
        opts = RNNTOptions(blank=1, reduction="sum")
        assert opts.blank == 1 and opts.reduction == "sum"

    def test_options_honored_by_rnnt_loss(self):
        """rnnt_loss(options=...) takes precedence over the kwargs."""
        acts, labels, il, ll = _fixture()
        opts = RNNTOptions(reduction="sum", implementation="xla")
        out = rnnt_loss(acts, labels, il, ll, reduction="none", options=opts)
        assert out.shape == ()  # options.reduction won
        np.testing.assert_allclose(float(out), G.BIG_COSTS.sum(), rtol=1e-5)

    def test_options_honored_by_module(self):
        acts, labels, il, ll = _fixture()
        mod = RNNTLoss(options=RNNTOptions(reduction="sum", implementation="xla"))
        np.testing.assert_allclose(
            float(mod(acts, labels, il, ll)), G.BIG_COSTS.sum(), rtol=1e-5
        )

    def test_fwd_bwd_check_warns(self, capfd):
        """fwd_bwd_check_tol arms the likelihood self-check; a negative tol
        always trips it (ll_fwd == ll_bwd up to rounding, diff > -1)."""
        acts, labels, il, ll = _fixture()
        opts = RNNTOptions(reduction="sum", implementation="xla",
                           fwd_bwd_check_tol=-1.0)
        out = rnnt_loss(acts, labels, il, ll, options=opts)
        jax.effects_barrier()
        captured = capfd.readouterr()
        assert "likelihood mismatch" in captured.out + captured.err
        np.testing.assert_allclose(float(out), G.BIG_COSTS.sum(), rtol=1e-5)

    def test_fwd_bwd_check_silent_when_consistent(self, capfd):
        acts, labels, il, ll = _fixture()
        opts = RNNTOptions(reduction="sum", implementation="xla",
                           fwd_bwd_check_tol=0.1)
        rnnt_loss(acts, labels, il, ll, options=opts)
        jax.effects_barrier()
        captured = capfd.readouterr()
        assert "likelihood mismatch" not in captured.out + captured.err

    def test_fwd_bwd_check_under_grad(self, capfd):
        """The check also runs on the training (custom_vjp fwd) path."""
        acts, labels, il, ll = _fixture()
        opts = RNNTOptions(reduction="sum", implementation="xla",
                           fwd_bwd_check_tol=-1.0)
        jax.grad(lambda a: rnnt_loss(a, labels, il, ll, options=opts))(acts)
        jax.effects_barrier()
        captured = capfd.readouterr()
        assert "likelihood mismatch" in captured.out + captured.err


class TestDtypeSteering:
    def test_bf16_small_v_upcast_matches_f32(self):
        """auto + bf16 + small V takes the f32 path (same costs bitwise)."""
        acts, labels, il, ll = _fixture()
        acts_bf = acts.astype(jnp.bfloat16)
        out_auto = rnnt_loss(acts_bf, labels, il, ll, reduction="none",
                             implementation="auto")
        out_f32 = rnnt_loss(acts_bf.astype(jnp.float32), labels, il, ll,
                            reduction="none", implementation="xla")
        np.testing.assert_allclose(
            np.asarray(out_auto, np.float32), np.asarray(out_f32), rtol=1e-6
        )
        # gradients flow back in the caller's dtype
        g = jax.grad(lambda a: rnnt_loss(a, labels, il, ll, reduction="sum",
                                         implementation="auto"))(acts_bf)
        assert g.dtype == jnp.bfloat16


class TestLengths:
    def test_ragged_vs_oracle(self):
        rng = np.random.RandomState(0)
        B, T, U, V = 4, 9, 6, 7
        acts = rng.randn(B, T, U, V).astype(np.float32)
        labels = rng.randint(1, V, size=(B, U - 1)).astype(np.int32)
        il = np.array([9, 5, 7, 3], np.int32)
        ll = np.array([5, 2, 4, 0], np.int32)
        oc, og = O.rnnt_batch(acts, labels, il, ll)
        c, g = rnnt_loss_and_grad(
            jnp.asarray(acts), jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll),
            implementation="xla",
        )
        np.testing.assert_allclose(np.asarray(c), oc, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g), og, atol=1e-5)

    def test_padding_invariance(self):
        """Values beyond (T_b, U_b) must not affect loss or gradients."""
        rng = np.random.RandomState(1)
        B, T, U, V = 2, 8, 5, 6
        acts = rng.randn(B, T, U, V).astype(np.float32)
        labels = rng.randint(1, V, size=(B, U - 1)).astype(np.int32)
        il = np.array([6, 8], np.int32)
        ll = np.array([3, 4], np.int32)

        c0, g0 = rnnt_loss_and_grad(
            jnp.asarray(acts), jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll),
            implementation="xla",
        )
        acts2 = acts.copy()
        acts2[0, 6:, :, :] += 100.0  # t beyond T_0
        acts2[0, :, 4:, :] -= 50.0  # u beyond U_0
        c1, g1 = rnnt_loss_and_grad(
            jnp.asarray(acts2), jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll),
            implementation="xla",
        )
        np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-5)
        # gradient is exactly zero in the padded region
        assert np.all(np.asarray(g1)[0, 6:, :, :] == 0)
        assert np.all(np.asarray(g1)[0, :, 4:, :] == 0)

    def test_forward_backward_loglik_agree(self):
        """The built-in numerical self-check (cpu_rnnt.h:167-169)."""
        from warp_transducer_tpu.ops import lattice, prep

        rng = np.random.RandomState(2)
        B, T, U, V = 3, 12, 7, 9
        acts = jnp.asarray(rng.randn(B, T, U, V).astype(np.float32))
        labels = jnp.asarray(rng.randint(1, V, size=(B, U - 1)), jnp.int32)
        il = jnp.asarray([12, 9, 4], jnp.int32)
        ll = jnp.asarray([6, 3, 2], jnp.int32)
        p = prep.prepare(acts, labels, 0, False)
        res = lattice.forward_backward(p.lpb, p.lpe, il, ll)
        np.testing.assert_allclose(
            np.asarray(res.ll_forward), np.asarray(res.ll_backward), rtol=1e-4
        )
