"""Native CPU backend + torch binding vs golden values and the JAX engines."""
import numpy as np
import pytest

import golden as G
from warp_transducer_tpu.bindings import native
from warp_transducer_tpu.utils import numpy_oracle as O

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C native)"
)


class TestNative:
    def test_small_golden(self):
        costs, grads = native.rnnt_loss_native(
            G.SMALL_ACTS.astype(np.float32), G.SMALL_LABELS,
            G.SMALL_INPUT_LENGTHS, G.SMALL_LABEL_LENGTHS,
        )
        np.testing.assert_allclose(costs, [G.SMALL_COST], rtol=1e-5)
        np.testing.assert_allclose(grads, G.SMALL_GRADS_ACTS, atol=1e-5)

    def test_big_golden_both_conventions(self):
        costs, grads = native.rnnt_loss_native(
            G.BIG_ACTS.astype(np.float32), G.BIG_LABELS,
            G.BIG_INPUT_LENGTHS, G.BIG_LABEL_LENGTHS,
        )
        np.testing.assert_allclose(costs, G.BIG_COSTS, rtol=1e-5)
        np.testing.assert_allclose(grads, G.BIG_GRADS_ACTS, atol=1e-5)

        lp = O.log_softmax(G.BIG_ACTS).astype(np.float32)
        costs, grads = native.rnnt_loss_native(
            lp, G.BIG_LABELS, G.BIG_INPUT_LENGTHS, G.BIG_LABEL_LENGTHS,
            from_log_probs=True,
        )
        np.testing.assert_allclose(costs, G.BIG_COSTS, rtol=1e-5)
        np.testing.assert_allclose(grads, G.BIG_GRADS_LOGPROBS, atol=1e-5)

    def test_fp64_matches_oracle(self):
        rng = np.random.RandomState(5)
        B, T, U, V = 3, 11, 6, 8
        acts = rng.randn(B, T, U, V)
        labels = rng.randint(1, V, size=(B, U - 1)).astype(np.int32)
        il = np.array([11, 7, 4], np.int32)
        ll = np.array([5, 3, 1], np.int32)
        oc, og = O.rnnt_batch(acts, labels, il, ll)
        costs, grads = native.rnnt_loss_native(acts, labels, il, ll)
        np.testing.assert_allclose(costs, oc, rtol=1e-10)
        np.testing.assert_allclose(grads, og, atol=1e-10)

    def test_score_only(self):
        costs, grads = native.rnnt_loss_native(
            G.BIG_ACTS.astype(np.float32), G.BIG_LABELS,
            G.BIG_INPUT_LENGTHS, G.BIG_LABEL_LENGTHS, compute_grads=False,
        )
        assert grads is None
        np.testing.assert_allclose(costs, G.BIG_COSTS, rtol=1e-5)

    def test_bad_args(self):
        with pytest.raises(RuntimeError, match="bad argument"):
            native.rnnt_loss_native(
                G.BIG_ACTS.astype(np.float32), G.BIG_LABELS,
                np.array([99, 4], np.int32),  # input length > maxT
                G.BIG_LABEL_LENGTHS,
            )

    def test_simple_matches_jax(self):
        """Native factorised loss vs the JAX rnnt_loss_simple: costs + grads."""
        import jax
        import jax.numpy as jnp

        from warp_transducer_tpu import rnnt_loss_simple

        rng = np.random.RandomState(13)
        B, T, U, V = 3, 12, 7, 10
        am = rng.randn(B, T, V).astype(np.float32)
        lm = rng.randn(B, U, V).astype(np.float32)
        labels = rng.randint(1, V, size=(B, U - 1)).astype(np.int32)
        il = np.array([12, 9, 5], np.int32)
        ll = np.array([6, 4, 2], np.int32)

        costs_n, gam_n, glm_n = native.rnnt_loss_simple_native(
            am, lm, labels, il, ll
        )

        def total(a, m):
            return rnnt_loss_simple(
                jnp.asarray(a), jnp.asarray(m), jnp.asarray(labels),
                jnp.asarray(il), jnp.asarray(ll), reduction="sum",
            )

        costs_j = rnnt_loss_simple(
            jnp.asarray(am), jnp.asarray(lm), jnp.asarray(labels),
            jnp.asarray(il), jnp.asarray(ll), reduction="none",
        )
        gam_j, glm_j = jax.grad(total, argnums=(0, 1))(am, lm)
        np.testing.assert_allclose(costs_n, np.asarray(costs_j), rtol=1e-4)
        np.testing.assert_allclose(gam_n, np.asarray(gam_j), atol=2e-4)
        np.testing.assert_allclose(glm_n, np.asarray(glm_j), atol=2e-4)

    def test_simple_score_only_fp64(self):
        rng = np.random.RandomState(17)
        B, T, U, V = 2, 8, 5, 6
        am = rng.randn(B, T, V)
        lm = rng.randn(B, U, V)
        labels = rng.randint(1, V, size=(B, U - 1)).astype(np.int32)
        il = np.array([8, 6], np.int32)
        ll = np.array([4, 2], np.int32)
        costs, gam, glm = native.rnnt_loss_simple_native(
            am, lm, labels, il, ll, compute_grads=False
        )
        assert gam is None and glm is None
        # factorised == dense on the expanded sum
        acts = am[:, :, None, :] + lm[:, None, :, :]
        costs_d, _ = native.rnnt_loss_native(
            acts, labels, il, ll, compute_grads=False
        )
        np.testing.assert_allclose(costs, costs_d, rtol=1e-10)


class TestTorchBinding:
    def test_small_autograd(self):
        torch = pytest.importorskip("torch")
        from warp_transducer_tpu.bindings.torch_binding import RNNTLoss

        acts = torch.tensor(G.SMALL_ACTS, dtype=torch.float32, requires_grad=True)
        labels = torch.tensor(G.SMALL_LABELS, dtype=torch.int32)
        il = torch.tensor(G.SMALL_INPUT_LENGTHS, dtype=torch.int32)
        ll = torch.tensor(G.SMALL_LABEL_LENGTHS, dtype=torch.int32)
        loss = RNNTLoss(reduction="sum")(acts, labels, il, ll)
        loss.backward()
        np.testing.assert_allclose(float(loss), G.SMALL_COST, rtol=1e-5)
        np.testing.assert_allclose(
            acts.grad.numpy(), G.SMALL_GRADS_ACTS, atol=1e-5
        )

    def test_mean_reduction_scales_grads(self):
        torch = pytest.importorskip("torch")
        from warp_transducer_tpu.bindings.torch_binding import rnnt_loss

        acts = torch.tensor(G.BIG_ACTS, dtype=torch.float32, requires_grad=True)
        labels = torch.tensor(G.BIG_LABELS, dtype=torch.int32)
        il = torch.tensor(G.BIG_INPUT_LENGTHS, dtype=torch.int32)
        ll = torch.tensor(G.BIG_LABEL_LENGTHS, dtype=torch.int32)
        loss = rnnt_loss(acts, labels, il, ll, reduction="mean")
        loss.backward()
        np.testing.assert_allclose(float(loss), G.BIG_COSTS.mean(), rtol=1e-5)
        np.testing.assert_allclose(
            acts.grad.numpy(), G.BIG_GRADS_ACTS / 2.0, atol=1e-5
        )
