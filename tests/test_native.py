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

    def test_pruned_matches_jax_on_random_bands(self):
        """Native banded loss vs the JAX rnnt_loss_pruned: costs + grads on
        real (posterior-derived) pruning bands."""
        import jax
        import jax.numpy as jnp

        from warp_transducer_tpu import rnnt_loss_pruned, rnnt_prune_ranges

        rng = np.random.RandomState(23)
        B, T, U, V, S = 3, 12, 7, 9, 3
        am = rng.randn(B, T, V).astype(np.float32)
        lm = rng.randn(B, U, V).astype(np.float32)
        labels = rng.randint(1, V, size=(B, U - 1)).astype(np.int32)
        il = np.array([12, 9, 6], np.int32)
        ll = np.array([6, 4, 2], np.int32)
        ranges = np.asarray(rnnt_prune_ranges(
            jnp.asarray(am), jnp.asarray(lm), jnp.asarray(labels),
            jnp.asarray(il), jnp.asarray(ll), S, implementation="xla",
        ))
        acts = rng.randn(B, T, S, V).astype(np.float32)

        costs_n, grads_n = native.rnnt_loss_pruned_native(
            acts, ranges, labels, il, ll
        )

        costs_j = rnnt_loss_pruned(
            jnp.asarray(acts), jnp.asarray(ranges), jnp.asarray(labels),
            jnp.asarray(il), jnp.asarray(ll), reduction="none",
        )
        grads_j = jax.grad(lambda a: rnnt_loss_pruned(
            a, jnp.asarray(ranges), jnp.asarray(labels),
            jnp.asarray(il), jnp.asarray(ll), reduction="sum",
        ))(jnp.asarray(acts))
        np.testing.assert_allclose(costs_n, np.asarray(costs_j), rtol=1e-4)
        np.testing.assert_allclose(grads_n, np.asarray(grads_j), atol=2e-4)

    def test_pruned_full_band_equals_dense(self):
        rng = np.random.RandomState(29)
        B, T, U, V = 2, 6, 4, 5
        acts = rng.randn(B, T, U, V).astype(np.float32)
        labels = rng.randint(1, V, size=(B, U - 1)).astype(np.int32)
        il = np.array([6, 4], np.int32)
        ll = np.array([3, 2], np.int32)
        ranges = np.zeros((B, T), np.int32)  # S = U: band is the lattice
        cd, gd = native.rnnt_loss_native(acts, labels, il, ll)
        cp, gp = native.rnnt_loss_pruned_native(acts, ranges, labels, il, ll)
        np.testing.assert_allclose(cp, cd, rtol=1e-6)
        np.testing.assert_allclose(gp, gd, atol=1e-6)

    def test_pruned_bad_ranges_rejected(self):
        rng = np.random.RandomState(31)
        B, T, U, V, S = 1, 5, 4, 5, 2
        acts = rng.randn(B, T, S, V).astype(np.float32)
        labels = rng.randint(1, V, size=(B, U - 1)).astype(np.int32)
        il = np.array([5], np.int32)
        ll = np.array([3], np.int32)
        bad = np.array([[0, 2, 1, 1, 1]], np.int32)  # non-monotone
        with pytest.raises(RuntimeError, match="bad argument"):
            native.rnnt_loss_pruned_native(acts, bad, labels, il, ll)
        jump = np.array([[0, 0, 3, 3, 3]], np.int32)  # step > S-1
        with pytest.raises(RuntimeError, match="bad argument"):
            native.rnnt_loss_pruned_native(acts, jump, labels, il, ll)

    def test_caller_workspace_bit_identical(self):
        """The zero-allocation workspace contract (rnnt.h:139-143)."""
        acts = G.BIG_ACTS.astype(np.float32)
        B, T, U, V = acts.shape
        c0, g0 = native.rnnt_loss_native(
            acts, G.BIG_LABELS, G.BIG_INPUT_LENGTHS, G.BIG_LABEL_LENGTHS
        )
        nbytes = native.workspace_size(T, U, B)
        ws = np.full((nbytes,), 0xCD, np.uint8)
        c1, g1 = native.rnnt_loss_native(
            acts, G.BIG_LABELS, G.BIG_INPUT_LENGTHS, G.BIG_LABEL_LENGTHS,
            workspace=ws,
        )
        np.testing.assert_array_equal(c0, c1)
        np.testing.assert_array_equal(g0, g1)

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


class TestTorchSimplePruned:
    def test_simple_autograd_matches_dense(self):
        torch = pytest.importorskip("torch")
        from warp_transducer_tpu.bindings.torch_binding import (
            rnnt_loss, rnnt_loss_simple,
        )

        rng = np.random.RandomState(41)
        B, T, U, V = 2, 7, 4, 6
        am = torch.tensor(rng.randn(B, T, V), dtype=torch.float32,
                          requires_grad=True)
        lm = torch.tensor(rng.randn(B, U, V), dtype=torch.float32,
                          requires_grad=True)
        labels = torch.tensor(rng.randint(1, V, (B, U - 1)), dtype=torch.int32)
        il = torch.tensor([7, 5], dtype=torch.int32)
        ll = torch.tensor([3, 2], dtype=torch.int32)

        loss = rnnt_loss_simple(am, lm, labels, il, ll, reduction="sum")
        loss.backward()

        acts = (am.detach()[:, :, None, :] + lm.detach()[:, None, :, :]
                ).contiguous().requires_grad_(True)
        ref = rnnt_loss(acts, labels, il, ll, reduction="sum")
        ref.backward()
        np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)
        np.testing.assert_allclose(am.grad.numpy(),
                                   acts.grad.sum(dim=2).numpy(), atol=1e-4)
        np.testing.assert_allclose(lm.grad.numpy(),
                                   acts.grad.sum(dim=1).numpy(), atol=1e-4)

    def test_fused_joint_autograd_matches_dense(self):
        torch = pytest.importorskip("torch")
        from warp_transducer_tpu.bindings.torch_binding import (
            rnnt_loss, rnnt_loss_fused_joint,
        )

        rng = np.random.RandomState(47)
        B, T, U, V, H = 2, 6, 4, 7, 5
        e = torch.tensor(rng.randn(B, T, H) * 0.5, dtype=torch.float32,
                         requires_grad=True)
        p = torch.tensor(rng.randn(B, U, H) * 0.5, dtype=torch.float32,
                         requires_grad=True)
        W = torch.tensor(rng.randn(H, V) / np.sqrt(H), dtype=torch.float32,
                         requires_grad=True)
        b = torch.tensor(rng.randn(V) * 0.1, dtype=torch.float32,
                         requires_grad=True)
        labels = torch.tensor(rng.randint(1, V, (B, U - 1)), dtype=torch.int32)
        il = torch.tensor([6, 4], dtype=torch.int32)
        ll = torch.tensor([3, 2], dtype=torch.int32)

        loss = rnnt_loss_fused_joint(e, p, W, b, labels, il, ll,
                                     reduction="mean")
        loss.backward()

        # reference: materialise the joint, run the dense binding, let
        # torch autograd do the contraction
        e2 = e.detach().clone().requires_grad_(True)
        p2 = p.detach().clone().requires_grad_(True)
        W2 = W.detach().clone().requires_grad_(True)
        b2 = b.detach().clone().requires_grad_(True)
        acts = torch.tanh(e2[:, :, None, :] + p2[:, None, :, :])
        acts = torch.einsum("btuh,hv->btuv", acts, W2) + b2
        ref = rnnt_loss(acts.contiguous(), labels, il, ll, reduction="mean")
        ref.backward()

        np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)
        for name, a, r in (("de", e, e2), ("dp", p, p2), ("dW", W, W2),
                           ("db", b, b2)):
            np.testing.assert_allclose(a.grad.numpy(), r.grad.numpy(),
                                       atol=1e-4, err_msg=name)

        with pytest.raises(ValueError, match="sum\\|mean"):
            rnnt_loss_fused_joint(e, p, W, b, labels, il, ll,
                                  reduction="none")

    def test_pruned_autograd_full_band_equals_dense(self):
        torch = pytest.importorskip("torch")
        from warp_transducer_tpu.bindings.torch_binding import (
            rnnt_loss, rnnt_loss_pruned,
        )

        rng = np.random.RandomState(43)
        B, T, U, V = 2, 6, 4, 5
        acts_np = rng.randn(B, T, U, V).astype(np.float32)
        labels = torch.tensor(rng.randint(1, V, (B, U - 1)), dtype=torch.int32)
        il = torch.tensor([6, 4], dtype=torch.int32)
        ll = torch.tensor([3, 2], dtype=torch.int32)
        ranges = torch.zeros((B, T), dtype=torch.int32)

        a1 = torch.tensor(acts_np, requires_grad=True)
        loss_p = rnnt_loss_pruned(a1, ranges, labels, il, ll, reduction="mean")
        loss_p.backward()
        a2 = torch.tensor(acts_np, requires_grad=True)
        loss_d = rnnt_loss(a2, labels, il, ll, reduction="mean")
        loss_d.backward()
        np.testing.assert_allclose(float(loss_p), float(loss_d), rtol=1e-5)
        np.testing.assert_allclose(a1.grad.numpy(), a2.grad.numpy(), atol=1e-5)


class TestNativeMultiblank:
    def test_matches_oracle_with_grads(self):
        from warp_transducer_tpu.utils import numpy_oracle_multiblank as omb

        rng = np.random.RandomState(19)
        B, T, U, V, durs = 2, 8, 4, 9, (2, 4)
        acts = (rng.randn(B, T, U, V) * 1.5).astype(np.float64)
        labels = rng.randint(1, V - 2, (B, U - 1)).astype(np.int32)
        il = np.array([8, 5], np.int32)
        ll = np.array([3, 2], np.int32)
        oc, og = omb.multiblank_batch(acts, labels, il, ll, durs,
                                      sigma=0.05, fastemit_lambda=0.1,
                                      delay_penalty=0.02)
        costs, grads = native.rnnt_loss_multiblank_native(
            acts, labels, il, ll, durs, sigma=0.05, fastemit_lambda=0.1,
            delay_penalty=0.02)
        np.testing.assert_allclose(costs, oc, rtol=1e-9)
        np.testing.assert_allclose(grads, og, rtol=1e-7, atol=1e-11)

    def test_k0_equals_dense_f32(self):
        rng = np.random.RandomState(3)
        B, T, U, V = 2, 6, 3, 7
        acts = rng.randn(B, T, U, V).astype(np.float32)
        labels = rng.randint(1, V, (B, U - 1)).astype(np.int32)
        il = np.array([6, 4], np.int32)
        ll = np.array([2, 1], np.int32)
        c0, g0 = native.rnnt_loss_multiblank_native(acts, labels, il, ll, ())
        cd, gd = native.rnnt_loss_native(acts, labels, il, ll)
        np.testing.assert_allclose(c0, cd, rtol=1e-6)
        np.testing.assert_allclose(g0, gd, rtol=1e-6, atol=1e-7)

    def test_bad_args(self):
        acts = np.zeros((1, 3, 2, 5), np.float32)
        labels = np.ones((1, 1), np.int32)
        il = np.array([3], np.int32)
        ll = np.array([1], np.int32)
        with pytest.raises(RuntimeError, match="bad argument"):
            native.rnnt_loss_multiblank_native(acts, labels, il, ll, (1,))
        with pytest.raises(RuntimeError, match="bad argument"):
            native.rnnt_loss_multiblank_native(acts, labels, il, ll, (2,),
                                               big_blank_indices=(0,))
        # python-side guard: labels colliding with a big-blank column
        with pytest.raises(ValueError, match="big-blank vocab entries"):
            native.rnnt_loss_multiblank_native(acts, labels, il, ll, (2,),
                                               big_blank_indices=(1,))

    def test_torch_autograd_matches_oracle(self):
        import torch

        from warp_transducer_tpu.bindings.torch_binding import (
            rnnt_loss_multiblank,
        )
        from warp_transducer_tpu.utils import numpy_oracle_multiblank as omb

        rng = np.random.RandomState(5)
        B, T, U, V, durs = 2, 6, 3, 8, (2, 3)
        acts_np = rng.randn(B, T, U, V).astype(np.float32)
        labels_np = rng.randint(1, V - 2, (B, U - 1)).astype(np.int32)
        il_np = np.array([6, 4], np.int32)
        ll_np = np.array([2, 1], np.int32)
        oc, og = omb.multiblank_batch(acts_np, labels_np, il_np, ll_np,
                                      durs, sigma=0.05)

        a = torch.tensor(acts_np, requires_grad=True)
        loss = rnnt_loss_multiblank(
            a, torch.tensor(labels_np), torch.tensor(il_np),
            torch.tensor(ll_np), durs, sigma=0.05, reduction="mean")
        loss.backward()
        np.testing.assert_allclose(float(loss), oc.mean(), rtol=1e-5)
        np.testing.assert_allclose(a.grad.numpy(), og / B, rtol=1e-4,
                                   atol=1e-6)


class TestNativeTDT:
    def test_matches_oracle_with_grads(self):
        from warp_transducer_tpu.utils import numpy_oracle_tdt as otdt

        rng = np.random.RandomState(11)
        B, T, U, V, durs = 2, 8, 4, 7, (0, 1, 2)
        tok = (rng.randn(B, T, U, V) * 1.5).astype(np.float64)
        dur = (rng.randn(B, T, U, len(durs)) * 1.5).astype(np.float64)
        labels = rng.randint(1, V, (B, U - 1)).astype(np.int32)
        il = np.array([8, 5], np.int32)
        ll = np.array([3, 2], np.int32)
        oc, ogt, ogd = otdt.tdt_batch(tok, dur, labels, il, ll, durs,
                                      sigma=0.05, fastemit_lambda=0.1,
                                      delay_penalty=0.02)
        costs, gt, gd = native.rnnt_loss_tdt_native(
            tok, dur, labels, il, ll, durs, sigma=0.05, fastemit_lambda=0.1,
            delay_penalty=0.02)
        np.testing.assert_allclose(costs, oc, rtol=1e-9)
        np.testing.assert_allclose(gt, ogt, rtol=1e-7, atol=1e-11)
        np.testing.assert_allclose(gd, ogd, rtol=1e-7, atol=1e-11)

    def test_bad_args(self):
        tok = np.zeros((1, 3, 2, 5), np.float32)
        dur = np.zeros((1, 3, 2, 2), np.float32)
        labels = np.zeros((1, 1), np.int32)
        il = np.array([3], np.int32)
        ll = np.array([1], np.int32)
        with pytest.raises(RuntimeError, match="bad argument"):
            native.rnnt_loss_tdt_native(tok, dur[..., :1], labels, il, ll,
                                        (0,))
        with pytest.raises(RuntimeError, match="bad argument"):
            native.rnnt_loss_tdt_native(tok, dur, labels, il, ll, (1, 1))

    def test_torch_autograd_matches_oracle(self):
        import torch

        from warp_transducer_tpu.bindings.torch_binding import rnnt_loss_tdt
        from warp_transducer_tpu.utils import numpy_oracle_tdt as otdt

        rng = np.random.RandomState(7)
        B, T, U, V, durs = 2, 6, 3, 8, (0, 1, 3)
        tok_np = rng.randn(B, T, U, V).astype(np.float32)
        dur_np = rng.randn(B, T, U, len(durs)).astype(np.float32)
        labels_np = rng.randint(1, V, (B, U - 1)).astype(np.int32)
        il_np = np.array([6, 4], np.int32)
        ll_np = np.array([2, 1], np.int32)
        oc, ogt, ogd = otdt.tdt_batch(tok_np, dur_np, labels_np, il_np,
                                      ll_np, durs, sigma=0.03)

        t = torch.tensor(tok_np, requires_grad=True)
        d = torch.tensor(dur_np, requires_grad=True)
        loss = rnnt_loss_tdt(t, d, torch.tensor(labels_np),
                             torch.tensor(il_np), torch.tensor(ll_np),
                             durs, sigma=0.03, reduction="mean")
        loss.backward()
        np.testing.assert_allclose(float(loss), oc.mean(), rtol=1e-5)
        np.testing.assert_allclose(t.grad.numpy(), ogt / B, rtol=1e-4,
                                   atol=1e-6)
        np.testing.assert_allclose(d.grad.numpy(), ogd / B, rtol=1e-4,
                                   atol=1e-6)


class TestNativeFusedVariants:
    def test_multiblank_fused_matches_jax(self):
        import jax
        import jax.numpy as jnp

        from warp_transducer_tpu import rnnt_loss_multiblank_fused_joint

        rng = np.random.RandomState(7)
        B, T, U, V, H, durs = 2, 7, 4, 10, 6, (2, 3)
        e = (rng.randn(B, T, H) * 0.5).astype(np.float64)
        p = (rng.randn(B, U, H) * 0.5).astype(np.float64)
        W = (rng.randn(H, V) / np.sqrt(H)).astype(np.float64)
        b = (rng.randn(V) * 0.1).astype(np.float64)
        labels = rng.randint(1, V - 2, (B, U - 1)).astype(np.int32)
        il = np.array([7, 5], np.int32)
        ll = np.array([3, 2], np.int32)

        costs, gs = native.rnnt_loss_multiblank_fused_native(
            e, p, W, b, labels, il, ll, durs, sigma=0.05,
            fastemit_lambda=0.1, delay_penalty=0.02)

        def f(*ins):
            return jnp.sum(rnnt_loss_multiblank_fused_joint(
                *ins, jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll),
                durs, sigma=0.05, fastemit_lambda=0.1, delay_penalty=0.02,
                reduction="none"))

        ins = tuple(map(jnp.asarray, (e, p, W, b)))
        cj = rnnt_loss_multiblank_fused_joint(
            *ins, jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll),
            durs, sigma=0.05, fastemit_lambda=0.1, delay_penalty=0.02,
            reduction="none")
        gj = jax.grad(f, argnums=(0, 1, 2, 3))(*ins)
        np.testing.assert_allclose(costs, np.asarray(cj), rtol=1e-4)
        for name, a, r in zip(("de", "dp", "dW", "db"), gs, gj):
            np.testing.assert_allclose(a, np.asarray(r), rtol=1e-3,
                                       atol=1e-5, err_msg=name)

    def test_tdt_fused_matches_jax(self):
        import jax
        import jax.numpy as jnp

        from warp_transducer_tpu import rnnt_loss_tdt_fused_joint

        rng = np.random.RandomState(9)
        B, T, U, V, H, durs = 2, 7, 4, 9, 6, (0, 1, 2)
        e = (rng.randn(B, T, H) * 0.5).astype(np.float64)
        p = (rng.randn(B, U, H) * 0.5).astype(np.float64)
        W = (rng.randn(H, V) / np.sqrt(H)).astype(np.float64)
        b = (rng.randn(V) * 0.1).astype(np.float64)
        Wd = (rng.randn(H, len(durs)) / np.sqrt(H)).astype(np.float64)
        bd = (rng.randn(len(durs)) * 0.1).astype(np.float64)
        labels = rng.randint(1, V, (B, U - 1)).astype(np.int32)
        il = np.array([7, 5], np.int32)
        ll = np.array([3, 2], np.int32)

        costs, gs = native.rnnt_loss_tdt_fused_native(
            e, p, W, b, Wd, bd, labels, il, ll, durs, sigma=0.03,
            fastemit_lambda=0.1)

        def f(*ins):
            return jnp.sum(rnnt_loss_tdt_fused_joint(
                *ins, jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll),
                durs, sigma=0.03, fastemit_lambda=0.1, reduction="none"))

        ins = tuple(map(jnp.asarray, (e, p, W, b, Wd, bd)))
        cj = rnnt_loss_tdt_fused_joint(
            *ins, jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll),
            durs, sigma=0.03, fastemit_lambda=0.1, reduction="none")
        gj = jax.grad(f, argnums=tuple(range(6)))(*ins)
        np.testing.assert_allclose(costs, np.asarray(cj), rtol=1e-4)
        for name, a, r in zip(("de", "dp", "dW", "db", "dWd", "dbd"),
                              gs, gj):
            np.testing.assert_allclose(a, np.asarray(r), rtol=1e-3,
                                       atol=1e-5, err_msg=name)

    def test_score_only_and_bad_args(self):
        rng = np.random.RandomState(1)
        B, T, U, V, H = 1, 4, 2, 6, 4
        e = rng.randn(B, T, H).astype(np.float32)
        p = rng.randn(B, U, H).astype(np.float32)
        W = rng.randn(H, V).astype(np.float32)
        b = np.zeros(V, np.float32)
        labels = np.ones((B, U - 1), np.int32)
        il = np.array([4], np.int32)
        ll = np.array([1], np.int32)
        costs, gs = native.rnnt_loss_multiblank_fused_native(
            e, p, W, b, labels, il, ll, (2,), compute_grads=False)
        assert gs is None and np.isfinite(costs).all()
        with pytest.raises(RuntimeError, match="bad argument"):
            native.rnnt_loss_multiblank_fused_native(
                e, p, W, b, labels, il, ll, (1,))
        Wd = rng.randn(H, 1).astype(np.float32)
        bd = np.zeros(1, np.float32)
        with pytest.raises(RuntimeError, match="bad argument"):
            native.rnnt_loss_tdt_fused_native(
                e, p, W, b, Wd, bd, labels, il, ll, (0,))

    def test_torch_fused_variants_train(self):
        import torch

        from warp_transducer_tpu.bindings.torch_binding import (
            rnnt_loss_multiblank_fused, rnnt_loss_tdt_fused,
        )

        rng = np.random.RandomState(3)
        B, T, U, V, H = 2, 6, 3, 9, 5
        e = torch.tensor(rng.randn(B, T, H).astype(np.float32) * 0.5,
                         requires_grad=True)
        p = torch.tensor(rng.randn(B, U, H).astype(np.float32) * 0.5,
                         requires_grad=True)
        W = torch.tensor((rng.randn(H, V) / np.sqrt(H)).astype(np.float32),
                         requires_grad=True)
        b = torch.zeros(V, requires_grad=True)
        labels = torch.tensor(rng.randint(1, V - 2, (B, U - 1)),
                              dtype=torch.int32)
        il = torch.tensor([6, 4], dtype=torch.int32)
        ll = torch.tensor([2, 1], dtype=torch.int32)

        loss = rnnt_loss_multiblank_fused(e, p, W, b, labels, il, ll,
                                          (2, 3), sigma=0.05)
        loss.backward()
        assert all(t.grad is not None and torch.isfinite(t.grad).all()
                   for t in (e, p, W, b))

        Wd = torch.tensor((rng.randn(H, 3) / np.sqrt(H)).astype(np.float32),
                          requires_grad=True)
        bd = torch.zeros(3, requires_grad=True)
        for t in (e, p, W, b):
            t.grad = None
        loss = rnnt_loss_tdt_fused(e, p, W, b, Wd, bd, labels, il, ll,
                                   (0, 1, 2), sigma=0.02)
        loss.backward()
        assert all(t.grad is not None and torch.isfinite(t.grad).all()
                   for t in (e, p, W, b, Wd, bd))


class TestTorchJaxBackend:
    """backend="jax": torch tensors bridged through dlpack into the JAX op
    (the accelerator-resident torch path; here it runs on the CPU JAX
    backend). Must match the golden fixtures and the native backend."""

    def test_small_golden_autograd(self):
        torch = pytest.importorskip("torch")
        from warp_transducer_tpu.bindings.torch_binding import rnnt_loss

        acts = torch.tensor(G.SMALL_ACTS, dtype=torch.float32,
                            requires_grad=True)
        labels = torch.tensor(G.SMALL_LABELS, dtype=torch.int32)
        il = torch.tensor(G.SMALL_INPUT_LENGTHS, dtype=torch.int32)
        ll = torch.tensor(G.SMALL_LABEL_LENGTHS, dtype=torch.int32)
        loss = rnnt_loss(acts, labels, il, ll, reduction="sum",
                         backend="jax")
        loss.backward()
        np.testing.assert_allclose(float(loss), G.SMALL_COST, rtol=1e-5)
        np.testing.assert_allclose(acts.grad.numpy(), G.SMALL_GRADS_ACTS,
                                   atol=1e-5)

    def test_matches_native_backend(self):
        torch = pytest.importorskip("torch")
        from warp_transducer_tpu.bindings.torch_binding import rnnt_loss

        rng = np.random.RandomState(3)
        B, T, U, V = 3, 7, 4, 6
        acts_np = rng.randn(B, T, U, V).astype(np.float32)
        labels = torch.tensor(rng.randint(1, V, (B, U - 1)),
                              dtype=torch.int32)
        il = torch.tensor([7, 5, 6], dtype=torch.int32)
        ll = torch.tensor([3, 2, 3], dtype=torch.int32)

        outs = {}
        for backend in ("native", "jax"):
            acts = torch.tensor(acts_np, requires_grad=True)
            loss = rnnt_loss(acts, labels, il, ll, reduction="mean",
                             fastemit_lambda=0.1, backend=backend)
            loss.backward()
            outs[backend] = (float(loss), acts.grad.numpy())
        np.testing.assert_allclose(outs["jax"][0], outs["native"][0],
                                   rtol=1e-5)
        np.testing.assert_allclose(outs["jax"][1], outs["native"][1],
                                   rtol=1e-4, atol=1e-5)

    def test_module_and_score_only(self):
        torch = pytest.importorskip("torch")
        from warp_transducer_tpu.bindings.torch_binding import RNNTLoss

        acts = torch.tensor(G.BIG_ACTS, dtype=torch.float32)  # no grad
        labels = torch.tensor(G.BIG_LABELS, dtype=torch.int32)
        il = torch.tensor(G.BIG_INPUT_LENGTHS, dtype=torch.int32)
        ll = torch.tensor(G.BIG_LABEL_LENGTHS, dtype=torch.int32)
        loss = RNNTLoss(reduction="none", backend="jax")(acts, labels, il, ll)
        np.testing.assert_allclose(loss.numpy(), G.BIG_COSTS, rtol=1e-5)
