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
