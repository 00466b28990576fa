"""Golden acceptance tests — the exact fixtures of the reference suite.

Mirrors /root/reference/tests/test_cpu.cpp (small_test, options_test) and
/root/reference/pytorch_binding/test/test.py (small_test, big_test), covering
both gradient conventions.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import golden as G
import os as _os

# TPU f32 transcendentals (exp/log on the VPU) differ from the CPU libm in
# the last ~2 ulp; the golden constants were produced on CPU. The reference
# relaxes its GPU tolerances the same way (test_gpu.cu:443-445 uses 1e-2 for
# grads); 1e-4 is far tighter than that.
_TPU = _os.environ.get("WTT_TEST_TPU") == "1"
RTOL = 1e-4 if _TPU else 1e-5
ATOL = 1e-4 if _TPU else 1e-5
from warp_transducer_tpu import rnnt_loss, rnnt_loss_and_grad, rnnt_score


def _to_jnp(*arrays, dtype=jnp.float32):
    out = []
    for a in arrays:
        if np.issubdtype(np.asarray(a).dtype, np.integer):
            out.append(jnp.asarray(a, dtype=jnp.int32))
        else:
            out.append(jnp.asarray(a, dtype=dtype))
    return out


class TestSmall:
    def test_cost_and_grads_acts(self, implementation):
        acts, labels, il, ll = _to_jnp(
            G.SMALL_ACTS, G.SMALL_LABELS, G.SMALL_INPUT_LENGTHS, G.SMALL_LABEL_LENGTHS
        )
        costs, grads = rnnt_loss_and_grad(acts, labels, il, ll, implementation=implementation)
        np.testing.assert_allclose(np.asarray(costs), [G.SMALL_COST], rtol=RTOL)
        np.testing.assert_allclose(np.asarray(grads), G.SMALL_GRADS_ACTS, atol=ATOL)

    def test_score_only(self, implementation):
        acts, labels, il, ll = _to_jnp(
            G.SMALL_ACTS, G.SMALL_LABELS, G.SMALL_INPUT_LENGTHS, G.SMALL_LABEL_LENGTHS
        )
        s = rnnt_score(acts, labels, il, ll, implementation=implementation)
        np.testing.assert_allclose(np.asarray(s), [G.SMALL_COST], rtol=RTOL)


class TestBig:
    """options_test / big_test: B=2, T=4, U=3, V=3."""

    def test_cost_and_grads_acts(self, implementation):
        acts, labels, il, ll = _to_jnp(
            G.BIG_ACTS, G.BIG_LABELS, G.BIG_INPUT_LENGTHS, G.BIG_LABEL_LENGTHS
        )
        costs, grads = rnnt_loss_and_grad(acts, labels, il, ll, implementation=implementation)
        np.testing.assert_allclose(np.asarray(costs), G.BIG_COSTS, rtol=RTOL)
        np.testing.assert_allclose(np.asarray(grads), G.BIG_GRADS_ACTS, atol=ATOL)

    def test_cost_and_grads_log_probs(self, implementation):
        """The reference-CPU convention: log-softmaxed inputs, sparse grads."""
        lp = jax.nn.log_softmax(jnp.asarray(G.BIG_ACTS, jnp.float32), axis=-1)
        _, labels, il, ll = _to_jnp(
            G.BIG_ACTS, G.BIG_LABELS, G.BIG_INPUT_LENGTHS, G.BIG_LABEL_LENGTHS
        )
        costs, grads = rnnt_loss_and_grad(
            lp, labels, il, ll, log_probs_input=True, implementation=implementation
        )
        np.testing.assert_allclose(np.asarray(costs), G.BIG_COSTS, rtol=RTOL)
        np.testing.assert_allclose(np.asarray(grads), G.BIG_GRADS_LOGPROBS, atol=ATOL)

    def test_autodiff_matches_cached_grads(self, implementation):
        acts, labels, il, ll = _to_jnp(
            G.BIG_ACTS, G.BIG_LABELS, G.BIG_INPUT_LENGTHS, G.BIG_LABEL_LENGTHS
        )
        g = jax.grad(
            lambda a: rnnt_loss(a, labels, il, ll, reduction="sum", implementation=implementation)
        )(acts)
        np.testing.assert_allclose(np.asarray(g), G.BIG_GRADS_ACTS, atol=ATOL)

    def test_fp64(self, implementation):
        acts, labels, il, ll = _to_jnp(
            G.BIG_ACTS, G.BIG_LABELS, G.BIG_INPUT_LENGTHS, G.BIG_LABEL_LENGTHS,
            dtype=jnp.float64,
        )
        costs, grads = rnnt_loss_and_grad(acts, labels, il, ll, implementation=implementation)
        assert costs.dtype == jnp.float64
        np.testing.assert_allclose(np.asarray(costs), G.BIG_COSTS, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(grads), G.BIG_GRADS_ACTS, atol=1e-6)

    @pytest.mark.tpu_fp64
    def test_fp64_tpu_xla_engine(self):
        """fp64 ON the accelerator via the XLA engine.

        The reference's fp64 entry point dispatches to the GPU backend too
        (/root/reference/src/rnnt_entrypoint.cpp:165-178); our equivalent is
        the XLA lattice engine under jax_enable_x64, which on TPU lowers f64
        arithmetic to software emulation — data and compute stay on-device.
        Runs only under WTT_TEST_TPU=1 (jax.default_backend()=="tpu").
        """
        if jax.default_backend() != "tpu":
            pytest.skip("TPU-only check; CPU fp64 is covered by test_fp64")
        prev = jax.config.jax_enable_x64
        jax.config.update("jax_enable_x64", True)
        try:
            acts, labels, il, ll = _to_jnp(
                G.BIG_ACTS, G.BIG_LABELS, G.BIG_INPUT_LENGTHS,
                G.BIG_LABEL_LENGTHS, dtype=jnp.float64,
            )
            costs, grads = rnnt_loss_and_grad(
                acts, labels, il, ll, implementation="xla")
            assert costs.dtype == jnp.float64
            np.testing.assert_allclose(np.asarray(costs), G.BIG_COSTS,
                                       rtol=1e-9)
            np.testing.assert_allclose(np.asarray(grads), G.BIG_GRADS_ACTS,
                                       atol=1e-6)
        finally:
            jax.config.update("jax_enable_x64", prev)

    def test_bfloat16_inputs(self, implementation):
        acts, labels, il, ll = _to_jnp(
            G.BIG_ACTS, G.BIG_LABELS, G.BIG_INPUT_LENGTHS, G.BIG_LABEL_LENGTHS,
            dtype=jnp.bfloat16,
        )
        costs, grads = rnnt_loss_and_grad(acts, labels, il, ll, implementation=implementation)
        assert grads.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(costs, np.float32), G.BIG_COSTS, rtol=5e-2
        )
        np.testing.assert_allclose(
            np.asarray(grads, np.float32), G.BIG_GRADS_ACTS, atol=5e-2
        )

    def test_under_jit(self, implementation):
        acts, labels, il, ll = _to_jnp(
            G.BIG_ACTS, G.BIG_LABELS, G.BIG_INPUT_LENGTHS, G.BIG_LABEL_LENGTHS
        )
        f = jax.jit(
            lambda a: rnnt_loss(a, labels, il, ll, reduction="none", implementation=implementation)
        )
        np.testing.assert_allclose(np.asarray(f(acts)), G.BIG_COSTS, rtol=RTOL)
