"""TensorFlow binding tests: the golden cases of the reference's
``tensorflow_binding/tests/test_warprnnt_op.py:10-94`` ported to the
jax2tf-based binding, plus graph-mode and SavedModel coverage the
reference never had.
"""
import numpy as np
import pytest

import golden as G

tf = pytest.importorskip("tensorflow")

from warp_transducer_tpu.bindings import tf_binding  # noqa: E402


def _grads(acts, labels, il, ll, **kw):
    acts_t = tf.constant(acts)
    with tf.GradientTape() as tape:
        tape.watch(acts_t)
        costs = tf_binding.rnnt_loss(
            acts_t, tf.constant(labels), tf.constant(il), tf.constant(ll), **kw
        )
        total = tf.reduce_sum(costs)
    return costs.numpy(), tape.gradient(total, acts_t).numpy()


class TestGolden:
    def test_small(self):
        """small_test fixture (B=1,T=2,U=3,V=5), raw-acts convention."""
        costs, grads = _grads(
            G.SMALL_ACTS, G.SMALL_LABELS, G.SMALL_INPUT_LENGTHS,
            G.SMALL_LABEL_LENGTHS,
        )
        np.testing.assert_allclose(costs, [G.SMALL_COST], rtol=1e-5)
        np.testing.assert_allclose(grads, G.SMALL_GRADS_ACTS, atol=1e-6)

    def test_multiple_batches(self):
        """options/big test (B=2,T=4,U=3,V=3) — costs and dense grads
        (test_warprnnt_op.py:52-86)."""
        costs, grads = _grads(
            G.BIG_ACTS.astype(np.float32), G.BIG_LABELS,
            G.BIG_INPUT_LENGTHS, G.BIG_LABEL_LENGTHS,
        )
        np.testing.assert_allclose(costs, G.BIG_COSTS.astype(np.float32), rtol=1e-5)
        np.testing.assert_allclose(grads, G.BIG_GRADS_ACTS, atol=1e-6)

    def test_log_probs_convention(self):
        """CPU convention: caller applies log_softmax, sparse gradient
        (the reference TF op's non-GPU path, test_warprnnt_op.py:20-21)."""
        acts = tf.constant(G.BIG_ACTS.astype(np.float32))
        with tf.GradientTape() as tape:
            tape.watch(acts)
            lp = tf.nn.log_softmax(acts, axis=-1)
            costs = tf_binding.rnnt_loss(
                lp, tf.constant(G.BIG_LABELS), tf.constant(G.BIG_INPUT_LENGTHS),
                tf.constant(G.BIG_LABEL_LENGTHS), from_log_probs=True,
            )
            total = tf.reduce_sum(costs)
        grads = tape.gradient(total, acts).numpy()
        np.testing.assert_allclose(costs.numpy(), G.BIG_COSTS.astype(np.float32), rtol=1e-5)
        # chain rule through log_softmax turns the sparse log-prob gradient
        # into the dense activation gradient
        np.testing.assert_allclose(grads, G.BIG_GRADS_ACTS, atol=1e-6)


class TestGraphMode:
    def test_tf_function(self):
        """The op must be graph-compatible (XlaCallModule, not numpy_function)."""

        @tf.function(autograph=False)
        def f(a):
            return tf_binding.rnnt_loss(
                a, tf.constant(G.BIG_LABELS), tf.constant(G.BIG_INPUT_LENGTHS),
                tf.constant(G.BIG_LABEL_LENGTHS),
            )

        costs = f(tf.constant(G.BIG_ACTS.astype(np.float32)))
        np.testing.assert_allclose(costs.numpy(), G.BIG_COSTS.astype(np.float32), rtol=1e-5)
        # and its graph must not contain a py_func-style escape hatch
        graph_ops = {op.type for op in f.get_concrete_function(
            tf.TensorSpec(G.BIG_ACTS.shape, tf.float32)).graph.get_operations()}
        assert not any("PyFunc" in o or "EagerPyFunc" in o for o in graph_ops), graph_ops

    def test_gradient_in_graph_mode(self):
        @tf.function(autograph=False)
        def g(a):
            with tf.GradientTape() as tape:
                tape.watch(a)
                costs = tf_binding.rnnt_loss(
                    a, tf.constant(G.BIG_LABELS), tf.constant(G.BIG_INPUT_LENGTHS),
                    tf.constant(G.BIG_LABEL_LENGTHS),
                )
                total = tf.reduce_sum(costs)
            return tape.gradient(total, a)

        grads = g(tf.constant(G.BIG_ACTS.astype(np.float32))).numpy()
        np.testing.assert_allclose(grads, G.BIG_GRADS_ACTS, atol=1e-6)


class TestSavedModel:
    def test_round_trip(self, tmp_path):
        mod = tf_binding.make_rnnt_loss_module()
        acts = tf.constant(G.BIG_ACTS.astype(np.float32))
        args = (acts, tf.constant(G.BIG_LABELS),
                tf.constant(G.BIG_INPUT_LENGTHS), tf.constant(G.BIG_LABEL_LENGTHS))
        before = mod(*args).numpy()
        path = str(tmp_path / "rnnt_loss_sm")
        tf.saved_model.save(mod, path)
        loaded = tf.saved_model.load(path)
        after = loaded(*args).numpy()
        np.testing.assert_allclose(before, after, rtol=1e-6)
        np.testing.assert_allclose(after, G.BIG_COSTS.astype(np.float32), rtol=1e-5)


class TestNativeFallback:
    def test_native_fallback_costs(self):
        from warp_transducer_tpu.bindings.native import available

        if not available():
            pytest.skip("native backend not built")
        costs = tf_binding.rnnt_loss_native_op(
            tf.constant(G.BIG_ACTS.astype(np.float32)), tf.constant(G.BIG_LABELS),
            tf.constant(G.BIG_INPUT_LENGTHS), tf.constant(G.BIG_LABEL_LENGTHS),
        )
        np.testing.assert_allclose(costs.numpy(), G.BIG_COSTS.astype(np.float32), rtol=1e-5)


class TestPrunedLoss:
    def test_full_band_matches_dense_with_grads(self):
        """TF pruned loss with a band covering the whole lattice (S=U,
        ranges=0) == TF dense loss, gradients included."""
        rng = np.random.RandomState(23)
        B, T, U, V = 2, 5, 3, 6
        acts_np = rng.randn(B, T, U, V).astype(np.float32)
        labels = tf.constant(rng.randint(1, V, (B, U - 1)).astype(np.int32))
        il = tf.constant(np.array([5, 4], np.int32))
        ll = tf.constant(np.array([2, 1], np.int32))
        ranges = tf.constant(np.zeros((B, T), np.int32))

        band = tf.constant(acts_np)  # (B, T, S=U, V)
        with tf.GradientTape() as tape:
            tape.watch(band)
            costs = tf_binding.rnnt_loss_pruned(band, ranges, labels, il, ll)
            total = tf.reduce_sum(costs)
        gband = tape.gradient(total, band)

        acts = tf.constant(acts_np)
        with tf.GradientTape() as tape2:
            tape2.watch(acts)
            ref = tf_binding.rnnt_loss(acts, labels, il, ll)
            tref = tf.reduce_sum(ref)
        gref = tape2.gradient(tref, acts)
        np.testing.assert_allclose(costs.numpy(), ref.numpy(), rtol=1e-5)
        np.testing.assert_allclose(gband.numpy(), gref.numpy(), atol=1e-5)


class TestFusedJointLoss:
    def test_fused_matches_dense_with_grads(self):
        """TF fused joint+loss == TF dense loss on the materialised
        tanh(e ⊕ p) @ W + bias, gradients included (all four inputs)."""
        rng = np.random.RandomState(29)
        B, T, U, V, H = 2, 5, 3, 9, 8
        e_np = (rng.randn(B, T, H) * 0.5).astype(np.float32)
        p_np = (rng.randn(B, U, H) * 0.5).astype(np.float32)
        W_np = (rng.randn(H, V) / np.sqrt(H)).astype(np.float32)
        b_np = (rng.randn(V) * 0.1).astype(np.float32)
        labels = tf.constant(rng.randint(1, V, (B, U - 1)).astype(np.int32))
        il = tf.constant(np.array([5, 4], np.int32))
        ll = tf.constant(np.array([2, 1], np.int32))

        e, p, W, b = (tf.constant(x) for x in (e_np, p_np, W_np, b_np))
        with tf.GradientTape() as tape:
            tape.watch([e, p, W, b])
            costs = tf_binding.rnnt_loss_fused_joint(e, p, W, b, labels,
                                                     il, ll)
            total = tf.reduce_sum(costs)
        gf = tape.gradient(total, [e, p, W, b])

        with tf.GradientTape() as tape2:
            tape2.watch([e, p, W, b])
            h = tf.tanh(e[:, :, None, :] + p[:, None, :, :])
            acts = tf.einsum("btuh,hv->btuv", h, W) + b
            ref = tf_binding.rnnt_loss(acts, labels, il, ll)
            tref = tf.reduce_sum(ref)
        gr = tape2.gradient(tref, [e, p, W, b])
        np.testing.assert_allclose(costs.numpy(), ref.numpy(), rtol=1e-5)
        for name, a, r in zip(("de", "dp", "dW", "db"), gf, gr):
            np.testing.assert_allclose(a.numpy(), r.numpy(),
                                       rtol=1e-4, atol=1e-4, err_msg=name)


class TestSimpleLoss:
    def test_simple_matches_dense_with_grads(self):
        """TF simple loss == TF dense loss on the expanded sum, and its
        am/lm gradients equal the dense gradient's marginals."""
        rng = np.random.RandomState(17)
        B, T, U, V = 2, 6, 4, 7
        am = tf.constant(rng.randn(B, T, V).astype(np.float32))
        lm = tf.constant(rng.randn(B, U, V).astype(np.float32))
        labels = tf.constant(rng.randint(1, V, (B, U - 1)).astype(np.int32))
        il = tf.constant(np.array([6, 4], np.int32))
        ll = tf.constant(np.array([3, 2], np.int32))

        with tf.GradientTape() as tape:
            tape.watch([am, lm])
            costs = tf_binding.rnnt_loss_simple(am, lm, labels, il, ll)
            total = tf.reduce_sum(costs)
        gam, glm = tape.gradient(total, [am, lm])

        acts = tf.constant(
            am.numpy()[:, :, None, :] + lm.numpy()[:, None, :, :]
        )
        with tf.GradientTape() as tape2:
            tape2.watch(acts)
            ref = tf_binding.rnnt_loss(acts, labels, il, ll)
            tref = tf.reduce_sum(ref)
        gref = tape2.gradient(tref, acts)
        np.testing.assert_allclose(costs.numpy(), ref.numpy(), rtol=1e-5)
        np.testing.assert_allclose(gam.numpy(), gref.numpy().sum(2), atol=1e-4)
        np.testing.assert_allclose(glm.numpy(), gref.numpy().sum(1), atol=1e-4)


class TestMultiblankTDT:
    def test_multiblank_matches_oracle_with_grads(self):
        from warp_transducer_tpu.utils import numpy_oracle_multiblank as omb

        rng = np.random.RandomState(23)
        B, T, U, V, durs = 2, 6, 3, 8, (2, 3)
        acts_np = (rng.randn(B, T, U, V) * 1.5).astype(np.float32)
        labels_np = rng.randint(1, V - 2, (B, U - 1)).astype(np.int32)
        il_np = np.array([6, 4], np.int32)
        ll_np = np.array([2, 1], np.int32)
        oc, og = omb.multiblank_batch(acts_np, labels_np, il_np, ll_np,
                                      durs, sigma=0.05)

        acts = tf.constant(acts_np)
        with tf.GradientTape() as tape:
            tape.watch(acts)
            costs = tf_binding.rnnt_loss_multiblank(
                acts, tf.constant(labels_np), tf.constant(il_np),
                tf.constant(ll_np), durs, sigma=0.05)
            total = tf.reduce_sum(costs)
        g = tape.gradient(total, acts)
        np.testing.assert_allclose(costs.numpy(), oc, rtol=1e-5)
        np.testing.assert_allclose(g.numpy(), og, rtol=1e-4, atol=1e-5)

    def test_tdt_matches_oracle_with_grads(self):
        from warp_transducer_tpu.utils import numpy_oracle_tdt as otdt

        rng = np.random.RandomState(31)
        B, T, U, V, durs = 2, 6, 3, 7, (0, 1, 2)
        tok_np = (rng.randn(B, T, U, V) * 1.5).astype(np.float32)
        dur_np = (rng.randn(B, T, U, len(durs)) * 1.5).astype(np.float32)
        labels_np = rng.randint(1, V, (B, U - 1)).astype(np.int32)
        il_np = np.array([6, 4], np.int32)
        ll_np = np.array([2, 1], np.int32)
        oc, ogt, ogd = otdt.tdt_batch(tok_np, dur_np, labels_np, il_np,
                                      ll_np, durs, sigma=0.02)

        tok, dur = tf.constant(tok_np), tf.constant(dur_np)
        with tf.GradientTape() as tape:
            tape.watch([tok, dur])
            costs = tf_binding.rnnt_loss_tdt(
                tok, dur, tf.constant(labels_np), tf.constant(il_np),
                tf.constant(ll_np), durs, sigma=0.02)
            total = tf.reduce_sum(costs)
        gt, gd = tape.gradient(total, [tok, dur])
        np.testing.assert_allclose(costs.numpy(), oc, rtol=1e-5)
        np.testing.assert_allclose(gt.numpy(), ogt, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(gd.numpy(), ogd, rtol=1e-4, atol=1e-5)

    def test_tdt_fused_matches_tdt_with_grads(self):
        rng = np.random.RandomState(41)
        B, T, U, V, H, durs = 2, 5, 3, 8, 6, (0, 1, 2)
        e_np = (rng.randn(B, T, H) * 0.5).astype(np.float32)
        p_np = (rng.randn(B, U, H) * 0.5).astype(np.float32)
        W_np = (rng.randn(H, V) / np.sqrt(H)).astype(np.float32)
        b_np = (rng.randn(V) * 0.1).astype(np.float32)
        Wd_np = (rng.randn(H, len(durs)) / np.sqrt(H)).astype(np.float32)
        bd_np = (rng.randn(len(durs)) * 0.1).astype(np.float32)
        labels = tf.constant(rng.randint(1, V, (B, U - 1)).astype(np.int32))
        il = tf.constant(np.array([5, 4], np.int32))
        ll = tf.constant(np.array([2, 1], np.int32))
        ins = [tf.constant(x) for x in
               (e_np, p_np, W_np, b_np, Wd_np, bd_np)]

        with tf.GradientTape() as tape:
            tape.watch(ins)
            costs = tf_binding.rnnt_loss_tdt_fused_joint(
                *ins, labels, il, ll, durs, sigma=0.02)
            total = tf.reduce_sum(costs)
        gf = tape.gradient(total, ins)

        with tf.GradientTape() as tape2:
            tape2.watch(ins)
            e, p, W, b, Wd, bd = ins
            h = tf.tanh(e[:, :, None, :] + p[:, None, :, :])
            tok = tf.einsum("btuh,hv->btuv", h, W) + b
            dur = tf.einsum("btuh,hd->btud", h, Wd) + bd
            ref = tf_binding.rnnt_loss_tdt(tok, dur, labels, il, ll, durs,
                                           sigma=0.02)
            tref = tf.reduce_sum(ref)
        gr = tape2.gradient(tref, ins)
        np.testing.assert_allclose(costs.numpy(), ref.numpy(), rtol=1e-5)
        for name, a, r in zip(("de", "dp", "dW", "db", "dWd", "dbd"), gf, gr):
            np.testing.assert_allclose(a.numpy(), r.numpy(),
                                       rtol=1e-4, atol=1e-4, err_msg=name)
