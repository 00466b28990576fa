"""Token-and-Duration Transducer loss (arXiv:2304.06795) vs the NumPy oracle.

The oracle (``utils/numpy_oracle_tdt.py``) is an independent loop-based
float64 implementation; tests cover costs, BOTH heads' dense gradients
(incl. sigma / FastEmit / delay-penalty), degeneracy to the standard dense
loss when durations=(0,1) and the duration head is constant, variable
lengths, and a central-difference check over both logits tensors.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warp_transducer_tpu import rnnt_loss, rnnt_loss_tdt
from warp_transducer_tpu.utils import numpy_oracle_tdt as otdt


def _rand_problem(seed, B=3, T=9, U=4, V=7, durs=(0, 1, 2, 4)):
    rng = np.random.default_rng(seed)
    tok = (rng.standard_normal((B, T, U, V)) * 2.0).astype(np.float64)
    dur = (rng.standard_normal((B, T, U, len(durs))) * 2.0).astype(np.float64)
    labels = rng.integers(1, V, size=(B, U - 1)).astype(np.int32)
    il = rng.integers(max(2, T - 4), T + 1, size=(B,)).astype(np.int32)
    il[0] = T
    ll = rng.integers(0, U, size=(B,)).astype(np.int32)
    ll[0] = U - 1
    return tok, dur, labels, il, ll


@pytest.mark.parametrize("durs,sigma,lam,dp", [
    ((0, 1, 2, 4), 0.0, 0.0, 0.0),
    ((0, 1, 2, 4), 0.05, 0.0, 0.0),
    ((1, 2, 3), 0.0, 0.25, 0.0),
    ((0, 1, 3), 0.05, 0.1, 0.02),
])
def test_vs_oracle(durs, sigma, lam, dp):
    tok, dur, labels, il, ll = _rand_problem(42, durs=durs)
    oc, ogt, ogd = otdt.tdt_batch(tok, dur, labels, il, ll, durs,
                                  sigma=sigma, fastemit_lambda=lam,
                                  delay_penalty=dp)

    def f(t, d):
        return rnnt_loss_tdt(t, d, jnp.asarray(labels), jnp.asarray(il),
                             jnp.asarray(ll), durs, sigma=sigma,
                             fastemit_lambda=lam, delay_penalty=dp,
                             reduction="none")

    costs = f(jnp.asarray(tok), jnp.asarray(dur))
    np.testing.assert_allclose(np.asarray(costs), oc, rtol=1e-12, atol=1e-12)
    gt, gd = jax.grad(lambda t, d: jnp.sum(f(t, d)), argnums=(0, 1))(
        jnp.asarray(tok), jnp.asarray(dur))
    np.testing.assert_allclose(np.asarray(gt), ogt, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gd), ogd, rtol=1e-10, atol=1e-12)


def test_embeds_dense_paths():
    """durations=(0,1) with a UNIFORM duration head embeds every standard
    RNN-T path: a dense path (U_b-1 vertical token moves + T_b blank
    moves) becomes a TDT path with the same token weight times
    (1/2)^(T_b + U_b - 1). TDT additionally has diagonal token-d=1 paths,
    so ll_tdt >= ll_dense - (T_b + U_b - 1)·log 2, i.e.
    cost_tdt <= cost_dense + (T_b + U_b - 1)·log 2."""
    tok, dur, labels, il, ll = _rand_problem(7, durs=(0, 1))
    zeros_dur = np.zeros_like(dur)  # uniform duration head: log p = -log 2

    c_tdt = rnnt_loss_tdt(jnp.asarray(tok), jnp.asarray(zeros_dur),
                          jnp.asarray(labels), jnp.asarray(il),
                          jnp.asarray(ll), (0, 1), reduction="none")
    c_dense = rnnt_loss(jnp.asarray(tok), jnp.asarray(labels),
                        jnp.asarray(il), jnp.asarray(ll), reduction="none",
                        implementation="xla")
    # a dense path has T_b blank + (U_b - 1) token arcs = il + ll arcs
    bound = np.asarray(c_dense) + (il + ll) * np.log(2.0)
    assert np.all(np.asarray(c_tdt) <= bound + 1e-9), (c_tdt, bound)


def test_finite_difference_grad():
    tok, dur, labels, il, ll = _rand_problem(11, B=2, T=6, U=3, V=6,
                                             durs=(0, 1, 2))
    args = (jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll))

    @jax.jit  # one trace; the unjitted form re-traced per FD probe (~30 s)
    def f(t, d):
        return jnp.sum(rnnt_loss_tdt(t, d, *args, (0, 1, 2), sigma=0.03,
                                     reduction="none"))

    gt, gd = jax.grad(f, argnums=(0, 1))(jnp.asarray(tok), jnp.asarray(dur))
    import os as _os
    rng = np.random.default_rng(0)
    eps = 1e-6
    n_probes = 8 if _os.environ.get("WTT_FULL_SUITE") == "1" else 5
    for _ in range(n_probes):
        i = tuple(rng.integers(0, s) for s in tok.shape)
        dlt = np.zeros_like(tok); dlt[i] = eps
        fd = (float(f(jnp.asarray(tok + dlt), jnp.asarray(dur)))
              - float(f(jnp.asarray(tok - dlt), jnp.asarray(dur)))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(gt)[i], fd, rtol=2e-5, atol=1e-7)
    for _ in range(8):
        i = tuple(rng.integers(0, s) for s in dur.shape)
        dlt = np.zeros_like(dur); dlt[i] = eps
        fd = (float(f(jnp.asarray(tok), jnp.asarray(dur + dlt)))
              - float(f(jnp.asarray(tok), jnp.asarray(dur - dlt)))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(gd)[i], fd, rtol=2e-5, atol=1e-7)


def test_f32_and_jit():
    tok, dur, labels, il, ll = _rand_problem(13)
    durs = (0, 1, 2, 4)

    @jax.jit
    def step(t, d):
        return jax.value_and_grad(
            lambda a, b: rnnt_loss_tdt(a, b, jnp.asarray(labels),
                                       jnp.asarray(il), jnp.asarray(ll),
                                       durs, sigma=0.05, reduction="mean"),
            argnums=(0, 1))(t, d)

    loss, (gt, gd) = step(jnp.asarray(tok, jnp.float32),
                          jnp.asarray(dur, jnp.float32))
    oc, ogt, ogd = otdt.tdt_batch(tok, dur, labels, il, ll, durs, sigma=0.05)
    assert abs(float(loss) - oc.mean()) < 1e-4
    np.testing.assert_allclose(np.asarray(gt), ogt / len(oc),
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gd), ogd / len(oc),
                               rtol=2e-3, atol=1e-5)
    assert gt.dtype == jnp.float32 and gd.dtype == jnp.float32


def test_model_train_and_decode():
    """End-to-end TDT model: duration head created, jitted train step
    reduces the loss, TDT greedy decode returns valid tokens."""
    import optax

    from warp_transducer_tpu.models.decoding import greedy_decode_tdt
    from warp_transducer_tpu.models.transducer import (
        TransducerConfig, init_params, make_model, make_tdt_train_step,
    )

    cfg = TransducerConfig(
        vocab_size=8, encoder_dim=16, encoder_layers=1, encoder_heads=2,
        prediction_dim=16, joint_dim=16, input_dim=6, conv_kernel=3,
        dtype=jnp.float32, tdt_durations=(0, 1, 2),
    )
    model = make_model(cfg)
    B, T, U = 3, 7, 4
    rng = np.random.RandomState(0)
    params = init_params(cfg, jax.random.PRNGKey(2), B=B, T=T, U=U)
    assert "DurHead_0" in params["params"]["Joint_0"]
    batch = {
        "feats": jnp.asarray(rng.randn(B, T, cfg.input_dim), jnp.float32),
        "feat_lengths": jnp.asarray([7, 5, 3], jnp.int32),
        "labels": jnp.asarray(rng.randint(1, 8, (B, U - 1)), jnp.int32),
        "label_lengths": jnp.asarray([3, 2, 1], jnp.int32),
    }
    opt = optax.adam(1e-2)
    step = jax.jit(make_tdt_train_step(model, opt, sigma=0.02))
    opt_state = opt.init(params)
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    tokens, n = jax.jit(lambda f, l: greedy_decode_tdt(
        model, params, f, l, max_symbols=5))(batch["feats"],
                                             batch["feat_lengths"])
    assert tokens.shape == (B, 5)
    arr, narr = np.asarray(tokens), np.asarray(n)
    assert np.all((narr >= 0) & (narr <= 5))
    assert np.all((arr >= 0) & (arr < cfg.vocab_size))


def test_infeasible_utterance_sentinel():
    """durations (2,) with odd T: no combination consumes the frames
    exactly -> huge finite cost and ZERO gradients (the pruned-loss
    convention), on the JAX engine, the native engine and the oracle."""
    rng = np.random.default_rng(0)
    B, T, U, V = 2, 5, 3, 6  # T=5 odd; durs=(2,): infeasible
    tok = rng.standard_normal((B, T, U, V))
    dur = rng.standard_normal((B, T, U, 1))
    labels = rng.integers(1, V, size=(B, U - 1)).astype(np.int32)
    il = np.array([5, 4], np.int32)  # utt 0 infeasible, utt 1 feasible
    ll = np.array([2, 1], np.int32)

    oc, ogt, ogd = otdt.tdt_batch(tok, dur, labels, il, ll, (2,))
    assert oc[0] == 1e30 and np.isfinite(oc[1])
    assert not ogt[0].any() and ogt[1].any()

    def f(t, d):
        return rnnt_loss_tdt(t, d, jnp.asarray(labels), jnp.asarray(il),
                             jnp.asarray(ll), (2,), reduction="none")

    costs = f(jnp.asarray(tok), jnp.asarray(dur))
    assert float(costs[0]) > 1e29
    np.testing.assert_allclose(float(costs[1]), oc[1], rtol=1e-10)
    gt, gd = jax.grad(lambda t, d: jnp.sum(f(t, d)), argnums=(0, 1))(
        jnp.asarray(tok), jnp.asarray(dur))
    assert not np.asarray(gt)[0].any() and not np.asarray(gd)[0].any()
    np.testing.assert_allclose(np.asarray(gt)[1], ogt[1], rtol=1e-10,
                               atol=1e-12)

    from warp_transducer_tpu.bindings import native
    if native.available():
        c_n, gt_n, gd_n = native.rnnt_loss_tdt_native(
            tok, dur, labels, il, ll, (2,))
        assert c_n[0] == 1e30 and not gt_n[0].any() and not gd_n[0].any()
        np.testing.assert_allclose(c_n[1], oc[1], rtol=1e-10)


def test_validation():
    tok, dur, labels, il, ll = _rand_problem(1)
    a = (jnp.asarray(tok), jnp.asarray(dur), jnp.asarray(labels),
         jnp.asarray(il), jnp.asarray(ll))
    with pytest.raises(ValueError, match="non-empty"):
        rnnt_loss_tdt(*a, ())
    with pytest.raises(ValueError, match=">= 0"):
        rnnt_loss_tdt(*a, (-1, 1, 2, 3))
    with pytest.raises(ValueError, match="distinct"):
        rnnt_loss_tdt(*a, (0, 1, 1, 2))
    with pytest.raises(ValueError, match=">= 1"):
        rnnt_loss_tdt(*a, (0,))
    with pytest.raises(ValueError, match="last dim"):
        rnnt_loss_tdt(*a, (0, 1))
    with pytest.raises(ValueError, match="disagree"):
        rnnt_loss_tdt(a[0], a[1][:, :-1], *a[2:], (0, 1, 2, 4))
    with pytest.raises(ValueError, match="reduction"):
        rnnt_loss_tdt(*a, (0, 1, 2, 4), reduction="avg")


class TestTDTFusedJoint:
    def test_matches_unfused_with_all_grads(self):
        from warp_transducer_tpu import rnnt_loss_tdt_fused_joint

        rng = np.random.default_rng(3)
        B, T, U, V, H, durs = 3, 9, 4, 11, 8, (0, 1, 2, 4)
        e = jnp.asarray(rng.standard_normal((B, T, H)) * 0.5, jnp.float32)
        p = jnp.asarray(rng.standard_normal((B, U, H)) * 0.5, jnp.float32)
        W = jnp.asarray(rng.standard_normal((H, V)) / np.sqrt(H), jnp.float32)
        b = jnp.asarray(rng.standard_normal(V) * 0.1, jnp.float32)
        Wd = jnp.asarray(rng.standard_normal((H, len(durs))) / np.sqrt(H),
                         jnp.float32)
        bd = jnp.asarray(rng.standard_normal(len(durs)) * 0.1, jnp.float32)
        labels = jnp.asarray(rng.integers(1, V, size=(B, U - 1)), jnp.int32)
        il = jnp.asarray([9, 6, 8], jnp.int32)
        ll = jnp.asarray([3, 2, 0], jnp.int32)

        def ref(e, p, W, b, Wd, bd):
            h = jnp.tanh(e[:, :, None, :] + p[:, None, :, :])
            return jnp.sum(rnnt_loss_tdt(
                h @ W + b, h @ Wd + bd, labels, il, ll, durs, sigma=0.05,
                fastemit_lambda=0.1, delay_penalty=0.02, reduction="none"))

        def fus(e, p, W, b, Wd, bd):
            return jnp.sum(rnnt_loss_tdt_fused_joint(
                e, p, W, b, Wd, bd, labels, il, ll, durs, sigma=0.05,
                fastemit_lambda=0.1, delay_penalty=0.02, reduction="none"))

        ins = (e, p, W, b, Wd, bd)
        np.testing.assert_allclose(float(fus(*ins)), float(ref(*ins)),
                                   rtol=1e-5)
        gr = jax.grad(ref, argnums=tuple(range(6)))(*ins)
        gf = jax.grad(fus, argnums=tuple(range(6)))(*ins)
        for name, a, r in zip(("de", "dp", "dW", "db", "dWd", "dbd"), gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=1e-4, atol=1e-5, err_msg=name)

    def test_infeasible_zero_grads(self):
        from warp_transducer_tpu import rnnt_loss_tdt_fused_joint

        rng = np.random.default_rng(5)
        B, T, U, V, H = 1, 5, 2, 6, 4  # durs=(2,): T=5 odd -> infeasible
        e = jnp.asarray(rng.standard_normal((B, T, H)), jnp.float32)
        p = jnp.asarray(rng.standard_normal((B, U, H)), jnp.float32)
        W = jnp.asarray(rng.standard_normal((H, V)), jnp.float32)
        b = jnp.zeros((V,), jnp.float32)
        Wd = jnp.asarray(rng.standard_normal((H, 1)), jnp.float32)
        bd = jnp.zeros((1,), jnp.float32)
        labels = jnp.asarray([[1]], jnp.int32)
        il = jnp.asarray([5], jnp.int32)
        ll = jnp.asarray([1], jnp.int32)

        def f(e):
            return jnp.sum(rnnt_loss_tdt_fused_joint(
                e, p, W, b, Wd, bd, labels, il, ll, (2,), reduction="none"))

        assert float(f(e)) > 1e29
        g = jax.grad(f)(e)
        assert not np.asarray(g).any()

    def test_model_fused_train_step(self):
        import optax

        from warp_transducer_tpu.models.transducer import (
            TransducerConfig, init_params, make_model,
            make_tdt_fused_train_step, tdt_loss_fn,
        )

        cfg = TransducerConfig(
            vocab_size=8, encoder_dim=16, encoder_layers=1, encoder_heads=2,
            prediction_dim=16, joint_dim=16, input_dim=6, conv_kernel=3,
            dtype=jnp.float32, tdt_durations=(0, 1, 2),
        )
        model = make_model(cfg)
        B, T, U = 3, 7, 4
        rng = np.random.RandomState(0)
        params = init_params(cfg, jax.random.PRNGKey(2), B=B, T=T, U=U)
        batch = {
            "feats": jnp.asarray(rng.randn(B, T, cfg.input_dim), jnp.float32),
            "feat_lengths": jnp.asarray([7, 5, 3], jnp.int32),
            "labels": jnp.asarray(rng.randint(1, 8, (B, U - 1)), jnp.int32),
            "label_lengths": jnp.asarray([3, 2, 1], jnp.int32),
        }
        # fused loss == unfused model loss on the same params
        fused = model.apply(params, batch["feats"], batch["feat_lengths"],
                            batch["labels"], batch["label_lengths"],
                            sigma=0.02, method=model.tdt_fused_loss)
        unfused = tdt_loss_fn(params, model, batch, sigma=0.02)
        np.testing.assert_allclose(float(fused), float(unfused), rtol=1e-5)

        opt = optax.adam(1e-2)
        step = jax.jit(make_tdt_fused_train_step(model, opt, sigma=0.02))
        opt_state = opt.init(params)
        losses = []
        for _ in range(6):
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
        assert np.isfinite(losses).all() and losses[-1] < losses[0]


class TestTDTViterbi:
    def _brute_force(self, lp_tok, lp_dur, labels, durs, blank=0):
        """Enumerate every complete TDT path; return (best score, best
        token (frame, duration) list)."""
        T, U, V = lp_tok.shape
        best = [-np.inf, None]

        def go(t, u, s, emits):
            for j, d in enumerate(durs):
                if u == U - 1 and d >= 1 and t + d == T:
                    cand = s + lp_tok[t, u, blank] + lp_dur[t, u, j]
                    if cand > best[0]:
                        best[0], best[1] = cand, list(emits)
                if d >= 1 and t + d <= T - 1:
                    go(t + d, u, s + lp_tok[t, u, blank] + lp_dur[t, u, j],
                       emits)
                if u < U - 1 and t + d <= T - 1:
                    go(t + d, u + 1,
                       s + lp_tok[t, u, labels[u]] + lp_dur[t, u, j],
                       emits + [(t, d)])

        go(0, 0, 0.0, [])
        return best

    @pytest.mark.parametrize("durs", [(0, 1, 2), (1, 2)])
    def test_matches_brute_force(self, durs):
        from warp_transducer_tpu.ops.alignment import tdt_viterbi_align
        from warp_transducer_tpu.utils.numpy_oracle import log_softmax

        rng = np.random.default_rng(0)
        B, T, U, V = 3, 6, 3, 5
        tok = rng.standard_normal((B, T, U, V)) * 2
        dur = rng.standard_normal((B, T, U, len(durs))) * 2
        labels = rng.integers(1, V, size=(B, U - 1)).astype(np.int32)
        il = np.array([6, 4, 5], np.int32)
        ll = np.array([2, 1, 2], np.int32)

        out = tdt_viterbi_align(
            jnp.asarray(tok), jnp.asarray(dur), jnp.asarray(labels),
            jnp.asarray(il), jnp.asarray(ll), durs, sigma=0.03)
        for b in range(B):
            t, u = int(il[b]), int(ll[b]) + 1
            lp_t = log_softmax(tok[b, :t, :u]) - 0.03
            lp_d = log_softmax(dur[b, :t, :u])
            ref_score, ref_emits = self._brute_force(
                lp_t, lp_d, labels[b], durs)
            np.testing.assert_allclose(float(out.score[b]), ref_score,
                                       rtol=1e-5)
            got = [(int(out.emit_frames[b, i]),
                    int(out.emit_durations[b, i]))
                   for i in range(int(ll[b]))]
            assert got == ref_emits, (b, got, ref_emits)
            # padding stays -1
            for i in range(int(ll[b]), U - 1):
                assert int(out.emit_frames[b, i]) == -1

    def test_score_bounded_by_loss(self):
        from warp_transducer_tpu.ops.alignment import tdt_viterbi_align

        tok, dur, labels, il, ll = _rand_problem(21, durs=(0, 1, 2))
        out = tdt_viterbi_align(
            jnp.asarray(tok), jnp.asarray(dur), jnp.asarray(labels),
            jnp.asarray(il), jnp.asarray(ll), (0, 1, 2))
        costs = rnnt_loss_tdt(jnp.asarray(tok), jnp.asarray(dur),
                              jnp.asarray(labels), jnp.asarray(il),
                              jnp.asarray(ll), (0, 1, 2), reduction="none")
        # best single path <= sum over all paths
        assert np.all(np.asarray(out.score) <= -np.asarray(costs) + 1e-9)


def test_fused_pallas_engine_matches_xla():
    """implementation='pallas' (interpreter on CPU) == the XLA engine,
    costs and all six gradients."""
    from warp_transducer_tpu import rnnt_loss_tdt_fused_joint

    rng = np.random.default_rng(9)
    B, T, U, V, H, durs = 2, 8, 3, 12, 8, (0, 1, 2)
    e = jnp.asarray(rng.standard_normal((B, T, H)) * 0.5, jnp.float32)
    p = jnp.asarray(rng.standard_normal((B, U, H)) * 0.5, jnp.float32)
    W = jnp.asarray(rng.standard_normal((H, V)) / np.sqrt(H), jnp.float32)
    b = jnp.asarray(rng.standard_normal(V) * 0.1, jnp.float32)
    Wd = jnp.asarray(rng.standard_normal((H, len(durs))) / np.sqrt(H),
                     jnp.float32)
    bd = jnp.asarray(rng.standard_normal(len(durs)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, size=(B, U - 1)), jnp.int32)
    il = jnp.asarray([8, 5], jnp.int32)
    ll = jnp.asarray([2, 1], jnp.int32)

    def f(impl):
        return lambda *ins: jnp.sum(rnnt_loss_tdt_fused_joint(
            *ins, labels, il, ll, durs, sigma=0.05, fastemit_lambda=0.1,
            reduction="none", implementation=impl))

    ins = (e, p, W, b, Wd, bd)
    np.testing.assert_allclose(float(f("pallas")(*ins)),
                               float(f("xla")(*ins)), rtol=1e-5)
    gx = jax.grad(f("xla"), argnums=tuple(range(6)))(*ins)
    gp = jax.grad(f("pallas"), argnums=tuple(range(6)))(*ins)
    for name, a, r in zip(("de", "dp", "dW", "db", "dWd", "dbd"), gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_fused_pallas_chunked_matches_xla():
    """Oversize-W Pallas path (V-chunked token head + standalone duration
    kernels) == the XLA engine. Forces chunking via the test override."""
    from warp_transducer_tpu import rnnt_loss_tdt_fused_joint
    from warp_transducer_tpu.ops.pallas import joint_fused

    rng = np.random.default_rng(11)
    B, T, U, V, H, durs = 2, 8, 3, 300, 8, (0, 1, 2)
    e = jnp.asarray(rng.standard_normal((B, T, H)) * 0.5, jnp.float32)
    p = jnp.asarray(rng.standard_normal((B, U, H)) * 0.5, jnp.float32)
    W = jnp.asarray(rng.standard_normal((H, V)) / np.sqrt(H), jnp.float32)
    b = jnp.asarray(rng.standard_normal(V) * 0.1, jnp.float32)
    Wd = jnp.asarray(rng.standard_normal((H, len(durs))) / np.sqrt(H),
                     jnp.float32)
    bd = jnp.asarray(rng.standard_normal(len(durs)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, size=(B, U - 1)), jnp.int32)
    il = jnp.asarray([8, 5], jnp.int32)
    ll = jnp.asarray([2, 1], jnp.int32)

    def f(impl):
        return lambda *ins: jnp.sum(rnnt_loss_tdt_fused_joint(
            *ins, labels, il, ll, durs, sigma=0.03, reduction="none",
            implementation=impl))

    ins = (e, p, W, b, Wd, bd)
    old = joint_fused._N_CHUNKS_OVERRIDE
    joint_fused._N_CHUNKS_OVERRIDE = 2
    try:
        cp = float(f("pallas")(*ins))
        gp = jax.grad(f("pallas"), argnums=tuple(range(6)))(*ins)
    finally:
        joint_fused._N_CHUNKS_OVERRIDE = old
    cx = float(f("xla")(*ins))
    gx = jax.grad(f("xla"), argnums=tuple(range(6)))(*ins)
    np.testing.assert_allclose(cp, cx, rtol=1e-5)
    for name, a, r in zip(("de", "dp", "dW", "db", "dWd", "dbd"), gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


class TestWindowStreamKernel:
    """The streamed pending-window Pallas kernel (pallas/window_stream.py,
    interpreter on CPU) vs the XLA TDT scan."""

    def _prep(self, durs, seed=13, B=3, T=9, U=4, V=8):
        from warp_transducer_tpu.ops.tdt import _tdt_prep

        rng = np.random.default_rng(seed)
        tok = rng.standard_normal((B, T, U, V)).astype(np.float32) * 2.0
        dur = rng.standard_normal((B, T, U, len(durs))).astype(np.float32)
        labels = rng.integers(1, V, size=(B, U - 1)).astype(np.int32)
        il = rng.integers(max(2, T - 4), T + 1, size=(B,)).astype(np.int32)
        il[0] = T
        ll = rng.integers(0, U, size=(B,)).astype(np.int32)
        ll[0] = U - 1
        lpb, lpe, lpd, _, _ = _tdt_prep(
            jnp.asarray(tok), jnp.asarray(dur), jnp.asarray(labels), 0,
            0.05, jnp.float32)
        return (tok, dur, labels, il, ll), (lpb, lpe, lpd)

    @pytest.mark.parametrize("durs", [(0, 1, 2), (1, 2, 4), (0, 2, 3)])
    def test_lattice_parity(self, durs):
        from warp_transducer_tpu.ops.tdt import _tdt_lattice
        from warp_transducer_tpu.ops.pallas.window_stream import (
            tdt_forward_backward,
        )

        (tok, dur, labels, il, ll), (lpb, lpe, lpd) = self._prep(durs)
        il_j, ll_j = jnp.asarray(il), jnp.asarray(ll)
        ref = _tdt_lattice(lpb, lpe, lpd, durs, il_j, ll_j)
        a, b, llf, llb = tdt_forward_backward(
            lpb, lpe, lpd, durs, il_j, ll_j, interpret=True)

        valid = np.asarray(ref.alphas) > -1e29
        np.testing.assert_allclose(np.asarray(a)[valid],
                                   np.asarray(ref.alphas)[valid],
                                   rtol=2e-5, atol=2e-5)
        validb = np.asarray(ref.betas) > -1e29
        np.testing.assert_allclose(np.asarray(b)[validb],
                                   np.asarray(ref.betas)[validb],
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(llf), np.asarray(ref.ll_forward),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(llb), np.asarray(ref.ll_backward),
                                   rtol=2e-5, atol=2e-5)

    def test_infeasible_utterance_sentinel(self):
        """No d=0 arcs and more labels than frames -> infeasible: the
        kernel must preserve the NEG sentinel exactly like the scan (no
        clamp leak)."""
        from warp_transducer_tpu.ops.tdt import _tdt_lattice
        from warp_transducer_tpu.ops.pallas.window_stream import (
            tdt_forward_backward,
        )

        durs = (1, 2)
        (tok, dur, labels, il, ll), (lpb, lpe, lpd) = self._prep(
            durs, B=2, T=4, U=4)
        il = np.asarray([2, 4], np.int32)  # utt 0: 3 labels in 2 frames
        ll = np.asarray([3, 2], np.int32)
        il_j, ll_j = jnp.asarray(il), jnp.asarray(ll)
        ref = _tdt_lattice(lpb, lpe, lpd, durs, il_j, ll_j)
        _, _, llf, llb = tdt_forward_backward(
            lpb, lpe, lpd, durs, il_j, ll_j, interpret=True)
        assert float(ref.ll_forward[0]) < -1e29
        assert float(llf[0]) < -1e29
        np.testing.assert_allclose(np.asarray(llf[1]), np.asarray(ref.ll_forward[1]),
                                   rtol=2e-5)
        np.testing.assert_allclose(np.asarray(llb[1]), np.asarray(ref.ll_backward[1]),
                                   rtol=2e-5)

    def test_loss_and_grad_parity(self):
        durs = (0, 1, 2, 4)
        (tok, dur, labels, il, ll), _ = self._prep(durs, seed=29, T=10)
        ins = (jnp.asarray(tok), jnp.asarray(dur), jnp.asarray(labels),
               jnp.asarray(il), jnp.asarray(ll))

        def f(impl):
            return lambda t, d: rnnt_loss_tdt(
                t, d, *ins[2:], durations=durs, sigma=0.05,
                reduction="sum", implementation=impl)

        np.testing.assert_allclose(float(f("pallas")(*ins[:2])),
                                   float(f("xla")(*ins[:2])), rtol=2e-5)
        gx = jax.grad(f("xla"), argnums=(0, 1))(*ins[:2])
        gp = jax.grad(f("pallas"), argnums=(0, 1))(*ins[:2])
        for p, x in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(p), np.asarray(x),
                                       rtol=2e-4, atol=2e-5)
