"""Distributed layer tests on an 8-virtual-device CPU mesh.

The reference has no distributed surface (SURVEY.md §5.8); these tests cover
the new first-class data-parallel layer: sharded loss == single-device loss,
gradients stay correct under shard_map, GSPMD auto-sharding agrees.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warp_transducer_tpu import rnnt_loss
from warp_transducer_tpu.parallel.sharding import (
    auto_sharded_rnnt_loss,
    data_parallel_rnnt_loss,
    make_mesh,
)


def _problem(B=8, T=10, U=5, V=6, seed=0):
    rng = np.random.RandomState(seed)
    acts = jnp.asarray(rng.randn(B, T, U, V), jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, size=(B, U - 1)), jnp.int32)
    il = jnp.asarray(rng.randint(2, T + 1, size=(B,)), jnp.int32)
    ll = jnp.asarray(rng.randint(0, U, size=(B,)), jnp.int32)
    return acts, labels, il, ll


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 virtual devices"
    return make_mesh(jax.devices()[:8])


class TestDataParallel:
    def test_costs_match_single_device(self, mesh):
        acts, labels, il, ll = _problem()
        ref = rnnt_loss(acts, labels, il, ll, reduction="none", implementation="xla")
        out = data_parallel_rnnt_loss(
            acts, labels, il, ll, mesh, reduction="none", implementation="xla"
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)

    @pytest.mark.parametrize("reduction", ["sum", "mean"])
    def test_reduced_losses_match(self, mesh, reduction):
        acts, labels, il, ll = _problem(seed=1)
        ref = rnnt_loss(acts, labels, il, ll, reduction=reduction, implementation="xla")
        out = data_parallel_rnnt_loss(
            acts, labels, il, ll, mesh, reduction=reduction, implementation="xla"
        )
        np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)

    def test_gradients_match_single_device(self, mesh):
        acts, labels, il, ll = _problem(seed=2)
        g_ref = jax.grad(
            lambda a: rnnt_loss(a, labels, il, ll, reduction="mean", implementation="xla")
        )(acts)
        g_dp = jax.grad(
            lambda a: data_parallel_rnnt_loss(
                a, labels, il, ll, mesh, reduction="mean", implementation="xla"
            )
        )(acts)
        np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_ref), atol=1e-6)

    def test_under_jit(self, mesh):
        acts, labels, il, ll = _problem(seed=3)
        f = jax.jit(
            lambda a: data_parallel_rnnt_loss(
                a, labels, il, ll, mesh, reduction="sum", implementation="xla"
            )
        )
        ref = rnnt_loss(acts, labels, il, ll, reduction="sum", implementation="xla")
        np.testing.assert_allclose(float(f(acts)), float(ref), rtol=1e-5)

    def test_indivisible_batch_rejected(self, mesh):
        acts, labels, il, ll = _problem(B=6)
        with pytest.raises(ValueError, match="divisible"):
            data_parallel_rnnt_loss(acts, labels, il, ll, mesh)


class TestAutoSharded:
    def test_gspmd_agrees(self, mesh):
        acts, labels, il, ll = _problem(seed=4)
        ref = rnnt_loss(acts, labels, il, ll, reduction="none", implementation="xla")
        out = auto_sharded_rnnt_loss(
            acts, labels, il, ll, mesh, reduction="none", implementation="xla"
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)

    def test_output_sharding_pinned(self, mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P

        acts, labels, il, ll = _problem(seed=5)
        out = auto_sharded_rnnt_loss(
            acts, labels, il, ll, mesh, reduction="none", implementation="xla"
        )
        assert out.sharding.is_equivalent_to(
            NamedSharding(mesh, P("data")), out.ndim
        ), out.sharding
        # every device holds exactly B / n_devices costs
        assert {s.data.shape for s in out.addressable_shards} == {(1,)}
        scalar = auto_sharded_rnnt_loss(
            acts, labels, il, ll, mesh, reduction="sum", implementation="xla"
        )
        assert scalar.sharding.is_fully_replicated


class TestNewLossesSharded:
    """simple/pruned losses are batch-parallel: GSPMD shards them cleanly."""

    def test_simple_loss_gspmd(self, mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from warp_transducer_tpu.ops.simple import rnnt_loss_simple

        rng = np.random.RandomState(11)
        B, T, U, V = 8, 6, 4, 7
        am = jnp.asarray(rng.randn(B, T, V), jnp.float32)
        lm = jnp.asarray(rng.randn(B, U, V), jnp.float32)
        labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
        il = jnp.full((B,), T, jnp.int32)
        ll = jnp.full((B,), U - 1, jnp.int32)
        ref = rnnt_loss_simple(am, lm, labels, il, ll, reduction="none",
                               implementation="xla")

        shard = lambda x, s: jax.device_put(x, NamedSharding(mesh, s))
        out = jax.jit(
            lambda a, m: rnnt_loss_simple(a, m, labels, il, ll,
                                          reduction="none",
                                          implementation="xla")
        )(shard(am, P("data", None, None)), shard(lm, P("data", None, None)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)

    def test_pruned_loss_gspmd(self, mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from warp_transducer_tpu.ops.pruned import rnnt_loss_pruned

        rng = np.random.RandomState(12)
        B, T, U, S, V = 8, 6, 4, 4, 5
        acts_band = jnp.asarray(rng.randn(B, T, S, V), jnp.float32)
        ranges = jnp.zeros((B, T), jnp.int32)
        labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
        il = jnp.full((B,), T, jnp.int32)
        ll = jnp.full((B,), U - 1, jnp.int32)
        ref = rnnt_loss_pruned(acts_band, ranges, labels, il, ll, reduction="none")

        shard = lambda x, s: jax.device_put(x, NamedSharding(mesh, s))
        out = jax.jit(
            lambda a, r: rnnt_loss_pruned(a, r, labels, il, ll, reduction="none")
        )(shard(acts_band, P("data", None, None, None)), shard(ranges, P("data", None)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


class TestFusedJointSharded:
    """Data-parallel fused joint+loss: batch-sharded activations, replicated
    projection weights, dW/db psum-reduced across shards."""

    def _problem(self, seed=21, B=8, T=6, U=4, V=9, H=16):
        rng = np.random.RandomState(seed)
        e = jnp.asarray(rng.randn(B, T, H) * 0.5, jnp.float32)
        p = jnp.asarray(rng.randn(B, U, H) * 0.5, jnp.float32)
        W = jnp.asarray(rng.randn(H, V) / np.sqrt(H), jnp.float32)
        bias = jnp.asarray(rng.randn(V) * 0.1, jnp.float32)
        labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
        il = jnp.asarray(rng.randint(2, T + 1, (B,)), jnp.int32)
        ll = jnp.asarray(rng.randint(0, U, (B,)), jnp.int32)
        return e, p, W, bias, labels, il, ll

    def test_costs_match_single_device(self, mesh):
        from warp_transducer_tpu.ops.fused_joint import rnnt_loss_fused_joint
        from warp_transducer_tpu.parallel.sharding import (
            data_parallel_fused_joint_loss,
        )

        e, p, W, bias, labels, il, ll = self._problem()
        ref = rnnt_loss_fused_joint(e, p, W, bias, labels, il, ll,
                                    reduction="none", implementation="xla")
        out = data_parallel_fused_joint_loss(
            e, p, W, bias, labels, il, ll, mesh, reduction="none",
            implementation="xla",
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)

    @pytest.mark.full_suite
    def test_all_gradients_match_single_device(self, mesh):
        """de/dp stay sharded; dW/db must be the full cross-shard psum."""
        from warp_transducer_tpu.ops.fused_joint import rnnt_loss_fused_joint
        from warp_transducer_tpu.parallel.sharding import (
            data_parallel_fused_joint_loss,
        )

        e, p, W, bias, labels, il, ll = self._problem(seed=22)

        g_ref = jax.grad(
            lambda e, p, W, bias: rnnt_loss_fused_joint(
                e, p, W, bias, labels, il, ll, reduction="sum",
                implementation="xla"),
            argnums=(0, 1, 2, 3),
        )(e, p, W, bias)
        g_dp = jax.grad(
            lambda e, p, W, bias: data_parallel_fused_joint_loss(
                e, p, W, bias, labels, il, ll, mesh, reduction="sum",
                implementation="xla"),
            argnums=(0, 1, 2, 3),
        )(e, p, W, bias)
        for name, a, b in zip(("de", "dp", "dW", "db"), g_dp, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5, err_msg=name)


class TestPrunedFusedSharded:
    """Data-parallel pruned fused joint: batch-sharded trunk + ranges,
    replicated projection, dW/db psum-reduced."""

    def _problem(self, seed=31, B=8, T=6, U=4, V=9, H=16, S=3):
        rng = np.random.RandomState(seed)
        e = jnp.asarray(rng.randn(B, T, H) * 0.5, jnp.float32)
        p = jnp.asarray(rng.randn(B, U, H) * 0.5, jnp.float32)
        W = jnp.asarray(rng.randn(H, V) / np.sqrt(H), jnp.float32)
        bias = jnp.asarray(rng.randn(V) * 0.1, jnp.float32)
        labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
        il = jnp.full((B,), T, jnp.int32)
        ll = jnp.full((B,), U - 1, jnp.int32)
        steps = rng.randint(0, S, size=(B, T)).astype(np.int32)
        steps[:, 0] = 0
        ranges = np.minimum(np.cumsum(steps, 1), max(U - S, 0))
        ranges[:, -1] = max(U - S, 0)
        for t in range(T - 1, 0, -1):
            ranges[:, t - 1] = np.maximum(ranges[:, t - 1],
                                          ranges[:, t] - (S - 1))
        ranges[:, 0] = 0
        return e, p, W, bias, jnp.asarray(ranges, jnp.int32), labels, il, ll, S

    @pytest.mark.full_suite
    def test_costs_and_gradients_match_single_device(self, mesh):
        from warp_transducer_tpu.ops.pruned_fused import rnnt_loss_pruned_fused
        from warp_transducer_tpu.parallel.sharding import (
            data_parallel_pruned_fused_loss,
        )

        e, p, W, bias, ranges, labels, il, ll, S = self._problem()
        ref = rnnt_loss_pruned_fused(e, p, W, bias, ranges, labels, il, ll,
                                     s_range=S, reduction="none",
                                     implementation="xla")
        out = data_parallel_pruned_fused_loss(
            e, p, W, bias, ranges, labels, il, ll, S, mesh,
            reduction="none", implementation="xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)

        g_ref = jax.grad(
            lambda e, p, W, bias: rnnt_loss_pruned_fused(
                e, p, W, bias, ranges, labels, il, ll, s_range=S,
                reduction="sum", implementation="xla"),
            argnums=(0, 1, 2, 3))(e, p, W, bias)
        g_dp = jax.grad(
            lambda e, p, W, bias: data_parallel_pruned_fused_loss(
                e, p, W, bias, ranges, labels, il, ll, S, mesh,
                reduction="sum", implementation="xla"),
            argnums=(0, 1, 2, 3))(e, p, W, bias)
        for name, a, b in zip(("de", "dp", "dW", "db"), g_dp, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5, err_msg=name)


class TestMultiblankTDTSharded:
    @pytest.mark.full_suite
    def test_multiblank_costs_and_grads_match(self, mesh):
        from warp_transducer_tpu import rnnt_loss_multiblank
        from warp_transducer_tpu.parallel.sharding import (
            data_parallel_multiblank_loss,
        )

        acts, labels, il, ll = _problem(V=8)
        durs = (2, 4)
        ref = rnnt_loss_multiblank(acts, labels, il, ll, durs, sigma=0.05,
                                   reduction="none")
        out = data_parallel_multiblank_loss(acts, labels, il, ll, durs,
                                            mesh, sigma=0.05,
                                            reduction="none")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5)
        g_ref = jax.grad(lambda a: rnnt_loss_multiblank(
            a, labels, il, ll, durs, sigma=0.05, reduction="mean"))(acts)
        g_out = jax.grad(lambda a: data_parallel_multiblank_loss(
            a, labels, il, ll, durs, mesh, sigma=0.05,
            reduction="mean"))(acts)
        np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                                   atol=1e-6)

    @pytest.mark.full_suite
    def test_tdt_costs_and_grads_match(self, mesh):
        from warp_transducer_tpu import rnnt_loss_tdt
        from warp_transducer_tpu.parallel.sharding import (
            data_parallel_tdt_loss,
        )

        acts, labels, il, ll = _problem(V=7)
        durs = (0, 1, 2)
        rng = np.random.RandomState(9)
        dur = jnp.asarray(rng.randn(*acts.shape[:3], len(durs)), jnp.float32)
        ref = rnnt_loss_tdt(acts, dur, labels, il, ll, durs, sigma=0.02,
                            reduction="none")
        out = data_parallel_tdt_loss(acts, dur, labels, il, ll, durs, mesh,
                                     sigma=0.02, reduction="none")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5)
        gt_ref, gd_ref = jax.grad(lambda t, d: rnnt_loss_tdt(
            t, d, labels, il, ll, durs, sigma=0.02, reduction="mean"),
            argnums=(0, 1))(acts, dur)
        gt, gd = jax.grad(lambda t, d: data_parallel_tdt_loss(
            t, d, labels, il, ll, durs, mesh, sigma=0.02,
            reduction="mean"), argnums=(0, 1))(acts, dur)
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gt_ref),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(gd), np.asarray(gd_ref),
                                   atol=1e-6)


class TestFusedVariantsSharded:
    @pytest.mark.full_suite
    def test_tdt_fused_costs_and_all_grads_match(self, mesh):
        from warp_transducer_tpu import rnnt_loss_tdt_fused_joint
        from warp_transducer_tpu.parallel.sharding import (
            data_parallel_tdt_fused_loss,
        )

        rng = np.random.RandomState(3)
        B, T, U, V, H, durs = 8, 8, 4, 10, 6, (0, 1, 2)
        e = jnp.asarray(rng.randn(B, T, H) * 0.5, jnp.float32)
        p = jnp.asarray(rng.randn(B, U, H) * 0.5, jnp.float32)
        W = jnp.asarray(rng.randn(H, V) / np.sqrt(H), jnp.float32)
        b = jnp.asarray(rng.randn(V) * 0.1, jnp.float32)
        Wd = jnp.asarray(rng.randn(H, 3) / np.sqrt(H), jnp.float32)
        bd = jnp.asarray(rng.randn(3) * 0.1, jnp.float32)
        labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
        il = jnp.asarray(rng.randint(2, T + 1, (B,)), jnp.int32)
        ll = jnp.asarray(rng.randint(0, U, (B,)), jnp.int32)

        def ref(*ins):
            return rnnt_loss_tdt_fused_joint(
                *ins, labels, il, ll, durs, sigma=0.02, reduction="mean")

        def sharded(*ins):
            return data_parallel_tdt_fused_loss(
                *ins, labels, il, ll, durs, mesh, sigma=0.02,
                reduction="mean")

        ins = (e, p, W, b, Wd, bd)
        np.testing.assert_allclose(float(sharded(*ins)), float(ref(*ins)),
                                   rtol=1e-5)
        gr = jax.grad(ref, argnums=tuple(range(6)))(*ins)
        gs = jax.grad(sharded, argnums=tuple(range(6)))(*ins)
        for name, a, r in zip(("de", "dp", "dW", "db", "dWd", "dbd"), gs, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=1e-6, err_msg=name)

    @pytest.mark.full_suite
    def test_multiblank_fused_costs_and_grads_match(self, mesh):
        from warp_transducer_tpu import rnnt_loss_multiblank_fused_joint
        from warp_transducer_tpu.parallel.sharding import (
            data_parallel_multiblank_fused_loss,
        )

        rng = np.random.RandomState(5)
        B, T, U, V, H, durs = 8, 8, 4, 10, 6, (2, 3)
        e = jnp.asarray(rng.randn(B, T, H) * 0.5, jnp.float32)
        p = jnp.asarray(rng.randn(B, U, H) * 0.5, jnp.float32)
        W = jnp.asarray(rng.randn(H, V) / np.sqrt(H), jnp.float32)
        b = jnp.asarray(rng.randn(V) * 0.1, jnp.float32)
        labels = jnp.asarray(rng.randint(1, V - 2, (B, U - 1)), jnp.int32)
        il = jnp.asarray(rng.randint(2, T + 1, (B,)), jnp.int32)
        ll = jnp.asarray(rng.randint(0, U, (B,)), jnp.int32)

        def ref(*ins):
            return rnnt_loss_multiblank_fused_joint(
                *ins, labels, il, ll, durs, sigma=0.05, reduction="mean")

        def sharded(*ins):
            return data_parallel_multiblank_fused_loss(
                *ins, labels, il, ll, durs, mesh, sigma=0.05,
                reduction="mean")

        ins = (e, p, W, b)
        np.testing.assert_allclose(float(sharded(*ins)), float(ref(*ins)),
                                   rtol=1e-5)
        gr = jax.grad(ref, argnums=(0, 1, 2, 3))(*ins)
        gs = jax.grad(sharded, argnums=(0, 1, 2, 3))(*ins)
        for name, a, r in zip(("de", "dp", "dW", "db"), gs, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=1e-6, err_msg=name)
