#!/usr/bin/env python
"""Benchmark harness: loss+grad latency, mirroring the reference's
``test_time`` CLI (/root/reference/tests/test_time.cu:89-128 — 10-iteration
mean of ``compute_rnnt_loss`` with gradients).

Usage:
    python bench.py [B] [T] [L] [V] [--impl pallas|xla] [--all]

Default shape is the headline baseline config N=128, T=150, L=40, A=28
(19.48 ms on the reference's GTX 1080 Ti, BASELINE.md). Prints ONE JSON
line: {"metric": ..., "value": ms, "unit": "ms", "vs_baseline": speedup}.
"""
from __future__ import annotations

import argparse
import functools
import json
import subprocess
import sys
import time

import numpy as np

BASELINES_MS = {
    # (B, T, L, V) -> reference ms on GTX 1080 Ti (BASELINE.md)
    (1, 150, 40, 28): 8.51,
    (16, 150, 40, 28): 11.43,
    (32, 150, 40, 28): 12.65,
    (64, 150, 40, 28): 14.75,
    (128, 150, 40, 28): 19.48,
    (1, 150, 20, 5000): 4.79,
    (16, 150, 20, 5000): 24.44,
    (32, 150, 20, 5000): 41.38,
    (64, 150, 20, 5000): 80.44,
    (128, 150, 20, 5000): 51.46,
    (1, 1500, 300, 50): 570.33,
    (16, 1500, 300, 50): 768.57,
    (32, 1500, 300, 50): 955.05,
    (64, 1500, 300, 50): 569.34,
}


def slope_time_ms(run, target_s=0.3, n_cap=4096, reps=5):
    """Per-iteration time of ``run(n)`` (a jitted fn executing n chained
    iterations) via the slope between two repetition counts.

    Remote-tunnel environments (axon) add a large, jittery per-dispatch RPC
    overhead (tens of ms) that has nothing to do with device time; chaining
    iterations inside one jit and differencing two counts cancels it. The
    counts are auto-calibrated so the *difference* covers >= ``target_s`` of
    device work, keeping RPC jitter in the noise.
    """
    import jax
    import numpy as _np

    def fetch(r):
        # Device->host VALUE fetch, not just block_until_ready: the axon
        # tunnel can defer/batch enqueued programs until a value is
        # actually pulled, in which case block_until_ready returns ~0 ms
        # with the work still queued (measured: a chained 8192^2 matmul
        # fori "timed" 0.1 ms by block alone, 230 ms once fetched).
        # Fetch ONE element per leaf, not the whole array: producing the
        # element forces the enqueued programs to execute, but pulling a
        # GB-scale buffer through the tunnel takes minutes (the r5 long-T
        # donation-chain bench hung >18 min fetching a 5.4 GB gradient
        # per repetition). The element slice is a separate dispatch on an
        # already-materialised output buffer, so it cannot narrow the
        # producer program (unlike an in-jit ravel()[0]).
        return jax.tree.map(lambda x: _np.asarray(x[(0,) * _np.ndim(x)]), r)

    def best_of(n):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fetch(run(n))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    fetch(run(4))  # compile (n is a traced operand: one compile)
    t16 = best_of(16)
    per_est = max(t16 / 16, 1e-6)
    n2 = int(min(max(32, target_s / per_est), n_cap))
    n1 = max(4, n2 // 4)
    t1, t2 = best_of(n1), best_of(n2)
    return (t2 - t1) / (n2 - n1) * 1e3


def bench_config(B, T, L, V, impl, iters=10, warmup=3, seed=0, dtype="f32"):
    """Measure per-call device time for loss+grad (forward + gradient)."""
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from warp_transducer_tpu import rnnt_loss

    jdt = {"f32": jnp.float32, "bf16": jnp.bfloat16}[dtype]
    U = L + 1
    rng = np.random.RandomState(seed)
    # Generate acts ON DEVICE: a GB-scale host upload through the axon
    # tunnel takes many minutes and has nothing to do with the op under
    # test. (f32 uniform then cast so the values match across dtypes.)
    acts = jax.jit(
        lambda k: jax.random.uniform(k, (B, T, U, V), jnp.float32).astype(jdt)
    )(jax.random.PRNGKey(seed))
    labels = jnp.asarray(rng.randint(1, V, size=(B, L)), jnp.int32)
    il = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), L, jnp.int32)

    loss_grad = jax.value_and_grad(
        lambda a: rnnt_loss(a, labels, il, ll, reduction="sum", implementation=impl)
    )
    loss = float(jax.jit(lambda a: loss_grad(a)[0])(acts))

    # Pin the acts argument (and grads output) to the default major-to-minor
    # layout. An isolated jit lets XLA pick the entry layout freely, and at
    # large V it picks a batch-minor one — then inserts a full-size copy of
    # acts to feed the Pallas prep kernel (which requires default layout).
    # Measured at B=64,T=150,L=20,V=5000 bf16: 16.2 ms with the copy,
    # temp buffer 2.4 GB; pinned: temp 0. In a real training step the joint
    # network's matmul output already has this layout, so pinning makes the
    # bench match production, not cheat it.
    try:
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding

        fmt = Format(Layout(tuple(range(4))),
                     SingleDeviceSharding(jax.devices()[0]))
    except Exception:  # pragma: no cover - older jax
        fmt = None

    if B * T * U * V * acts.dtype.itemsize > int(2e8):
        # Big-config mode: the fori_loop harness needs two extra full-size
        # buffers (the perturbed copy + the while-carry copy of acts), which
        # pushes real-but-tight workloads out of HBM — and the ``a * eps``
        # perturbed copy is MATERIALISED whenever prep is a Pallas call
        # (custom-call operands can't absorb the multiply), adding a full
        # write+read per iteration that a real training step doesn't have.
        # Instead chain DONATED dispatches: each call's gradient buffer
        # becomes the next call's input, so exactly one big buffer stays
        # resident, no perturbation copy exists, and the async dispatch
        # queue amortises the per-call RPC overhead.
        # Pin only for fused-prep shapes — see the fori-mode comment below
        # (at small V the pin triggers minutes-long layout assignment).
        from warp_transducer_tpu.ops.pallas.prep_fused import MIN_FUSED_V

        layout_kw = (
            {"in_shardings": (fmt,), "out_shardings": fmt}
            if fmt and V >= MIN_FUSED_V else {}
        )
        gf = jax.jit(lambda a: loss_grad(a)[1], donate_argnums=0, **layout_kw)
        state = {"a": acts}

        def run(n):
            a = state["a"]
            for _ in range(int(n)):
                a = gf(a)
            state["a"] = a
            return a

        per_iter_ms = slope_time_ms(run, n_cap=256)
    else:
        # Every output feeds the carry with a NONZERO coefficient: a 0.0
        # multiplier would let XLA dead-code-eliminate the entire backward
        # pass (and a hoistable loop-invariant body would let LICM lift the
        # loss out of the loop — the carry-perturbed input prevents that).
        # ``acts`` MUST be a jit argument, not a closure: closed-over arrays
        # are captured as HLO constants and blow up remote compiles.
        # Pin only when the fused Pallas prep runs (V >= MIN_FUSED_V):
        # that's the op whose default-layout operand XLA otherwise feeds
        # with a materialised copy. For small V there is no copy to kill
        # and the pin sends the compiler into a 5-minute layout-assignment
        # search at the headline shape (measured 307 s vs ~40 s).
        from warp_transducer_tpu.ops.pallas.prep_fused import MIN_FUSED_V

        layout_kw = (
            {"in_shardings": (fmt, None)} if fmt and V >= MIN_FUSED_V else {}
        )

        @functools.partial(jax.jit, **layout_kw)
        def run_with_acts(a, n):
            def body(i, carry):
                # Scalar cast BEFORE the multiply keeps bf16 acts bf16 (an
                # f32 carry would silently promote the whole tensor and
                # double the HBM traffic being measured).
                eps = (1.0 + carry * 1e-30).astype(a.dtype)
                loss, g = loss_grad(a * eps)
                # The barrier forces the full gradient tensor to exist
                # before the element is taken: without it XLA slice-pushes
                # the [0,0,0,0] through the (pure-XLA) gradient pass and
                # the whole backward narrows to one element (r5: the
                # B=16,T=150 row "measured" 0.009 ms). Pallas-backed
                # gradients were immune (custom calls don't narrow), which
                # is why the bug appeared only when the one-pass XLA prep
                # replaced the small-V Pallas path.
                g = jax.lax.optimization_barrier(g)
                return (loss.astype(jnp.float32) * 1e-12
                        + g[0, 0, 0, 0].astype(jnp.float32) * 1e-12)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        per_iter_ms = slope_time_ms(lambda n: run_with_acts(acts, n))
    return dict(
        mean_ms=float(per_iter_ms),
        std_ms=0.0,
        min_ms=float(per_iter_ms),
        loss=loss,
    )


def bench_fused(B, T, L, V, H=256, dtype="bf16", seed=0):
    """Fused joint+loss+grad vs the unfused pipeline (joint matmul
    materialises (B,T,U,V), then the dense loss reads it)."""
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import jax.numpy as jnp

    from warp_transducer_tpu import rnnt_loss_fused_joint

    jdt = {"f32": jnp.float32, "bf16": jnp.bfloat16}[dtype]
    U = L + 1
    rng = np.random.RandomState(seed)
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    e = jax.jit(lambda k: (jax.random.uniform(k, (B, T, H)) - 0.5).astype(jdt))(ks[0])
    p = jax.jit(lambda k: (jax.random.uniform(k, (B, U, H)) - 0.5).astype(jdt))(ks[1])
    W = jax.jit(lambda k: (jax.random.uniform(k, (H, V)) / np.sqrt(H)).astype(jdt))(ks[2])
    bias = jax.jit(lambda k: jax.random.uniform(k, (V,)) * 0.1)(ks[3])
    labels = jnp.asarray(rng.randint(1, V, (B, L)), jnp.int32)
    il = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), L, jnp.int32)

    lg = jax.value_and_grad(
        lambda e, p, W, bias: rnnt_loss_fused_joint(
            e, p, W, bias, labels, il, ll, reduction="sum"),
        argnums=(0, 1, 2, 3))

    @jax.jit
    def run(e, p, W, bias, n):
        def body(i, c):
            eps = (1.0 + c * 1e-30).astype(e.dtype)
            loss, (de, dp, dW, db) = lg(e * eps, p, W, bias)
            return (loss * 1e-12 + de[0, 0, 0].astype(jnp.float32) * 1e-12
                    + dp[0, 0, 0].astype(jnp.float32) * 1e-12
                    + dW[0, 0].astype(jnp.float32) * 1e-12 + db[0] * 1e-12)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    ms = slope_time_ms(lambda n: run(e, p, W, bias, n))
    return {
        "metric": f"rnnt_loss_fused_joint+grad ms, B={B},T={T},L={L},V={V},H={H},{dtype}",
        "value": round(ms, 3), "unit": "ms", "vs_baseline": None,
    }


def bench_pruned_fused(B, T, L, V, H=256, S=5, dtype="f32", seed=0):
    """Pruned fused joint+loss+grad: band gather + joint + band loss in
    T-chunked sweeps; the (B,T,S,V) banded logits never materialise."""
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import jax.numpy as jnp

    from warp_transducer_tpu import rnnt_loss_pruned_fused

    jdt = {"f32": jnp.float32, "bf16": jnp.bfloat16}[dtype]
    U = L + 1
    rng = np.random.RandomState(seed)
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    e = jax.jit(lambda k: (jax.random.uniform(k, (B, T, H)) - 0.5).astype(jdt))(ks[0])
    p = jax.jit(lambda k: (jax.random.uniform(k, (B, U, H)) - 0.5).astype(jdt))(ks[1])
    W = jax.jit(lambda k: (jax.random.uniform(k, (H, V)) / np.sqrt(H)).astype(jdt))(ks[2])
    bias = jax.jit(lambda k: jax.random.uniform(k, (V,)) * 0.1)(ks[3])
    labels = jnp.asarray(rng.randint(1, V, (B, L)), jnp.int32)
    il = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), L, jnp.int32)
    steps = rng.randint(0, S, size=(B, T))
    steps[:, 0] = 0
    ranges = np.minimum(np.cumsum(steps, 1), max(U - S, 0))
    ranges[:, -1] = max(U - S, 0)
    for t in range(T - 1, 0, -1):
        ranges[:, t - 1] = np.maximum(ranges[:, t - 1], ranges[:, t] - (S - 1))
    ranges[:, 0] = 0
    ranges = jnp.asarray(ranges, jnp.int32)

    lg = jax.value_and_grad(
        lambda e, p, W, bias: rnnt_loss_pruned_fused(
            e, p, W, bias, ranges, labels, il, ll, s_range=S,
            reduction="sum"),
        argnums=(0, 1, 2, 3))

    @jax.jit
    def run(e, p, W, bias, n):
        def body(i, c):
            eps = (1.0 + c * 1e-30).astype(e.dtype)
            loss, (de, dp, dW, db) = lg(e * eps, p, W, bias)
            return (loss * 1e-12 + de[0, 0, 0].astype(jnp.float32) * 1e-12
                    + dp[0, 0, 0].astype(jnp.float32) * 1e-12
                    + dW[0, 0].astype(jnp.float32) * 1e-12 + db[0] * 1e-12)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    ms = slope_time_ms(lambda n: run(e, p, W, bias, n))
    return {
        "metric": (f"rnnt_loss_pruned_fused+grad ms, B={B},T={T},L={L},"
                   f"V={V},H={H},S={S},{dtype}"),
        "value": round(ms, 3), "unit": "ms", "vs_baseline": None,
    }


def bench_extras(B, T, L, V, s_range=5, seed=0):
    """Beyond-reference losses on shapes where the dense loss cannot run:
    factorised (simple) and pruned loss+grad. Returns list of JSON rows."""
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import jax.numpy as jnp
    from warp_transducer_tpu import (
        gather_banded, rnnt_loss_pruned, rnnt_loss_simple, rnnt_prune_ranges,
    )

    U = L + 1
    rng = np.random.RandomState(seed)
    am = jnp.asarray(rng.uniform(0, 1, (B, T, V)), jnp.float32)
    lm = jnp.asarray(rng.uniform(0, 1, (B, U, V)), jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, (B, L)), jnp.int32)
    il = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), L, jnp.int32)

    rows = []

    simple_lg = jax.value_and_grad(
        lambda a, m: rnnt_loss_simple(a, m, labels, il, ll, reduction="sum"),
        argnums=(0, 1),
    )

    @jax.jit
    def run_simple(a, m, n):
        def body(i, c):
            loss, (ga, gm) = simple_lg(a * (1.0 + c * 1e-30), m)
            # barrier: see bench_config — XLA-produced gradients narrow
            # under element consumption otherwise.
            ga, gm = jax.lax.optimization_barrier((ga, gm))
            return loss * 1e-12 + ga[0, 0, 0] * 1e-12 + gm[0, 0, 0] * 1e-12

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    ms = slope_time_ms(lambda n: run_simple(am, lm, n))
    rows.append({
        "metric": f"rnnt_loss_simple+grad ms, B={B},T={T},L={L},V={V}",
        "value": round(ms, 3), "unit": "ms", "vs_baseline": None,
    })

    S = s_range
    ranges = jax.jit(
        lambda a, m: rnnt_prune_ranges(a, m, labels, il, ll, S)
    )(am, lm)
    acts_band = jnp.asarray(rng.uniform(0, 1, (B, T, S, V)), jnp.float32)
    pruned_lg = jax.value_and_grad(
        lambda a: rnnt_loss_pruned(a, ranges, labels, il, ll, reduction="sum")
    )

    @jax.jit
    def run_pruned(a, n):
        def body(i, c):
            loss, g = pruned_lg(a * (1.0 + c * 1e-30))
            return loss * 1e-12 + g[0, 0, 0, 0] * 1e-12

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    ms = slope_time_ms(lambda n: run_pruned(acts_band, n))
    rows.append({
        "metric": f"rnnt_loss_pruned+grad ms, B={B},T={T},L={L},S={S},V={V}",
        "value": round(ms, 3), "unit": "ms", "vs_baseline": None,
    })
    return rows


def bench_variants(B, T, L, V, seed=0, impl="auto"):
    """The duration-arc loss families (multi-blank, TDT): loss+grad slope
    times on this shape. ``impl`` picks the lattice engine: 'auto' (the
    pending-window Pallas kernel on TPU), 'xla' (t-major scan), 'pallas'.
    Note the fori harness's a*(1+eps) perturbation materialises one acts
    copy per step when the lattice is a Pallas call (CLAUDE.md) — a few
    percent at these shapes, identical across engines."""
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import jax.numpy as jnp
    from warp_transducer_tpu import rnnt_loss_multiblank, rnnt_loss_tdt

    U = L + 1
    K = 2           # big blanks (durations 2 and 4) on the last 2 columns
    durs_tdt = (0, 1, 2, 4)
    rng = np.random.RandomState(seed)
    acts = jnp.asarray(rng.uniform(0, 1, (B, T, U, V)), jnp.float32)
    dur = jnp.asarray(rng.uniform(0, 1, (B, T, U, len(durs_tdt))), jnp.float32)
    labels = jnp.asarray(rng.randint(1, V - K, (B, L)), jnp.int32)
    il = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), L, jnp.int32)

    rows = []

    # Donation-chain harness (the big-config mode of bench_config): each
    # call's gradient becomes the next call's input. The fori-loop harness
    # MATERIALISES the a*(1+eps) perturbation copy whenever the lattice is
    # a Pallas call and keeps extra while-carry buffers — measured +1-2 ms
    # of pure harness overhead on these losses at the headline shape
    # (mb 3.88 "fori" vs 1.64 ms donation-chain on the same engine).
    def chain_ms(gf, a0):
        gf = jax.jit(gf, donate_argnums=0)
        state = {"a": a0 + 0.0}

        def run(n):
            a = state["a"]
            for _ in range(int(n)):
                a = gf(a)
            state["a"] = a
            return a

        return slope_time_ms(run, n_cap=256)

    ms = chain_ms(
        lambda a: jax.value_and_grad(lambda x: rnnt_loss_multiblank(
            x, labels, il, ll, (2, 4), sigma=0.05, reduction="sum",
            implementation=impl))(a)[1],
        acts)
    rows.append({
        "metric": f"rnnt_loss_multiblank+grad ms, B={B},T={T},L={L},V={V},K={K},{impl}",
        "value": round(ms, 3), "unit": "ms", "vs_baseline": None,
    })

    ms = chain_ms(
        lambda t: jax.value_and_grad(lambda x: rnnt_loss_tdt(
            x, dur, labels, il, ll, durs_tdt, sigma=0.05, reduction="sum",
            implementation=impl))(t)[1],
        acts)
    rows.append({
        "metric": f"rnnt_loss_tdt+grad ms, B={B},T={T},L={L},V={V},D={len(durs_tdt)},{impl}",
        "value": round(ms, 3), "unit": "ms", "vs_baseline": None,
    })
    return rows


def bench_tdt_fused(B, T, L, V, H=256, dtype="f32", seed=0):
    """Fused TDT joint+loss+grad at large V: the (B,T,U,V) token logits
    and (B,T,U,H) joint features never materialise."""
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import jax.numpy as jnp
    from warp_transducer_tpu import rnnt_loss_tdt_fused_joint

    U = L + 1
    durs = (0, 1, 2, 4)
    dt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    e = jax.random.normal(ks[0], (B, T, H), dt)
    p = jax.random.normal(ks[1], (B, U, H), dt)
    W = jax.random.normal(ks[2], (H, V), dt) / np.sqrt(H)
    bias = jax.random.normal(ks[3], (V,), jnp.float32) * 0.1
    Wd = jax.random.normal(ks[4], (H, len(durs)), jnp.float32) / np.sqrt(H)
    bd = jax.random.normal(ks[5], (len(durs),), jnp.float32) * 0.1
    labels = jax.random.randint(ks[0], (B, L), 1, V).astype(jnp.int32)
    il = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), L, jnp.int32)

    lg = jax.value_and_grad(
        lambda e_, p_, W_, b_, Wd_, bd_: rnnt_loss_tdt_fused_joint(
            e_, p_, W_, b_, Wd_, bd_, labels, il, ll, durs, sigma=0.05,
            reduction="sum"),
        argnums=(0, 1, 2, 3, 4, 5),
    )

    @jax.jit
    def run(e_, p_, W_, b_, Wd_, bd_, n):
        def body(i, c):
            loss, gs = lg(e_ * (1.0 + c * 1e-30), p_, W_, b_, Wd_, bd_)
            out = loss * 1e-12
            for g in gs:
                out = out + g.reshape(-1)[0].astype(jnp.float32) * 1e-12
            return out

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    ms = slope_time_ms(lambda n: run(e, p, W, bias, Wd, bd, n))
    return {
        "metric": (f"rnnt_loss_tdt_fused_joint+grad ms, B={B},T={T},L={L},"
                   f"V={V},H={H},{dtype}"),
        "value": round(ms, 3), "unit": "ms", "vs_baseline": None,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("B", nargs="?", type=int, default=128)
    p.add_argument("T", nargs="?", type=int, default=150)
    p.add_argument("L", nargs="?", type=int, default=40)
    p.add_argument("V", nargs="?", type=int, default=28)
    p.add_argument("--impl", default="auto", choices=["auto", "xla", "pallas"])
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                   help="activation dtype (bf16 halves big-tensor HBM traffic;"
                        " the lattice recursion stays f32 either way)")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--all", action="store_true", help="run every baseline config")
    p.add_argument("--extras", action="store_true",
                   help="bench the factorised/pruned losses on this shape")
    p.add_argument("--variants", action="store_true",
                   help="bench the multi-blank and TDT losses on this shape")
    p.add_argument("--variants-impl", default="auto",
                   choices=["auto", "xla", "pallas"],
                   help="lattice engine for --variants")
    p.add_argument("--tdt-fused", action="store_true",
                   help="bench the fused TDT joint+loss on this shape")
    p.add_argument("--fused", action="store_true",
                   help="bench the fused joint+loss on this shape")
    p.add_argument("--pruned-fused", action="store_true",
                   help="bench the pruned fused joint+loss on this shape")
    p.add_argument("--s-range", type=int, default=5,
                   help="band width S for --pruned-fused")
    p.add_argument("--joint-dim", type=int, default=256,
                   help="hidden width H for --fused")
    args = p.parse_args()

    if args.fused:
        print(json.dumps(bench_fused(args.B, args.T, args.L, args.V,
                                     H=args.joint_dim, dtype=args.dtype)),
              flush=True)
        return

    if args.pruned_fused:
        print(json.dumps(bench_pruned_fused(
            args.B, args.T, args.L, args.V, H=args.joint_dim,
            S=args.s_range, dtype=args.dtype)), flush=True)
        return

    if args.extras:
        for row in bench_extras(args.B, args.T, args.L, args.V):
            print(json.dumps(row), flush=True)
        return

    if args.variants:
        for row in bench_variants(args.B, args.T, args.L, args.V,
                                  impl=args.variants_impl):
            print(json.dumps(row), flush=True)
        return

    if args.tdt_fused:
        print(json.dumps(bench_tdt_fused(args.B, args.T, args.L, args.V,
                                         H=args.joint_dim,
                                         dtype=args.dtype)), flush=True)
        return

    if args.all:
        # Each config runs in its own subprocess so one failure (e.g. an OOM
        # on a shape whose acts+grads exceed HBM) cannot take down the sweep.
        result_line = None
        for (B, T, L, V) in sorted(BASELINES_MS):
            cmd = [
                sys.executable, __file__, str(B), str(T), str(L), str(V),
                "--impl", args.impl, "--iters", str(args.iters),
            ]
            # f32 dense needs acts+grads resident; past ~14 GB it cannot
            # allocate on a 16 GB chip (the reference's GTX 1080 Ti row at
            # B=128,V=5000 is 51.46 ms — README.md:23). Fall back to bf16
            # dense (a supported production path; the reference has no
            # low-precision path, its f32 number stays the bar) instead of
            # leaving the baseline row empty.
            f32_bytes = B * T * (L + 1) * V * 4 * 2
            dtype_note = None
            if f32_bytes > 14e9:
                cmd += ["--dtype", "bf16"]
                dtype_note = (
                    f"f32 dense unallocatable ({f32_bytes/1e9:.1f} GB "
                    "acts+grads on a 16 GB chip); bf16 dense measured")
            proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
            sys.stderr.write(proc.stderr)
            line = None
            for out in proc.stdout.splitlines():
                try:
                    line = json.loads(out)
                except json.JSONDecodeError:
                    continue
            if line is None:
                err = "OOM" if "RESOURCE_EXHAUSTED" in proc.stderr else f"exit {proc.returncode}"
                line = {
                    "metric": f"rnnt_loss+grad ms, B={B},T={T},L={L},V={V}",
                    "value": None,
                    "unit": "ms",
                    "vs_baseline": None,
                    "error": err,
                }
            if dtype_note:
                line["note"] = dtype_note
            print(json.dumps(line), flush=True)
            if dtype_note and line.get("value") is not None:
                # Companion row: the fused joint+loss at the same shape is
                # the recommended large-V training path (no big tensor at
                # all, f32-safe); publish it beside the bf16 dense number.
                fproc = subprocess.run(
                    [sys.executable, __file__, str(B), str(T), str(L),
                     str(V), "--fused", "--dtype", "bf16"],
                    capture_output=True, text=True, timeout=3600)
                sys.stderr.write(fproc.stderr)
                for out in fproc.stdout.splitlines():
                    try:
                        print(json.dumps(json.loads(out)), flush=True)
                    except json.JSONDecodeError:
                        continue
            if (B, T, L, V) == (128, 150, 40, 28):
                result_line = line
        # the headline metric must be the LAST JSON line
        if result_line is not None:
            print(json.dumps(result_line), flush=True)
        return

    B, T, L, V = args.B, args.T, args.L, args.V
    r = bench_config(B, T, L, V, args.impl, iters=args.iters, dtype=args.dtype)
    base = BASELINES_MS.get((B, T, L, V))
    tag = "" if args.dtype == "f32" else f",{args.dtype}"
    line = {
        "metric": f"rnnt_loss+grad ms, B={B},T={T},L={L},V={V}{tag}",
        "value": round(r["mean_ms"], 3),
        "unit": "ms",
        # the reference has no bf16 path; its f32 number is still the bar
        "vs_baseline": round(base / r["mean_ms"], 3) if base else None,
    }
    print(json.dumps(line), flush=True)
    sys.stderr.write(
        f"# {B=} {T=} {L=} {V=} mean={r['mean_ms']:.3f}ms loss={r['loss']:.1f} ref={base}ms\n"
    )


if __name__ == "__main__":
    main()
