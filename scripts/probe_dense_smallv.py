"""Round-5 probes for the all-Pallas dense small-V pipeline.

The r4 roofline (docs/rnnt_math.md) pinned the B=64,T=1500,U=301,V=50
dense row at 68.5 ms vs a 30.3 ms 3-slab floor, with the gap in the XLA
prep (2 reads at ~270 GB/s) plus a layout-relayout threat if only ONE
stage goes Pallas. These probes establish, on hardware, whether a fresh
small-V Pallas prep+grad pair sharing the default layout end-to-end is
viable:

  size   — physical bytes of the (B,T,U,V) array in the default layout
  copy   — trivial Pallas passthrough at block (1,Tt,U,V): compile time,
           temp bytes (relayout detector), achieved GB/s
  prep   — max/sumexp/label-select kernel at the same geometry
  grad   — dense-gradient-shaped kernel (read acts + small carriers,
           write grads)

Run each under `timeout` — the r4 Mosaic wedge at this geometry took
>25 min to (not) compile; anything healthy compiles in well under 120 s.

Usage: python scripts/probe_dense_smallv.py {size,copy,prep,grad} [B T U V Tt]
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import slope_time_ms  # noqa: E402

NEG = -1e30


def make_acts(B, T, U, V, seed=0):
    return jax.jit(
        lambda k: jax.random.uniform(k, (B, T, U, V), jnp.float32) * 4 - 2
    )(jax.random.PRNGKey(seed))


def probe_size(B, T, U, V, Tt):
    dev = jax.devices()[0]
    s0 = dev.memory_stats()["bytes_in_use"]
    a = make_acts(B, T, U, V)
    a.block_until_ready()
    s1 = dev.memory_stats()["bytes_in_use"]
    logical = B * T * U * V * 4
    print(f"logical={logical/1e9:.3f} GB physical={(s1-s0)/1e9:.3f} GB "
          f"ratio={(s1-s0)/logical:.3f}")


def _timed_compile(f, *args):
    t0 = time.time()
    c = jax.jit(f).lower(*args).compile()
    dt = time.time() - t0
    ma = c.memory_analysis()
    print(f"compile_s={dt:.1f} temp={ma.temp_size_in_bytes/1e9:.3f} GB "
          f"arg={ma.argument_size_in_bytes/1e9:.3f} GB "
          f"out={ma.output_size_in_bytes/1e9:.3f} GB")
    return c


def probe_copy(B, T, U, V, Tt):
    a = make_acts(B, T, U, V)

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 1.0000001

    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(B, pl.cdiv(T, Tt)),
            in_specs=[pl.BlockSpec((1, Tt, U, V), lambda b, t: (b, t, 0, 0))],
            out_specs=pl.BlockSpec((1, Tt, U, V), lambda b, t: (b, t, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, T, U, V), jnp.float32),
        )(x)

    _timed_compile(run, a)

    @jax.jit
    def loop(x, n):
        def body(i, c):
            y = run(x * (1.0 + c * 1e-30))
            return c + y[0, 0, 0, 0] * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    ms = slope_time_ms(lambda n: loop(a, n), n_cap=64)
    gb = 2 * B * T * U * V * 4 / 1e9
    print(f"copy: {ms:.2f} ms  {gb/ms*1e3:.0f} GB/s (R+W logical {gb:.2f} GB)")


def probe_prep(B, T, U, V, Tt):
    a = make_acts(B, T, U, V)
    labels = jnp.asarray(
        np.random.RandomState(1).randint(1, V, (B, U)), jnp.int32)
    blank = 0

    def kernel(x_ref, lab_ref, lpb_ref, lpe_ref, den_ref):
        x = x_ref[0]  # (Tt, U, V)
        m = jnp.max(x, axis=-1)
        s = jnp.sum(jnp.exp(x - m[..., None]), axis=-1)
        den = -(m + jnp.log(s))
        lab = lab_ref[0, 0]
        v_iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
        e = jnp.max(jnp.where(v_iota == lab[None, :, None], x, NEG), axis=-1)
        u_iota = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
        den_ref[0] = den
        lpb_ref[0] = x[..., blank] + den
        lpe_ref[0] = jnp.where(u_iota == x.shape[1] - 1, NEG, e + den)

    def run(x, lab):
        return pl.pallas_call(
            kernel,
            grid=(B, pl.cdiv(T, Tt)),
            in_specs=[
                pl.BlockSpec((1, Tt, U, V), lambda b, t: (b, t, 0, 0)),
                pl.BlockSpec((1, 1, U), lambda b, t: (b, 0, 0)),
            ],
            out_specs=tuple(
                pl.BlockSpec((1, Tt, U), lambda b, t: (b, t, 0))
                for _ in range(3)),
            out_shape=tuple(
                jax.ShapeDtypeStruct((B, T, U), jnp.float32) for _ in range(3)),
        )(x, lab[:, None, :])

    _timed_compile(run, a, labels)

    @jax.jit
    def loop(x, lab, n):
        def body(i, c):
            lpb, lpe, den = run(x * (1.0 + c * 1e-30), lab)
            return (c + lpb[0, 0, 0] * 1e-20 + lpe[0, 0, 0] * 1e-20
                    + den[0, 0, 0] * 1e-20)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    ms = slope_time_ms(lambda n: loop(a, labels, n), n_cap=64)
    gb = B * T * U * V * 4 / 1e9
    print(f"prep: {ms:.2f} ms  {gb/ms*1e3:.0f} GB/s (R logical {gb:.2f} GB)")


def probe_grad(B, T, U, V, Tt):
    a = make_acts(B, T, U, V)
    rng = np.random.RandomState(2)
    # lane-packed carrier: (B, T, 8, U) f32 — coef, cb, ce, denom rows
    carrier = jnp.asarray(rng.rand(B, T, 4, U), jnp.float32) * 0.1
    labels = jnp.asarray(rng.randint(1, V, (B, U)), jnp.int32)
    blank = 0

    def kernel(x_ref, car_ref, lab_ref, g_ref):
        x = x_ref[0]  # (Tt, U, V)
        car = car_ref[0]  # (Tt, 4, U)
        coef = car[:, 0, :][..., None]
        cb = car[:, 1, :][..., None]
        ce = car[:, 2, :][..., None]
        den = car[:, 3, :][..., None]
        probs = jnp.exp(x + den)
        v_iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
        lab = lab_ref[0, 0]
        g = coef * probs
        g = g - jnp.where(v_iota == blank, cb, 0.0)
        g = g - jnp.where(v_iota == lab[None, :, None], ce, 0.0)
        g_ref[0] = g

    def run(x, car, lab):
        return pl.pallas_call(
            kernel,
            grid=(B, pl.cdiv(T, Tt)),
            in_specs=[
                pl.BlockSpec((1, Tt, U, V), lambda b, t: (b, t, 0, 0)),
                pl.BlockSpec((1, Tt, 4, U), lambda b, t: (b, t, 0, 0)),
                pl.BlockSpec((1, 1, U), lambda b, t: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, Tt, U, V), lambda b, t: (b, t, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, T, U, V), jnp.float32),
        )(x, car, lab[:, None, :])

    _timed_compile(run, a, carrier, labels)

    @jax.jit
    def loop(x, car, lab, n):
        def body(i, c):
            g = run(x * (1.0 + c * 1e-30), car, lab)
            return c + g[0, 0, 0, 0] * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    ms = slope_time_ms(lambda n: loop(a, carrier, labels, n), n_cap=64)
    gb = 2 * B * T * U * V * 4 / 1e9
    print(f"grad: {ms:.2f} ms  {gb/ms*1e3:.0f} GB/s (R+W logical {gb:.2f} GB)")


def probe_flatcopy(B, T, U, V, Tt):
    """Pallas passthrough over the flat (B, T, U*V) view — the compact
    default layout. Establishes the kernel-path HBM rate at this geometry."""
    UV = U * V
    a = jax.jit(
        lambda k: jax.random.uniform(k, (B, T, UV), jnp.float32) * 4 - 2
    )(jax.random.PRNGKey(0))

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 1.0000001

    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(B, pl.cdiv(T, Tt)),
            in_specs=[pl.BlockSpec((1, Tt, UV), lambda b, t: (b, t, 0))],
            out_specs=pl.BlockSpec((1, Tt, UV), lambda b, t: (b, t, 0)),
            out_shape=jax.ShapeDtypeStruct((B, T, UV), jnp.float32),
            input_output_aliases={0: 0},
        )(x)

    _timed_compile(run, a)

    @jax.jit
    def loop(x, n):
        # Chain the ARRAY through the carry — a perturbed-copy harness
        # materialises an extra 5.4 GB against a pallas op and OOMs.
        y = jax.lax.fori_loop(0, n, lambda i, xc: run(xc), x)
        return y[0, 0, 0]

    ms = slope_time_ms(lambda n: loop(a, n), n_cap=64)
    gb = 2 * B * T * UV * 4 / 1e9
    print(f"flatcopy: {ms:.2f} ms  {gb/ms*1e3:.0f} GB/s (R+W logical {gb:.2f} GB)")


def probe_xla(B, T, U, V, Tt):
    """XLA prep formulations at the 4-D small-V shape."""
    a = make_acts(B, T, U, V)
    labels = jnp.asarray(
        np.random.RandomState(1).randint(1, V, (B, U - 1)), jnp.int32)

    def maxonly(x):
        return jnp.max(x, axis=-1)

    def current(x, lab):
        m = jnp.max(x, axis=-1, keepdims=True)
        denom = -(m[..., 0] + jnp.log(jnp.sum(jnp.exp(x - m), axis=-1)))
        v_iota = jnp.arange(V, dtype=jnp.int32)
        sel = v_iota[None, None, :] == lab[:, :, None]
        e = jnp.max(jnp.where(sel[:, None, :, :], x[:, :, : U - 1, :], -1e30),
                    axis=-1)
        return denom, x[..., 0] + denom, e

    def onepass(x, lab):
        # Streaming logsumexp as ONE variadic reduce over V: state
        # (m, s, e) with s in units of exp(x - m).
        v_iota = jnp.arange(V, dtype=jnp.int32)
        sel = v_iota[None, None, None, :] == lab[:, None, :, None]
        xl = jnp.where(jnp.pad(sel, ((0, 0), (0, 0), (0, 1), (0, 0)),
                               constant_values=False), x, -1e30)
        ones = jnp.ones((), jnp.float32)

        def comb(acc, elt):
            m1, s1, e1 = acc
            m2, s2, e2 = elt
            m = jnp.maximum(m1, m2)
            s = s1 * jnp.exp(m1 - m) + s2 * jnp.exp(m2 - m)
            return m, s, jnp.maximum(e1, e2)

        m, s, e = jax.lax.reduce(
            (x, jnp.broadcast_to(ones, x.shape), xl),
            (jnp.float32(-1e30), jnp.float32(0.0), jnp.float32(-1e30)),
            comb, (3,))
        denom = -(m + jnp.log(s))
        return denom, x[..., 0] + denom, e

    def mxu_sum(x, lab):
        # Pass 1: max + label select (fused). Pass 2: exp + MXU reduce.
        m = jnp.max(x, axis=-1)
        v_iota = jnp.arange(V, dtype=jnp.int32)
        sel = v_iota[None, None, :] == lab[:, :, None]
        e = jnp.max(jnp.where(sel[:, None, :, :], x[:, :, : U - 1, :], -1e30),
                    axis=-1)
        s = jnp.einsum("btuv,v->btu", jnp.exp(x - m[..., None]),
                       jnp.ones((V,), jnp.float32),
                       preferred_element_type=jnp.float32)
        denom = -(m + jnp.log(s))
        return denom, x[..., 0] + denom, e

    for name, fn, nargs in [("maxonly", maxonly, 1), ("current", current, 2),
                            ("onepass", onepass, 2), ("mxu_sum", mxu_sum, 2)]:
        try:
            args = (a,) if nargs == 1 else (a, labels)

            @jax.jit
            def loop(x, lab, n, fn=fn, nargs=nargs):
                def body(i, c):
                    xp = x * (1.0 + c * 1e-30)
                    outs = fn(xp) if nargs == 1 else fn(xp, lab)
                    outs = outs if isinstance(outs, tuple) else (outs,)
                    return c + sum(o[0, 0, 0] * 1e-20 for o in outs)
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            t0 = time.time()
            jax.jit(loop).lower(a, labels, 4).compile()
            dt = time.time() - t0
            ms = slope_time_ms(lambda n: loop(a, labels, n), n_cap=64)
            gb = B * T * U * V * 4 / 1e9
            print(f"{name}: {ms:.2f} ms  {gb/ms*1e3:.0f} GB/s-per-read "
                  f"(compile {dt:.0f}s)")
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:200]}")


if __name__ == "__main__":
    which = sys.argv[1]
    args = [int(x) for x in sys.argv[2:]] or []
    B, T, U, V, Tt = (args + [64, 1500, 301, 50, 8][len(args):])
    print(f"probe={which} B={B} T={T} U={U} V={V} Tt={Tt} "
          f"dev={jax.devices()[0].device_kind}")
    dict(size=probe_size, copy=probe_copy, prep=probe_prep,
         grad=probe_grad, flatcopy=probe_flatcopy, xla=probe_xla)[which](
        B, T, U, V, Tt)
