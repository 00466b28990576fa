"""Micro-ladder for the band grad kernel's 10x-over-BW mystery.

Same geometry as band_pipeline._grad_kernel (x (B,T_pad,SV) f32, blocks
(B,Tc,SV), grid T_pad//Tc). Rungs add one suspect at a time:

  copy        — g = 2*x                       (pure DMA in + out)
  bcast       — g = x + den_s lane-broadcasts (the (B,Tc,1) splat pattern)
  selects     — + the in_seg where-chain      (masked select passes)
  exp         — + the exp                     (transcendental)
  full        — the real kernel               (everything)
  sliced      — per-segment lane-slice variant (ops on (B,Tc,V) slices)
  gridB       — copy with grid over (B-tiles, T) and (Bt,Tc,SV) blocks
"""
import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
from bench import slope_time_ms

B, T, S, V = 128, 1500, 5, 50
SV = S * V
Tc = 48
T_pad = -(-T // Tc) * Tc
NEG = -1e30
LIM = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)

x = jax.jit(lambda k: jax.random.uniform(k, (B, T_pad, SV), jnp.float32))(
    jax.random.PRNGKey(0))
f = jax.jit(lambda k: jax.random.uniform(k, (B, T_pad, 5 * 8), jnp.float32))(
    jax.random.PRNGKey(1))

spec_x = pl.BlockSpec((B, Tc, SV), lambda i: (0, i, 0),
                      memory_space=pltpu.VMEM)
spec_f = pl.BlockSpec((B, Tc, 40), lambda i: (0, i, 0),
                      memory_space=pltpu.VMEM)


def call(kernel, *ops):
    return pl.pallas_call(
        kernel, grid=(T_pad // Tc,),
        in_specs=[spec_x, spec_f][: len(ops)],
        out_specs=spec_x,
        out_shape=jax.ShapeDtypeStruct((B, T_pad, SV), jnp.float32),
        compiler_params=LIM,
    )(*ops)


def k_copy(x_ref, g_ref):
    g_ref[...] = x_ref[...] * 2.0


def k_bcast(x_ref, f_ref, g_ref):
    xx = x_ref[...]
    ff = f_ref[...]
    acc = xx
    for s in range(S):
        acc = acc + ff[:, :, s:s + 1]
    g_ref[...] = acc


def k_selects(x_ref, f_ref, g_ref):
    xx = x_ref[...]
    ff = f_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, xx.shape, 2)
    den = jnp.full(xx.shape, -1.0, jnp.float32)
    coef = jnp.zeros(xx.shape, jnp.float32)
    sub = jnp.zeros(xx.shape, jnp.float32)
    for s in range(S):
        in_seg = (lane >= s * V) & (lane < (s + 1) * V)
        den = jnp.where(in_seg, ff[:, :, s:s + 1], den)
        coef = jnp.where(in_seg, ff[:, :, 8 + s:8 + s + 1], coef)
        sub = sub + jnp.where(lane == s * V, ff[:, :, 16 + s:16 + s + 1], 0.0)
        sub = sub + jnp.where(lane == s * V + 1, ff[:, :, 24 + s:24 + s + 1], 0.0)
    g_ref[...] = coef * (xx + den) - sub


def k_exp(x_ref, f_ref, g_ref):
    xx = x_ref[...]
    ff = f_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, xx.shape, 2)
    den = jnp.full(xx.shape, -1.0, jnp.float32)
    coef = jnp.zeros(xx.shape, jnp.float32)
    sub = jnp.zeros(xx.shape, jnp.float32)
    for s in range(S):
        in_seg = (lane >= s * V) & (lane < (s + 1) * V)
        den = jnp.where(in_seg, ff[:, :, s:s + 1], den)
        coef = jnp.where(in_seg, ff[:, :, 8 + s:8 + s + 1], coef)
        sub = sub + jnp.where(lane == s * V, ff[:, :, 16 + s:16 + s + 1], 0.0)
        sub = sub + jnp.where(lane == s * V + 1, ff[:, :, 24 + s:24 + s + 1], 0.0)
    g_ref[...] = coef * jnp.exp(xx + den) - sub


def k_sliced(x_ref, f_ref, g_ref):
    ff = f_ref[...]
    for s in range(S):
        xs = x_ref[:, :, s * V:(s + 1) * V]
        lane = jax.lax.broadcasted_iota(jnp.int32, xs.shape, 2)
        den = ff[:, :, s:s + 1]
        coef = ff[:, :, 8 + s:8 + s + 1]
        cb = ff[:, :, 16 + s:16 + s + 1]
        ce = ff[:, :, 24 + s:24 + s + 1]
        lab = ff[:, :, 32 + s:32 + s + 1].astype(jnp.int32)
        g = coef * jnp.exp(xs + den)
        g = g - jnp.where(lane == 0, cb, 0.0)
        g = g - jnp.where(lane == lab, ce, 0.0)
        g_ref[:, :, s * V:(s + 1) * V] = g


def k_gridB(x_ref, g_ref):
    g_ref[...] = x_ref[...] * 2.0


def run(name, fn):
    # donation-chain harness: each call's output IS the next call's input —
    # un-elidable (bare kernels in a fori harness measure ~0 through the
    # tunnel even with carry perturbation; see CLAUDE.md).
    @jax.jit
    def go(x, f, n):
        def body(i, xc):
            out = fn(xc, f)
            return out * (1.0 + 1e-30 * i)
        return jax.lax.fori_loop(0, n, body, x)[0, 0, 0]

    ms = slope_time_ms(lambda n: go(x, f, n))
    print(f"{name:10s} {ms:8.3f} ms", flush=True)


run("copy", lambda x, f: call(k_copy, x))
run("bcast", lambda x, f: call(k_bcast, x, f))
run("selects", lambda x, f: call(k_selects, x, f))
run("exp", lambda x, f: call(k_exp, x, f))
run("sliced", lambda x, f: call(k_sliced, x, f))

Bt = 8
gridB = pl.pallas_call(
    k_gridB, grid=(B // Bt, T_pad // Tc),
    in_specs=[pl.BlockSpec((Bt, Tc, SV), lambda b, i: (b, i, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((Bt, Tc, SV), lambda b, i: (b, i, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, T_pad, SV), jnp.float32),
    compiler_params=LIM,
)
run("gridB copy", lambda x, f: gridB(x))
