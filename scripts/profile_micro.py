#!/usr/bin/env python
"""Microsurgical attribution of the prep+skew cost on TPU.

Each candidate is a whole jit over the same inputs; compare alternatives:
  denom        — logsumexp reductions only (2 passes over acts)
  lpb          — blank slice + denom
  lpe_gather   — label log-probs via take_along_axis
  lpe_matmul   — label log-probs via one-hot einsum (MXU)
  skew_gather  — (B,T,U)x2 -> diagonal panels via advanced-index gather
  skew_reshape — same via pad+reshape trick (pure relayout)
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import slope_time_ms  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("B", nargs="?", type=int, default=128)
    p.add_argument("T", nargs="?", type=int, default=150)
    p.add_argument("L", nargs="?", type=int, default=40)
    p.add_argument("V", nargs="?", type=int, default=28)
    args = p.parse_args()
    B, T, L, V = args.B, args.T, args.L, args.V
    U = L + 1
    NEG = -1e30

    import jax
    import jax.numpy as jnp
    from warp_transducer_tpu.ops import lattice as Lat

    rng = np.random.RandomState(0)
    acts = jnp.asarray(rng.uniform(0, 1, size=(B, T, U, V)), jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, size=(B, L)), jnp.int32)
    labels_u = jnp.pad(labels, ((0, 0), (0, 1)))  # (B, U)
    lpb0 = jnp.asarray(rng.randn(B, T, U), jnp.float32)
    lpe0 = jnp.asarray(rng.randn(B, T, U), jnp.float32)

    def runner(fn, x0):
        @jax.jit
        def run(n):
            def body(i, c):
                out = fn(x0 * (1.0 + c * 1e-30))
                acc = c
                for leaf in jax.tree.leaves(out):
                    acc = acc + leaf.ravel()[0].astype(jnp.float32) * 1e-12
                return acc

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return run

    def denom(a):
        m = jnp.max(a, axis=-1, keepdims=True)
        return -(m[..., 0] + jnp.log(jnp.sum(jnp.exp(a - m), axis=-1)))

    def lpb_fn(a):
        return a[..., 0] + denom(a)

    def lpe_gather(a):
        g = jnp.take_along_axis(a[:, :, : U - 1, :], labels[:, None, :, None], axis=3)[..., 0]
        return jnp.pad(g, ((0, 0), (0, 0), (0, 1)), constant_values=NEG)

    onehot = jax.nn.one_hot(labels_u, V, dtype=jnp.float32)  # (B, U, V)
    onehot = onehot.at[:, U - 1, :].set(0.0)

    def lpe_matmul(a):
        return jnp.einsum("btuv,buv->btu", a, onehot)

    def lpe_maskmax(a):
        v_iota = jnp.arange(V, dtype=jnp.int32)
        mask = v_iota[None, None, :] == labels_u[:, :, None]  # (B, U, V)
        return jnp.max(jnp.where(mask[:, None, :, :], a, NEG), axis=-1)

    def prep2pass(a):
        # denom-max and label-select-max share one read; sumexp is pass 2.
        v_iota = jnp.arange(V, dtype=jnp.int32)
        mask = v_iota[None, None, :] == labels_u[:, :, None]
        m = jnp.max(a, axis=-1)
        e = jnp.max(jnp.where(mask[:, None, :, :], a, NEG), axis=-1)
        denom_ = -(m + jnp.log(jnp.sum(jnp.exp(a - m[..., None]), axis=-1)))
        return a[..., 0] + denom_, e + denom_, denom_

    def prep_matmul(a):
        m = jnp.max(a, axis=-1)
        denom_ = -(m + jnp.log(jnp.sum(jnp.exp(a - m[..., None]), axis=-1)))
        e = jnp.einsum("btuv,buv->btu", jnp.maximum(a, NEG), onehot,
                       precision=jax.lax.Precision.HIGHEST)
        return a[..., 0] + denom_, e + denom_, denom_

    def skew_gather(lpb):
        return Lat.skew(lpb, fill=NEG), Lat.skew(lpe0, fill=NEG)

    def skew_reshape_one(x):
        # D[n,b,u] = x[b, n-u, u]: per-u right-shift along t by u, done with
        # the flatten-rechunk trick — rows of length N+1 flattened then
        # re-chunked with row length N shift row u right by exactly u; the
        # wrapped head elements land in the previous row's NEG padding.
        N = T + U - 1
        xt = jnp.transpose(x, (2, 1, 0))  # (U, T, B)
        xt = jnp.pad(xt, ((0, 0), (0, N + 1 - T), (0, 0)), constant_values=NEG)
        flat = xt.reshape(U * (N + 1), B)
        d = flat[: U * N].reshape(U, N, B)
        return jnp.transpose(d, (1, 2, 0))  # (N, B, U)

    def skew_reshape(lpb):
        return skew_reshape_one(lpb), skew_reshape_one(lpe0)

    cases = [
        ("denom", denom, acts),
        ("lpb", lpb_fn, acts),
        ("lpe_gather", lpe_gather, acts),
        ("lpe_matmul", lpe_matmul, acts),
        ("lpe_maskmax", lpe_maskmax, acts),
        ("prep2pass", prep2pass, acts),
        ("prep_matmul", prep_matmul, acts),
        ("skew_gather", skew_gather, lpb0),
        ("skew_reshape", skew_reshape, lpb0),
    ]
    # correctness cross-checks first (cheap, on-device)
    sg = jax.jit(skew_gather)(lpb0)
    sr = jax.jit(skew_reshape)(lpb0)
    ok = bool(jnp.all(jnp.isclose(sg[0], sr[0])) & jnp.all(jnp.isclose(sg[1], sr[1])))
    print(f"# skew_reshape == skew_gather: {ok}")
    lg_ = jax.jit(lpe_gather)(acts)
    lm_ = jax.jit(lpe_matmul)(acts)
    ok2 = bool(jnp.all(jnp.isclose(lg_[:, :, : U - 1], lm_[:, :, : U - 1])))
    print(f"# lpe_matmul == lpe_gather (valid cols): {ok2}")

    print(f"# B={B} T={T} U={U} V={V}")
    for name, fn, x0 in cases:
        ms = slope_time_ms(runner(fn, x0))
        print(f"{name:14s} {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
