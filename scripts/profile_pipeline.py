#!/usr/bin/env python
"""Whole-jit sub-pipeline bracketing: each stage prefix is its own jit, so
XLA assigns layouts exactly as in the full program. Differences between
consecutive rows isolate each stage's integrated cost.

Usage: python scripts/profile_pipeline.py [B] [T] [L] [V] [--impl pallas|xla]
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
    p.add_argument("--impl", default="pallas", choices=["xla", "pallas"])
    args = p.parse_args()
    B, T, L, V = args.B, args.T, args.L, args.V
    U = L + 1

    import jax
    import jax.numpy as jnp
    from warp_transducer_tpu.ops import lattice as Lat
    from warp_transducer_tpu.ops import prep as P
    from warp_transducer_tpu.ops import rnnt as R

    rng = np.random.RandomState(0)
    # Generate acts ON DEVICE and pass them as a jit ARGUMENT: a closed-over
    # GB-scale array becomes an HLO constant, which both blows up the axon
    # remote compiler and takes minutes to upload (CLAUDE.md rule).
    acts = jax.jit(
        lambda k: jax.random.uniform(k, (B, T, U, V), jnp.float32)
    )(jax.random.PRNGKey(0))
    labels = jnp.asarray(rng.randint(1, V, size=(B, L)), jnp.int32)
    il = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), L, jnp.int32)

    def runner(fn):
        @jax.jit
        def run(a, n):
            def body(i, c):
                out = fn(a * (1.0 + c * 1e-30))
                acc = c
                for leaf in jax.tree.leaves(out):
                    # FULL-reduce consumption: a ravel()[0] probe lets XLA
                    # slice-pushdown narrow a producer reduce (the r5
                    # one-pass variadic prep would collapse to one output
                    # element and measure ~0). The sum costs one extra read
                    # of each output, identical across stage prefixes, so
                    # stage DIFFERENCES stay meaningful.
                    acc = acc + jnp.sum(leaf).astype(jnp.float32) * 1e-12
                return acc

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return lambda n: run(acts, n)

    NEG = -1e30

    def prep_only(a):
        pp = P.prepare(a, labels, 0, False)
        return pp.lpb, pp.lpe

    def prep_skew(a):
        pp = P.prepare(a, labels, 0, False)
        lpb32 = jnp.maximum(pp.lpb, NEG)
        lpe32 = jnp.maximum(pp.lpe, NEG)
        return Lat.skew(lpb32, fill=NEG), Lat.skew(lpe32, fill=NEG)

    def score(a):
        pp = P.prepare(a, labels, 0, False)
        res = R._run_lattice(args.impl, pp, il, ll, compute_betas=False)
        return res.ll_forward

    def fb(a):
        pp = P.prepare(a, labels, 0, False)
        res = R._run_lattice(args.impl, pp, il, ll, compute_betas=True)
        return res.ll_forward, res.alphas, res.betas

    def loss_grad(a):
        from warp_transducer_tpu import rnnt_loss
        return jax.value_and_grad(lambda x: rnnt_loss(
            x, labels, il, ll, reduction="sum",
            implementation=args.impl))(a)

    stages = [("prep", prep_only), ("prep+skew", prep_skew),
              ("score(fwd)", score), ("fwd+bwd lattice", fb),
              ("loss+grad", loss_grad)]
    print(f"# B={B} T={T} U={U} V={V} impl={args.impl}")
    for name, fn in stages:
        ms = slope_time_ms(runner(fn))
        print(f"{name:16s} {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
