#!/usr/bin/env python
"""Bracket pipeline costs via API variants, each as its own whole jit
(so XLA picks layouts exactly as it does in production).

  score_xla / score_pallas   — prep + forward-only lattice
  loss_lp                    — log_probs_input=True: no denominator pass
  full_xla / full_pallas     — value_and_grad end to end

Usage: python scripts/profile_variants.py [B] [T] [L] [V]
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

    import jax
    import jax.numpy as jnp
    from warp_transducer_tpu import rnnt_loss, rnnt_score

    rng = np.random.RandomState(0)
    acts = jnp.asarray(rng.uniform(0, 1, size=(B, T, U, V)), jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, size=(B, L)), jnp.int32)
    il = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), L, jnp.int32)

    def runner(fn):
        @jax.jit
        def run(n):
            def body(i, c):
                out = fn(acts * (1.0 + c * 1e-30))
                acc = c
                for leaf in jax.tree.leaves(out):
                    acc = acc + leaf.ravel()[0].astype(jnp.float32) * 1e-12
                return acc

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return run

    variants = {
        "score_xla": lambda a: rnnt_score(a, labels, il, ll, implementation="xla"),
        "score_pallas": lambda a: rnnt_score(a, labels, il, ll, implementation="pallas"),
        "loss_only_pallas": lambda a: rnnt_loss(
            a, labels, il, ll, reduction="sum", implementation="pallas"
        ),
        "full_xla": jax.value_and_grad(
            lambda a: rnnt_loss(a, labels, il, ll, reduction="sum", implementation="xla")
        ),
        "full_pallas": jax.value_and_grad(
            lambda a: rnnt_loss(a, labels, il, ll, reduction="sum", implementation="pallas")
        ),
        "full_pallas_lp": jax.value_and_grad(
            lambda a: rnnt_loss(
                a, labels, il, ll, reduction="sum", implementation="pallas",
                log_probs_input=True,
            )
        ),
    }
    print(f"# B={B} T={T} U={U} V={V} acts={B*T*U*V*4/1e6:.1f} MB")
    for name, fn in variants.items():
        ms = slope_time_ms(runner(fn))
        print(f"{name:18s} {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
