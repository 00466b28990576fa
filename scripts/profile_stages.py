#!/usr/bin/env python
"""Stage-wise latency breakdown of the loss+grad pipeline on TPU.

Times each stage with the same slope method bench.py uses (chained
iterations inside one jit, difference of two repetition counts), so the
axon RPC overhead cancels. Stages:

  prep      — fused log-softmax denominator + blank/label gather (ops/prep.py)
  lattice   — wavefront alpha/beta sweep (pallas or xla engine)
  grad      — dense gradient pass (ops/gradients.py)
  full      — rnnt_loss value_and_grad end to end

Usage: python scripts/profile_stages.py [B] [T] [L] [V] [--impl pallas|xla]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


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
    from warp_transducer_tpu.ops import gradients as G
    from warp_transducer_tpu.ops import prep as P
    from warp_transducer_tpu.ops import rnnt as R

    rng = np.random.RandomState(0)
    acts = jnp.asarray(rng.uniform(0, 1, size=(B, T, U, V)), jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, size=(B, L)), jnp.int32)
    il = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), L, jnp.int32)

    impl = args.impl

    # ---- stage inputs, computed once -------------------------------------
    prepped = jax.jit(lambda a: P.prepare(a, labels, 0, False))(acts)
    res = R._run_lattice(impl, prepped, il, ll)
    labels_u = jnp.pad(P._pad_labels(labels, U), ((0, 0), (0, 1)))

    def chain(fn, x0):
        """n-times-chained jitted runner: carry a scalar perturbation.

        EVERY output leaf feeds the carry with a nonzero coefficient so XLA
        cannot DCE any part of fn; the input perturbation defeats LICM.
        """

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

    t_prep = slope_time_ms(chain(lambda a: P.prepare(a, labels, 0, False), acts))
    t_lat = slope_time_ms(
        chain(lambda lpb: R._run_lattice(impl, P.PreparedInputs(lpb, prepped.lpe, prepped.denom), il, ll), prepped.lpb)
    )
    t_lat_fwd = slope_time_ms(
        chain(
            lambda lpb: R._run_lattice(
                impl, P.PreparedInputs(lpb, prepped.lpe, prepped.denom), il, ll, compute_betas=False
            ),
            prepped.lpb,
        )
    )
    t_grad = slope_time_ms(
        chain(
            lambda a: G.grad_wrt_acts(
                a, prepped.denom, prepped.lpb, prepped.lpe, res.alphas, res.betas,
                res.ll_forward, labels_u, il, ll, 0,
            ),
            acts,
        )
    )
    t_fwd_all = slope_time_ms(
        chain(lambda a: R._forward(a, labels, il, ll, 0, False, impl), acts)
    )
    lg = jax.value_and_grad(
        lambda a: R.rnnt_loss(a, labels, il, ll, reduction="sum", implementation=impl)
    )
    t_full = slope_time_ms(chain(lambda a: lg(a), acts))

    gb = B * T * U * V * 4 / 1e9
    print(f"# shape B={B} T={T} U={U} V={V}  acts={gb*1000:.1f} MB  impl={impl}")
    print(f"prep        {t_prep:8.3f} ms   ({gb / (t_prep/1e3):6.0f} GB/s read)")
    print(f"lattice f+b {t_lat:8.3f} ms")
    print(f"lattice fwd {t_lat_fwd:8.3f} ms")
    print(f"grad        {t_grad:8.3f} ms   ({3*gb / (t_grad/1e3):6.0f} GB/s r+w est)")
    print(f"fwd costs+g {t_fwd_all:8.3f} ms   (sum of stages {t_prep+t_lat+t_grad:.3f})")
    print(f"full vjp    {t_full:8.3f} ms   (fwd + bwd rescale)")


if __name__ == "__main__":
    main()
