"""Client-side Mosaic lowering check: export every Pallas path for TPU
WITHOUT the tunnel.

``jax.export.export(..., platforms=["tpu"])`` runs the pallas->Mosaic
lowering on the client, which is exactly the stage that rejected the
panels gradient kernel's gather (commit fe31260) while interpreter mode
accepted it.  ``jax.default_backend`` is patched to "tpu" so the library's
interpret-mode defaults pick the real kernels.  This does NOT execute
anything — compile-side failures (VMEM overflow, Mosaic backend bugs) can
still only surface on hardware — but it catches the most common class of
interpret-vs-TPU divergence early.

Run: env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/lower_check.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

FAILED = []


def check(name, fn, *args):
    try:
        exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
        n = exp.mlir_module().count("tpu_custom_call")
        status = "OK" if n > 0 else "NO-KERNEL"
        if n == 0:
            FAILED.append((name, "lowered but no tpu_custom_call"))
        print(f"{name}: {status} ({n} tpu_custom_call)", flush=True)
    except Exception as ex:
        FAILED.append((name, f"{type(ex).__name__}: {str(ex)[:200]}"))
        print(f"{name}: FAIL {type(ex).__name__}: {str(ex)[:200]}", flush=True)


rng = np.random.RandomState(0)
B, T, U, V = 4, 64, 10, 50

from warp_transducer_tpu.ops.rnnt import rnnt_loss
from warp_transducer_tpu.ops.pruned import rnnt_loss_pruned, rnnt_prune_ranges

# Build ALL data eagerly first (real CPU backend), THEN patch
# jax.default_backend so the exported traces pick the real kernels.
acts = jnp.asarray(rng.randn(B, T, U, V), jnp.float32)
labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
il = jnp.full((B,), T, jnp.int32)
ll = jnp.full((B,), U - 1, jnp.int32)
S = 5
am = jnp.asarray(rng.randn(B, T, V), jnp.float32)
lm = jnp.asarray(rng.randn(B, U, V), jnp.float32)
ranges = rnnt_prune_ranges(am, lm, labels, il, ll, S)
acts_band = jnp.asarray(rng.randn(B, T, S, V), jnp.float32)

jax.default_backend = lambda: "tpu"  # steer interpret-mode defaults

# dense pallas path (hardware-proven; sanity check of the method)
check("dense pallas fwd+bwd",
      jax.value_and_grad(lambda a: rnnt_loss(
          a, labels, il, ll, reduction="sum", implementation="pallas")),
      acts)

# pruned: all-panels pipeline
check("pruned panels fwd+bwd",
      jax.value_and_grad(lambda a: rnnt_loss_pruned(
          a, ranges, labels, il, ll, reduction="sum",
          implementation="pallas")),
      acts_band)

# fused joint: resident, chunked, pipelined
from warp_transducer_tpu.ops.fused_joint import rnnt_loss_fused_joint
from warp_transducer_tpu.ops.pallas import joint_fused

H, V2 = 64, 1200
e = jnp.asarray(rng.randn(B, T, H) * 0.3, jnp.float32)
p = jnp.asarray(rng.randn(B, U, H) * 0.3, jnp.float32)
W = jnp.asarray(rng.randn(H, V2) / np.sqrt(H), jnp.float32)
bias = jnp.zeros((V2,), jnp.float32)
lab2 = jnp.asarray(rng.randint(1, V2, (B, U - 1)), jnp.int32)
def make_fused_vg():
    # fresh callable per check: the chunk/pipeline knobs are Python
    # globals invisible to the jit trace cache, so reusing one callable
    # across knob settings would silently re-export the first trace
    return jax.value_and_grad(
        lambda e, p, W, bias: rnnt_loss_fused_joint(
            e, p, W, bias, lab2, il, ll, reduction="sum"),
        argnums=(0, 1, 2, 3))

check("fused resident fwd+bwd", make_fused_vg(), e, p, W, bias)
joint_fused._N_CHUNKS_OVERRIDE = 2
check("fused chunked fwd+bwd", make_fused_vg(), e, p, W, bias)
joint_fused._N_CHUNKS_OVERRIDE = 0
joint_fused._PIPELINE = 1
# the inner fused_prep jit would hit its cache from the resident check
# (same shapes + static args); the knob is outside the key
joint_fused.fused_prep.clear_cache()
joint_fused.fused_grad.clear_cache()
check("fused pipelined fwd+bwd", make_fused_vg(), e, p, W, bias)
joint_fused._PIPELINE = 0

# long labels: U_pad a multiple of 128 once forced T_t into {1,2,4},
# which interpreter mode accepted and Mosaic rejects
U_long = 122
p_long = jnp.asarray(rng.randn(B, U_long, H) * 0.3, jnp.float32)
lab_long = jnp.asarray(rng.randint(1, V2, (B, U_long - 1)), jnp.int32)
ll_long = jnp.full((B,), U_long - 1, jnp.int32)
check("fused long-labels fwd+bwd",
      jax.value_and_grad(
          lambda e, p, W, bias: rnnt_loss_fused_joint(
              e, p, W, bias, lab_long, il, ll_long, reduction="sum"),
          argnums=(0, 1, 2, 3)),
      e, p_long, W, bias)

# simple loss pallas engine (used by the factorised path)
from warp_transducer_tpu.ops.simple import rnnt_loss_simple

check("simple pallas fwd+bwd",
      jax.value_and_grad(lambda a, m: rnnt_loss_simple(
          a, m, labels, il, ll, reduction="sum",
          implementation="pallas"), argnums=(0, 1)),
      am, lm)

# pruned fused joint: XLA chunked sweeps + the Pallas band recursion
from warp_transducer_tpu.ops.pruned_fused import rnnt_loss_pruned_fused

e_pf = jnp.asarray(rng.randn(B, T, H) * 0.3, jnp.float32)
p_pf = jnp.asarray(rng.randn(B, U, H) * 0.3, jnp.float32)
W_pf = jnp.asarray(rng.randn(H, V) / np.sqrt(H), jnp.float32)
b_pf = jnp.asarray(rng.randn(V) * 0.1, jnp.float32)
check("pruned fused (pallas band) fwd+bwd",
      jax.value_and_grad(
          lambda e, p, W, bias: rnnt_loss_pruned_fused(
              e, p, W, bias, ranges, labels, il, ll, s_range=S,
              reduction="sum", implementation="pallas"),
          argnums=(0, 1, 2, 3)),
      e_pf, p_pf, W_pf, b_pf)

# fused TDT: the kernels with the duration head enabled
from warp_transducer_tpu.ops.tdt_fused import rnnt_loss_tdt_fused_joint

durs = (0, 1, 2, 4)
Wd = jnp.asarray(rng.randn(H, len(durs)) / np.sqrt(H), jnp.float32)
bd = jnp.zeros((len(durs),), jnp.float32)
check("fused TDT fwd+bwd",
      jax.value_and_grad(
          lambda e, p, W, bias, Wd, bd: rnnt_loss_tdt_fused_joint(
              e, p, W, bias, Wd, bd, lab2, il, ll, durs, sigma=0.05,
              reduction="sum", implementation="pallas"),
          argnums=(0, 1, 2, 3, 4, 5)),
      e, p, W, bias, Wd, bd)

# fused multi-blank: the kernels with K static big-blank columns
from warp_transducer_tpu.ops.multiblank_fused import (
    rnnt_loss_multiblank_fused_joint,
)

lab_mb = jnp.asarray(rng.randint(1, V2 - 2, (B, U - 1)), jnp.int32)
check("fused multiblank fwd+bwd",
      jax.value_and_grad(
          lambda e, p, W, bias: rnnt_loss_multiblank_fused_joint(
              e, p, W, bias, lab_mb, il, ll, (2, 4), sigma=0.05,
              reduction="sum", implementation="pallas"),
          argnums=(0, 1, 2, 3)),
      e, p, W, bias)

# pending-window streamed lattices (multi-blank / TDT duration arcs)
from warp_transducer_tpu.ops.multiblank import rnnt_loss_multiblank
from warp_transducer_tpu.ops.tdt import rnnt_loss_tdt

lab_mb2 = jnp.asarray(rng.randint(1, V - 3, (B, U - 1)), jnp.int32)
check("multiblank window-stream fwd+bwd",
      jax.value_and_grad(lambda a: rnnt_loss_multiblank(
          a, lab_mb2, il, ll, (2, 4), sigma=0.05, reduction="sum",
          implementation="pallas")),
      acts)

dur_tdt = jnp.asarray(rng.randn(B, T, U, len(durs)), jnp.float32)
check("tdt window-stream fwd+bwd",
      jax.value_and_grad(lambda a, d: rnnt_loss_tdt(
          a, d, labels, il, ll, durations=durs, sigma=0.05,
          reduction="sum", implementation="pallas"), argnums=(0, 1)),
      acts, dur_tdt)

if FAILED:
    print("\nFAILURES:")
    for name, msg in FAILED:
        print(f"  {name}: {msg}")
    sys.exit(1)
print("\nALL LOWERINGS OK")
