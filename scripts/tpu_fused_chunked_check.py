"""On-TPU validation + timing for the V-chunked fused joint+loss path.

Three parts:
1. Parity at a shape whose W genuinely exceeds the VMEM budget
   (H=1024, V=32000 f32 -> 128 MB W) against the unfused pipeline.
2. Forced-chunk parity at the headline shape (chunks must change nothing).
3. Timing of a realistic large-vocab config (H=1024, V=32000 bf16),
   fused-chunked vs unfused.
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
import sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

from warp_transducer_tpu.ops.fused_joint import rnnt_loss_fused_joint
from warp_transducer_tpu.ops.rnnt import rnnt_loss
from warp_transducer_tpu.ops.pallas import joint_fused
from bench import slope_time_ms

print("backend:", jax.default_backend(), flush=True)


def make(seed, B, T, U, V, H, dtype):
    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    e = jax.jit(lambda k: (jax.random.uniform(k, (B, T, H)) - 0.5).astype(dtype))(ks[0])
    p = jax.jit(lambda k: (jax.random.uniform(k, (B, U, H)) - 0.5).astype(dtype))(ks[1])
    W = jax.jit(lambda k: ((jax.random.uniform(k, (H, V)) - 0.5) / np.sqrt(H)).astype(dtype))(ks[2])
    bias = jax.jit(lambda k: jax.random.uniform(k, (V,)) * 0.1)(ks[3])
    labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
    il = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), U - 1, jnp.int32)
    return e, p, W, bias, labels, il, ll


def parity(tag, seed, B, T, U, V, H, dtype=jnp.float32, tol=1e-4):
    e, p, W, bias, labels, il, ll = make(seed, B, T, U, V, H, dtype)
    nf = joint_fused.fused_n_chunks(e, p, W)
    nb = joint_fused.fused_n_chunks(e, p, W, backward=True)

    def f_fused(e, p, W, bias):
        return rnnt_loss_fused_joint(e, p, W, bias, labels, il, ll, reduction="sum")

    def f_ref(e, p, W, bias):
        acts = jnp.tanh(e.astype(jnp.float32)[:, :, None, :]
                        + p.astype(jnp.float32)[:, None, :, :]) @ W.astype(jnp.float32) + bias
        return rnnt_loss(acts, labels, il, ll, reduction="sum")

    vf, gf = jax.jit(jax.value_and_grad(f_fused, argnums=(0, 1, 2, 3)))(e, p, W, bias)
    vr, gr = jax.jit(jax.value_and_grad(f_ref, argnums=(0, 1, 2, 3)))(e, p, W, bias)
    np.testing.assert_allclose(float(vf), float(vr), rtol=tol)
    for name, a, b in zip(("de", "dp", "dW", "db"), gf, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   rtol=tol * 10, atol=tol * 10, err_msg=name)
    print(f"parity OK [{tag}] chunks fwd={nf} bwd={nb} "
          f"B={B} T={T} U={U} V={V} H={H} {dtype.__name__}", flush=True)


# 1. genuinely chunked: W = 1024x32000 f32 = 128 MB
parity("big-W", 0, 2, 20, 6, 32000, 1024, tol=2e-3)

# 2. forced chunks at a resident-fit shape: must be identical
joint_fused._N_CHUNKS_OVERRIDE = 3
parity("forced-3", 1, 4, 30, 8, 5000, 256, tol=2e-3)
joint_fused._N_CHUNKS_OVERRIDE = 0

# 3. timing: realistic production vocab.  All fused rows first — the
# unfused comparison needs the 13 GB (f32) joint tensor and may OOM, and
# a tunnel OOM can poison the client for later dispatches.
CFGS = [
    (32, 150, 20, 32000, 1024, jnp.bfloat16),
    (32, 150, 20, 32000, 1024, jnp.float32),
]


def time_fused(B, T, L, V, H, dtype):
    U = L + 1
    e, p, W, bias, labels, il, ll = make(2, B, T, U, V, H, dtype)
    nf = joint_fused.fused_n_chunks(e, p, W)
    nb = joint_fused.fused_n_chunks(e, p, W, backward=True)

    fused_lg = jax.value_and_grad(
        lambda e, p, W, bias: rnnt_loss_fused_joint(
            e, p, W, bias, labels, il, ll, reduction="sum"),
        argnums=(0, 1, 2, 3))

    @jax.jit
    def run_fused(e, p, W, bias, n):
        def body(i, c):
            eps = (1.0 + c * 1e-30).astype(e.dtype)
            loss, (de, dp, dW, db) = fused_lg(e * eps, p, W, bias)
            return (loss * 1e-12 + de[0, 0, 0].astype(jnp.float32) * 1e-12
                    + dp[0, 0, 0].astype(jnp.float32) * 1e-12
                    + dW[0, 0].astype(jnp.float32) * 1e-12 + db[0] * 1e-12)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    try:
        ms = slope_time_ms(lambda n: run_fused(e, p, W, bias, n))
        print(f"FUSED-CHUNKED ({nf}f/{nb}b) B={B} T={T} L={L} V={V} H={H} "
              f"{dtype.__name__}: {ms:.3f} ms", flush=True)
    except Exception as ex:
        print(f"FUSED-CHUNKED B={B} {dtype.__name__} FAILED: "
              f"{type(ex).__name__} {str(ex)[:300]}", flush=True)


def time_unfused(B, T, L, V, H, dtype):
    U = L + 1
    e, p, W, bias, labels, il, ll = make(2, B, T, U, V, H, dtype)

    unfused_lg = jax.value_and_grad(
        lambda e, p, W, bias: rnnt_loss(
            (jnp.tanh(e[:, :, None, :] + p[:, None, :, :]) @ W
             + bias.astype(dtype)).astype(dtype),
            labels, il, ll, reduction="sum"),
        argnums=(0, 1, 2, 3))

    @jax.jit
    def run_unfused(e, p, W, bias, n):
        def body(i, c):
            eps = (1.0 + c * 1e-30).astype(e.dtype)
            loss, (de, dp, dW, db) = unfused_lg(e * eps, p, W, bias)
            return (loss * 1e-12 + de[0, 0, 0].astype(jnp.float32) * 1e-12
                    + dp[0, 0, 0].astype(jnp.float32) * 1e-12
                    + dW[0, 0].astype(jnp.float32) * 1e-12
                    + db[0].astype(jnp.float32) * 1e-12)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    try:
        ms = slope_time_ms(lambda n: run_unfused(e, p, W, bias, n))
        print(f"UNFUSED       B={B} T={T} L={L} V={V} H={H} "
              f"{dtype.__name__}: {ms:.3f} ms", flush=True)
    except Exception as ex:
        print(f"UNFUSED B={B} {dtype.__name__} FAILED: "
              f"{type(ex).__name__} {str(ex)[:300]}", flush=True)


for cfg in CFGS:
    time_fused(*cfg)
for cfg in CFGS:
    time_unfused(*cfg)
