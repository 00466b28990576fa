"""On-TPU validation + timing for the fused joint+loss kernels."""
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
from bench import slope_time_ms

print("backend:", jax.default_backend(), flush=True)

def parity(seed, B, T, U, V, H, dtype=jnp.float32, tol=1e-4):
    rng = np.random.RandomState(seed)
    e = jnp.asarray(rng.randn(B, T, H) * 0.5, dtype)
    p = jnp.asarray(rng.randn(B, U, H) * 0.5, dtype)
    W = jnp.asarray(rng.randn(H, V) / np.sqrt(H), dtype)
    bias = jnp.asarray(rng.randn(V) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
    il = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), U - 1, jnp.int32)

    def f_fused(e, p, W, bias):
        return rnnt_loss_fused_joint(e, p, W, bias, labels, il, ll, reduction="sum")

    def f_ref(e, p, W, bias):
        acts = jnp.tanh(e.astype(jnp.float32)[:, :, None, :]
                        + p.astype(jnp.float32)[:, None, :, :]) @ W.astype(jnp.float32) + bias
        return rnnt_loss(acts, labels, il, ll, reduction="sum")

    vf, gf = jax.jit(jax.value_and_grad(f_fused, argnums=(0,1,2,3)))(e, p, W, bias)
    vr, gr = jax.jit(jax.value_and_grad(f_ref, argnums=(0,1,2,3)))(e, p, W, bias)
    np.testing.assert_allclose(float(vf), float(vr), rtol=tol)
    for name, a, b in zip(("de","dp","dW","db"), gf, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   rtol=tol*10, atol=tol*10, err_msg=name)
    print(f"parity OK seed={seed} B={B} T={T} U={U} V={V} H={H} {dtype.__name__}", flush=True)

parity(0, 2, 6, 4, 9, 16)
parity(1, 4, 30, 8, 600, 64)
parity(2, 8, 50, 21, 5000, 256, tol=2e-3)

# ---- timing at the headline V=5000 shape ----
for (B, T, L, V, H, dtype) in [
    (64, 150, 20, 5000, 256, jnp.float32),
    (64, 150, 20, 5000, 256, jnp.bfloat16),
    (128, 150, 20, 5000, 256, jnp.bfloat16),
]:
    U = L + 1
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    e = jax.jit(lambda k: (jax.random.uniform(k, (B, T, H)) - 0.5).astype(dtype))(ks[0])
    p = jax.jit(lambda k: (jax.random.uniform(k, (B, U, H)) - 0.5).astype(dtype))(ks[1])
    W = jax.jit(lambda k: (jax.random.uniform(k, (H, V)) / np.sqrt(H)).astype(dtype))(ks[2])
    bias = jax.jit(lambda k: jax.random.uniform(k, (V,)) * 0.1)(ks[3])
    labels = jnp.asarray(rng.randint(1, V, (B, L)), jnp.int32)
    il = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), L, jnp.int32)

    fused_lg = jax.value_and_grad(
        lambda e, p, W, bias: rnnt_loss_fused_joint(e, p, W, bias, labels, il, ll, reduction="sum"),
        argnums=(0, 1, 2, 3))

    @jax.jit
    def run_fused(e, p, W, bias, n):
        def body(i, c):
            eps = (1.0 + c * 1e-30).astype(e.dtype)
            loss, (de, dp, dW, db) = fused_lg(e * eps, p, W, bias)
            return (loss * 1e-12 + de[0,0,0].astype(jnp.float32) * 1e-12
                    + dp[0,0,0].astype(jnp.float32) * 1e-12
                    + dW[0,0].astype(jnp.float32) * 1e-12 + db[0] * 1e-12)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    try:
        ms = slope_time_ms(lambda n: run_fused(e, p, W, bias, n))
        print(f"FUSED joint+loss+grad B={B} T={T} L={L} V={V} H={H} {dtype.__name__}: {ms:.3f} ms", flush=True)
    except Exception as ex:
        print(f"FUSED B={B} {dtype.__name__} FAILED: {type(ex).__name__} {str(ex)[:300]}", flush=True)

    unfused_lg = jax.value_and_grad(
        lambda e, p, W, bias: rnnt_loss(
            (jnp.tanh(e[:, :, None, :] + p[:, None, :, :]) @ W
             + bias).astype(dtype),
            labels, il, ll, reduction="sum"),
        argnums=(0, 1, 2, 3))

    @jax.jit
    def run_unfused(e, p, W, bias, n):
        def body(i, c):
            eps = (1.0 + c * 1e-30).astype(e.dtype)
            loss, (de, dp, dW, db) = unfused_lg(e * eps, p, W, bias)
            return (loss * 1e-12 + de[0,0,0].astype(jnp.float32) * 1e-12
                    + dp[0,0,0].astype(jnp.float32) * 1e-12
                    + dW[0,0].astype(jnp.float32) * 1e-12 + db[0].astype(jnp.float32) * 1e-12)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    try:
        ms = slope_time_ms(lambda n: run_unfused(e, p, W, bias, n))
        print(f"UNFUSED joint+loss+grad B={B} T={T} L={L} V={V} H={H} {dtype.__name__}: {ms:.3f} ms", flush=True)
    except Exception as ex:
        print(f"UNFUSED B={B} {dtype.__name__} FAILED: {type(ex).__name__} {str(ex)[:300]}", flush=True)
