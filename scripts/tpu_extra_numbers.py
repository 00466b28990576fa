"""North-star + impossible-config numbers for the README."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
from bench import slope_time_ms, bench_fused
from warp_transducer_tpu import rnnt_loss_simple

# 1. north-star simple loss B=128,T=1500,L=300,V=50
B, T, L, V = 128, 1500, 300, 50
U = L + 1
rng = np.random.RandomState(0)
am = jax.jit(lambda k: jax.random.uniform(k, (B, T, V)))(jax.random.PRNGKey(0))
lm = jax.jit(lambda k: jax.random.uniform(k, (B, U, V)))(jax.random.PRNGKey(1))
labels = jnp.asarray(rng.randint(1, V, (B, L)), jnp.int32)
il = jnp.full((B,), T, jnp.int32); ll = jnp.full((B,), L, jnp.int32)
lg = jax.value_and_grad(lambda a, m: rnnt_loss_simple(a, m, labels, il, ll, reduction="sum"), argnums=(0, 1))

@jax.jit
def run(a, m, n):
    def body(i, c):
        loss, (ga, gm) = lg(a * (1.0 + c * 1e-30), m)
        return loss * 1e-12 + ga[0, 0, 0] * 1e-12 + gm[0, 0, 0] * 1e-12
    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

ms = slope_time_ms(lambda n: run(am, lm, n))
print(f"simple loss+grad B={B} T={T} L={L} V={V}: {ms:.3f} ms", flush=True)

# 2. fused joint at the impossible dense config: B=128, V=5000, f32
print("fused f32 B=128:", bench_fused(128, 150, 20, 5000, H=256, dtype="f32"), flush=True)
