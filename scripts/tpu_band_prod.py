"""Pruned loss measured the production way (acts produced/consumed in-jit)."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
import numpy as np, jax, jax.numpy as jnp
sys.path.append("/root/repo")
from bench import slope_time_ms
from warp_transducer_tpu.ops.pruned import rnnt_loss_pruned

B, T, L, V, S = 128, 1500, 300, 50, 5
U = L + 1
rng = np.random.RandomState(0)
labels = jnp.asarray(rng.randint(1, V, (B, L)), jnp.int32)
il = jnp.full((B,), T, jnp.int32); ll = jnp.full((B,), L, jnp.int32)
steps = rng.randint(0, S, size=(B, T)); steps[:, 0] = 0
ranges = jnp.asarray(np.minimum(np.cumsum(steps, 1), max(U - S, 0)), jnp.int32)

# 1. flat-entry: acts passed as (B, T, S*V), reshaped (bitcast) inside
acts_flat = jax.jit(lambda k: jax.random.uniform(k, (B, T, S * V), jnp.float32))(jax.random.PRNGKey(0))
for impl in ("pallas", "xla"):
    print(f"# compiling flat-entry impl={impl} ...", flush=True)
    lg = jax.value_and_grad(lambda a: rnnt_loss_pruned(
        a.reshape(B, T, S, V), ranges, labels, il, ll, reduction="sum",
        implementation=impl))

    @jax.jit
    def run(a, n):
        def body(i, c):
            loss, g = lg(a * (1.0 + c * 1e-30))
            return loss * 1e-12 + g[0, 0, 0] * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    ms = slope_time_ms(lambda n: run(acts_flat, n))
    print(f"flat-entry pruned loss+grad B={B} impl={impl}: {ms:.3f} ms", flush=True)

# 2. production: banded joint (enc+pred_band -> tanh -> proj) inside the jit
print("# compiling banded-joint end-to-end ...", flush=True)
H = 256
ks = jax.random.split(jax.random.PRNGKey(1), 4)
enc = jax.jit(lambda k: (jax.random.uniform(k, (B, T, H)) - 0.5))(ks[0])
pred_band = jax.jit(lambda k: (jax.random.uniform(k, (B, T, S, H)) - 0.5))(ks[1])
W = jax.jit(lambda k: jax.random.uniform(k, (H, V)) / np.sqrt(H))(ks[2])
bias = jax.jit(lambda k: jax.random.uniform(k, (V,)) * 0.1)(ks[3])

for impl in ("pallas",):
    def train_obj(enc, pb, W, bias):
        acts = jnp.tanh(enc[:, :, None, :] + pb) @ W + bias  # (B,T,S,V)
        return rnnt_loss_pruned(acts, ranges, labels, il, ll,
                                reduction="sum", implementation=impl)

    lg = jax.value_and_grad(train_obj, argnums=(0, 1, 2, 3))

    @jax.jit
    def run(enc, pb, W, bias, n):
        def body(i, c):
            loss, (ge, gp, gw, gb) = lg(enc * (1.0 + c * 1e-30), pb, W, bias)
            return (loss * 1e-12 + ge[0, 0, 0] * 1e-12 + gp[0, 0, 0, 0] * 1e-12
                    + gw[0, 0] * 1e-12 + gb[0] * 1e-12)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    ms = slope_time_ms(lambda n: run(enc, pred_band, W, bias, n))
    print(f"banded-joint+loss+grad end-to-end B={B} H={H} impl={impl}: {ms:.3f} ms", flush=True)
