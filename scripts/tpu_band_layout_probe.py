"""Probe: cost of single passes over (B,T,S,V) vs reshaped layouts."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
from bench import slope_time_ms

B, T, S, V = 128, 1500, 5, 50
acts = jax.jit(lambda k: jax.random.uniform(k, (B, T, S, V), jnp.float32))(jax.random.PRNGKey(0))

def timed(name, fn):
    @jax.jit
    def run(a, n):
        def body(i, c):
            out = fn(a * (1.0 + c * 1e-30))
            # full reduction: nothing can be DCE'd
            return jnp.sum(out) * 1e-12 + c * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    ms = slope_time_ms(lambda n: run(acts, n))
    print(f"{name}: {ms:.3f} ms", flush=True)

timed("sum-exp over V, native (B,T,S,V)", lambda a: jnp.sum(jnp.exp(a), axis=-1))
timed("reshape to (B,T,S*V) then sum-exp", lambda a: jnp.sum(jnp.exp(a.reshape(B, T, S * V)), axis=-1))
timed("full denom (max+sumexp+log)", lambda a: -(jnp.max(a, -1) + jnp.log(jnp.sum(jnp.exp(a - jnp.max(a, -1, keepdims=True)), -1))))
from warp_transducer_tpu.ops.pruned import _band_prep
rng = np.random.RandomState(0)
labels = jnp.asarray(rng.randint(1, V, (B, 300)), jnp.int32)
steps = rng.randint(0, S, size=(B, T)); steps[:, 0] = 0
ranges = jnp.asarray(np.minimum(np.cumsum(steps, axis=1), 301 - S), jnp.int32)
timed("_band_prep (all outputs)", lambda a: sum(jnp.sum(x.astype(jnp.float32)) for x in _band_prep(a, labels, ranges, 0)[:3]))
