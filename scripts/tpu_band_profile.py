"""Stage breakdown of the pruned loss at B=128,T=1500 (whole-jit prefixes)."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
from bench import slope_time_ms
from warp_transducer_tpu.ops import pruned as PR

B, T, L, V, S = 128, 1500, 300, 50, 5
U = L + 1
rng = np.random.RandomState(0)
labels = jnp.asarray(rng.randint(1, V, (B, L)), jnp.int32)
il = jnp.full((B,), T, jnp.int32); ll = jnp.full((B,), L, jnp.int32)
steps = rng.randint(0, S, size=(B, T)); steps[:, 0] = 0
r = np.minimum(np.cumsum(steps, axis=1), max(U - S, 0))
ranges = jnp.asarray(r, jnp.int32)
acts = jax.jit(lambda k: jax.random.uniform(k, (B, T, S, V), jnp.float32))(jax.random.PRNGKey(0))

def timed(name, fn, *args):
    @jax.jit
    def run(a, n):
        def body(i, c):
            out = fn(a * (1.0 + c * 1e-30), *args)
            leaves = jax.tree.leaves(out)
            return sum(jnp.ravel(l)[0].astype(jnp.float32) * 1e-12 for l in leaves) + c * 0
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    ms = slope_time_ms(lambda n: run(acts, n))
    print(f"{name}: {ms:.3f} ms", flush=True)

# 1. prep only
timed("prep", lambda a: PR._band_prep(a, labels, ranges, 0)[:3])
# 2. prep + pallas lattice
def prep_lat(a):
    lpb, lpe, denom, lab, has = PR._band_prep(a, labels, ranges, 0)
    lat = PR._band_lattice(lpb, lpe, ranges, il, ll, implementation="pallas")
    return lat.ll_forward
timed("prep+lattice(pallas)", prep_lat)
# 3. full fwd+bwd via the public op
lg = jax.value_and_grad(lambda a: PR.rnnt_loss_pruned(a, ranges, labels, il, ll, reduction="sum", implementation="pallas"))
timed("full loss+grad", lambda a: lg(a))
