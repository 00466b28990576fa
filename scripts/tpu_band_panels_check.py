"""On-TPU validation + timing for the all-panels pruned pipeline."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
import numpy as np, jax, jax.numpy as jnp
sys.path.append("/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
from bench import slope_time_ms
from warp_transducer_tpu.ops.pruned import rnnt_loss_pruned

print("backend:", jax.default_backend(), flush=True)

def make(seed, B, T, L, V, S, ragged=False):
    U = L + 1
    rng = np.random.RandomState(seed)
    labels = jnp.asarray(rng.randint(1, V, (B, L)), jnp.int32)
    if ragged:
        il = jnp.asarray(rng.randint(1, T + 1, (B,)), jnp.int32).at[0].set(T)
        ll = jnp.asarray(rng.randint(0, U, (B,)), jnp.int32).at[0].set(L)
    else:
        il = jnp.full((B,), T, jnp.int32); ll = jnp.full((B,), L, jnp.int32)
    steps = rng.randint(0, S, size=(B, T)); steps[:, 0] = 0
    r = np.minimum(np.cumsum(steps, 1), np.maximum(np.asarray(ll)[:, None] + 1 - S, 0))
    ranges = jnp.asarray(r, jnp.int32)
    acts = jax.jit(lambda k: jax.random.uniform(k, (B, T, S, V), jnp.float32))(jax.random.PRNGKey(seed))
    return acts, ranges, labels, il, ll

def parity(seed, B, T, L, V, S, ragged, rtol=1e-3, atol=1e-4):
    acts, ranges, labels, il, ll = make(seed, B, T, L, V, S, ragged)
    cx, gx = jax.jit(jax.value_and_grad(lambda a: rnnt_loss_pruned(
        a, ranges, labels, il, ll, reduction="sum", implementation="xla")))(acts)
    cp, gp = jax.jit(jax.value_and_grad(lambda a: rnnt_loss_pruned(
        a, ranges, labels, il, ll, reduction="sum", implementation="pallas")))(acts)
    np.testing.assert_allclose(float(cp), float(cx), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=rtol,
                               atol=atol)
    print(f"parity OK seed={seed} B={B} T={T} L={L} V={V} S={S} ragged={ragged}", flush=True)

parity(0, 3, 9, 5, 5, 3, True)
parity(1, 16, 150, 40, 28, 5, True)
# T=1500: |alpha| grows to O(|mean lp| * T) ~ 3e3, so one f32 ulp in the
# exponent is ~2e-4 and a 1500-step random walk drifts it to ~1e-2; the
# posteriors exp(alpha+beta-ll) then scatter ~1% between any two f32
# engines. Measured: interpret-mode pallas vs xla on CPU shows the same
# 0.4% of elements beyond rtol=1e-3 (costs agree to 7e-8). Two f32
# engines cannot agree tighter at this depth; 2e-2 bounds the walk.
parity(2, 16, 1500, 300, 50, 5, False, rtol=2e-2, atol=1e-3)

for (B, T, L, V, S) in [(16, 1500, 300, 50, 5), (128, 1500, 300, 50, 5), (16, 150, 40, 28, 5)]:
    acts, ranges, labels, il, ll = make(0, B, T, L, V, S)
    lg = jax.value_and_grad(lambda a: rnnt_loss_pruned(
        a, ranges, labels, il, ll, reduction="sum", implementation="pallas"))

    @jax.jit
    def run(a, n):
        def body(i, c):
            loss, g = lg(a * (1.0 + c * 1e-30))
            return loss * 1e-12 + g[0, 0, 0, 0] * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    ms = slope_time_ms(lambda n: run(acts, n))
    print(f"panels pruned loss+grad B={B} T={T} L={L} V={V} S={S}: {ms:.3f} ms", flush=True)
