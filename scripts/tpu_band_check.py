"""On-TPU validation + timing for the Pallas band kernel."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

from warp_transducer_tpu.ops.pruned import _band_prep, _band_lattice
from warp_transducer_tpu.ops.pallas import band_stream

print("backend:", jax.default_backend(), jax.devices())

def parity(seed, B, T, U, V, S, ragged=True):
    rng = np.random.RandomState(seed)
    acts = jnp.asarray(rng.randn(B, T, S, V), jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, (B, max(U - 1, 1))), jnp.int32)
    if ragged:
        il = jnp.asarray(rng.randint(1, T + 1, (B,)), jnp.int32).at[0].set(T)
        ll = jnp.asarray(rng.randint(0, U, (B,)), jnp.int32).at[0].set(U - 1)
    else:
        il = jnp.full((B,), T, jnp.int32)
        ll = jnp.full((B,), U - 1, jnp.int32)
    steps = rng.randint(0, S, size=(B, T)); steps[:, 0] = 0
    r = np.minimum(np.cumsum(steps, axis=1),
                   np.maximum(np.asarray(ll)[:, None] + 1 - S, 0))
    ranges = jnp.asarray(r, jnp.int32)
    lpb, lpe, _, _, _ = _band_prep(acts, labels, ranges, 0)

    ref = jax.jit(lambda *a: _band_lattice(*a, implementation="xla"))(
        lpb, lpe, ranges, il, ll)
    a, b, llf, llb = jax.jit(band_stream.band_forward_backward)(
        lpb, lpe, ranges, il, ll)
    np.testing.assert_allclose(np.asarray(llf), np.asarray(ref.ll_forward), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(llb), np.asarray(ref.ll_backward), rtol=1e-5, atol=1e-4)
    # lattice parity on valid cells
    Tb = np.asarray(il); Ub = np.asarray(ll) + 1
    va, ra = np.asarray(a), np.asarray(ref.alphas)
    vb, rb = np.asarray(b), np.asarray(ref.betas)
    t_i = np.arange(T)[None, :, None]; s_i = np.arange(S)[None, None, :]
    valid = (t_i < Tb[:, None, None]) & (np.asarray(r)[:, :, None] + s_i < Ub[:, None, None])
    np.testing.assert_allclose(va[valid], ra[valid], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(vb[valid], rb[valid], rtol=1e-4, atol=1e-4)
    print(f"parity OK seed={seed} B={B} T={T} U={U} V={V} S={S}")

parity(0, 3, 9, 6, 5, 3)
parity(1, 16, 150, 21, 50, 5, ragged=False)
parity(2, 16, 1500, 301, 50, 5, ragged=False)

# ---- timing: full pruned loss+grad at the ROADMAP #3 target shape ----
sys.path.insert(0, "/root/repo")
from bench import slope_time_ms
from warp_transducer_tpu import rnnt_loss_pruned, rnnt_prune_ranges

for (B, T, L, V, S) in [(16, 1500, 300, 50, 5), (16, 150, 40, 28, 5), (128, 1500, 300, 50, 5)]:
    U = L + 1
    rng = np.random.RandomState(0)
    am = jnp.asarray(rng.uniform(0, 1, (B, T, V)), jnp.float32)
    lm = jnp.asarray(rng.uniform(0, 1, (B, U, V)), jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, (B, L)), jnp.int32)
    il = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), L, jnp.int32)
    ranges = jax.jit(lambda a, m: rnnt_prune_ranges(a, m, labels, il, ll, S))(am, lm)
    acts_band = jax.jit(lambda k: jax.random.uniform(k, (B, T, S, V), jnp.float32))(jax.random.PRNGKey(0))

    for impl in ("pallas", "xla"):
        lg = jax.value_and_grad(lambda a: rnnt_loss_pruned(
            a, ranges, labels, il, ll, reduction="sum", implementation=impl))

        @jax.jit
        def run(a, n):
            def body(i, c):
                loss, g = lg(a * (1.0 + c * 1e-30))
                return loss * 1e-12 + g[0, 0, 0, 0] * 1e-12
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        ms = slope_time_ms(lambda n: run(acts_band, n))
        print(f"pruned loss+grad B={B} T={T} L={L} V={V} S={S} impl={impl}: {ms:.3f} ms", flush=True)
