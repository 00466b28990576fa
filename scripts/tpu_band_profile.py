"""Stage breakdown of the pruned ALL-PANELS pipeline at B=128,T=1500.

Brackets the three Pallas invocations (prep_panels -> stream_panels ->
grad_panels) as whole-jit prefixes, so XLA assigns layouts exactly as in
the full program. The fori harness materialises one acts-sized
perturbation copy per iteration (~0.5 ms at 192 MB) — constant across
rows, so differences between consecutive rows isolate each stage.

Usage: python scripts/tpu_band_profile.py [B T L V S]
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
from bench import slope_time_ms
from warp_transducer_tpu.ops import pruned as PR
from warp_transducer_tpu.ops.pallas import band_pipeline as BP
from warp_transducer_tpu.ops.pallas.band_stream import band_row_metadata, stream_panels

args = [int(x) for x in sys.argv[1:6]] or []
B, T, L, V, S = args + [128, 1500, 300, 50, 5][len(args):]
U = L + 1
rng = np.random.RandomState(0)
labels = jnp.asarray(rng.randint(1, V, (B, L)), jnp.int32)
il = jnp.full((B,), T, jnp.int32)
ll = jnp.full((B,), L, jnp.int32)
steps = rng.randint(0, S, size=(B, T))
steps[:, 0] = 0
r = np.minimum(np.cumsum(steps, axis=1), max(U - S, 0))
ranges = jnp.asarray(r, jnp.int32)
acts = jax.jit(lambda k: jax.random.uniform(k, (B, T, S, V), jnp.float32))(
    jax.random.PRNGKey(0))

print(f"# panels pipeline stages B={B} T={T} L={L} V={V} S={S}", flush=True)

lab_band, has_lab = PR._band_labels(labels, ranges, S)
S_pad, SV, Tc, T_pad = BP._geometry(B, T, S, V)
print(f"# geometry: Tc={Tc} T_pad={T_pad} S_pad={S_pad}", flush=True)


def timed(name, fn):
    @jax.jit
    def run(a, n):
        def body(i, c):
            out = fn(a * (1.0 + c * 1e-30))
            leaves = jax.tree.leaves(out)
            return sum(jnp.ravel(l)[0].astype(jnp.float32) * 1e-12
                       for l in leaves) + c * 0
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    ms = slope_time_ms(lambda n: run(acts, n))
    print(f"{name:28s} {ms:8.3f} ms", flush=True)


def prep_only(a):
    llf, res = BP.pruned_forward(a, lab_band, has_lab, ranges, il, ll,
                                 0, False)
    return res["lpb"], res["lpe"], res["den"]


def prep_lattice(a):
    llf, res = BP.pruned_forward(a, lab_band, has_lab, ranges, il, ll,
                                 0, False)
    return llf


def full(a):
    return jax.value_and_grad(lambda x: PR.rnnt_loss_pruned(
        x, ranges, labels, il, ll, reduction="sum",
        implementation="pallas"))(a)


timed("prep kernel (fwd minus lattice)", prep_only)
timed("prep+stream", prep_lattice)
timed("full loss+grad", full)
