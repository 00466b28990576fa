"""A/B: donated vs non-donated dispatch chain for the big-config bench.

Hypothesis (r5): at B=64,T=1500,L=300,V=50 the donation-chain harness
measures ~18 ms MORE than the fori-loop profiler because input-output
aliasing forces XLA to relayout/copy the 5.4 GB gradient into the donated
buffer each call. If the non-donated chain matches the fori number, the
bench should prefer it whenever two big buffers fit HBM.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import slope_time_ms  # noqa: E402
from warp_transducer_tpu import rnnt_loss  # noqa: E402

B, T, L, V = (int(x) for x in (sys.argv[1:] + ["64", "1500", "300", "50"])[:4])
U = L + 1
rng = np.random.RandomState(0)
acts = jax.jit(
    lambda k: jax.random.uniform(k, (B, T, U, V), jnp.float32)
)(jax.random.PRNGKey(0))
labels = jnp.asarray(rng.randint(1, V, size=(B, L)), jnp.int32)
il = jnp.full((B,), T, jnp.int32)
ll = jnp.full((B,), L, jnp.int32)

loss_grad = jax.value_and_grad(
    lambda a: rnnt_loss(a, labels, il, ll, reduction="sum"))

for name, kw in [("donated", dict(donate_argnums=0)), ("plain", {})]:
    gf = jax.jit(lambda a: loss_grad(a)[1], **kw)
    state = {"a": acts}

    def run(n):
        a = state["a"]
        for _ in range(int(n)):
            a = gf(a)
        state["a"] = a
        return a

    ms = slope_time_ms(run, n_cap=128)
    print(f"RES chain_{name}: {ms:.2f} ms", flush=True)
    state.clear()

# fori harness for comparison (safe now: no pallas op consumes acts on the
# small-V path, so the perturbation multiply fuses into the prep reduce)
@jax.jit
def loop(a, n):
    def body(i, c):
        eps = (1.0 + c * 1e-30).astype(a.dtype)
        loss, g = loss_grad(a * eps)
        return (loss.astype(jnp.float32) * 1e-12
                + jnp.sum(g).astype(jnp.float32) * 1e-12)
    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

ms = slope_time_ms(lambda n: loop(acts, n), n_cap=128)
print(f"RES fori_sumconsume: {ms:.2f} ms (includes one extra grad read)",
      flush=True)
