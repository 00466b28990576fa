"""Big-V fused-joint structural probe (VERDICT r3 item 2 follow-up).

The r4 chunked re-check killed the recompute-tax theory: cutting backward
chunks 63 -> 6 did not move the time. Structural hypothesis instead: at
B=32,T=150,L=20,V=32000,H=1024 the job is MXU-bound, and the fused path
runs FOUR joint-sized matmuls (forward logits, backward logits recompute,
dh, dW) where the unfused runs THREE plus big-tensor traffic — a 4/3
handicap no tuning can close.

Probes:
1. WTT_FUSED_MM_ONLY=1 bench at the shape — the fused kernel's measured
   matmul envelope. If it lands near 4/3 of the unfused-minus-traffic
   time, the hypothesis is confirmed.
2. The UNFUSED bf16 HTTP 500 repro with full stderr captured, plus a
   bisect over B to find where the remote compiler starts failing.
"""
import os
import subprocess
import sys

PY = sys.executable
BASE = dict(os.environ, JAX_COMPILATION_CACHE_DIR="/tmp/jax_comp_cache")

# 1. mm-only envelope at the big-V shape (bf16 + f32)
for dt in ("bf16", "f32"):
    env = dict(BASE, WTT_FUSED_MM_ONLY="1")
    r = subprocess.run(
        [PY, "/root/repo/bench.py", "32", "150", "20", "32000",
         "--fused", "--joint-dim", "1024", "--dtype", dt],
        env=env, capture_output=True, text=True, timeout=2400)
    rows = [l for l in r.stdout.splitlines() if l.startswith("{")]
    print(f"MM_ONLY bigV {dt}:",
          rows[-1] if rows else f"FAILED rc={r.returncode}: {r.stderr[-300:]}",
          flush=True)

# 2. unfused bf16 compile-crash repro (smallest-first bisect over B)
REPRO = r"""
import sys, numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from warp_transducer_tpu.ops.rnnt import rnnt_loss
B = int(sys.argv[1]); T, U, V, H = 150, 21, 32000, 1024
ks = jax.random.split(jax.random.PRNGKey(0), 4)
dt = jnp.bfloat16
e = jax.jit(lambda k: (jax.random.uniform(k, (B, T, H)) - 0.5).astype(dt))(ks[0])
p = jax.jit(lambda k: (jax.random.uniform(k, (B, U, H)) - 0.5).astype(dt))(ks[1])
W = jax.jit(lambda k: ((jax.random.uniform(k, (H, V)) - 0.5) / np.sqrt(H)).astype(dt))(ks[2])
bias = jax.jit(lambda k: (jax.random.uniform(k, (V,)) * 0.1).astype(dt))(ks[3])
rng = np.random.RandomState(0)
labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
il = jnp.full((B,), T, jnp.int32); ll = jnp.full((B,), U - 1, jnp.int32)
def unfused(e, p, W, bias):
    acts = jnp.tanh(e[:, :, None, :] + p[:, None, :, :]) @ W + bias
    return rnnt_loss(acts, labels, il, ll, reduction="sum")
v, g = jax.jit(jax.value_and_grad(unfused, argnums=(0, 1, 2, 3)))(e, p, W, bias)
jax.block_until_ready(v)
print("UNFUSED bf16 B=%d COMPILED+RAN ok" % B, flush=True)
"""
for B in (4, 16, 32):
    r = subprocess.run([PY, "-c", REPRO, str(B)], env=dict(BASE),
                       capture_output=True, text=True, timeout=2400)
    if r.returncode == 0:
        print(r.stdout.strip().splitlines()[-1], flush=True)
    else:
        tail = (r.stderr or r.stdout).strip().splitlines()[-12:]
        print(f"UNFUSED bf16 B={B} FAILED rc={r.returncode}:", flush=True)
        for ln in tail:
            print("   " + ln, flush=True)

# 3. unfused bf16 TIMING (r5: the compile crash is gone — the two-pass
# prep formulation it wedged on was replaced by prep.onepass_stats).
# Measured r5: 152.3 ms — the new best at this shape (unfused f32 176.1,
# fused bf16 192.9, fused mm-only envelope 155.9).
TIME_UNFUSED = r"""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from bench import slope_time_ms
from warp_transducer_tpu import rnnt_loss
B,T,U,V,H = 32,150,21,32000,1024
ks = jax.random.split(jax.random.PRNGKey(0), 4)
dt = jnp.bfloat16
e = jax.jit(lambda k: (jax.random.uniform(k,(B,T,H))-0.5).astype(dt))(ks[0])
p = jax.jit(lambda k: (jax.random.uniform(k,(B,U,H))-0.5).astype(dt))(ks[1])
W = jax.jit(lambda k: ((jax.random.uniform(k,(H,V))-0.5)/np.sqrt(H)).astype(dt))(ks[2])
bias = jax.jit(lambda k: (jax.random.uniform(k,(V,))*0.1).astype(dt))(ks[3])
rng = np.random.RandomState(0)
labels = jnp.asarray(rng.randint(1,V,(B,U-1)), jnp.int32)
il = jnp.full((B,),T,jnp.int32); ll = jnp.full((B,),U-1,jnp.int32)
def unfused(e,p,W,bias):
    acts = jnp.tanh(e[:,:,None,:] + p[:,None,:,:]) @ W + bias
    return rnnt_loss(acts, labels, il, ll, reduction="sum")
lg = jax.value_and_grad(unfused, argnums=(0,1,2,3))
@jax.jit
def run(e,p,W,bias,n):
    def body(i,c):
        eps = (1.0 + c*1e-30).astype(e.dtype)
        loss,(de,dp,dW,db) = lg(e*eps,p,W,bias)
        return (loss.astype(jnp.float32)*1e-12 + de[0,0,0].astype(jnp.float32)*1e-12
                + dp[0,0,0].astype(jnp.float32)*1e-12 + dW[0,0].astype(jnp.float32)*1e-12
                + db[0].astype(jnp.float32)*1e-12)
    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
ms = slope_time_ms(lambda n: run(e,p,W,bias,n), n_cap=32)
print('{"metric": "unfused dense bf16 joint+loss+grad ms, B=32,T=150,L=20,V=32000,H=1024", "value": %.3f, "unit": "ms", "vs_baseline": null}' % ms)
"""
r = subprocess.run([PY, "-c", TIME_UNFUSED], env=dict(BASE),
                   capture_output=True, text=True, timeout=2400)
rows = [l for l in r.stdout.splitlines() if l.startswith("{")]
print("UNFUSED bf16 timing:",
      rows[-1] if rows else f"FAILED rc={r.returncode}: {r.stderr[-300:]}",
      flush=True)
