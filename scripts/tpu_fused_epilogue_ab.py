"""A/B the round-4 fused-joint epilogue knobs on TPU.

Arms: MXU lane-sum (WTT_FUSED_MXU_SUM) x log-coef exp-fold
(WTT_FUSED_LOGCOEF) at the headline fused shape, bf16 first (the target:
<= 13.5 ms per VERDICT r3 item 3). Each arm is a subprocess because the
knobs are module-import constants. Parity on-hardware is checked once for
the fully-enabled arm before any timing (a fast wrong kernel is worthless).
"""
import os
import subprocess
import sys

PY = sys.executable
BASE = dict(os.environ, JAX_COMPILATION_CACHE_DIR="/tmp/jax_comp_cache")

# 1. parity of the fully-enabled arm vs the unfused reference on hardware
env = dict(BASE, WTT_FUSED_MXU_SUM="1", WTT_FUSED_LOGCOEF="1")
r = subprocess.run(
    [PY, "-c", """
import sys, numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from warp_transducer_tpu.ops.fused_joint import rnnt_loss_fused_joint
from warp_transducer_tpu.ops.rnnt import rnnt_loss
rng = np.random.RandomState(0)
B,T,U,V,H = 4, 30, 8, 5000, 256
ks = jax.random.split(jax.random.PRNGKey(0), 4)
e = jax.jit(lambda k: (jax.random.uniform(k,(B,T,H))-0.5))(ks[0])
p = jax.jit(lambda k: (jax.random.uniform(k,(B,U,H))-0.5))(ks[1])
W = jax.jit(lambda k: (jax.random.uniform(k,(H,V))-0.5)/np.sqrt(H))(ks[2])
bias = jax.jit(lambda k: jax.random.uniform(k,(V,))*0.1)(ks[3])
labels = jnp.asarray(rng.randint(1,V,(B,U-1)), jnp.int32)
il = jnp.full((B,), T, jnp.int32); ll = jnp.full((B,), U-1, jnp.int32)
f = lambda e,p,W,b: rnnt_loss_fused_joint(e,p,W,b,labels,il,ll,reduction="sum")
g = lambda e,p,W,b: rnnt_loss(jnp.tanh(e[:,:,None,:]+p[:,None,:,:])@W+b, labels, il, ll, reduction="sum")
vf, gf = jax.jit(jax.value_and_grad(f, argnums=(0,1,2,3)))(e,p,W,bias)
vr, gr = jax.jit(jax.value_and_grad(g, argnums=(0,1,2,3)))(e,p,W,bias)
np.testing.assert_allclose(float(vf), float(vr), rtol=1e-4)
for name,a,b in zip(("de","dp","dW","db"), gf, gr):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3, err_msg=name)
print("parity OK (mxu_sum=1 logcoef=1) B=%d T=%d U=%d V=%d H=%d" % (B,T,U,V,H))
"""],
    env=env, capture_output=True, text=True, timeout=1800)
print(r.stdout.strip() or f"PARITY FAILED rc={r.returncode}: {r.stderr[-600:]}",
      flush=True)
if r.returncode != 0:
    sys.exit(1)

for dtype in ("bf16", "f32"):
    for ms, lc in (("0", "0"), ("1", "0"), ("0", "1"), ("1", "1")):
        env = dict(BASE, WTT_FUSED_MXU_SUM=ms, WTT_FUSED_LOGCOEF=lc)
        r = subprocess.run(
            [PY, "/root/repo/bench.py", "64", "150", "20", "5000",
             "--fused", "--dtype", dtype],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        print(f"mxu_sum={ms} logcoef={lc} {dtype} ->",
              line[-1] if line else f"FAILED rc={r.returncode}: "
                                    f"{r.stderr[-300:]}", flush=True)
