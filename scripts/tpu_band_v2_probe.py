"""Isolate the band-pipeline v2 backward: XLA glue vs the grad kernel.

Stages (whole-jit, slope-timed):
  fwd            — pruned_forward (prep kernel + stream)          [baseline]
  fwd+coefs      — + _band_coefs on (B,T,S) fields (incl. panel transposes)
  fwd+fields     — + the lane-packed (B,T_pad,5*S_pad) carrier build
  fwd+grad       — + the grad kernel (= full backward)
Differences between consecutive rows isolate each piece.
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
lab_band, has_lab = PR._band_labels(labels, ranges, S)
S_pad, SV, Tc, T_pad = BP._geometry(B, T, S, V)
print(f"# v2 backward probe B={B} T={T} Tc={Tc}", flush=True)

NEG = BP.NEG
scale = jnp.ones((B,), jnp.float32)


def _coefs(res):
    alphas = jnp.transpose(res["alpha_p"], (2, 0, 1))[:B, :T, :S]
    betas = jnp.transpose(res["beta_p"], (2, 0, 1))[:B, :T, :S]

    class _Lat:
        pass

    lat = _Lat()
    lat.alphas, lat.betas, lat.ll_forward = alphas, betas, res["llf"][0, :B]
    return PR._band_coefs(res["lpb"], res["lpe"], lat, res["ranges"],
                          res["has_lab"], il, ll, scale, 0.0)


def _fields(res):
    coef, cb, ce, valid = _coefs(res)
    den = jnp.where(valid, res["den"], NEG)
    lab = jnp.where(valid, res["lab_lane"].astype(jnp.float32), -1.0)
    pad = lambda x, cval: jnp.pad(
        x.astype(jnp.float32),
        ((0, 0), (0, T_pad - T), (0, S_pad - S)), constant_values=cval)
    return jnp.concatenate(
        [pad(den, NEG), pad(coef, 0.0), pad(cb, 0.0), pad(ce, 0.0),
         pad(lab, -1.0)], axis=2)


def fwd(a):
    llf, res = BP.pruned_forward(a, lab_band, has_lab, ranges, il, ll,
                                 0, False)
    return llf


def fwd_coefs(a):
    llf, res = BP.pruned_forward(a, lab_band, has_lab, ranges, il, ll,
                                 0, False)
    return llf, _coefs(res)[:3]


def fwd_fields(a):
    llf, res = BP.pruned_forward(a, lab_band, has_lab, ranges, il, ll,
                                 0, False)
    return llf, _fields(res)


def fwd_grad(a):
    llf, res = BP.pruned_forward(a, lab_band, has_lab, ranges, il, ll,
                                 0, False)
    g = BP.pruned_backward(a, res, scale, 0, False)
    return llf, g


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
    print(f"{name:14s} {ms:8.3f} ms", flush=True)


timed("fwd", fwd)
timed("fwd+coefs", fwd_coefs)
timed("fwd+fields", fwd_fields)
timed("fwd+grad", fwd_grad)
