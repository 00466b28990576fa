"""TPU parity check for the duration-arc loss families (multi-blank, TDT).

Checks BOTH lattice engines (the XLA t-major scan and the streamed
pending-window Pallas kernel, ``pallas/window_stream.py``) against the
float64 NumPy oracles at f32 tolerances, plus slope timings at the
headline shape via bench.py --variants.

Run through the axon tunnel — serialized (one TPU client at a time).
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warp_transducer_tpu import rnnt_loss_multiblank, rnnt_loss_tdt
from warp_transducer_tpu.utils import numpy_oracle_multiblank as omb
from warp_transducer_tpu.utils import numpy_oracle_tdt as otdt


def check_multiblank(impl="xla"):
    rng = np.random.default_rng(0)
    B, T, U, V, durs = 4, 40, 8, 64, (2, 4)
    acts = (rng.standard_normal((B, T, U, V)) * 2).astype(np.float32)
    labels = rng.integers(1, V - 2, size=(B, U - 1)).astype(np.int32)
    il = np.array([40, 31, 40, 17], np.int32)
    ll = np.array([7, 5, 7, 2], np.int32)
    oc, og = omb.multiblank_batch(acts, labels, il, ll, durs, sigma=0.05,
                                  fastemit_lambda=0.1)

    @jax.jit
    def f(a):
        return jax.value_and_grad(lambda x: jnp.sum(rnnt_loss_multiblank(
            x, jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll), durs,
            sigma=0.05, fastemit_lambda=0.1, reduction="none",
            implementation=impl)))(a)

    c_sum, g = f(jnp.asarray(acts))
    dc = abs(float(c_sum) - oc.sum()) / abs(oc.sum())
    dg = np.max(np.abs(np.asarray(g) - og))
    print(f"multiblank TPU parity [{impl}]: rel cost diff {dc:.2e}, "
          f"max grad diff {dg:.2e}")
    assert dc < 1e-4 and dg < 1e-3, (impl, dc, dg)


def check_tdt(impl="xla"):
    rng = np.random.default_rng(1)
    B, T, U, V, durs = 4, 40, 8, 64, (0, 1, 2, 4)
    tok = (rng.standard_normal((B, T, U, V)) * 2).astype(np.float32)
    dur = (rng.standard_normal((B, T, U, len(durs))) * 2).astype(np.float32)
    labels = rng.integers(1, V, size=(B, U - 1)).astype(np.int32)
    il = np.array([40, 31, 40, 17], np.int32)
    ll = np.array([7, 5, 7, 2], np.int32)
    oc, ogt, ogd = otdt.tdt_batch(tok, dur, labels, il, ll, durs, sigma=0.05)

    @jax.jit
    def f(t, d):
        return jax.value_and_grad(
            lambda a, b: jnp.sum(rnnt_loss_tdt(
                a, b, jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll),
                durs, sigma=0.05, reduction="none", implementation=impl)),
            argnums=(0, 1))(t, d)

    c_sum, (gt, gd) = f(jnp.asarray(tok), jnp.asarray(dur))
    dc = abs(float(c_sum) - oc.sum()) / abs(oc.sum())
    dgt = np.max(np.abs(np.asarray(gt) - ogt))
    dgd = np.max(np.abs(np.asarray(gd) - ogd))
    print(f"tdt TPU parity [{impl}]: rel cost diff {dc:.2e}, max grad diffs "
          f"tok {dgt:.2e} dur {dgd:.2e}")
    assert dc < 1e-4 and dgt < 1e-3 and dgd < 1e-3, (impl, dc, dgt, dgd)


if __name__ == "__main__":
    # NB: timings live in `bench.py --variants` as a SEPARATE roundup item
    # — never spawn a second TPU client from a process that holds one.
    print("devices:", jax.devices())
    for impl in ("xla", "pallas"):
        check_multiblank(impl)
        check_tdt(impl)
