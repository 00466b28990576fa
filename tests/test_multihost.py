"""Two-process multi-host test: real ``jax.distributed`` bring-up on CPU.

The single-process suite (test_sharding.py) exercises sharding semantics on
8 virtual devices; this test makes the multi-host claim real by launching
TWO OS processes that rendezvous through ``jax.distributed.initialize``
(exercising ``parallel.sharding.initialize_distributed``), build one global
mesh spanning both processes (2 local CPU devices each), compute the
data-parallel loss + gradient on globally-sharded arrays, and assert the
result equals the single-process computation.

Skipped (not failed) when the sandbox cannot fork/bind localhost sockets;
any numeric mismatch after successful bring-up IS a failure.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys
pid, port, outpath = int(sys.argv[1]), sys.argv[2], sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, sys.argv[4])

import jax

# this environment pre-imports jax and pins the platform before user code
# runs; the config update (not the env var) is what actually takes effect
jax.config.update("jax_platforms", "cpu")
# share the gate's persistent compile cache: these workers recompile the
# same distributed programs every run otherwise (~2 min of the gate)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("WTT_TEST_COMP_CACHE",
                                 "/tmp/wtt_test_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from warp_transducer_tpu.parallel.sharding import (
    data_parallel_rnnt_loss, initialize_distributed, make_mesh,
)

initialize_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid,
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

# identical global problem on both processes (seeded)
rng = np.random.RandomState(0)
B, T, U, V = 8, 6, 4, 5
acts = rng.randn(B, T, U, V).astype(np.float32)
labels = rng.randint(1, V, (B, U - 1)).astype(np.int32)
il = np.full((B,), T, np.int32)
ll = np.full((B,), U - 1, np.int32)

mesh = make_mesh()  # all 4 global devices, data axis


def mk(x, spec):
    s = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])


ga = mk(acts, P("data", None, None, None))
gl = mk(labels, P("data", None))
gil = mk(il, P("data"))
gll = mk(ll, P("data"))

loss = data_parallel_rnnt_loss(ga, gl, gil, gll, mesh, reduction="sum",
                               implementation="xla")
grad = jax.grad(
    lambda a: data_parallel_rnnt_loss(a, gl, gil, gll, mesh, reduction="sum",
                                      implementation="xla")
)(ga)
gsum = jax.jit(lambda g: jnp.sum(jnp.abs(g)))(grad)

if pid == 0:
    with open(outpath, "w") as f:
        json.dump({"loss": float(loss), "grad_abs_sum": float(gsum)}, f)
jax.distributed.shutdown()
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    port = _free_port()
    out = tmp_path / "result.json"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), str(port), str(out), _REPO],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            o, e = p.communicate(timeout=420)
            outs.append((p.returncode, o, e))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("two-process rendezvous timed out in this sandbox")

    if any(rc != 0 for rc, _, _ in outs):
        msgs = "\n".join(e[-2000:] for _, _, e in outs)
        # bring-up failures (no sockets, no fork) are environmental: skip;
        # but a worker that got far enough to write results and then a
        # peer died is a real failure.
        if not out.exists():
            pytest.skip(f"jax.distributed bring-up failed:\n{msgs}")
        pytest.fail(f"worker died after distributed init:\n{msgs}")

    result = json.loads(out.read_text())

    # single-process reference
    import jax
    import jax.numpy as jnp

    from warp_transducer_tpu import rnnt_loss

    rng = np.random.RandomState(0)
    B, T, U, V = 8, 6, 4, 5
    acts = jnp.asarray(rng.randn(B, T, U, V), jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, (B, U - 1)), jnp.int32)
    il = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), U - 1, jnp.int32)
    ref = rnnt_loss(acts, labels, il, ll, reduction="sum", implementation="xla")
    gref = jax.grad(
        lambda a: rnnt_loss(a, labels, il, ll, reduction="sum",
                            implementation="xla")
    )(acts)
    np.testing.assert_allclose(result["loss"], float(ref), rtol=1e-5)
    np.testing.assert_allclose(
        result["grad_abs_sum"], float(jnp.sum(jnp.abs(gref))), rtol=1e-4
    )
