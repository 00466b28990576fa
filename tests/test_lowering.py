"""Mosaic lowering regression test.

Interpreter mode accepts kernel code that the real pallas->Mosaic TPU
lowering rejects (e.g. basic indexing with a None after a transpose emits
lax.gather, which Mosaic cannot lower — the panels gradient kernel bug).
``jax.export.export(..., platforms=["tpu"])`` runs that lowering on the
client with no TPU attached, so CPU CI can catch the whole class.

Runs ``scripts/lower_check.py`` in a subprocess: the script patches
``jax.default_backend`` to steer the library's interpret-mode defaults,
which must not leak into this process.
"""
import os
import subprocess
import sys

_SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                       "lower_check.py")


def test_all_pallas_paths_lower_for_tpu():
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    proc = subprocess.run(
        [sys.executable, _SCRIPT], env=env, capture_output=True, text=True,
        timeout=880,
    )
    assert proc.returncode == 0, (
        f"Mosaic lowering check failed:\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-2000:]}"
    )
    assert "ALL LOWERINGS OK" in proc.stdout
