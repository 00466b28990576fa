"""Test harness configuration.

Tests always run on CPU with 8 virtual devices so the multi-chip sharding
paths can be exercised without TPU hardware (the driver separately
dry-run-compiles the multi-chip path; see ``__graft_entry__.py``).

NOTE: this environment registers an ``axon`` TPU PJRT plugin from
``sitecustomize`` at interpreter start; we must both point JAX_PLATFORMS at
cpu *and* update the already-imported jax config, since sitecustomize may
have imported jax before pytest loads this file.
"""
import os
import sys

# WTT_TEST_TPU=1 runs the suite against the real chip (scripts/tpu_roundup.py
# item 2): the Pallas kernels leave interpreter mode. fp64-parametrised tests
# are auto-skipped there (no f64 on TPU) — see pytest_collection_modifyitems.
_TPU_MODE = os.environ.get("WTT_TEST_TPU") == "1"

if not _TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            "--xla_force_host_platform_device_count=8 "
            + os.environ.get("XLA_FLAGS", "")
        )

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax  # noqa: E402

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)  # fp64 paths; code is dtype-explicit

import pytest  # noqa: E402


@pytest.fixture(params=["xla", "pallas"])
def implementation(request):
    """Run engine-parametrised tests against both lattice engines.

    The Pallas kernel runs in interpreter mode on CPU (slow but exact), so
    it is skipped for large problem sizes via the ``pallas_slow`` marker.
    """
    return request.param


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "pallas_slow: skip under the pallas interpreter on CPU"
    )
    config.addinivalue_line(
        "markers",
        "tpu_fp64: fp64-on-accelerator check; exempt from the TPU fp64 skip",
    )
    config.addinivalue_line(
        "markers",
        "full_suite: heavyweight redundant-coverage test; runs only with "
        "WTT_FULL_SUITE=1 (the default gate keeps one representative per "
        "family — see CLAUDE.md)",
    )


_FULL_SUITE = os.environ.get("WTT_FULL_SUITE") == "1"


def pytest_collection_modifyitems(config, items):
    for item in items:
        if "full_suite" in item.keywords and not _FULL_SUITE:
            item.add_marker(pytest.mark.skip(
                reason="full-matrix test; set WTT_FULL_SUITE=1"))
            continue
        if (_TPU_MODE and "tpu_fp64" not in item.keywords and any(
                tag in item.nodeid for tag in ("float64", "fp64", "f64"))):
            # fp64-parametrised CPU tests assume native doubles; on TPU the
            # supported fp64 story is the XLA engine's emulation, covered by
            # the dedicated @tpu_fp64 test below.
            item.add_marker(pytest.mark.skip(reason="no native fp64 on TPU"))
            continue
        if _TPU_MODE or "pallas_slow" not in item.keywords:
            continue  # pallas runs natively on TPU — no interpreter skip
        callspec = getattr(item, "callspec", None)
        if callspec is not None and callspec.params.get("implementation") == "pallas":
            item.add_marker(pytest.mark.skip(reason="pallas interpreter too slow on CPU"))
