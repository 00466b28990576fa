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
    # The gate is COMPILE-bound (cost spread over ~80 jit-heavy tests, no
    # dominator — see CLAUDE.md), so a persistent compilation cache is the
    # single biggest wall-time lever for repeat runs on the same box.
    # Cache entries key on the full HLO + device topology, so the 8-virtual-
    # device programs and plain single-device ones coexist safely.
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("WTT_TEST_COMP_CACHE",
                                     "/tmp/wtt_test_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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

# Measured slowest tests (pytest --durations, r4, 8-vCPU box). Under xdist's
# dynamic load scheduler a 3-5 min test that starts LAST extends the gate by
# its full duration; fronting the heavy families cuts the straggler tail.
_HEAVY_FIRST = (
    "test_graft_entry_multichip",          # 291s
    "test_gradients_match_single_device",  # 169s
    "test_two_process_distributed",        # 157s
    "test_tdt_beam_score_sandwich_and_order",  # 142s
    "test_simple_pruned_fused_match_dense",    # 135s
    "test_model_train_and_decode",         # 117s
    "test_lattice_parity",                 # 107s (mb + tdt window kernels)
    "test_loss_and_grad_parity",           # 101s
    "test_graft_entry_single_chip",        # 97s
    "test_merged_score_bounds",            # 97s
    "test_costs_match_single_device",      # 92s
    "test_vs_oracle",                      # 91s (tdt)
    "test_fused_pallas_chunked_matches_xla",  # 89s
    "test_matches_unfused_with_all_grads",    # 83s
    "test_model_fused_train_step",         # 83s
)


def _heavy_rank(item):
    name = item.name.split("[", 1)[0]
    try:
        return _HEAVY_FIRST.index(name)
    except ValueError:
        return len(_HEAVY_FIRST)


def pytest_collection_modifyitems(config, items):
    items.sort(key=_heavy_rank)  # stable: non-heavy keep collection order
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
