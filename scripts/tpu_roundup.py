"""Serialized TPU round-up: run every pending hardware check in sequence.

The axon tunnel allows exactly ONE TPU client at a time (a second client
kills both), so each item runs as its own subprocess, strictly serially,
with a timeout. Output is teed to stdout and appended to
/tmp/tpu_roundup.log so a dropped session can see how far it got.

Items (in priority order):
  1. tunnel probe            — cheap jax.devices() check; abort early if down
  2. pytest tests/ on TPU    — the kernels leave interpreter mode (smoke set)
  3. tpu_band_panels_check   — all-panels pruned pipeline parity + timing
  4. tpu_band_prod           — pruned loss at the production jit boundary
  5. tpu_fused_chunked_check — V-chunked fused joint parity + timing
  6. tpu_pipeline_ab         — WTT_FUSED_PIPELINE A/B at the headline shape
  7. bench.py --all          — the full baseline sweep
  8. bench.py --extras       — factorised/pruned incl. the north-star config
  9. bench.py --fused        — fused joint headline rows (bf16 + f32)

Usage: python scripts/tpu_roundup.py [--from N] [--only N[,M...]]
                                     [--artifact PATH]

With --artifact, every item's exit status plus all machine-readable
output lines (the bench JSON rows and the parity "OK"/timing lines) are
collected into one JSON file — the committed, driver-reproducible record
the perf claims trace to.
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = "/root/repo"
LOG = "/tmp/tpu_roundup.log"
PY = sys.executable

ITEMS = [
    ("tunnel probe",
     [PY, "-c", "import jax; print(jax.devices())"], 180),
    ("pytest smoke on TPU",
     # NOTE: no -q here — pyproject addopts already has -q, and a second
     # one makes -qq which SUPPRESSES the "N passed" summary line (the
     # round-3 artifact recorded a 23-min run with zero usable lines).
     # -ra prints the skip reasons and the final pass/skip counts.
     [PY, "-m", "pytest", "tests/test_golden.py", "tests/test_prep_fused.py",
      "tests/test_stream_kernel.py", "tests/test_fused_joint.py",
      "tests/test_pruned.py", "-x", "-ra", "--no-header"], 3600),
    ("band panels check",
     [PY, "scripts/tpu_band_panels_check.py"], 3600),
    ("band production-boundary timing",
     [PY, "scripts/tpu_band_prod.py"], 3600),
    ("fused chunked check",
     [PY, "scripts/tpu_fused_chunked_check.py"], 3600),
    ("pipeline A/B",
     [PY, "scripts/tpu_pipeline_ab.py"], 7200),
    ("bench --all",
     [PY, "bench.py", "--all"], 7200),
    ("bench --extras",
     [PY, "bench.py", "--extras"], 7200),
    ("bench --fused bf16",
     [PY, "bench.py", "64", "150", "20", "5000", "--fused", "--dtype", "bf16"], 1800),
    ("bench --fused f32",
     [PY, "bench.py", "64", "150", "20", "5000", "--fused", "--dtype", "f32"], 1800),
    ("bench --pruned-fused north-star",
     [PY, "bench.py", "128", "1500", "300", "50", "--pruned-fused"], 1800),
    ("bench --pruned-fused big-vocab",
     [PY, "bench.py", "128", "1500", "300", "5000", "--pruned-fused",
      "--dtype", "bf16"], 3600),
    ("multiblank/TDT parity on TPU",
     [PY, "scripts/tpu_variants_check.py"], 3600),
    ("bench --variants headline",
     [PY, "bench.py", "128", "150", "40", "28", "--variants"], 3600),
    ("bench --tdt-fused big-vocab",
     [PY, "bench.py", "64", "150", "20", "5000", "--tdt-fused"], 3600),
    # r5 rows: long-T dense bf16 (auto keeps bf16 past T*U=64k) and the
    # long-T duration-arc variants after the one-pass prep.
    ("bench long-T dense bf16",
     [PY, "bench.py", "64", "1500", "300", "50", "--dtype", "bf16"], 1800),
    ("bench --variants long-T",
     [PY, "bench.py", "16", "1500", "300", "50", "--variants"], 3600),
    ("big-V structural probe (mm-only envelope + unfused-bf16 status)",
     [PY, "scripts/tpu_bigv_probe.py"], 3600),
    ("band-labels one-hot fusion guard (ADVICE r4 low #2)",
     [PY, "scripts/tpu_band_labels_fusioncheck.py"], 1800),
]


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


_KEEP = re.compile(
    r'^\{"metric"|^parity OK|^panels |^flat-entry |^banded-|^FUSED-CHUNKED'
    r'|^UNFUSED|^pipeline=|ms$|passed|failed', re.M)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from", dest="start", type=int, default=1)
    ap.add_argument("--only", type=str, default=None)
    ap.add_argument("--artifact", type=str, default=None)
    args = ap.parse_args()
    only = set(int(x) for x in args.only.split(",")) if args.only else None
    artifact = {"started": time.strftime("%Y-%m-%dT%H:%M:%S"),
                "git": subprocess.run(
                    ["git", "rev-parse", "HEAD"], cwd=REPO,
                    capture_output=True, text=True).stdout.strip(),
                "items": []}

    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
    # TPU tests: do NOT force the CPU platform conftest would pick via
    # pytest -p; tests read JAX_PLATFORMS, so clear any cpu pin.
    env.pop("JAX_PLATFORMS", None)

    for i, (name, cmd, tmo) in enumerate(ITEMS, start=1):
        if i < args.start or (only is not None and i not in only):
            continue
        # pytest must run on TPU here: conftest honors WTT_TEST_TPU=1.
        item_env = dict(env)
        if "pytest" in " ".join(cmd):
            item_env["WTT_TEST_TPU"] = "1"
        log(f"=== item {i}: {name} :: {' '.join(cmd)}")
        t0 = time.time()
        try:
            r = subprocess.run(cmd, cwd=REPO, env=item_env, timeout=tmo,
                               capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            log(f"item {i} TIMEOUT after {tmo}s")
            artifact["items"].append(
                {"item": i, "name": name, "exit": "timeout", "secs": tmo})
            if i == 1:
                log("tunnel down — aborting round-up")
                return 1
            continue
        dt = time.time() - t0
        with open(f"/tmp/tpu_roundup_item{i:02d}.log", "w") as f:
            f.write(r.stdout + "\n--- stderr ---\n" + r.stderr)
        tail = "\n".join((r.stdout + r.stderr).splitlines()[-15:])
        log(f"item {i} exit={r.returncode} in {dt:.0f}s "
            f"(full: /tmp/tpu_roundup_item{i:02d}.log)\n{tail}")
        lines = [ln for ln in (r.stdout + r.stderr).splitlines()
                 if _KEEP.search(ln)]
        rec = {"item": i, "name": name, "exit": r.returncode,
               "secs": round(dt), "lines": lines[:60]}
        if r.returncode != 0:
            # A failure with an empty "lines" is useless for diagnosis:
            # always persist the raw tails on nonzero exit.
            rec["stdout_tail"] = r.stdout.splitlines()[-40:]
            rec["stderr_tail"] = r.stderr.splitlines()[-40:]
        artifact["items"].append(rec)
        if args.artifact:  # write incrementally so a crash keeps progress
            with open(args.artifact, "w") as f:
                json.dump(artifact, f, indent=1)
        if i == 1 and r.returncode != 0:
            log("tunnel down — aborting round-up")
            return 1
    log("round-up complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
