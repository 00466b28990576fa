"""Round-3 follow-up experiment queue (runs serially after tpu_roundup).

Targets the round-3 verdict's open perf items, in value order:
  1. chunked-fused re-check     — validates the 48 MB VMEM budget change
                                  (63 -> ~6 backward chunks at H=1024)
  2. fused tiles A/B            — MXU-utilisation sweep toward the ~12.8 ms
                                  pure-matmul floor (verdict item 5)
  3. band profile B=128         — stage breakdown of the 15.4 ms pruned
                                  north-star (verdict item 2, target ~10)
  4. long-T dense pipeline      — stage bracketing of the 68 ms
                                  B=64,T=1500 dense row (verdict item 4)
  5. variants unroll A/B        — WTT_VARIANT_UNROLL at the T=150 headline
                                  (verdict item 1 polish: mb 1.64 -> <=1.5)
  6. variants stage profile     — where mb/TDT headline time goes

Usage: python scripts/tpu_followup_r03.py [--from N] [--only N[,M...]]
"""
import argparse
import os
import subprocess
import sys
import time

REPO = "/root/repo"
LOG = "/tmp/tpu_followup_r03.log"
PY = sys.executable

ITEMS = [
    ("tunnel probe",
     [PY, "-c", "import jax; print(jax.devices())"], {}, 180),
    ("chunked-fused re-check (48MB budget)",
     [PY, "scripts/tpu_fused_chunked_check.py"], {}, 3600),
    ("fused tiles A/B",
     [PY, "scripts/tpu_fused_tiles_ab.py"], {}, 7200),
    ("band profile B=128",
     [PY, "scripts/tpu_band_profile.py"], {}, 3600),
    ("long-T dense pipeline profile",
     [PY, "scripts/profile_pipeline.py", "64", "1500", "300", "50",
      "--impl", "pallas"], {}, 3600),
    ("variants headline unroll=auto",
     [PY, "bench.py", "128", "150", "40", "28", "--variants"], {}, 3600),
    ("variants headline unroll=4",
     [PY, "bench.py", "128", "150", "40", "28", "--variants"],
     {"WTT_VARIANT_UNROLL": "4"}, 3600),
    ("variants headline unroll=8",
     [PY, "bench.py", "128", "150", "40", "28", "--variants"],
     {"WTT_VARIANT_UNROLL": "8"}, 3600),
    ("variants stage profile",
     [PY, "scripts/profile_variants.py", "128", "150", "40", "28"], {}, 3600),
]


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from", dest="start", type=int, default=1)
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()
    only = set(int(x) for x in args.only.split(",")) if args.only else None

    base = dict(os.environ)
    base.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
    base.pop("JAX_PLATFORMS", None)

    for i, (name, cmd, extra_env, tmo) in enumerate(ITEMS, start=1):
        if i < args.start or (only is not None and i not in only):
            continue
        env = dict(base, **extra_env)
        log(f"=== item {i}: {name} :: {' '.join(cmd)}")
        t0 = time.time()
        try:
            r = subprocess.run(cmd, cwd=REPO, env=env, timeout=tmo,
                               capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            log(f"item {i} TIMEOUT after {tmo}s")
            if i == 1:
                log("tunnel down — aborting")
                return 1
            continue
        dt = time.time() - t0
        with open(f"/tmp/tpu_followup_item{i:02d}.log", "w") as f:
            f.write(r.stdout + "\n--- stderr ---\n" + r.stderr)
        tail = "\n".join((r.stdout + r.stderr).splitlines()[-12:])
        log(f"item {i} exit={r.returncode} in {dt:.0f}s\n{tail}")
        if i == 1 and r.returncode != 0:
            log("tunnel down — aborting")
            return 1
    log("follow-up complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
