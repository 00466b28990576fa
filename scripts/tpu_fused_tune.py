"""Sweep fused-joint kernel knobs (each config in a subprocess)."""
import itertools
import os
import subprocess
import sys

CONFIGS = [
    {},  # default: VTILE=512, MINROWS=256
    {"WTT_FUSED_VTILE": "1024"},
    {"WTT_FUSED_MINROWS": "512"},
    {"WTT_FUSED_VTILE": "1024", "WTT_FUSED_MINROWS": "512"},
    {"WTT_FUSED_VTILE": "2560"},
]

for cfg in CONFIGS:
    env = dict(os.environ)
    env.update(cfg)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
    r = subprocess.run(
        [sys.executable, "/root/repo/bench.py", "64", "150", "20", "5000",
         "--fused", "--dtype", "bf16"],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    line = [l for l in r.stdout.splitlines() if l.startswith("{")]
    print(cfg or "default", "->", line[-1] if line else f"FAILED rc={r.returncode}: {r.stderr[-200:]}", flush=True)
