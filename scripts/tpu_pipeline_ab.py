"""A/B the software-pipelined fused prep (WTT_FUSED_PIPELINE) on TPU.

Each arm runs bench.py --fused in a subprocess because the knob is read at
module import. Headline fused shape, bf16 and f32.
"""
import os
import subprocess
import sys

for dtype in ("bf16", "f32"):
    for pipe in ("0", "1"):
        env = dict(os.environ, WTT_FUSED_PIPELINE=pipe)
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
        r = subprocess.run(
            [sys.executable, "/root/repo/bench.py", "64", "150", "20",
             "5000", "--fused", "--dtype", dtype],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        print(f"pipeline={pipe} {dtype} ->",
              line[-1] if line else f"FAILED rc={r.returncode}: "
                                    f"{r.stderr[-300:]}", flush=True)
