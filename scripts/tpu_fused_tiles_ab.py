"""A/B the fused-joint MXU tile knobs on hardware.

The label-path refactor showed the VPU epilogue is NOT the gap to the
~12.8 ms pure-matmul floor at B=64,T=150,L=20,V=5000,H=256 (removing 5
full passes moved bf16 by 0.06 ms) — so the remaining lever is MXU
utilisation: bigger row blocks (WTT_FUSED_MINROWS) and/or wider V tiles
(WTT_FUSED_VTILE) mean fewer, larger matmuls. Each variant runs in a
subprocess (the knobs are module globals read at import).
"""
import itertools
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    # (vtile, minrows)
    (512, 512),    # current default
    (1024, 512),
    (512, 1024),
    (1024, 1024),
    (2048, 512),
]


def main():
    for dtype in ("bf16", "f32"):
        for vt, mr in CONFIGS:
            env = dict(os.environ, WTT_FUSED_VTILE=str(vt),
                       WTT_FUSED_MINROWS=str(mr),
                       JAX_COMPILATION_CACHE_DIR="/tmp/jax_comp_cache")
            r = subprocess.run(
                [sys.executable, "bench.py", "64", "150", "20", "5000",
                 "--fused", "--dtype", dtype],
                cwd=REPO, env=env, capture_output=True, text=True,
                timeout=1800)
            rows = [l for l in r.stdout.splitlines() if l.startswith("{")]
            print(f"vtile={vt} minrows={mr} {dtype}: "
                  f"{rows[-1] if rows else 'FAILED rc=' + str(r.returncode)}",
                  flush=True)
            if not rows:
                tail = (r.stdout + r.stderr).splitlines()[-4:]
                print("   " + " | ".join(tail), flush=True)


if __name__ == "__main__":
    main()
