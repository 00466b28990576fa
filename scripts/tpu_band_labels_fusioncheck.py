"""ADVICE r4 low #2 guard: assert XLA still fuses _band_labels' one-hot.

``pruned._band_labels`` builds a (B, T, S, U-1) one-hot intermediate and
sums it away; at the production shape (B=128, T=1500, S=5, U=301) that is
~290M elements which MUST stay inside one fusion (never materialised) —
a silent XLA regression would cost ~1.1 GB of temp and a memory cliff.

Compiles the extraction alone at the production shape and asserts the
temp allocation stays far below the unfused one-hot's footprint.
"""
import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from warp_transducer_tpu.ops import pruned as PR  # noqa: E402

B, T, S, U = 128, 1500, 5, 301
rng = np.random.RandomState(0)
labels = jnp.asarray(rng.randint(1, 40, (B, U - 1)), jnp.int32)
ranges = jnp.asarray(
    np.minimum(np.sort(rng.randint(0, U - S + 1, (B, T)), axis=1), U - S),
    jnp.int32)

c = (jax.jit(functools.partial(PR._band_labels, S=S))
     .lower(labels, ranges).compile())
ma = c.memory_analysis()
temp_gb = ma.temp_size_in_bytes / 1e9
print(f"band_labels temp={temp_gb:.3f} GB "
      f"out={ma.output_size_in_bytes / 1e9:.3f} GB")
# Output is (B,T,S) int32+bool ≈ 4.7 MB; an unfused one-hot would be >1 GB.
assert temp_gb < 0.2, f"one-hot fusion regressed: temp {temp_gb:.2f} GB"
print("band-labels fusion OK (one-hot stays inside the fusion)")
