#!/bin/bash
# Round-4 serial TPU queue (ONE client at a time through the axon tunnel):
#   1. mm-only envelope probe of the fused joint kernels (bf16 + f32):
#      same grid/DMA/matmuls, no VPU epilogue -> the measured floor for
#      VERDICT r3 item 3's MXU-vs-VPU breakdown.
#   2. V-chunked fused re-check at the 48 MB VMEM budget (verdict item 2;
#      the r03 roundup measured the OLD 16 MB budget = 63 backward chunks).
#   3. Band panels profile at B=128 (verdict item 4).
#   4. Variants unroll A/B + stage profile at the T=150 headline (item 7).
#   5. Long-T dense stage bracketing (item 8).
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_comp_cache
PY=$(command -v python)

echo "=== 1. mm-only envelope probe"
for dt in bf16 f32; do
  WTT_FUSED_MM_ONLY=1 timeout 1800 $PY bench.py 64 150 20 5000 --fused --dtype $dt 2>/dev/null \
    | sed "s/^/MM_ONLY $dt /"
done

echo "=== 2. chunked fused re-check (48MB budget)"
timeout 3600 $PY scripts/tpu_fused_chunked_check.py

echo "=== 3. band profile B=128"
timeout 3600 $PY scripts/tpu_band_profile.py

echo "=== 4. variants unroll A/B"
for u in 0 4 8; do
  WTT_VARIANT_UNROLL=$u timeout 3600 $PY bench.py 128 150 40 28 --variants 2>/dev/null \
    | sed "s/^/UNROLL=$u /"
done
timeout 3600 $PY scripts/profile_variants.py 128 150 40 28

echo "=== 5. long-T dense pipeline profile"
timeout 3600 $PY scripts/profile_pipeline.py 64 1500 300 50 --impl pallas
echo "=== session done"
