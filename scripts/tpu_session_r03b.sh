#!/bin/bash
# Serial TPU queue for the round-3 continuation session.
# ONE TPU client at a time (axon tunnel rule) — run this alone.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_comp_cache
unset JAX_PLATFORMS
LOG=/tmp/tpu_session_r03b.log
run() {
  echo "=== [$(date +%H:%M:%S)] $*" | tee -a $LOG
  timeout 2400 "$@" >>$LOG 2>&1
  echo "--- exit $? [$(date +%H:%M:%S)]" | tee -a $LOG
}
run python -c "import jax; print(jax.devices())"
# 1. validate pruned-fused materialisation (c926393): expect ~25 ms (was 66)
run python bench.py 128 1500 300 50 --pruned-fused
# 2. band profile: stage breakdown of the pruned north-star (12.3 ms, target 10)
run python scripts/tpu_band_profile.py
# 3. long-T dense pipeline: the 68 ms B=64,T=1500 row (verdict item 4)
run python scripts/profile_pipeline.py 64 1500 300 50 --impl pallas
# 4. chunked-fused re-check: validates 48 MB VMEM budget (0cdf284)
run python scripts/tpu_fused_chunked_check.py
# 5. TPU pytest smoke (was exit 1 at the roundup; tolerance fix 5d819d1 since)
run python -m pytest tests/test_golden.py tests/test_prep_fused.py \
  tests/test_stream_kernel.py tests/test_fused_joint.py tests/test_pruned.py \
  tests/test_pruned_fused.py -x -q --no-header
# 6. variants unroll A/B at the headline
run python bench.py 128 150 40 28 --variants
run env WTT_VARIANT_UNROLL=4 python bench.py 128 150 40 28 --variants
run env WTT_VARIANT_UNROLL=8 python bench.py 128 150 40 28 --variants
echo "ALL DONE" | tee -a $LOG
