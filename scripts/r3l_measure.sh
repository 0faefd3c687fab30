#!/bin/bash
# Round-3 TWELFTH pass — settle the ORT_MT_PRECISION=x3 default flip,
# finish the two ablations r3k lost to wedges, and record the nine-case
# matrix under x3.
#
# r3k evidence so far: baseline 16.54 ms (highest) vs 13.02 ms (x3),
# +22% Mrays (125.3 -> 159.3), checksum drift 3.2e-4 relative (inside
# the documented bf16_3x t-error bound).  cf_close's x3 sample timed
# out and mixed's ran 1520 ms in the same sweep where highest ran 494 —
# wedge-suspect, so the flip needs a paired confirm on the heavy cases.
set -x
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=4 BENCH_BUDGET=500 \
  timeout 600 python bench.py 2>&1 | tee /tmp/r3l_canary.log
canary_ms=$(grep -o '"ms_per_frame": [0-9.]*' /tmp/r3l_canary.log \
  | head -1 | awk '{print $2}')
if [ -z "$canary_ms" ] || awk "BEGIN{exit !($canary_ms > 80)}"; then
  echo "canary ${canary_ms:-none} ms — slice degraded, aborting"
  exit 1
fi

# 1. x3 paired A/B on every BVH case r3k did not settle (realistic/
#    full/moving exercise the 48M scoped-vmem fix under x3 too;
#    cf_close is the wedge-suspect retry; heavy prices 4spp).
for mp in highest x3; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=realistic,full,moving BENCH_FRAMES=8 \
    BENCH_BUDGET=1800 BENCH_TIMEOUT=800 ORT_MT_PRECISION=$mp \
    timeout 2000 python bench.py 2>&1 \
    | sed "s/^{/{\"mt\": \"$mp\", /" | tee -a /tmp/r3l_mt.log
done
for mp in highest x3; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=heavy,cf_close BENCH_FRAMES=4 \
    BENCH_BUDGET=1800 BENCH_TIMEOUT=900 ORT_MT_PRECISION=$mp \
    timeout 2000 python bench.py 2>&1 \
    | sed "s/^{/{\"mt\": \"$mp\", /" | tee -a /tmp/r3l_mt_heavy.log
done

# 2. the shade-split ablate case r3k lost to a wedge (gate+BRDF vs
#    any-hit attribution at the current defaults)
for c in shade taa; do
  ABLATE_REPS=16 timeout 620 python scripts/ablate.py --case $c 2>&1 \
    | tee -a /tmp/r3l_ablate.log
done

# 3. an_full stage attribution — first-ever run that survives the
#    scoped-vmem fix (r3i attempt crashed pre-fix).  REPS=8: the frame
#    is ~148 ms, compiles dominate anyway.
ABLATE_REPS=8 timeout 2400 python scripts/ablate_analytic.py 2>&1 \
  | tee /tmp/r3l_an.log

# 4. nine-case record under x3 (the flip candidate).  r3k's step-4
#    record is the same matrix at mt=highest; diff the two to decide
#    the default.
BENCH_SKIP_PROBE=1 BENCH_BUDGET=3600 BENCH_TIMEOUT=800 \
  ORT_MT_PRECISION=x3 timeout 4000 python bench.py 2>&1 \
  | tee /tmp/r3l_bench.log

echo DONE
