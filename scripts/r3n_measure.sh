#!/bin/bash
# Round-3 fourteenth pass — price the analytic Pallas megakernel, sweep
# the two unswept kernel knobs at the new x3 default, and take the
# round-record nine-case matrix at the tree's defaults.
set -x
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=4 BENCH_BUDGET=500 \
  timeout 600 python bench.py 2>&1 | tee /tmp/r3n_canary.log
canary_ms=$(grep -o '"ms_per_frame": [0-9.]*' /tmp/r3n_canary.log \
  | head -1 | awk '{print $2}')
if [ -z "$canary_ms" ] || awk "BEGIN{exit !($canary_ms > 80)}"; then
  echo "canary ${canary_ms:-none} ms — slice degraded, aborting"
  exit 1
fi

# 1. the analytic megakernel A/B (Mosaic compile risk rides the same
#    child-process guard; a compile failure records as that case's
#    error line without killing the queue)
for ap in 0 1; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=an_baseline,an_full BENCH_FRAMES=8 \
    BENCH_BUDGET=1600 BENCH_TIMEOUT=800 ORT_AN_PALLAS=$ap \
    timeout 1800 python bench.py 2>&1 \
    | sed "s/^{/{\"anpl\": $ap, /" | tee -a /tmp/r3n_anpl.log
done

# 2. chunk-group sweep at the x3 default (never swept on silicon; the
#    group amortizes the ~450ns scalar step against matmul size)
for g in 2 4 8; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=8 \
    BENCH_BUDGET=700 BENCH_TIMEOUT=600 ORT_CHUNK_GROUP=$g \
    timeout 800 python bench.py 2>&1 \
    | sed "s/^{/{\"group\": $g, /" | tee -a /tmp/r3n_group.log
done

# 3. within-block subtile compaction (r3j built, never measured)
for sc in 0 1; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=baseline,heavy BENCH_FRAMES=8 \
    BENCH_BUDGET=1200 BENCH_TIMEOUT=700 ORT_SUBTILE_COMPACT=$sc \
    timeout 1500 python bench.py 2>&1 \
    | sed "s/^{/{\"compact\": $sc, /" | tee -a /tmp/r3n_compact.log
done

# 4. the BVH BRDF-tail megakernel A/B (the ~5 ms shading-math stage
#    of the headline frame, r3f/r3k ablations)
for bp in 0 1; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=baseline,full BENCH_FRAMES=8 \
    BENCH_BUDGET=1200 BENCH_TIMEOUT=700 ORT_BVH_BRDF_PALLAS=$bp \
    timeout 1500 python bench.py 2>&1 \
    | sed "s/^{/{\"brdf\": $bp, /" | tee -a /tmp/r3n_brdf.log
done

# 5. round-record nine-case matrix at the tree's defaults (x3 +
#    page-tcap now default-on)
BENCH_SKIP_PROBE=1 BENCH_BUDGET=3600 BENCH_TIMEOUT=800 \
  timeout 4000 python bench.py 2>&1 | tee /tmp/r3n_bench.log

echo DONE
