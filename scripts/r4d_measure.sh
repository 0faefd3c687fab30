#!/bin/bash
# Round-4 session D queue: the SMEM-plan GROUP_SORT pair (r4c measured
# the VMEM iota-select form +16-82% — this re-tests the fixed form),
# cf knobs at DEFAULT walk (r4c's knob arms composed with the bad
# gsort and are unusable), kernel-stage attribution, the TAA moving
# microbench, and the an_full knob composition.
set -x
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

: > /tmp/r4d_canary.log
BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=4 BENCH_BUDGET=500 \
  timeout 600 python bench.py 2>&1 | tee /tmp/r4d_canary.log
canary_ms=$(grep -o '"ms_per_frame": [0-9.]*' /tmp/r4d_canary.log \
  | head -1 | awk '{print $2}')
if [ -z "$canary_ms" ] || awk "BEGIN{exit !($canary_ms > 80)}"; then
  echo "canary ${canary_ms:-none} ms — slice degraded, aborting"
  exit 1
fi

# 1. kernel-stage attribution (far default camera + close camera):
#    full/noepi/nof/nowalk differences price epilogue, feature
#    expansion, walk, and scan skeleton
: > /tmp/r4d_kattrib.log
KA_REPS=16 timeout 1200 python scripts/kernel_attrib.py 2>&1 \
  | tee -a /tmp/r4d_kattrib.log
KA_REPS=4 KA_SUBDIV=6 KA_CLOSE=1 timeout 1800 \
  python scripts/kernel_attrib.py 2>&1 | tee -a /tmp/r4d_kattrib.log

# 2. TAA moving-resolve microbench (r4c: +9.4 ms/frame attribution vs
#    a 332 MB audit — moving/still/gather isolate the lowering)
: > /tmp/r4d_taamicro.log
timeout 900 python scripts/taa_micro.py 2>&1 | tee /tmp/r4d_taamicro.log

# 3. SMEM-plan GROUP_SORT pair
: > /tmp/r4d_walk.log
for gs in 0 1; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=baseline,cf_far,cf_close \
    BENCH_FRAMES=4 BENCH_BUDGET=1400 BENCH_TIMEOUT=900 \
    ORT_GROUP_SORT=$gs timeout 1500 python bench.py 2>&1 \
    | sed "s/^{/{\"gsort\": $gs, /" | tee -a /tmp/r4d_walk.log
done

# 4. cf knobs at the DEFAULT walk (r4c ran these over the bad gsort)
: > /tmp/r4d_cfknobs.log
for arm in "ORT_CHUNK_GROUP=8" "ORT_PAGE_CHUNKS=128" "ORT_SUBTILES=64" \
           "ORT_PAGE_ORDER=1"; do
  env BENCH_SKIP_PROBE=1 BENCH_CASES=cf_close BENCH_FRAMES=4 \
    BENCH_BUDGET=900 BENCH_TIMEOUT=800 $arm \
    timeout 1000 python bench.py 2>&1 \
    | sed "s/^{/{\"knob\": \"$arm\", /" | tee -a /tmp/r4d_cfknobs.log
done
# GROUP=8 on the 1-page baseline (r3n's arm died to a tunnel flake)
BENCH_SKIP_PROBE=1 BENCH_CASES=baseline,heavy BENCH_FRAMES=8 \
  BENCH_BUDGET=900 BENCH_TIMEOUT=700 ORT_CHUNK_GROUP=8 \
  timeout 1000 python bench.py 2>&1 \
  | sed 's/^{/{"knob": "group8", /' | tee -a /tmp/r4d_cfknobs.log

# 5. an_full composition: gate-off + skygates together; milder gate
#    fracs (r4c: defaults 51.34, angate0 46.63, skygates 45.81)
: > /tmp/r4d_anknobs.log
BENCH_SKIP_PROBE=1 BENCH_CASES=an_full BENCH_FRAMES=8 BENCH_BUDGET=600 \
  BENCH_TIMEOUT=500 ORT_AN_HIT_GATE=0 ORT_SKY_MISS_GATE=0.75 \
  ORT_AN_SKYR_GATE=0.15 timeout 700 python bench.py 2>&1 \
  | sed 's/^{/{"arm": "gate0+skygates", /' | tee -a /tmp/r4d_anknobs.log
for g in 0.5 0.65; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=an_full BENCH_FRAMES=8 BENCH_BUDGET=600 \
    BENCH_TIMEOUT=500 ORT_AN_HIT_GATE=$g ORT_SKY_MISS_GATE=0.75 \
    ORT_AN_SKYR_GATE=0.15 timeout 700 python bench.py 2>&1 \
    | sed "s/^{/{\"arm\": \"gate$g+skygates\", /" \
    | tee -a /tmp/r4d_anknobs.log
done
BENCH_SKIP_PROBE=1 BENCH_CASES=an_baseline BENCH_FRAMES=8 \
  BENCH_BUDGET=500 BENCH_TIMEOUT=400 ORT_SKY_MISS_GATE=0.75 \
  ORT_AN_SKYR_GATE=0.15 timeout 500 python bench.py 2>&1 \
  | sed 's/^{/{"arm": "anbase+skygates", /' | tee -a /tmp/r4d_anknobs.log

echo DONE
