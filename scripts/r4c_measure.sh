#!/bin/bash
# Round-4 session C queue: re-run the r4b arms that died on the
# GROUP_SORT Mosaic lane-index bug (fixed: iota-select extraction,
# AOT-verified), measure the new defaults (env auto/patch_u8, analytic
# hit gate 0.8-on-TPU, light batching reverted), and attribute the
# moving penalty by stage.  SHADOW_PACK measured negative in r4b
# (cf_close 519->1996 ms: union hulls over heterogeneous light dirs
# admit 10x the MXU elements, cf_stats) — not re-run; stays off.
set -x
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

: > /tmp/r4c_canary.log
BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=4 BENCH_BUDGET=500 \
  timeout 600 python bench.py 2>&1 | tee /tmp/r4c_canary.log
canary_ms=$(grep -o '"ms_per_frame": [0-9.]*' /tmp/r4c_canary.log \
  | head -1 | awk '{print $2}')
if [ -z "$canary_ms" ] || awk "BEGIN{exit !($canary_ms > 80)}"; then
  echo "canary ${canary_ms:-none} ms — slice degraded, aborting"
  exit 1
fi

# 1. analytic record at the NEW defaults (u8 env table -> patch_u8,
#    hit gate 0.8 on TPU, sequential light calls) + gate-off control
#    and the skygate composition on top of the cheap gather.
: > /tmp/r4c_anrec.log
BENCH_SKIP_PROBE=1 BENCH_CASES=an_baseline,an_full BENCH_FRAMES=8 \
  BENCH_BUDGET=800 BENCH_TIMEOUT=600 timeout 900 python bench.py 2>&1 \
  | sed 's/^{/{"andefaults": 1, /' | tee -a /tmp/r4c_anrec.log
BENCH_SKIP_PROBE=1 BENCH_CASES=an_full BENCH_FRAMES=8 BENCH_BUDGET=600 \
  BENCH_TIMEOUT=500 ORT_AN_HIT_GATE=0 timeout 700 python bench.py 2>&1 \
  | sed 's/^{/{"angate": 0, /' | tee -a /tmp/r4c_anrec.log
BENCH_SKIP_PROBE=1 BENCH_CASES=an_full BENCH_FRAMES=8 BENCH_BUDGET=600 \
  BENCH_TIMEOUT=500 ORT_SKY_MISS_GATE=0.75 ORT_AN_SKYR_GATE=0.15 \
  timeout 700 python bench.py 2>&1 \
  | sed 's/^{/{"skygates": 1, /' | tee -a /tmp/r4c_anrec.log
for ab in 64 128; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=an_full BENCH_FRAMES=8 BENCH_BUDGET=600 \
    BENCH_TIMEOUT=500 ORT_AN_BLOCK=$ab timeout 700 python bench.py 2>&1 \
    | sed "s/^{/{\"anblock\": $ab, /" | tee -a /tmp/r4c_anrec.log
done

# 2. moving-penalty attribution (still mode isolates the moved-flag
#    cost at identity addresses: 38.67 vs ~30.6 static in r4a)
: > /tmp/r4c_moving.log
for arm in "full:" "full:TAA0" "baseline:" "realistic:"; do
  p="${arm%%:*}"; t="${arm##*:}"
  tenv=""; [ "$t" = "TAA0" ] && tenv="BENCH_MOVING_TAA=0"
  env BENCH_SKIP_PROBE=1 BENCH_CASES=moving BENCH_FRAMES=8 \
    BENCH_BUDGET=700 BENCH_TIMEOUT=600 BENCH_MOVING_MODE=still \
    BENCH_MOVING_PRESET=$p $tenv timeout 800 python bench.py 2>&1 \
    | sed "s/^{/{\"mpreset\": \"$p\", \"mtaa\": \"$t\", /" \
    | tee -a /tmp/r4c_moving.log
done

# 3. GROUP_SORT paired A/B (the r4b arms lost to the Mosaic bug)
: > /tmp/r4c_walk.log
for gs in 0 1; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=baseline,cf_far,cf_close \
    BENCH_FRAMES=4 BENCH_BUDGET=1400 BENCH_TIMEOUT=900 \
    ORT_GROUP_SORT=$gs timeout 1500 python bench.py 2>&1 \
    | sed "s/^{/{\"gsort\": $gs, /" | tee -a /tmp/r4c_walk.log
done

# 4. knob composition on cf_close at gsort=1: chunk-group 8, defer
#    normal, page order, pc=128, subtiles 64
: > /tmp/r4c_cfknobs.log
for arm in "ORT_CHUNK_GROUP=8" "ORT_DEFER_NORMAL=1" "ORT_PAGE_ORDER=1" \
           "ORT_PAGE_CHUNKS=128" "ORT_SUBTILES=64"; do
  env BENCH_SKIP_PROBE=1 BENCH_CASES=cf_close BENCH_FRAMES=4 \
    BENCH_BUDGET=900 BENCH_TIMEOUT=800 ORT_GROUP_SORT=1 $arm \
    timeout 1000 python bench.py 2>&1 \
    | sed "s/^{/{\"knob\": \"$arm\", \"gsort\": 1, /" \
    | tee -a /tmp/r4c_cfknobs.log
done

# 5. presets at gsort=1 (single-page guard + heavy AO wavefronts)
: > /tmp/r4c_presets.log
BENCH_SKIP_PROBE=1 BENCH_CASES=heavy,moving,full BENCH_FRAMES=8 \
  BENCH_BUDGET=1400 BENCH_TIMEOUT=700 ORT_GROUP_SORT=1 \
  timeout 1500 python bench.py 2>&1 \
  | sed 's/^{/{"gsort": 1, /' | tee -a /tmp/r4c_presets.log

# 6. full matrix at current defaults (BENCH_r04 preview)
: > /tmp/r4c_bench.log
BENCH_SKIP_PROBE=1 BENCH_BUDGET=1800 BENCH_TIMEOUT=600 \
  timeout 2000 python bench.py 2>&1 | tee /tmp/r4c_bench.log

echo DONE
