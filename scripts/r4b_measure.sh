#!/bin/bash
# Round-4 session B queue: the new BVH-walk kernels (ORT_GROUP_SORT,
# ORT_SHADOW_PACK) on the cases they target (cf_close above all), the
# GROUP=8 retry (r3n's failure was a remote-compile flake, not the
# kernel), DEFER_NORMAL's first A/B, the porder control pair r3o
# lacked, and re-pairs of the suspicious r4a anbatch arm.
# Schemas: every line gets knob keys; per-study logs zeroed at start.
set -x
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

: > /tmp/r4b_canary.log
BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=4 BENCH_BUDGET=500 \
  timeout 600 python bench.py 2>&1 | tee /tmp/r4b_canary.log
canary_ms=$(grep -o '"ms_per_frame": [0-9.]*' /tmp/r4b_canary.log \
  | head -1 | awk '{print $2}')
if [ -z "$canary_ms" ] || awk "BEGIN{exit !($canary_ms > 80)}"; then
  echo "canary ${canary_ms:-none} ms — slice degraded, aborting"
  exit 1
fi

# 1. walk-kernel 2x2: GROUP_SORT x SHADOW_PACK on the walk-bound cases.
#    cf_close is the target (509.87 ms best, r3o pc96+porder1);
#    baseline/cf_far guard regressions.  4-frame cf_close children keep
#    each arm ~6 min.
: > /tmp/r4b_walk.log
for gs in 0 1; do for sp in 0 1; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=baseline,cf_far,cf_close \
    BENCH_FRAMES=4 BENCH_BUDGET=1400 BENCH_TIMEOUT=900 \
    ORT_GROUP_SORT=$gs ORT_SHADOW_PACK=$sp \
    timeout 1500 python bench.py 2>&1 \
    | sed "s/^{/{\"gsort\": $gs, \"spack\": $sp, /" \
    | tee -a /tmp/r4b_walk.log
done; done

# 2. chunk-group 8 retry at the packed walk (r3n "failure" =
#    read-body tunnel flake, /tmp/child_stderr_baseline.log)
: > /tmp/r4b_group8.log
BENCH_SKIP_PROBE=1 BENCH_CASES=baseline,cf_close BENCH_FRAMES=4 \
  BENCH_BUDGET=1000 BENCH_TIMEOUT=900 \
  ORT_CHUNK_GROUP=8 ORT_GROUP_SORT=1 ORT_SHADOW_PACK=1 \
  timeout 1100 python bench.py 2>&1 \
  | sed 's/^{/{"group": 8, "gsort": 1, "spack": 1, /' \
  | tee -a /tmp/r4b_group8.log

# 3. DEFER_NORMAL first hardware A/B (cuts ~1/3 of the closest-hit VPU
#    epilogue; the normal re-fetch is one flat row-gather ~1.2 ms)
: > /tmp/r4b_defer.log
for dn in 0 1; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=baseline,cf_close BENCH_FRAMES=4 \
    BENCH_BUDGET=1000 BENCH_TIMEOUT=900 \
    ORT_DEFER_NORMAL=$dn ORT_GROUP_SORT=1 ORT_SHADOW_PACK=1 \
    timeout 1100 python bench.py 2>&1 \
    | sed "s/^{/{\"defer\": $dn, \"gsort\": 1, \"spack\": 1, /" \
    | tee -a /tmp/r4b_defer.log
done

# 4. page-order control pair at the best-known combo (r3o swept pc with
#    porder=1 only; this pins porder's own contribution)
: > /tmp/r4b_porder.log
for po in 0 1; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=cf_close BENCH_FRAMES=4 \
    BENCH_BUDGET=900 BENCH_TIMEOUT=800 \
    ORT_PAGE_ORDER=$po ORT_GROUP_SORT=1 ORT_SHADOW_PACK=1 \
    timeout 1000 python bench.py 2>&1 \
    | sed "s/^{/{\"porder\": $po, \"gsort\": 1, \"spack\": 1, /" \
    | tee -a /tmp/r4b_porder.log
done

# 5. re-pair the r4a anbatch arm (anbatch=1 read 21.71 ms an_baseline
#    vs 7.15 at identical-default angate=0 — slice drift suspected)
: > /tmp/r4b_anbatch.log
for lb in 1 0 1; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=an_baseline BENCH_FRAMES=8 \
    BENCH_BUDGET=500 BENCH_TIMEOUT=400 ORT_AN_LIGHT_BATCH=$lb \
    timeout 500 python bench.py 2>&1 \
    | sed "s/^{/{\"anbatch\": $lb, /" | tee -a /tmp/r4b_anbatch.log
done

# 6. heavy + moving with the packed walk (multi-sample wavefronts pack
#    AO hemispheres too; guard the single-page bunny cases)
: > /tmp/r4b_presets.log
BENCH_SKIP_PROBE=1 BENCH_CASES=heavy,moving,full BENCH_FRAMES=8 \
  BENCH_BUDGET=1400 BENCH_TIMEOUT=700 \
  ORT_GROUP_SORT=1 ORT_SHADOW_PACK=1 \
  timeout 1500 python bench.py 2>&1 \
  | sed 's/^{/{"gsort": 1, "spack": 1, /' | tee -a /tmp/r4b_presets.log

echo DONE
