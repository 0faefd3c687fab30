#!/bin/bash
# Round-3 thirteenth pass — price the new multi-page levers on the
# 7-page cf scene and finish the x3 flip evidence r3l lost to wedges.
#
# New in this tree: ORT_PAGE_TCAP (inter-page best-t cap, default ON)
# and ORT_PAGE_ORDER (near-first lax.scan page walk, default OFF).
# cf_close ran ~500 ms with full candidate ranges on all 7 pages; the
# cap + near-first order should collapse pages 2..7 to near-empty
# grids.  Single-page scenes (bunny) are structurally unaffected.
set -x
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=4 BENCH_BUDGET=500 \
  timeout 600 python bench.py 2>&1 | tee /tmp/r3m_canary.log
canary_ms=$(grep -o '"ms_per_frame": [0-9.]*' /tmp/r3m_canary.log \
  | head -1 | awk '{print $2}')
if [ -z "$canary_ms" ] || awk "BEGIN{exit !($canary_ms > 80)}"; then
  echo "canary ${canary_ms:-none} ms — slice degraded, aborting"
  exit 1
fi

# 1. cf pair x {off/off, cap/static, cap+order} — paired same-session.
#    x3 precision to stay comparable with the r3l cf samples.
for cfg in "0 0" "1 0" "1 1"; do
  set -- $cfg
  BENCH_SKIP_PROBE=1 BENCH_CASES=cf_far,cf_close BENCH_FRAMES=4 \
    BENCH_BUDGET=1800 BENCH_TIMEOUT=900 ORT_MT_PRECISION=x3 \
    ORT_PAGE_TCAP=$1 ORT_PAGE_ORDER=$2 \
    timeout 2000 python bench.py 2>&1 \
    | sed "s/^{/{\"tcap\": $1, \"order\": $2, /" | tee -a /tmp/r3m_cf.log
done

# 2. the x3 paired confirms r3l lost to timeouts (full + moving)
for mp in highest x3; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=full,moving BENCH_FRAMES=8 \
    BENCH_BUDGET=1500 BENCH_TIMEOUT=800 ORT_MT_PRECISION=$mp \
    timeout 1800 python bench.py 2>&1 \
    | sed "s/^{/{\"mt\": \"$mp\", /" | tee -a /tmp/r3m_mt.log
done

# 3. lost ablate case from r3l (an_full marker stage timed out) — only
#    the marker-onward prefixes matter; rerun the whole attribution at
#    lower reps as the wedge-tolerant retry.
ABLATE_REPS=4 timeout 1800 python scripts/ablate_analytic.py 2>&1 \
  | tee /tmp/r3m_an.log

echo DONE
