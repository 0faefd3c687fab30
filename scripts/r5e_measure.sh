#!/bin/bash
# Round-5 session E queue — fewer-pages knob matrix (zero code change):
# the TWO-WORD group bitmask holds 64*GROUP chunks: pc256/g4 = 3 pages
# with NO element waste; pc224/g8 = 3, pc336/g12 = 2, pc672/g21 = 1.
# Every page is one kernel launch that re-visits every tile (feature
# re-expansion + subtile scan) — at cf_close that is 97k shadow tiles
# x 7 pages.  Fewer pages trades per-step MXU elements (bigger groups)
# for 2-7x fewer tile visits.  pc672 also flips the swizzle auto
# (single page) — ORT_SWIZZLE=1 holds it fixed.
set -x
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

# analysis hold: the operator banks the previous session + flips
# defaults, then removes the marker.  EXIT (not wait): the chainer
# retries with a FRESH clone, so the flips land in the measured tree.
if [ -f /tmp/R5_HOLD ]; then echo 'held for analysis (no DONE)'; exit 1; fi

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

: > /tmp/r5e_canary.log
BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=8 BENCH_BUDGET=500 \
  timeout 600 python bench.py 2>&1 | tee /tmp/r5e_canary.log
canary_ms=$(grep -o '"ms_per_frame": [0-9.]*' /tmp/r5e_canary.log \
  | head -1 | awk '{print $2}')
if [ -z "$canary_ms" ] || awk "BEGIN{exit !($canary_ms > 80)}"; then
  echo "canary ${canary_ms:-none} ms — slice degraded, aborting"
  exit 1
fi

: > /tmp/r5e_pages.log
run_arm () {  # tag extra-env...
  local tag="$1"; shift
  env BENCH_SKIP_PROBE=1 BENCH_CASES=cf_far,cf_close,baseline \
    BENCH_FRAMES=8 BENCH_BUDGET=1300 BENCH_TIMEOUT=900 "$@" \
    timeout 1400 python bench.py 2>&1 \
    | sed "s/^{/{\"arm\": \"$tag\", /" | tee -a /tmp/r5e_pages.log
}

run_arm control
run_arm pc256g4 ORT_PAGE_CHUNKS=256
run_arm pc672g4 ORT_PAGE_CHUNKS=672 ORT_SWIZZLE=1
run_arm pc672g21 ORT_PAGE_CHUNKS=672 ORT_CHUNK_GROUP=21 ORT_SWIZZLE=1

echo DONE
