#!/bin/bash
# Round-3 NINTH pass — r3h retry + the round-record session, ordered by
# decision value (the worker wedges at random; early items decide the
# default flips).  Run from a snapshot clone; every child is bounded.
set -x
cd "$(dirname "$0")/.."

# persistent compilation cache (bench.py also defaults this; exporting
# here covers ablate/roofline/tpu_checks children too)
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

# Speed canary: the worker sometimes ANSWERS probes while running ~18x
# slow (r3h measured baseline at 368 ms vs the 19-31 healthy band) —
# numbers from that state are garbage.  Abort (no DONE -> the chainer
# retries later) unless a quick baseline lands under 80 ms/frame.
BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=4 BENCH_BUDGET=500 \
  timeout 600 python bench.py 2>&1 | tee /tmp/r3i_canary.log
canary_ms=$(grep -o '"ms_per_frame": [0-9.]*' /tmp/r3i_canary.log \
  | head -1 | awk '{print $2}')
if [ -z "$canary_ms" ] || \
   awk "BEGIN{exit !($canary_ms > 80)}"; then
  echo "canary ${canary_ms:-none} ms — slice degraded, aborting"
  exit 1
fi

# 1. realistic preset — confirms the TAA fusion-cut fix (a2adba1); the
#    one preset with no green r3 sample
JAX_TRACEBACK_FILTERING=off BENCH_SKIP_PROBE=1 BENCH_CASES=realistic \
  BENCH_FRAMES=4 BENCH_BUDGET=800 BENCH_TIMEOUT=700 \
  timeout 900 python bench.py 2>&1 | tee /tmp/r3i_realistic.log

# 2. deferred-normal A/B on baseline (fast compile, clean signal)
for dn in 0 1; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=4 \
    BENCH_BUDGET=600 ORT_DEFER_NORMAL=$dn timeout 700 python bench.py \
    2>&1 | sed "s/^{/{\"defer\": \"$dn\", /" | tee -a /tmp/r3i_defer.log
done

# 3. SVGF schedule A/B, full preset only (moving compiles >480s on the
#    wedgy slice — the full preset prices the same kernel)
for tag in old new b64; do
  case $tag in
    old) env_args=(ORT_SVGF_BH=8 ORT_SVGF_DB=0) ;;
    new) env_args=() ;;
    b64) env_args=(ORT_SVGF_BH=64 ORT_SVGF_DB=0) ;;
  esac
  BENCH_SKIP_PROBE=1 BENCH_CASES=full BENCH_FRAMES=4 BENCH_BUDGET=800 \
    BENCH_TIMEOUT=700 env "${env_args[@]}" timeout 900 python bench.py \
    2>&1 | sed "s/^{/{\"svgf\": \"$tag\", /" | tee -a /tmp/r3i_svgf.log
done

# 4. SUBTILES kernel-block sweep (baseline)
for st in 8 16 32 64; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=4 BENCH_BUDGET=500 \
    ORT_SUBTILES=$st timeout 600 python bench.py 2>&1 \
    | sed "s/^{/{\"subtiles\": \"$st\", /" | tee -a /tmp/r3i_subtiles.log
done

# 5. close/far x defer (the 81,920-tri scene has the largest per-tile
#    chunk-merge count — defer's best case)
for dn in 0 1; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=close,far BENCH_FRAMES=4 \
    BENCH_BUDGET=1200 ORT_DEFER_NORMAL=$dn timeout 1300 python bench.py \
    2>&1 | sed "s/^{/{\"defer\": \"$dn\", /" | tee -a /tmp/r3i_defer.log
done

# 6. measured ceilings (VERDICT r2 #3)
timeout 900 python scripts/roofline.py 2>&1 | tee /tmp/r3i_roofline.log

# 7. stage ablation at current defaults
ABLATE_REPS=16 timeout 1500 python scripts/ablate.py 2>&1 \
  | tee /tmp/r3i_ablate.log

# 8. the two slow-compile cases, generous child timeouts
BENCH_SKIP_PROBE=1 BENCH_CASES=an_full,moving BENCH_FRAMES=4 \
  BENCH_BUDGET=1800 BENCH_TIMEOUT=900 timeout 2000 python bench.py 2>&1 \
  | tee /tmp/r3i_anfull.log

# 9. the round record: all cases, 8-frame, final defaults
BENCH_SKIP_PROBE=1 BENCH_BUDGET=3000 BENCH_TIMEOUT=700 \
  timeout 3300 python bench.py 2>&1 | tee /tmp/r3i_bench.log

echo DONE
