#!/bin/bash
# Round-3 ELEVENTH pass — fix confirms + the round-record session at
# final defaults.  Assumes the r3j bisection picked the SVGF schedule
# and the realistic-preset fix; this queue proves them at runtime and
# then records the full nine-case matrix (16-frame scans).
set -x
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=4 BENCH_BUDGET=500 \
  timeout 600 python bench.py 2>&1 | tee /tmp/r3k_canary.log
canary_ms=$(grep -o '"ms_per_frame": [0-9.]*' /tmp/r3k_canary.log \
  | head -1 | awk '{print $2}')
if [ -z "$canary_ms" ] || awk "BEGIN{exit !($canary_ms > 80)}"; then
  echo "canary ${canary_ms:-none} ms — slice degraded, aborting"
  exit 1
fi

# 1. fix confirms at RUNTIME (not just compile): the two previously
#    broken defaults, generous timeouts for first compiles
for c in realistic full an_full; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=$c BENCH_FRAMES=8 BENCH_BUDGET=900 \
    BENCH_TIMEOUT=800 timeout 1000 python bench.py 2>&1 \
    | tee -a /tmp/r3k_confirm.log
done

# 2. shade-block split (new ablate cases): gate+BRDF vs wavefront
#    construction vs any-hit inner walk
ABLATE_REPS=16 timeout 1800 python scripts/ablate.py 2>&1 \
  | tee /tmp/r3k_ablate.log

# 2a. scoped-vmem default on/off A/B on baseline (guard against a
#     perf side effect of the 48M budget outside the realistic preset)
for kib in 49152 ""; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=8 BENCH_BUDGET=500 \
    ORT_SCOPED_VMEM_KIB=$kib timeout 600 python bench.py 2>&1 \
    | sed "s/^{/{\"vmem\": \"${kib:-off}\", /" | tee -a /tmp/r3k_vmem.log
done

# 2b. MT precision x3 A/B: the single-pass k=48 bf16_3x form vs the
#     6-pass default (PERF.md chunk-study section: projected ~-1.6 ms
#     on the trace at baseline, more on cf_close).  Checksum drift
#     expected ~1e-4 relative (t error bound); compare value + ms.
for mp in highest x3 mixed; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=baseline,cf_close BENCH_FRAMES=8 \
    BENCH_BUDGET=900 ORT_MT_PRECISION=$mp timeout 1000 python bench.py \
    2>&1 | sed "s/^{/{\"mt\": \"$mp\", /" | tee -a /tmp/r3k_mt.log
done

# 2c. SVGF schedule under the 48M scoped-vmem default: the r3j probes
#     showed the BH=32 kernel's working set (~33-38M) exceeds only the
#     OLD 16M cap — with 48M default, re-price the 1.5x-less-overread
#     schedule vs the proven BH=8 (full preset carries the kernel)
for sv in "8 0" "16 1" "32 1"; do
  set -- $sv
  BENCH_SKIP_PROBE=1 BENCH_CASES=full BENCH_FRAMES=8 BENCH_BUDGET=900 \
    BENCH_TIMEOUT=800 ORT_SVGF_BH=$1 ORT_SVGF_DB=$2 \
    timeout 1000 python bench.py 2>&1 \
    | sed "s/^{/{\"svgf\": \"$1-$2\", /" | tee -a /tmp/r3k_svgf.log
done

# 3. 16-frame dispatch-amortization check vs the 4-frame canary
BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=16 BENCH_BUDGET=500 \
  timeout 600 python bench.py 2>&1 | tee /tmp/r3k_frames16.log

# 4. the round record: all nine cases, final defaults, 16-frame scans
BENCH_SKIP_PROBE=1 BENCH_BUDGET=3600 BENCH_TIMEOUT=800 \
  timeout 4000 python bench.py 2>&1 | tee /tmp/r3k_bench.log

echo DONE
