#!/bin/bash
# Round-3 TENTH pass — compile-only bisection of the two broken-default
# presets (realistic scoped-vmem crash, full-preset default-SVGF crash),
# ordered by decision value.  Every child is bounded; a wedged worker
# eats at most one child timeout.  Run from a snapshot clone.
set -x
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

# Speed canary (see r3i): numbers from a degraded slice are garbage,
# and compiles on a wedged worker just burn the child timeouts.
BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=4 BENCH_BUDGET=500 \
  timeout 600 python bench.py 2>&1 | tee /tmp/r3j_canary.log
canary_ms=$(grep -o '"ms_per_frame": [0-9.]*' /tmp/r3j_canary.log \
  | head -1 | awk '{print $2}')
if [ -z "$canary_ms" ] || awk "BEGIN{exit !($canary_ms > 80)}"; then
  echo "canary ${canary_ms:-none} ms — slice degraded, aborting"
  exit 1
fi

# Bisection ladder (decision value order).  Compile-only: no dispatches.
for cfg in full_default realistic_default realistic_vmem48 \
           full_svgf_db0 full_svgf_bh16 realistic_nogate realistic_nobar \
           realistic_noswz realistic_no_taa realistic_no_ao \
           realistic_no_gi full_svgf_jnp full_svgf_old full_vmem48 \
           heavy_default heavy_vmem48; do
  timeout 900 python scripts/diag_r3j.py "$cfg" 2>&1 \
    | grep '^{' | tee -a /tmp/r3j_diag.log
done

# an_full failed rc=1 in r3i with only the traceback-filtering banner
# captured; re-run with full tracebacks (childproc now saves complete
# stderr to /tmp/child_stderr_<case>.log)
for c in an_full moving; do
  JAX_TRACEBACK_FILTERING=off BENCH_SKIP_PROBE=1 BENCH_CASES=$c \
    BENCH_FRAMES=2 BENCH_BUDGET=1000 BENCH_TIMEOUT=900 \
    timeout 1100 python bench.py 2>&1 | tee -a /tmp/r3j_runfail.log
done

echo DONE
