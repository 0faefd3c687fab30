#!/bin/bash
# CONTINGENCY queue (use when the worker window is short): AOT gate,
# canary, the round-5 default stack (gate+hulls+dedup) vs r4 history,
# and the exit-cadence pair — ~25 min total.  Kill the r5* chains by
# exact pid first if running this manually.
set -x
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }
timeout 600 python scripts/aot_check.py 2>&1 | tee /tmp/r5q_aot.log
grep -q 'AOT FAIL' /tmp/r5q_aot.log && { echo 'AOT FAIL'; exit 1; }

: > /tmp/r5q.log
for arm in "default:" "exit8:ORT_SHADOW_EXIT_EVERY=8"; do
  tag="${arm%%:*}"; envs="${arm#*:}"
  env BENCH_SKIP_PROBE=1 BENCH_CASES=cf_close,baseline,heavy \
    BENCH_FRAMES=8 BENCH_BUDGET=1300 BENCH_TIMEOUT=900 $envs \
    timeout 1400 python bench.py 2>&1 \
    | sed "s/^{/{\"arm\": \"$tag\", /" | tee -a /tmp/r5q.log
done

echo DONE
