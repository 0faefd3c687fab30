#!/bin/bash
# Round-5 session B queue:
#  1. close-camera kernel epilogue decomposition (nodiv/nowin price the
#     per-candidate divide and the winner+normal extraction inside the
#     6.0 ms epilogue the r4d attribution found)
#  2. DEFER_NORMAL first real A/B (every r4b arm died on the broken
#     gsort composition) — baseline + cf pair at default walk
#  3. an_full stage ablation at CURRENT defaults (patch_u8 env, hit
#     gate): the r3l stage table is stale; the 47 ms residual is
#     unattributed
set -x
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

# the two-word group masks changed kernel code — compile-verify against
# the real Mosaic compiler before spending measurement time (r4b lesson)
timeout 600 python scripts/aot_check.py 2>&1 | tee /tmp/r5b_aot.log
grep -q 'AOT FAIL' /tmp/r5b_aot.log && { echo 'AOT FAIL — aborting'; exit 1; }

: > /tmp/r5b_canary.log
BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=8 BENCH_BUDGET=500 \
  timeout 600 python bench.py 2>&1 | tee /tmp/r5b_canary.log
canary_ms=$(grep -o '"ms_per_frame": [0-9.]*' /tmp/r5b_canary.log \
  | head -1 | awk '{print $2}')
if [ -z "$canary_ms" ] || awk "BEGIN{exit !($canary_ms > 80)}"; then
  echo "canary ${canary_ms:-none} ms — slice degraded, aborting"
  exit 1
fi

# 0. SHADOW EXIT CADENCE sweep — promoted here (the suspected
#    cf_close monster): the legacy walk pays a vector->scalar sync
#    (jnp.min(occ) feeding the loop bound) on EVERY window step.
: > /tmp/r5b_exit.log
for ev in 8 0 4 1; do
  env BENCH_SKIP_PROBE=1 BENCH_CASES=cf_close,baseline,heavy \
    BENCH_FRAMES=8 BENCH_BUDGET=1300 BENCH_TIMEOUT=900 \
    ORT_SHADOW_EXIT_EVERY=$ev timeout 1400 python bench.py 2>&1 \
    | sed "s/^{/{\"exit_every\": $ev, /" | tee -a /tmp/r5b_exit.log
done

# (kattrib close-camera variants moved to r5d's ablate matrix — the
# 21:58 run wedged the worker mid-compile and its snapshot predated
# the perturbation fix)

# (DEFER_NORMAL pair dropped: the r3-era measurement had deferred
# normals 3.2x slower and the r5 priority is the exit sweep + an_full
# attribution inside the shrinking worker window)

# 3. an_full stage ablation at current defaults
: > /tmp/r5b_anablate.log
ABLATE_REPS=8 timeout 3000 python scripts/ablate_analytic.py 2>&1 \
  | tee /tmp/r5b_anablate.log

echo DONE
