#!/bin/bash
# Round-3 NINTH pass — the round-record session at FINAL defaults.
# Fired manually after the r3h results are read and any default flips
# are committed (the snapshot clone picks them up).
#  1. realistic preset: confirms the TAA fusion-cut fix (commit
#     a2adba1) on silicon — the one preset with no green r3 sample.
#  2. close/far + an_full + moving: the cases the r3g record lost to
#     wedges/budget.
#  3. The full 8-frame default bench — the round's headline artifact.
set -x
cd "$(dirname "$0")/.."

# persistent compilation cache: repeat compiles of the same configs
# (every bench child recompiles from scratch) hit disk instead of the
# wedge-prone worker; harmless if the axon backend ignores it
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

JAX_TRACEBACK_FILTERING=off BENCH_SKIP_PROBE=1 BENCH_CASES=realistic \
  BENCH_FRAMES=4 BENCH_BUDGET=600 timeout 700 python bench.py 2>&1 \
  | tee /tmp/r3i_realistic.log

BENCH_SKIP_PROBE=1 BENCH_CASES=close,far BENCH_FRAMES=4 \
  BENCH_BUDGET=1200 timeout 1300 python bench.py 2>&1 \
  | tee /tmp/r3i_closefar.log

BENCH_SKIP_PROBE=1 BENCH_CASES=an_full,moving BENCH_FRAMES=4 \
  BENCH_BUDGET=1200 BENCH_TIMEOUT=900 timeout 1300 python bench.py 2>&1 \
  | tee /tmp/r3i_anfull.log

# the round record: all cases, 8-frame, final defaults
BENCH_SKIP_PROBE=1 BENCH_BUDGET=3000 BENCH_TIMEOUT=700 \
  timeout 3300 python bench.py 2>&1 | tee /tmp/r3i_bench.log

echo DONE
