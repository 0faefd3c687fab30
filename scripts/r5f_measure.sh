#!/bin/bash
# Round-5 session F: the ROUND RECORD at post-sweep defaults.
# Runs after r5b..r5e land and any default flips are committed (the
# chain clones HEAD at start, so this measures the flipped tree).
# 32-frame chains (the repo's record standard, PERF.md r4a).
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

: > /tmp/r5f_record.log
BENCH_SKIP_PROBE=1 BENCH_FRAMES=32 BENCH_BUDGET=2600 BENCH_TIMEOUT=700 \
  timeout 2800 python bench.py 2>&1 | tee /tmp/r5f_record.log

echo DONE
