#!/bin/bash
# Round-3 THIRD measurement pass: the ordered GROUP walk A/B (the
# kernel change landed after r3b's snapshot).  cf_close measured 546 ms
# at default knobs (scalar-bound per-chunk ordered walk); the group
# variant amortizes the ~450ns scalar step G-fold.  Also re-checks
# tpu_checks (kernel change) and closes with a full bench at the
# final defaults chosen from r3b data.
set -x
cd "$(dirname "$0")/.."

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

timeout 600 python scripts/tpu_checks.py 2>&1 | tee /tmp/r3c_checks.log

for g in 1 4 8 16; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=cf_close,cf_far BENCH_FRAMES=4 \
    BENCH_BUDGET=1100 ORT_ORDERED_GROUP=$g timeout 1200 python bench.py 2>&1 \
    | sed "s/^{/{\"ordered_group\": \"$g\", /" | tee -a /tmp/r3c_og.log
done

# close-camera ordered-group x swizzle interaction at the winner G
BENCH_SKIP_PROBE=1 BENCH_CASES=cf_close BENCH_FRAMES=4 BENCH_BUDGET=500 \
  ORT_ORDERED_GROUP=8 ORT_SWIZZLE=0 timeout 600 python bench.py 2>&1 \
  | sed 's/^{/{"ordered_group": "8", "swizzle": "0", /' | tee -a /tmp/r3c_og.log

# final full bench at current repo defaults
BENCH_SKIP_PROBE=1 BENCH_BUDGET=2400 timeout 2600 python bench.py 2>&1 \
  | tee /tmp/r3c_bench.log
echo DONE
