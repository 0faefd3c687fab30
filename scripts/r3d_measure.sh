#!/bin/bash
# Round-3 FOURTH measurement pass: validate the default flips chosen
# from the r3b/r3c data (PERF.md):
#   - ORT_SWIZZLE=auto        (multi-page BVH scenes only)
#   - ORT_ANALYTIC_GATE_FRAC  default 0.15
#   - ORDERED_AUTO_FACTOR=0.0 (auto never picks the ordered walk)
# plus the one interaction the r3b singles didn't cover: the analytic
# gate under the UNswizzled stream (gate tiles become scanline strips).
set -x
cd "$(dirname "$0")/.."

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

# correctness checks on-device at the new defaults
timeout 600 python scripts/tpu_checks.py 2>&1 | tee /tmp/r3d_checks.log

# analytic gate x swizzle interaction: (0.15, swz0) is the unmeasured
# cell; (0, swz0) re-anchors; sweep 0.3 in case strips need more capacity
for combo in "0.15 0" "0 0" "0.3 0" "0.15 1"; do
  set -- $combo
  BENCH_SKIP_PROBE=1 BENCH_CASES=an_baseline,an_full BENCH_FRAMES=4 \
    BENCH_BUDGET=700 ORT_ANALYTIC_GATE_FRAC=$1 ORT_SWIZZLE=$2 \
    timeout 800 python bench.py 2>&1 \
    | sed "s/^{/{\"gate\": \"$1\", \"swizzle\": \"$2\", /" \
    | tee -a /tmp/r3d_an.log
done

# close/far at the new defaults (auto: unordered + swizzled multi-page)
BENCH_SKIP_PROBE=1 BENCH_CASES=cf_close,cf_far BENCH_FRAMES=4 \
  BENCH_BUDGET=700 timeout 800 python bench.py 2>&1 | tee /tmp/r3d_cf.log

# bunny baseline at the new defaults (swizzle auto -> off for 1 page)
BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=8 \
  BENCH_BUDGET=400 timeout 500 python bench.py 2>&1 | tee /tmp/r3d_base.log

# final full bench at repo defaults — the BENCH_r03 dress rehearsal
BENCH_SKIP_PROBE=1 BENCH_BUDGET=2400 timeout 2600 python bench.py 2>&1 \
  | tee /tmp/r3d_bench.log
echo DONE
