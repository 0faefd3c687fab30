#!/bin/bash
# Round-3 SIXTH pass: finish what the r3e session-restart killed.
#  1. Stage ablation completed (r3e died after gbuffer): run ALL cases
#     again same-session so the pairs are comparable.
#  2. heavy swizzle=1 read 2739 ms in r3e vs 141 ms at the same knob in
#     r3c -> single recheck to decide wedge vs real.
set -x
cd "$(dirname "$0")/.."

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

# 1. full stage ablation at production defaults
timeout 4000 python scripts/ablate.py 2>&1 | tee /tmp/r3f_ablate.log

# 2. heavy swizzle=1 recheck (4 frames, one sample)
BENCH_SKIP_PROBE=1 BENCH_CASES=heavy BENCH_FRAMES=4 BENCH_BUDGET=500 \
  ORT_SWIZZLE=1 timeout 600 python bench.py 2>&1 | tee /tmp/r3f_heavy.log

echo DONE
