#!/bin/bash
# Round-3 SEVENTH pass: the two queued paired A/Bs + a fresh default
# bench, all in ONE session window so the pairs are driver-comparable.
#  1. ORT_BVH_GATE_FRAC sweep (0 / 0.1 / 0.2) on baseline + full bunny
#     presets — the gate (commit e0f76fc) attacks the 5.3 ms of
#     full-lane shading math the r3f ablation exposed.  Checksums must
#     match across fractions (the gate is exact).
#  2. heavy swizzle paired A/B (auto=off vs forced-on) — r3e/r3f saw
#     142.35 vs 154.87 CROSS-session; this decides whether heavy flips.
#  3. Full default bench (8-frame) for the round record.
set -x
cd "$(dirname "$0")/.."

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

# 1. BVH hit-shading tile gate sweep (4-frame, paired)
for f in 0 0.1 0.2; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=baseline,full BENCH_FRAMES=4 \
    BENCH_BUDGET=900 ORT_BVH_GATE_FRAC=$f \
    timeout 1000 python bench.py 2>&1 \
    | sed "s/^{/{\"bvh_gate\": \"$f\", /" | tee -a /tmp/r3g_gate.log
done

# 2. heavy swizzle paired A/B (same session, back to back)
for s in "" 1; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=heavy BENCH_FRAMES=4 BENCH_BUDGET=700 \
    ORT_SWIZZLE=$s timeout 800 python bench.py 2>&1 \
    | sed "s/^{/{\"swizzle\": \"$s\", /" | tee -a /tmp/r3g_heavy.log
done

# 3. full default bench, 8-frame, all cases
BENCH_SKIP_PROBE=1 timeout 3600 python bench.py 2>&1 \
  | tee /tmp/r3g_bench.log

echo DONE
