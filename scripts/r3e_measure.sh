#!/bin/bash
# Round-3 FIFTH pass: chase the two r3d anomalies + stage ablation.
#  1. cf_close read 2560 ms in the final r3d bench vs 508 ms earlier the
#     SAME session at identical defaults -> paired re-measure.
#  2. heavy 157.8 vs 141.0 (r3c, swizzle=1 default then) -> swizzle A/B
#     on the heavy preset (4spp wavefronts may profit from block order
#     even on the 1-page bunny).
#  3. ablate.py stage breakdown of the 22.9 ms baseline frame at the new
#     defaults (swizzle resolves off for the bunny now).
set -x
cd "$(dirname "$0")/.."

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

# 1. cf_close paired re-measure (4-frame like the 508 ms sample)
BENCH_SKIP_PROBE=1 BENCH_CASES=cf_close BENCH_FRAMES=4 BENCH_BUDGET=700 \
  timeout 800 python bench.py 2>&1 | tee /tmp/r3e_cf.log

# 2. heavy swizzle A/B (paired, same session)
for swz in auto 1; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=heavy BENCH_FRAMES=8 BENCH_BUDGET=600 \
    ORT_SWIZZLE=$swz timeout 700 python bench.py 2>&1 \
    | sed "s/^{/{\"swizzle\": \"$swz\", /" | tee -a /tmp/r3e_heavy.log
done

# 3. baseline stage ablation at production defaults
timeout 3000 python scripts/ablate.py 2>&1 | tee /tmp/r3e_ablate.log
echo DONE
