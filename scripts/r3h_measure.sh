#!/bin/bash
# Round-3 EIGHTH pass: the SVGF Pallas restructure (32-row bands +
# double-buffered slab prefetch, commit 78231b4), priced on silicon.
# All pairs run back-to-back in ONE session so they are
# driver-comparable.  SVGF runs in the full/heavy presets, so the A/B
# uses the full preset (static) + the moving case (SVGF's worst case).
set -x
cd "$(dirname "$0")/.."

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

# hardware correctness gate first: the new kernel must bit-match the
# jnp stencil on the real Mosaic lowering before any timing counts
timeout 600 python scripts/tpu_checks.py 2>&1 | tee /tmp/r3h_checks.log

# realistic-preset re-run with full tracebacks: the r3g final bench saw
# {"error": "rc=1"} here right before the worker wedged — confirm it
# was the wedge, or capture the real crash
JAX_TRACEBACK_FILTERING=off BENCH_SKIP_PROBE=1 BENCH_CASES=realistic \
  BENCH_FRAMES=4 BENCH_BUDGET=600 timeout 700 python bench.py 2>&1 \
  | tee /tmp/r3h_realistic.log

# SVGF schedule A/B (4-frame chained scans, paired):
#   old  = BH=8 single-buffer (the r2 kernel's schedule)
#   new  = BH=32 double-buffered (committed default)
#   b64  = BH=64 single-buffer (VMEM-heavier, fewest grid steps)
#   jnp  = ORT_SVGF_PALLAS=0 (the XLA shifted-slice form)
for tag in old new b64 jnp; do
  case $tag in
    old) env_args=(ORT_SVGF_BH=8 ORT_SVGF_DB=0) ;;
    new) env_args=() ;;
    b64) env_args=(ORT_SVGF_BH=64 ORT_SVGF_DB=0) ;;
    jnp) env_args=(ORT_SVGF_PALLAS=0) ;;
  esac
  BENCH_SKIP_PROBE=1 BENCH_CASES=full,moving BENCH_FRAMES=4 \
    BENCH_BUDGET=900 env "${env_args[@]}" timeout 1000 python bench.py 2>&1 \
    | sed "s/^{/{\"svgf\": \"$tag\", /" | tee -a /tmp/r3h_svgf.log
done

# heavy preset at the winning default (SVGF on there too; also serves
# as the same-session heavy sample r3e/r3f never got)
BENCH_SKIP_PROBE=1 BENCH_CASES=heavy BENCH_FRAMES=4 BENCH_BUDGET=700 \
  timeout 800 python bench.py 2>&1 | tee -a /tmp/r3h_svgf.log

# deferred-normal closest-hit A/B (commit 928940a): baseline prices the
# epilogue cut on the bunny; close/far price it where the per-tile
# chunk-merge count is largest (81,920-tri scene)
for dn in 0 1; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=baseline,close,far BENCH_FRAMES=4 \
    BENCH_BUDGET=1100 ORT_DEFER_NORMAL=$dn timeout 1200 python bench.py \
    2>&1 | sed "s/^{/{\"defer\": \"$dn\", /" | tee -a /tmp/r3h_defer.log
done

# kernel grid-block size sweep: SUBTILES trades per-block sparse-plan
# granularity against grid-step count; never swept on silicon
for st in 8 16 32 64; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=4 BENCH_BUDGET=500 \
    ORT_SUBTILES=$st timeout 600 python bench.py 2>&1 \
    | sed "s/^{/{\"subtiles\": \"$st\", /" | tee -a /tmp/r3h_subtiles.log
done

# stage ablation at the r3g defaults (gate 0.1): the r3f table predates
# the gate, so the current frame's stage split is unknown
ABLATE_REPS=16 timeout 1500 python scripts/ablate.py 2>&1 \
  | tee /tmp/r3h_ablate.log

# measured device ceilings (VERDICT r2 #3): MXU TFLOP/s, HBM GB/s,
# dispatch floor + the primary trace's exact work accounting
timeout 900 python scripts/roofline.py 2>&1 | tee /tmp/r3h_roofline.log

echo DONE
