#!/bin/bash
# Round-3 SECOND measurement pass: A/Bs for the fixes/knobs added after
# the first pass ran (it snapshot-cloned before them):
#   * multi-page shared-origin crash fix -> cf_close/cf_far + ordered
#     sweep now runnable at default knobs
#   * ORT_ENV_GATHER flat|planes|multi (an_full was 1544 ms on the
#     serialized multi-dim gather)
#   * ORT_ANALYTIC_GATE_FRAC tile gate (baseline-analytic was 153 ms)
#   * ORT_TAA_PLANES A/B (row form measured 4.88 ms moving)
# Runs from a snapshot clone (probe_loop-style) so working-tree edits
# can't corrupt children mid-sweep.  Priority: correctness gate, the
# broken-before bench rows, env-gather A/B, gate-frac sweep, ordered
# sweep, then a final full bench preview at winning defaults.
set -x
cd "$(dirname "$0")/.."

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

# kernel-touching fix: re-verify hardware correctness first (cheap)
timeout 600 python scripts/tpu_checks.py 2>&1 | tee /tmp/r3b_checks.log

# the two bench rows that could not run at default knobs before the fix
BENCH_SKIP_PROBE=1 BENCH_CASES=cf_close,cf_far BENCH_BUDGET=1100 \
  timeout 1200 python bench.py 2>&1 | tee /tmp/r3b_cf.log

# env-gather lowering A/B on the catastrophic case (multi = old default)
for g in flat planes multi; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=an_full BENCH_FRAMES=4 BENCH_BUDGET=500 \
    ORT_ENV_GATHER=$g timeout 600 python bench.py 2>&1 \
    | sed "s/^{/{\"env_gather\": \"$g\", /" | tee -a /tmp/r3b_env.log
done

# analytic tile-gate capacity sweep (0 = dense baseline)
for f in 0 0.15 0.25 0.4; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=an_baseline,an_full BENCH_FRAMES=4 \
    BENCH_BUDGET=900 ORT_ANALYTIC_GATE_FRAC=$f \
    timeout 1000 python bench.py 2>&1 \
    | sed "s/^{/{\"gate_frac\": \"$f\", /" | tee -a /tmp/r3b_gate.log
done

# analytic swizzle A/B: the 8x16 block swizzle serves the BVH kernels'
# tile culls; the analytic scene has no kernels, and its frames got
# ~3x slower between the r2-start measurement and r3 (41->153 ms
# baseline-analytic) — suspect the swizzle/unswizzle plumbing.
for sw in 1 0; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=an_baseline,an_full BENCH_FRAMES=4 \
    BENCH_BUDGET=900 ORT_SWIZZLE=$sw timeout 1000 python bench.py 2>&1 \
    | sed "s/^{/{\"swizzle\": \"$sw\", /" | tee -a /tmp/r3b_swz.log
done

# svgf lowering re-check (pallas regressed 13.8 -> 22.6 ms vs jnp 15.98)
timeout 600 python scripts/perf_report.py --child svgf_jnp 2>&1 | tee -a /tmp/r3b_svgf.log
timeout 600 python scripts/perf_report.py --child svgf_pallas 2>&1 | tee -a /tmp/r3b_svgf.log

# TAA gather form A/B (moving resolve, layout probe case)
timeout 600 python scripts/layout_probe.py --case taa 2>&1 | tee /tmp/r3b_taa.log
ORT_TAA_PLANES=1 timeout 600 python scripts/layout_probe.py --case taa 2>&1 \
  | sed 's/^{/{"taa_planes": "1", /' | tee -a /tmp/r3b_taa.log

# ordered walk: now-runnable distance sweep (auto-threshold data)
timeout 2000 python scripts/ordered_sweep.py 2>&1 | tee /tmp/r3b_ordered.log

# swizzle x camera-distance: tune_knobs r3 showed swizzle=0 is ~5 ms
# FASTER on the default-camera baseline frame (31.2 -> 26.4) — but the
# swizzle's compact 2D hulls were built for the close-camera regime, so
# the default flip needs the close/far side too.
for sw in 1 0; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=cf_close,cf_far BENCH_FRAMES=4 \
    BENCH_BUDGET=1100 ORT_SWIZZLE=$sw timeout 1200 python bench.py 2>&1 \
    | sed "s/^{/{\"swizzle\": \"$sw\", /" | tee -a /tmp/r3b_cfswz.log
done

# precision A/B rerun: the r3a pass lost its `highest` reference to a
# compile timeout, so parity (t-delta / hit agreement / image delta)
# was never computed; mixed measured 7.8 ms and default 6.51 ms vs
# highest 10.09 on trace_primary — the flip decision needs the parity
# side.
timeout 1800 python scripts/ab_precision.py 2>&1 | tee /tmp/r3b_ab.log

# final preview: full bench matrix at current defaults
BENCH_SKIP_PROBE=1 BENCH_BUDGET=2400 timeout 2600 python bench.py 2>&1 \
  | tee /tmp/r3b_bench.log
echo DONE
