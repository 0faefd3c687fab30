#!/bin/bash
# Round-2 TPU measurement sequence. Run when the worker is alive.
# Each step bounded; logs land in /tmp/r2_*.log. Order: correctness
# first, then per-component timings, precision A/B, the bench matrix.
set -x
cd "$(dirname "$0")/.."

timeout 600 python scripts/tpu_checks.py 2>&1 | tee /tmp/r2_checks.log
timeout 2400 python scripts/perf_report.py 2>&1 | tee /tmp/r2_perf.log
timeout 1500 python scripts/ab_precision.py 2>&1 | tee /tmp/r2_ab.log
BENCH_BUDGET=2400 timeout 2600 python bench.py 2>&1 | tee /tmp/r2_bench.log
echo DONE
