#!/bin/bash
# Round-2 TPU measurement sequence. Run when the worker is alive.
# Each step bounded; logs land in /tmp/r2_*.log. Priority order: a
# quick liveness gate, correctness, then the BENCH MATRIX (the round's
# headline artifact) before the longer per-component/A-B sweeps, so a
# worker that wedges partway still yields the most important numbers.
set -x
cd "$(dirname "$0")/.."

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

timeout 600 python scripts/tpu_checks.py 2>&1 | tee /tmp/r2_checks.log
# BENCH_SKIP_PROBE: the gate above already proved liveness; budget 2400
# keeps the final embedded-matrix record inside the 2600 outer cap.
BENCH_SKIP_PROBE=1 BENCH_BUDGET=2400 timeout 2600 python bench.py 2>&1 | tee /tmp/r2_bench.log
timeout 2400 python scripts/perf_report.py 2>&1 | tee /tmp/r2_perf.log
timeout 1500 python scripts/ab_precision.py 2>&1 | tee /tmp/r2_ab.log
TUNE_BUDGET=1800 timeout 2000 python scripts/tune_knobs.py 2>&1 | tee /tmp/r2_tune.log
# attribution diagnostics (optional tail — headline artifacts are done)
timeout 1500 python scripts/ablate.py 2>&1 | tee /tmp/r2_ablate.log
timeout 1500 python scripts/probe_incoherent.py 2>&1 | tee /tmp/r2_probe.log
echo DONE
