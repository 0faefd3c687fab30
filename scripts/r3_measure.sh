#!/bin/bash
# Round-3 TPU measurement sequence. Run when the worker is alive —
# normally auto-fired by scripts/probe_loop.sh from a clean snapshot
# clone so in-flight edits of the working repo can't corrupt children.
# Priority order: liveness gate, correctness checks, the BENCH MATRIX
# (the round's headline artifact), then the full-preset rc=1 diagnosis
# (VERDICT r2 item 2), per-component timings, the ordered-threshold
# sweep (item 5), and the longer A/B sweeps — so a worker that wedges
# partway still yields the most important numbers first.
set -x
cd "$(dirname "$0")/.."

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

timeout 600 python scripts/tpu_checks.py 2>&1 | tee /tmp/r3_checks.log
# BENCH_SKIP_PROBE: the gate above already proved liveness; budget 2400
# keeps the final embedded-matrix record inside the 2600 outer cap.
BENCH_SKIP_PROBE=1 BENCH_BUDGET=2400 timeout 2600 python bench.py 2>&1 | tee /tmp/r3_bench.log
# full-preset 1080p BVH diagnosis: run the perf_report child DIRECTLY so
# the complete stderr (the rc=1 traceback) is captured, not just the
# last line.
timeout 900 python scripts/perf_report.py --child frame_full_bvh \
  > /tmp/r3_full_bvh.log 2>&1; echo "full_bvh rc=$?" | tee -a /tmp/r3_full_bvh.log
# layout probe: [H,W,4] minor-dim HBM padding + the TAA gather's real
# cost — both gate round-3 optimization decisions, so run early.
timeout 1200 python scripts/layout_probe.py 2>&1 | tee /tmp/r3_layout.log
timeout 2400 python scripts/perf_report.py 2>&1 | tee /tmp/r3_perf.log
timeout 2000 python scripts/ordered_sweep.py 2>&1 | tee /tmp/r3_ordered.log
timeout 1500 python scripts/ab_precision.py 2>&1 | tee /tmp/r3_ab.log
TUNE_BUDGET=1800 timeout 2000 python scripts/tune_knobs.py 2>&1 | tee /tmp/r3_tune.log
# attribution diagnostics (optional tail — headline artifacts are done)
timeout 1500 python scripts/ablate.py 2>&1 | tee /tmp/r3_ablate.log
timeout 1200 python scripts/close_far.py 2>&1 | tee /tmp/r3_closefar.log
echo DONE
