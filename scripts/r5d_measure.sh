#!/bin/bash
# Round-5 session D queue:
#  1. cf_close KERNEL-variant matrix over the ablate prefixes: primary
#     and shade under full/nof/noepi/nowalk — the shade-minus-primary
#     deltas decompose the SHADOW stream (feature expansion vs matmul
#     vs epilogue vs skeleton), testing the 683k-active-subtile
#     hypothesis for the 520 ms frame
#  2. viewer interactive-loop FPS at 640x360 (moving turbo landed r5)
set -x
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

# analysis hold: the operator banks the previous session + flips
# defaults, then removes the marker.  EXIT (not wait): the chainer
# retries with a FRESH clone, so the flips land in the measured tree.
if [ -f /tmp/R5_HOLD ]; then echo 'held for analysis (no DONE)'; exit 1; fi

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

: > /tmp/r5d_canary.log
BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=8 BENCH_BUDGET=500 \
  timeout 600 python bench.py 2>&1 | tee /tmp/r5d_canary.log
canary_ms=$(grep -o '"ms_per_frame": [0-9.]*' /tmp/r5d_canary.log \
  | head -1 | awk '{print $2}')
if [ -z "$canary_ms" ] || awk "BEGIN{exit !($canary_ms > 80)}"; then
  echo "canary ${canary_ms:-none} ms — slice degraded, aborting"
  exit 1
fi

: > /tmp/r5d_kvar.log
for c in primary shade; do
  vars="full nof noepi nowalk"
  [ "$c" = primary ] && vars="full nof noepi nowalk nodiv nowin"
  for v in $vars; do
    env ORT_KERN_VARIANT=$v ABLATE_SUBDIV=6 ABLATE_CAM=close \
      ABLATE_REPS=4 timeout 900 python scripts/ablate.py --case $c 2>&1 \
      | sed "s/^{/{\"variant\": \"$v\", /" | tee -a /tmp/r5d_kvar.log
  done
done

: > /tmp/r5d_roofline.log
ROOFLINE_CASES=vpu timeout 600 python scripts/roofline.py 2>&1 \
  | tee /tmp/r5d_roofline.log

: > /tmp/r5d_viewer.log
timeout 1200 python scripts/viewer_fps.py 2>&1 | tee /tmp/r5d_viewer.log

echo DONE
