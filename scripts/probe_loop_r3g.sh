#!/bin/bash
# Probe the tunneled TPU every ~7 min; on the first success, snapshot
# the repo at HEAD into /tmp/r3gsnap (git clone — committed state only)
# and run the r3g measurement queue THERE (BVH gate sweep + heavy
# swizzle paired A/B + default bench).  Status in /tmp/tpu_probe.log;
# /tmp/TPU_ALIVE appears on first contact, /tmp/R3G_MEASURE_DONE when
# the queue finishes (stay off the single CPU while it runs).
cd "$(dirname "$0")/.."
while true; do
  if timeout 150 python scripts/childproc.py --probe >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) ALIVE" >> /tmp/tpu_probe.log
    touch /tmp/TPU_ALIVE
    rm -rf /tmp/r3gsnap
    git clone -q . /tmp/r3gsnap
    ( cd /tmp/r3gsnap && bash scripts/r3g_measure.sh > /tmp/r3g_measure.log 2>&1 )
    echo "$(date -u +%FT%TZ) MEASURE_DONE rc=$?" >> /tmp/tpu_probe.log
    touch /tmp/R3G_MEASURE_DONE
    exit 0
  fi
  echo "$(date -u +%FT%TZ) down" >> /tmp/tpu_probe.log
  sleep 420
done
