#!/bin/bash
# Probe the tunneled TPU every ~7 min; on the first success, snapshot
# the repo at HEAD into /tmp/r3snap (git clone — committed state only)
# and run the full round-3 measurement sequence THERE, so edits to the
# working tree can never corrupt a sweep in flight (memory: children
# import at start).  Status lines land in /tmp/tpu_probe.log; the
# moment the worker answers /tmp/TPU_ALIVE appears (watch for it and
# stay off the single CPU while the measurement runs).
cd "$(dirname "$0")/.."
while true; do
  if timeout 150 python scripts/childproc.py --probe >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) ALIVE" >> /tmp/tpu_probe.log
    touch /tmp/TPU_ALIVE
    rm -rf /tmp/r3snap
    git clone -q . /tmp/r3snap
    ( cd /tmp/r3snap && bash scripts/r3_measure.sh > /tmp/r3_measure.log 2>&1 )
    echo "$(date -u +%FT%TZ) MEASURE_DONE rc=$?" >> /tmp/tpu_probe.log
    touch /tmp/R3_MEASURE_DONE
    exit 0
  fi
  echo "$(date -u +%FT%TZ) down" >> /tmp/tpu_probe.log
  sleep 420
done
