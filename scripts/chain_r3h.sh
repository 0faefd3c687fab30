#!/bin/bash
# Wait for the r3g measurement queue to finish, then run r3h from a
# fresh snapshot clone (committed state only — includes the SVGF
# restructure + deferred-normal kernel).  The worker wedges at random:
# retry the whole r3h queue (probe-gated inside) every ~8 min until its
# log reaches DONE.  Touches /tmp/R3H_MEASURE_DONE when finished.
cd "$(dirname "$0")/.."
while [ ! -f /tmp/R3G_MEASURE_DONE ]; do sleep 60; done
while true; do
  rm -rf /tmp/r3hsnap
  git clone -q . /tmp/r3hsnap
  ( cd /tmp/r3hsnap && bash scripts/r3h_measure.sh > /tmp/r3h_measure.log 2>&1 )
  if grep -q '^DONE' /tmp/r3h_measure.log; then
    echo "$(date -u +%FT%TZ) R3H_DONE" >> /tmp/tpu_probe.log
    touch /tmp/R3H_MEASURE_DONE
    exit 0
  fi
  echo "$(date -u +%FT%TZ) r3h retry (worker down?)" >> /tmp/tpu_probe.log
  sleep 480
done
