#!/bin/bash
# Wait for the r3g measurement queue to finish, then run r3h from a
# fresh snapshot clone (committed state only — includes the SVGF
# restructure).  Touches /tmp/R3H_MEASURE_DONE when finished.
cd "$(dirname "$0")/.."
while [ ! -f /tmp/R3G_MEASURE_DONE ]; do sleep 60; done
rm -rf /tmp/r3hsnap
git clone -q . /tmp/r3hsnap
( cd /tmp/r3hsnap && bash scripts/r3h_measure.sh > /tmp/r3h_measure.log 2>&1 )
echo "$(date -u +%FT%TZ) R3H_DONE rc=$?" >> /tmp/tpu_probe.log
touch /tmp/R3H_MEASURE_DONE
