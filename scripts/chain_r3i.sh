#!/bin/bash
# After r3h's process tree exits, probe until the worker answers, then
# run r3i from a fresh snapshot clone.  Retry predicate: at least one
# real ms_per_frame in the defer log AND the script reached DONE —
# otherwise the whole queue re-fires (a wedged worker makes every child
# time out while the script still "completes").
cd "$(dirname "$0")/.."
while [ ! -f /tmp/R3H_MEASURE_DONE ]; do sleep 60; done
while true; do
  if ! timeout 150 python scripts/childproc.py --probe >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) r3i waiting (worker down)" >> /tmp/tpu_probe.log
    sleep 420
    continue
  fi
  rm -rf /tmp/r3isnap
  git clone -q . /tmp/r3isnap
  ( cd /tmp/r3isnap && bash scripts/r3i_measure.sh > /tmp/r3i_measure.log 2>&1 )
  if grep -q '^DONE' /tmp/r3i_measure.log \
     && grep -q 'ms_per_frame": [0-9]' /tmp/r3i_defer.log 2>/dev/null; then
    echo "$(date -u +%FT%TZ) R3I_DONE" >> /tmp/tpu_probe.log
    touch /tmp/R3I_MEASURE_DONE
    exit 0
  fi
  echo "$(date -u +%FT%TZ) r3i retry (no numbers)" >> /tmp/tpu_probe.log
  sleep 480
done
