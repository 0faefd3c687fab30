#!/bin/bash
# After r4a completes (or its chainer dies), probe until the worker
# answers, then run r4b from a fresh snapshot clone.  Hygiene: own pid
# file, never edit a running script, re-clone per retry.
cd "$(dirname "$0")/.."
echo $$ > /tmp/chain_r4b.pid
while [ ! -f /tmp/R4A_MEASURE_DONE ]; do
  if [ -f /tmp/chain_r4a.pid ] && ! kill -0 "$(cat /tmp/chain_r4a.pid)" \
      2>/dev/null; then
    echo "$(date -u +%FT%TZ) r4b: r4a chainer gone, proceeding" \
      >> /tmp/tpu_probe.log
    break
  fi
  sleep 60
done
while true; do
  if ! timeout 150 python scripts/childproc.py --probe >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) r4b waiting (worker down)" >> /tmp/tpu_probe.log
    sleep 420
    continue
  fi
  rm -rf /tmp/r4bsnap
  git clone -q . /tmp/r4bsnap
  ( cd /tmp/r4bsnap && bash scripts/r4b_measure.sh > /tmp/r4b_measure.log 2>&1 )
  if grep -q '^DONE' /tmp/r4b_measure.log; then
    echo "$(date -u +%FT%TZ) R4B_DONE" >> /tmp/tpu_probe.log
    touch /tmp/R4B_MEASURE_DONE
    exit 0
  fi
  echo "$(date -u +%FT%TZ) r4b retry (no DONE)" >> /tmp/tpu_probe.log
  sleep 480
done
