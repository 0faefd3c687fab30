#!/bin/bash
# After r3n completes (or its chainer dies), probe until the worker
# answers, then run r3o from a fresh snapshot clone.
cd "$(dirname "$0")/.."
while [ ! -f /tmp/R3N_MEASURE_DONE ]; do
  if [ -f /tmp/chain_r3n2.pid ] && ! kill -0 "$(cat /tmp/chain_r3n2.pid)" \
      2>/dev/null; then
    echo "$(date -u +%FT%TZ) r3o: r3n chainer gone, proceeding" \
      >> /tmp/tpu_probe.log
    break
  fi
  sleep 60
done
while true; do
  if ! timeout 150 python scripts/childproc.py --probe >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) r3o waiting (worker down)" >> /tmp/tpu_probe.log
    sleep 420
    continue
  fi
  rm -rf /tmp/r3osnap
  git clone -q . /tmp/r3osnap
  ( cd /tmp/r3osnap && bash scripts/r3o_measure.sh > /tmp/r3o_measure.log 2>&1 )
  if grep -q '^DONE' /tmp/r3o_measure.log; then
    echo "$(date -u +%FT%TZ) R3O_DONE" >> /tmp/tpu_probe.log
    touch /tmp/R3O_MEASURE_DONE
    exit 0
  fi
  echo "$(date -u +%FT%TZ) r3o retry (no DONE)" >> /tmp/tpu_probe.log
  sleep 480
done
