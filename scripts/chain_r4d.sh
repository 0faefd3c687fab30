#!/bin/bash
# After r4b completes (or its chainer dies), probe until the worker
# answers, then run r4c from a fresh snapshot clone.
cd "$(dirname "$0")/.."
echo $$ > /tmp/chain_r4d.pid
while [ ! -f /tmp/R4C_MEASURE_DONE ]; do
  if [ -f /tmp/chain_r4c.pid ] && ! kill -0 "$(cat /tmp/chain_r4c.pid)" \
      2>/dev/null; then
    echo "$(date -u +%FT%TZ) r4d: r4b chainer gone, proceeding" \
      >> /tmp/tpu_probe.log
    break
  fi
  sleep 60
done
while true; do
  if ! timeout 150 python scripts/childproc.py --probe >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) r4d waiting (worker down)" >> /tmp/tpu_probe.log
    sleep 420
    continue
  fi
  rm -rf /tmp/r4dsnap
  git clone -q . /tmp/r4dsnap
  ( cd /tmp/r4dsnap && bash scripts/r4d_measure.sh > /tmp/r4d_measure.log 2>&1 )
  if grep -q '^DONE' /tmp/r4d_measure.log; then
    echo "$(date -u +%FT%TZ) R4D_DONE" >> /tmp/tpu_probe.log
    touch /tmp/R4D_MEASURE_DONE
    exit 0
  fi
  echo "$(date -u +%FT%TZ) r4d retry (no DONE)" >> /tmp/tpu_probe.log
  sleep 480
done
