#!/bin/bash
# After r3k completes (or its chainer dies), probe until the worker
# answers, then run r3l from a fresh snapshot clone.
cd "$(dirname "$0")/.."
while [ ! -f /tmp/R3K_MEASURE_DONE ]; do
  if [ -f /tmp/chain_r3k.pid ] && ! kill -0 "$(cat /tmp/chain_r3k.pid)" \
      2>/dev/null; then
    echo "$(date -u +%FT%TZ) r3l: r3k chainer gone, proceeding" \
      >> /tmp/tpu_probe.log
    break
  fi
  sleep 60
done
while true; do
  if ! timeout 150 python scripts/childproc.py --probe >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) r3l waiting (worker down)" >> /tmp/tpu_probe.log
    sleep 420
    continue
  fi
  rm -rf /tmp/r3lsnap
  git clone -q . /tmp/r3lsnap
  ( cd /tmp/r3lsnap && bash scripts/r3l_measure.sh > /tmp/r3l_measure.log 2>&1 )
  if grep -q '^DONE' /tmp/r3l_measure.log \
     && grep -q 'ms_per_frame": [0-9]' /tmp/r3l_bench.log 2>/dev/null; then
    echo "$(date -u +%FT%TZ) R3L_DONE" >> /tmp/tpu_probe.log
    touch /tmp/R3L_MEASURE_DONE
    exit 0
  fi
  echo "$(date -u +%FT%TZ) r3l retry (no numbers)" >> /tmp/tpu_probe.log
  sleep 480
done
