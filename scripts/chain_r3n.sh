#!/bin/bash
# After r3m completes (or its chainer dies), probe until the worker
# answers, then run r3n from a fresh snapshot clone.
cd "$(dirname "$0")/.."
while [ ! -f /tmp/R3M_MEASURE_DONE ]; do
  if [ -f /tmp/chain_r3m.pid ] && ! kill -0 "$(cat /tmp/chain_r3m.pid)" \
      2>/dev/null; then
    echo "$(date -u +%FT%TZ) r3n: r3m chainer gone, proceeding" \
      >> /tmp/tpu_probe.log
    break
  fi
  sleep 60
done
while true; do
  if ! timeout 150 python scripts/childproc.py --probe >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) r3n waiting (worker down)" >> /tmp/tpu_probe.log
    sleep 420
    continue
  fi
  rm -rf /tmp/r3nsnap
  git clone -q . /tmp/r3nsnap
  ( cd /tmp/r3nsnap && bash scripts/r3n_measure.sh > /tmp/r3n_measure.log 2>&1 )
  if grep -q '^DONE' /tmp/r3n_measure.log \
     && grep -q 'ms_per_frame": [0-9]' /tmp/r3n_bench.log 2>/dev/null; then
    echo "$(date -u +%FT%TZ) R3N_DONE" >> /tmp/tpu_probe.log
    touch /tmp/R3N_MEASURE_DONE
    exit 0
  fi
  echo "$(date -u +%FT%TZ) r3n retry (no numbers)" >> /tmp/tpu_probe.log
  sleep 480
done
