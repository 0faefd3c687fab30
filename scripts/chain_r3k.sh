#!/bin/bash
# After r3j completes (or its chainer dies), probe until the worker
# answers, then run r3k from a fresh snapshot clone.
cd "$(dirname "$0")/.."
while [ ! -f /tmp/R3J_MEASURE_DONE ]; do
  if [ -f /tmp/chain_r3j.pid ] && ! kill -0 "$(cat /tmp/chain_r3j.pid)" \
      2>/dev/null; then
    echo "$(date -u +%FT%TZ) r3k: r3j chainer gone, proceeding" \
      >> /tmp/tpu_probe.log
    break
  fi
  sleep 60
done
while true; do
  if ! timeout 150 python scripts/childproc.py --probe >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) r3k waiting (worker down)" >> /tmp/tpu_probe.log
    sleep 420
    continue
  fi
  rm -rf /tmp/r3ksnap
  git clone -q . /tmp/r3ksnap
  ( cd /tmp/r3ksnap && bash scripts/r3k_measure.sh > /tmp/r3k_measure.log 2>&1 )
  if grep -q '^DONE' /tmp/r3k_measure.log \
     && grep -q 'ms_per_frame": [0-9]' /tmp/r3k_bench.log 2>/dev/null; then
    echo "$(date -u +%FT%TZ) R3K_DONE" >> /tmp/tpu_probe.log
    touch /tmp/R3K_MEASURE_DONE
    exit 0
  fi
  echo "$(date -u +%FT%TZ) r3k retry (no numbers)" >> /tmp/tpu_probe.log
  sleep 480
done
