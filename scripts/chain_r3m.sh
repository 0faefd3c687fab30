#!/bin/bash
# After r3l completes (or its chainer dies), probe until the worker
# answers, then run r3m from a fresh snapshot clone.
cd "$(dirname "$0")/.."
while [ ! -f /tmp/R3L_MEASURE_DONE ]; do
  if [ -f /tmp/chain_r3l.pid ] && ! kill -0 "$(cat /tmp/chain_r3l.pid)" \
      2>/dev/null; then
    echo "$(date -u +%FT%TZ) r3m: r3l chainer gone, proceeding" \
      >> /tmp/tpu_probe.log
    break
  fi
  sleep 60
done
while true; do
  if ! timeout 150 python scripts/childproc.py --probe >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) r3m waiting (worker down)" >> /tmp/tpu_probe.log
    sleep 420
    continue
  fi
  rm -rf /tmp/r3msnap
  git clone -q . /tmp/r3msnap
  ( cd /tmp/r3msnap && bash scripts/r3m_measure.sh > /tmp/r3m_measure.log 2>&1 )
  if grep -q '^DONE' /tmp/r3m_measure.log \
     && grep -q 'ms_per_frame": [0-9]' /tmp/r3m_cf.log 2>/dev/null; then
    echo "$(date -u +%FT%TZ) R3M_DONE" >> /tmp/tpu_probe.log
    touch /tmp/R3M_MEASURE_DONE
    exit 0
  fi
  echo "$(date -u +%FT%TZ) r3m retry (no numbers)" >> /tmp/tpu_probe.log
  sleep 480
done
