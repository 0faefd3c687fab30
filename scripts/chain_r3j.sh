#!/bin/bash
# After r3i completes (or its chainer dies), probe until the worker
# answers, then run the r3j bisection from a fresh snapshot clone.
# Retry predicate: DONE reached AND at least one diag JSON line landed.
cd "$(dirname "$0")/.."
while [ ! -f /tmp/R3I_MEASURE_DONE ]; do
  if [ -f /tmp/chain_r3i.pid ] && ! kill -0 "$(cat /tmp/chain_r3i.pid)" \
      2>/dev/null; then
    echo "$(date -u +%FT%TZ) r3j: r3i chainer gone, proceeding" \
      >> /tmp/tpu_probe.log
    break
  fi
  sleep 60
done
while true; do
  if ! timeout 150 python scripts/childproc.py --probe >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) r3j waiting (worker down)" >> /tmp/tpu_probe.log
    sleep 420
    continue
  fi
  rm -rf /tmp/r3jsnap
  git clone -q . /tmp/r3jsnap
  ( cd /tmp/r3jsnap && bash scripts/r3j_measure.sh > /tmp/r3j_measure.log 2>&1 )
  if grep -q '^DONE' /tmp/r3j_measure.log \
     && grep -q '"config"' /tmp/r3j_diag.log 2>/dev/null; then
    echo "$(date -u +%FT%TZ) R3J_DONE" >> /tmp/tpu_probe.log
    touch /tmp/R3J_MEASURE_DONE
    exit 0
  fi
  echo "$(date -u +%FT%TZ) r3j retry (no numbers)" >> /tmp/tpu_probe.log
  sleep 480
done
