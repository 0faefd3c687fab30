#!/bin/bash
# After r3o completes (or its chainer dies), probe until the worker
# answers, then run r4a from a fresh snapshot clone.  Hygiene per
# ADVICE r3: writes its OWN pid file, never edits a running script,
# and each retry re-clones so the measured tree is current HEAD.
cd "$(dirname "$0")/.."
echo $$ > /tmp/chain_r4a.pid
while [ ! -f /tmp/R3O_MEASURE_DONE ]; do
  if [ -f /tmp/chain_r3o.pid ] && ! kill -0 "$(cat /tmp/chain_r3o.pid)" \
      2>/dev/null; then
    echo "$(date -u +%FT%TZ) r4a: r3o chainer gone, proceeding" \
      >> /tmp/tpu_probe.log
    break
  fi
  sleep 60
done
while true; do
  if ! timeout 150 python scripts/childproc.py --probe >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) r4a waiting (worker down)" >> /tmp/tpu_probe.log
    sleep 420
    continue
  fi
  rm -rf /tmp/r4asnap
  git clone -q . /tmp/r4asnap
  ( cd /tmp/r4asnap && bash scripts/r4a_measure.sh > /tmp/r4a_measure.log 2>&1 )
  if grep -q '^DONE' /tmp/r4a_measure.log; then
    echo "$(date -u +%FT%TZ) R4A_DONE" >> /tmp/tpu_probe.log
    touch /tmp/R4A_MEASURE_DONE
    exit 0
  fi
  echo "$(date -u +%FT%TZ) r4a retry (no DONE)" >> /tmp/tpu_probe.log
  sleep 480
done
