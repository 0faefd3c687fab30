#!/bin/bash
# Probe until the worker answers, then run r5d from a fresh snapshot
# clone.  Hygiene per ADVICE r3: writes its OWN pid file, never edits
# a running script, and each retry re-clones so the measured tree is
# current HEAD.  Gates on the r5c queue finishing first.
cd "$(dirname "$0")/.."
echo $$ > /tmp/chain_r5d.pid
while [ ! -f /tmp/R5C_MEASURE_DONE ]; do
  if [ -f /tmp/chain_r5c.pid ] && ! kill -0 "$(cat /tmp/chain_r5c.pid)" \
      2>/dev/null; then
    echo "$(date -u +%FT%TZ) r5d: r5c chainer gone, proceeding" \
      >> /tmp/tpu_probe.log
    break
  fi
  sleep 60
done
while true; do
  if ! timeout 150 python scripts/childproc.py --probe >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) r5d waiting (worker down)" >> /tmp/tpu_probe.log
    sleep 420
    continue
  fi
  rm -rf /tmp/r5dsnap
  git clone -q . /tmp/r5dsnap
  ( cd /tmp/r5dsnap && bash scripts/r5d_measure.sh > /tmp/r5d_measure.log 2>&1 )
  if grep -q '^DONE' /tmp/r5d_measure.log; then
    echo "$(date -u +%FT%TZ) R5D_DONE" >> /tmp/tpu_probe.log
    touch /tmp/R5D_MEASURE_DONE
    exit 0
  fi
  echo "$(date -u +%FT%TZ) r5d retry (no DONE)" >> /tmp/tpu_probe.log
  sleep 480
done
