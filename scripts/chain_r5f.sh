#!/bin/bash
# Probe until the worker answers, then run r5f from a fresh snapshot
# clone.  Hygiene per ADVICE r3: writes its OWN pid file, never edits
# a running script, and each retry re-clones so the measured tree is
# current HEAD.  Gates on the r5e queue finishing first.
cd "$(dirname "$0")/.."
echo $$ > /tmp/chain_r5f.pid
while [ ! -f /tmp/R5E_MEASURE_DONE ]; do
  if [ -f /tmp/chain_r5e.pid ] && ! kill -0 "$(cat /tmp/chain_r5e.pid)" \
      2>/dev/null; then
    echo "$(date -u +%FT%TZ) r5f: r5e chainer gone, proceeding" \
      >> /tmp/tpu_probe.log
    break
  fi
  sleep 60
done
while true; do
  if ! timeout 150 python scripts/childproc.py --probe >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) r5f waiting (worker down)" >> /tmp/tpu_probe.log
    sleep 420
    continue
  fi
  rm -rf /tmp/r5fsnap
  git clone -q . /tmp/r5fsnap
  ( cd /tmp/r5fsnap && bash scripts/r5f_measure.sh > /tmp/r5f_measure.log 2>&1 )
  if grep -q '^DONE' /tmp/r5f_measure.log; then
    echo "$(date -u +%FT%TZ) R5F_DONE" >> /tmp/tpu_probe.log
    touch /tmp/R5F_MEASURE_DONE
    exit 0
  fi
  echo "$(date -u +%FT%TZ) r5f retry (no DONE)" >> /tmp/tpu_probe.log
  sleep 480
done
