#!/bin/bash
# Probe until the worker answers, then run r5a from a fresh snapshot
# clone.  Hygiene per ADVICE r3: writes its OWN pid file, never edits
# a running script, and each retry re-clones so the measured tree is
# current HEAD.  (r4d already completed; no gating marker needed.)
cd "$(dirname "$0")/.."
echo $$ > /tmp/chain_r5a.pid
while true; do
  if ! timeout 150 python scripts/childproc.py --probe >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) r5a waiting (worker down)" >> /tmp/tpu_probe.log
    sleep 420
    continue
  fi
  rm -rf /tmp/r5asnap
  git clone -q . /tmp/r5asnap
  ( cd /tmp/r5asnap && bash scripts/r5a_measure.sh > /tmp/r5a_measure.log 2>&1 )
  if grep -q '^DONE' /tmp/r5a_measure.log; then
    echo "$(date -u +%FT%TZ) R5A_DONE" >> /tmp/tpu_probe.log
    touch /tmp/R5A_MEASURE_DONE
    exit 0
  fi
  echo "$(date -u +%FT%TZ) r5a retry (no DONE)" >> /tmp/tpu_probe.log
  sleep 480
done
