#!/bin/bash
# Fresh-session chainer (tmp wiped): probe until the worker answers,
# then run the r3n queue from a snapshot clone.  No r3m dependency —
# that session is gone.
cd "$(dirname "$0")/.."
while true; do
  if ! timeout 150 python scripts/childproc.py --probe >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) r3n2 waiting (worker down)" >> /tmp/tpu_probe.log
    sleep 420
    continue
  fi
  echo "$(date -u +%FT%TZ) r3n2: worker answered, launching r3n" \
    >> /tmp/tpu_probe.log
  rm -rf /tmp/r3nsnap
  git clone -q . /tmp/r3nsnap
  ( cd /tmp/r3nsnap && bash scripts/r3n_measure.sh > /tmp/r3n_measure.log 2>&1 )
  if grep -q '^DONE' /tmp/r3n_measure.log \
     && grep -q 'ms_per_frame": [0-9]' /tmp/r3n_bench.log 2>/dev/null; then
    echo "$(date -u +%FT%TZ) R3N_DONE" >> /tmp/tpu_probe.log
    touch /tmp/R3N_MEASURE_DONE
    exit 0
  fi
  echo "$(date -u +%FT%TZ) r3n2 retry (no numbers)" >> /tmp/tpu_probe.log
  sleep 480
done
