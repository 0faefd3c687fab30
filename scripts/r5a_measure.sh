#!/bin/bash
# Round-5 session A queue — attribution before levers (VERDICT r4):
#  1. cf_close FRAME ablation at the bench camera/scene: the r4d
#     kernel attribution put the primary closest-hit at ~13 ms true,
#     so ~97% of the 520 ms frame is elsewhere — find it.
#  2. TAA gather lowering probes (row gather is ~5 ns/row; do aligned
#     sublane take_along_axis / patch rows change the class?)
#  3. GROUP=8 equal-frames pair (r4d's 13.35@F8 vs 15.92@F4 was
#     frame-count-confounded).
set -x
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

: > /tmp/r5a_canary.log
BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=8 BENCH_BUDGET=500 \
  timeout 600 python bench.py 2>&1 | tee /tmp/r5a_canary.log
canary_ms=$(grep -o '"ms_per_frame": [0-9.]*' /tmp/r5a_canary.log \
  | head -1 | awk '{print $2}')
if [ -z "$canary_ms" ] || awk "BEGIN{exit !($canary_ms > 80)}"; then
  echo "canary ${canary_ms:-none} ms — slice degraded, aborting"
  exit 1
fi

# 1. cf_close frame ablation (81,920 tris, bench CLOSE_POS, 1080p).
#    shade_occ0 skips the shadow any-hit kernels entirely (cull plan
#    still built); shade_win0 launches them with collapsed windows;
#    shade is the real wavefront — the deltas attribute shadow cull
#    prep / kernel fixed cost / walk work separately.
: > /tmp/r5a_cfablate.log
ABLATE_SUBDIV=6 ABLATE_CAM=close ABLATE_REPS=4 timeout 3600 \
  python scripts/ablate.py 2>&1 | tee /tmp/r5a_cfablate.log

# 2. TAA gather lowering probes
: > /tmp/r5a_taamicro.log
timeout 1500 python scripts/taa_micro.py 2>&1 | tee /tmp/r5a_taamicro.log

# 3. GROUP equal-frames pair (16-frame children, same session)
: > /tmp/r5a_group.log
for g in 4 8; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=baseline,heavy BENCH_FRAMES=16 \
    BENCH_BUDGET=900 BENCH_TIMEOUT=700 ORT_CHUNK_GROUP=$g \
    timeout 1000 python bench.py 2>&1 \
    | sed "s/^{/{\"group\": $g, /" | tee -a /tmp/r5a_group.log
done

echo DONE
