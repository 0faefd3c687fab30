#!/bin/bash
# Round-3 fifteenth pass — attribute the moving-vs-full gap, sweep the
# small-page close-camera lever (PAGE_CHUNKS x PAGE_ORDER under the
# default inter-page tcap), re-attribute an_full under AN_PALLAS
# (incl. the never-measured marker/mirror/glass/taa/frame tail), and
# price SVGF Pallas on the current defaults.  Cheap cases first so a
# wedge banks the most information.
set -x
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

# log hygiene (CLAUDE.md): zero per-study logs at start so crashed/
# retried runs never mix populations; a live writer's offset stays
# harmless with truncation (vs rm).
: > /tmp/r3o_canary.log
: > /tmp/r3o_moving.log
: > /tmp/r3o_frames.log
: > /tmp/r3o_svgf.log
: > /tmp/r3o_subtiles.log
: > /tmp/r3o_anablate.log
: > /tmp/r3o_cf.log

BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=4 BENCH_BUDGET=500 \
  timeout 600 python bench.py 2>&1 | tee /tmp/r3o_canary.log
canary_ms=$(grep -o '"ms_per_frame": [0-9.]*' /tmp/r3o_canary.log \
  | head -1 | awk '{print $2}')
if [ -z "$canary_ms" ] || awk "BEGIN{exit !($canary_ms > 80)}"; then
  echo "canary ${canary_ms:-none} ms — slice degraded, aborting"
  exit 1
fi

# 1. moving attribution: which part of the +15 ms over static-full is
#    camera proximity (dolly) vs rotation (yaw) vs the TAA-reproj/
#    accum-reset path alone (still)?
for m in still yaw dolly full; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=moving BENCH_FRAMES=8 BENCH_BUDGET=700 \
    BENCH_TIMEOUT=600 BENCH_MOVING_MODE=$m \
    timeout 800 python bench.py 2>&1 \
    | sed "s/^{/{\"mode\": \"$m\", /" | tee -a /tmp/r3o_moving.log
done

# 2. dispatch-floor amortization headroom on the headline (16 is the
#    default; 32 halves the ~1.6 ms residual if memory allows)
BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=32 BENCH_BUDGET=700 \
  BENCH_TIMEOUT=600 timeout 800 python bench.py 2>&1 \
  | sed 's/^{/{"frames32": 1, /' | tee -a /tmp/r3o_frames.log

# 3. SVGF Pallas vs jnp at the current defaults (full preset carries
#    the filter; last paired numbers predate x3/scoped-vmem)
for sp in 0 1; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=full BENCH_FRAMES=8 BENCH_BUDGET=700 \
    BENCH_TIMEOUT=600 ORT_SVGF_PALLAS=$sp \
    timeout 800 python bench.py 2>&1 \
    | sed "s/^{/{\"svgfp\": $sp, /" | tee -a /tmp/r3o_svgf.log
done

# 3b. grid-step amortization: the CPU cull-stats study (r3o) puts the
#     bench camera at 516/16224 active tiles and 59.5 GFLOP ~ 0.74 ms
#     of real MXU work vs the ~4.3 ms measured primary kernel — the
#     rest is per-grid-step overhead (507 steps at SUBTILES=32).
#     Bigger blocks cut steps linearly; per-tile windows still gate
#     the inner loop.
for st in 64 128; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=baseline,heavy BENCH_FRAMES=8 \
    BENCH_BUDGET=1000 BENCH_TIMEOUT=700 ORT_SUBTILES=$st \
    timeout 1200 python bench.py 2>&1 \
    | sed "s/^{/{\"subtiles\": $st, /" | tee -a /tmp/r3o_subtiles.log
done

# 4. an_full stage attribution under AN_PALLAS=1 — the r3l run lost the
#    marker/mirror/glass/taa/frame tail to the wedge and predates the
#    megakernel; direct/gi deltas price the kernel per call site.
ORT_AN_PALLAS=1 ABLATE_REPS=8 timeout 2400 \
  python scripts/ablate_analytic.py 2>&1 | tee /tmp/r3o_anablate.log

# 5. close-camera small-page sweep: PAGE_ORDER=1 stacks pages into a
#    near-first lax.scan (required for small pages — unrolled launches
#    blow compile time), inter-page tcap default-on.  r3n's nine-case
#    record is the {96, order0} reference point.
for pc in 24 48 96; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=cf_close BENCH_FRAMES=4 \
    BENCH_BUDGET=1000 BENCH_TIMEOUT=900 \
    ORT_PAGE_CHUNKS=$pc ORT_PAGE_ORDER=1 \
    timeout 1100 python bench.py 2>&1 \
    | sed "s/^{/{\"pc\": $pc, \"porder\": 1, /" | tee -a /tmp/r3o_cf.log
done
# far-camera regression check + moving confirm at the smallest page
BENCH_SKIP_PROBE=1 BENCH_CASES=cf_far BENCH_FRAMES=8 BENCH_BUDGET=700 \
  BENCH_TIMEOUT=600 ORT_PAGE_CHUNKS=24 ORT_PAGE_ORDER=1 \
  timeout 800 python bench.py 2>&1 \
  | sed 's/^{/{"pc": 24, "porder": 1, /' | tee -a /tmp/r3o_cf.log
BENCH_SKIP_PROBE=1 BENCH_CASES=moving BENCH_FRAMES=8 BENCH_BUDGET=700 \
  BENCH_TIMEOUT=600 ORT_PAGE_CHUNKS=24 ORT_PAGE_ORDER=1 \
  timeout 800 python bench.py 2>&1 \
  | sed 's/^{/{"mode": "full", "pc": 24, "porder": 1, /' \
  | tee -a /tmp/r3o_moving.log

echo DONE
