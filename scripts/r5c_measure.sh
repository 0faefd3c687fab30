#!/bin/bash
# Round-5 session C queue — the baseline/heavy lever arms:
#  0. diag: kattrib-vs-ablate primary discrepancy (13 vs 48 ms at the
#     close camera — same scene, two trace formulations, one child)
#  1. control pair (current defaults) for same-session comparison
#  2. ORT_SWIZZLE=1 on the 1-page scene (auto=off there; r2's -5 ms
#     verdict predates x3/gates — block-level sky sparsity needs it)
#  3. ORT_SUBTILES down (8/16): the ~4 ms primary-kernel overhead is
#     per-SUBTILE scalar iteration over mostly-inactive subtiles —
#     smaller blocks shift skipping to the per-block gate
#  4. ORT_SPP_SHADOW_DEDUP pair on heavy (new default; evidence)
#  5. ORT_SHADOW_PACK=1 heavy/full (r4b arms all died pre-fix)
set -x
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

# analysis hold: the operator banks the previous session + flips
# defaults, then removes the marker.  EXIT (not wait): the chainer
# retries with a FRESH clone, so the flips land in the measured tree.
if [ -f /tmp/R5_HOLD ]; then echo 'held for analysis (no DONE)'; exit 1; fi

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

: > /tmp/r5c_canary.log
BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=8 BENCH_BUDGET=500 \
  timeout 600 python bench.py 2>&1 | tee /tmp/r5c_canary.log
canary_ms=$(grep -o '"ms_per_frame": [0-9.]*' /tmp/r5c_canary.log \
  | head -1 | awk '{print $2}')
if [ -z "$canary_ms" ] || awk "BEGIN{exit !($canary_ms > 80)}"; then
  echo "canary ${canary_ms:-none} ms — slice degraded, aborting"
  exit 1
fi

# 0. SHADOW EXIT CADENCE sweep — the suspected cf_close monster: the
#    legacy walk pays a vector->scalar sync (jnp.min(occ) feeding the
#    loop bound) on EVERY window step; 259k shadow steps at close.
#    K>1 checks every K steps (scalar-only in between); 0 = no exit.
: > /tmp/r5c_exit.log
# skip if the r5b queue already ran the sweep (promoted there)
if ! grep -q ms_per_frame /tmp/r5b_exit.log 2>/dev/null; then
for ev in 8 0 4 1; do
  env BENCH_SKIP_PROBE=1 BENCH_CASES=cf_close,cf_far,baseline \
    BENCH_FRAMES=8 BENCH_BUDGET=1300 BENCH_TIMEOUT=900 \
    ORT_SHADOW_EXIT_EVERY=$ev timeout 1400 python bench.py 2>&1 \
    | sed "s/^{/{\"exit_every\": $ev, /" | tee -a /tmp/r5c_exit.log
done
fi

: > /tmp/r5c_diag.log
DP_REPS=4 timeout 1500 python scripts/diag_primary.py 2>&1 \
  | tee /tmp/r5c_diag.log

# r5a repair: the cf_close shade/taa/frame ablation cases died on an
# 18.16M scoped-vmem loop fusion (ablate.py jitted without
# frame_jit_options — fixed); re-run just those
: > /tmp/r5c_cfablate.log
for c in shade taa frame; do
  ABLATE_SUBDIV=6 ABLATE_CAM=close ABLATE_REPS=4 timeout 900 \
    python scripts/ablate.py --case $c 2>&1 | tee -a /tmp/r5c_cfablate.log
done

: > /tmp/r5c_arms.log
run_arm () {  # tag cases extra-env...
  local tag="$1" cases="$2"; shift 2
  env BENCH_SKIP_PROBE=1 BENCH_CASES="$cases" BENCH_FRAMES=8 \
    BENCH_BUDGET=900 BENCH_TIMEOUT=700 "$@" \
    timeout 1000 python bench.py 2>&1 \
    | sed "s/^{/{\"arm\": \"$tag\", /" | tee -a /tmp/r5c_arms.log
}

run_arm control "baseline,heavy"
run_arm swizzle1 "baseline,realistic,full" ORT_SWIZZLE=1
run_arm subtiles16 "baseline" ORT_SUBTILES=16
run_arm subtiles8 "baseline" ORT_SUBTILES=8
run_arm sppdedup0 "heavy" ORT_SPP_SHADOW_DEDUP=0
run_arm ndlgate0 "cf_close,baseline,heavy" ORT_NDL_SHADOW_GATE=0
run_arm whulls0 "cf_close" ORT_WINDOW_HULLS=0
run_arm spack1 "heavy,full" ORT_SHADOW_PACK=1

echo DONE
