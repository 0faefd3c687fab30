#!/bin/bash
# Round-4 first hardware pass — bank the round-4 code knobs and the
# post-flip round record.  Cheap cases first so a wedge banks the most
# information.  Schemas: every A/B line gets ONE extra key naming its
# knob value; each study writes its OWN log, zeroed at start.
set -x
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

timeout 150 python scripts/childproc.py --probe \
  || { echo 'TPU unreachable, aborting'; exit 1; }

: > /tmp/r4a_canary.log
: > /tmp/r4a_angate.log
: > /tmp/r4a_anrec.log
: > /tmp/r4a_bench.log

BENCH_SKIP_PROBE=1 BENCH_CASES=baseline BENCH_FRAMES=4 BENCH_BUDGET=500 \
  timeout 600 python bench.py 2>&1 | tee /tmp/r4a_canary.log
canary_ms=$(grep -o '"ms_per_frame": [0-9.]*' /tmp/r4a_canary.log \
  | head -1 | awk '{print $2}')
if [ -z "$canary_ms" ] || awk "BEGIN{exit !($canary_ms > 80)}"; then
  echo "canary ${canary_ms:-none} ms — slice degraded, aborting"
  exit 1
fi

# 1. ORT_AN_HIT_GATE A/B (new r4 knob): compacts the whole analytic
#    shade to hit tiles.  0 = dense (current default), 0.65/0.8 probe
#    the capacity; an_full's default camera has ~40% sky tiles.
# budget 1400 keeps every arm at 8 frames: bench's low-budget degrade
# path (<240s remaining -> 4-frame run) must never split an A/B's
# populations between arms
for g in 0 0.65 0.8; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=an_baseline,an_full BENCH_FRAMES=8 \
    BENCH_BUDGET=1400 BENCH_TIMEOUT=600 ORT_AN_HIT_GATE=$g \
    timeout 1500 python bench.py 2>&1 \
    | sed "s/^{/{\"angate\": \"$g\", /" | tee -a /tmp/r4a_angate.log
done

# 1b. ORT_AN_LIGHT_BATCH A/B (r4 code change: glass 3-batch + primary/
#     GI 2-batch direct-light fusion — fewer megakernel launches).
: > /tmp/r4a_anbatch.log
for lb in 0 1; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=an_baseline,an_full BENCH_FRAMES=8 \
    BENCH_BUDGET=1400 BENCH_TIMEOUT=600 ORT_AN_LIGHT_BATCH=$lb \
    timeout 1500 python bench.py 2>&1 \
    | sed "s/^{/{\"anbatch\": $lb, /" | tee -a /tmp/r4a_anbatch.log
done

# 1c. an_full env-gather attribution: the r3o ablation's `direct`
#     stage costs 49.2 ms WITH the megakernel (53.1 jnp) while the
#     no-env an_baseline halved — the suspect is the 4-tap cubemap
#     gather.  no-env run bounds its share; ORT_ENV_GATHER=planes is
#     the never-measured alternative lowering.
: > /tmp/r4a_anenv.log
BENCH_SKIP_PROBE=1 BENCH_CASES=an_full BENCH_FRAMES=8 BENCH_BUDGET=700 \
  BENCH_TIMEOUT=600 BENCH_AN_ENV=0 timeout 800 python bench.py 2>&1 \
  | sed 's/^{/{"anenv": 0, /' | tee -a /tmp/r4a_anenv.log
for eg in planes onetake u8 patch patch_u8; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=an_full BENCH_FRAMES=8 BENCH_BUDGET=700 \
    BENCH_TIMEOUT=600 ORT_ENV_GATHER=$eg timeout 800 python bench.py 2>&1 \
    | sed "s/^{/{\"envgather\": \"$eg\", /" | tee -a /tmp/r4a_anenv.log
done

# 1c2. env-gather tile gates: sky(rd) only on miss tiles, the
#      megakernel's sky_r only on mirror/glass tiles (the sole
#      consumers).  Bit-parity pinned by test_pipeline.
: > /tmp/r4a_skygate.log
BENCH_SKIP_PROBE=1 BENCH_CASES=an_full BENCH_FRAMES=8 BENCH_BUDGET=700 \
  BENCH_TIMEOUT=600 ORT_SKY_MISS_GATE=0.75 ORT_AN_SKYR_GATE=0.15 \
  timeout 800 python bench.py 2>&1 \
  | sed 's/^{/{"skygates": 1, /' | tee -a /tmp/r4a_skygate.log

# 1d. megakernel rows-per-step: if the an_full `direct` stage's 45 ms
#     is kernel-side (not the env gathers), fatter grid steps move it.
: > /tmp/r4a_anblock.log
for ab in 128 256; do
  BENCH_SKIP_PROBE=1 BENCH_CASES=an_full BENCH_FRAMES=8 BENCH_BUDGET=700 \
    BENCH_TIMEOUT=600 ORT_AN_BLOCK=$ab timeout 800 python bench.py 2>&1 \
    | sed "s/^{/{\"anblock\": $ab, /" | tee -a /tmp/r4a_anblock.log
done

# 2. Post-AN_PALLAS-flip analytic record at 16 frames (default knobs).
BENCH_SKIP_PROBE=1 BENCH_CASES=an_baseline,an_full BENCH_FRAMES=16 \
  BENCH_BUDGET=900 BENCH_TIMEOUT=600 timeout 1000 python bench.py 2>&1 \
  | sed 's/^{/{"postflip": 1, /' | tee -a /tmp/r4a_anrec.log

# 2b. moving 'still' mode retry: r3o lost it to the cold compile (it
#     ran first); the executable is shared across modes so it is warm
#     now.  still isolates the camera_moved=1 TAA-branch cost at
#     identity gather addresses (r3o: yaw 40.0 / dolly 38.1 / full
#     43.2 vs ~31-33 static-equivalent).
: > /tmp/r4a_movstill.log
BENCH_SKIP_PROBE=1 BENCH_CASES=moving BENCH_FRAMES=8 BENCH_BUDGET=900 \
  BENCH_TIMEOUT=800 BENCH_MOVING_MODE=still \
  timeout 1000 python bench.py 2>&1 \
  | sed 's/^{/{"mode": "still", /' | tee -a /tmp/r4a_movstill.log

# 2c. TAA moving-path lowering A/B: the r3o an_full ablation prices
#     the branch-free moving resolve at ~+10 ms/frame — exactly the
#     moving-camera penalty (yaw 40 vs ~31 static).  ORT_TAA_PLANES
#     (channel-plane gathers) and ORT_ACCUM_PLANES (its cancel-the-
#     moveaxis partner) were never priced on hardware.
: > /tmp/r4a_taaplanes.log
for tp in "0 0" "1 0" "1 1"; do
  set -- $tp
  BENCH_SKIP_PROBE=1 BENCH_CASES=moving BENCH_FRAMES=8 BENCH_BUDGET=800 \
    BENCH_TIMEOUT=700 ORT_TAA_PLANES=$1 ORT_ACCUM_PLANES=$2 \
    timeout 900 python bench.py 2>&1 \
    | sed "s/^{/{\"taaplanes\": $1, \"accplanes\": $2, /" \
    | tee -a /tmp/r4a_taaplanes.log
done

# 3. Full matrix with current defaults (the BENCH_r04 preview).
BENCH_SKIP_PROBE=1 BENCH_BUDGET=1800 BENCH_TIMEOUT=600 \
  timeout 2000 python bench.py 2>&1 | tee /tmp/r4a_bench.log

echo DONE
