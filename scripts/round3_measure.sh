#!/bin/bash
# Single-session measurement sweep for every round-3 change still pending
# hardware numbers (see PERF.md "Round-3 hardware measurements" + CLAUDE.md
# state). Run ONLY on an idle machine with a live tunnel:
#
#   bash scripts/round3_measure.sh 2>&1 | tee /tmp/r3_measure.log
#
# Why one script: tunnel windows are unreliable (two outages this round) and
# PERF.md's drift section shows only same-session A/Bs attribute wins to
# code — so everything runs back-to-back in one session, highest-value
# stages first, each stage's raw output kept in $OUT so a dropped tunnel
# mid-run loses nothing.
#
# Pending items this covers, in order:
#   smoke   - all Mosaic paths compile+match on hardware (pays the remote
#             compiles every later stage reuses; incl. the compaction-bucket
#             and textured-scene cases)
#   ladder  - full LADDER.json refresh with final flags. Config 7's current
#             row (4.1 Mrays/s) predates the gather-free metadata fix
#             (commit f9a5686: sample pass 139.6 -> 31.1 ms); configs 3-7
#             predate the self-padding wavefront (commit ef05a65: before it,
#             >=1080p frames silently ran every bounce dense).
#   compact - TRT_COMPACT_FACTORS on/off A/B on configs 3 and 6 (the earlier
#             "within noise" A/B was void: all arms ran dense at 1080p)
#   gather  - scripts/gather_bench.py layout sweep (config-7 cliff mechanism)
#   microab - texture quad-pack vs 4-tap rows post metadata fix
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/r3_measure}
mkdir -p "$OUT"
CFG=toroidal_ray_tracing_tpu.experiments.configs

# any probe loop must die BEFORE timed stages (it shares the tunnel)
if [ -f /tmp/tpu_watch.pid ]; then
  kill "$(cat /tmp/tpu_watch.pid)" 2>/dev/null || true
  rm -f /tmp/tpu_watch.pid
  echo "killed TPU probe loop"
fi

stage() { echo; echo "===== $1 ($(date -u +%H:%M:%S)Z) ====="; }

stage "smoke"
TRT_TEST_PLATFORM=axon timeout 3600 python -m pytest tests/test_tpu_smoke.py \
  -q 2>&1 | tee "$OUT/smoke.log"
grep -q " passed" "$OUT/smoke.log" || {
  echo "SMOKE FAILED — aborting (no timed stage is meaningful)"; exit 1; }

stage "ladder (final flags) -> LADDER.json"
timeout 10800 python bench.py --ladder 2>&1 | tee "$OUT/ladder.log"

stage "compaction A/B config 3 (dense arm)"
TRT_COMPACT_FACTORS= timeout 1800 python -m "$CFG" \
  --run 3 --backend pallas --sequence 2>&1 | tee "$OUT/c3_dense.log"
stage "compaction A/B config 3 (2,4,8 arm)"
timeout 1800 python -m "$CFG" \
  --run 3 --backend pallas --sequence 2>&1 | tee "$OUT/c3_compact.log"

stage "compaction A/B config 6 (dense arm)"
TRT_COMPACT_FACTORS= timeout 1800 python -m "$CFG" \
  --run 6 --backend pallas --sequence 2>&1 | tee "$OUT/c6_dense.log"
stage "compaction A/B config 6 (2,4,8 arm)"
timeout 1800 python -m "$CFG" \
  --run 6 --backend pallas --sequence 2>&1 | tee "$OUT/c6_compact.log"

stage "config 7 quad-gather A/B (4-tap arm)"
TRT_TEX_QUAD=0 timeout 1800 python -m "$CFG" \
  --run 7 --backend pallas --sequence 2>&1 | tee "$OUT/c7_taps.log"

stage "gather layout sweep"
timeout 2400 python scripts/gather_bench.py 2>&1 | tee "$OUT/gather.log"

stage "texture microbench rows"
timeout 2400 python -m toroidal_ray_tracing_tpu.experiments.microbench \
  --scene 3 2>&1 | tee "$OUT/microab.log"

stage "done — update PERF.md + CLAUDE.md from $OUT"
