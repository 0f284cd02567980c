#!/bin/bash
# Runbook for the moment the axon tunnel comes back (see CLAUDE.md "AXON
# TUNNEL OUTAGE" + PERF.md "Round-3 changes awaiting hardware measurement").
# Run each STAGE separately on an IDLE machine — never overlap stages or run
# anything else (even CPU pytest) while a timed stage runs; tunnel
# contention corrupts timings 10-100x.
#
#   bash scripts/tpu_return_runbook.sh smoke    # TPU smoke suite (untimed)
#   bash scripts/tpu_return_runbook.sh microab  # texture quad-pack A/B rows
#   bash scripts/tpu_return_runbook.sh small    # small-K torus kernel A/B
#   bash scripts/tpu_return_runbook.sh ladder   # full ladder -> LADDER.json
#
# Order: smoke first (pays remote Mosaic compiles, validates every kernel
# path incl. the small-K fold + quad-gather). If the small-torus smoke case
# passes AND `small` shows a win, flip TORUS_SMALL_ENABLE's default in
# ops/trace_kernel.py, then run `ladder` LAST with the final flags.
set -e
cd "$(dirname "$0")/.."

# any probe loop must die BEFORE timed stages (it shares the tunnel)
if [ -f /tmp/tpu_watch.pid ]; then
  kill "$(cat /tmp/tpu_watch.pid)" 2>/dev/null || true
  rm -f /tmp/tpu_watch.pid
  echo "killed TPU probe loop"
fi

case "${1:-}" in
  smoke)
    TRT_TEST_PLATFORM=axon timeout 3600 python -m pytest \
      tests/test_tpu_smoke.py -q
    ;;
  microab)
    timeout 1800 python -m toroidal_ray_tracing_tpu.experiments.microbench \
      --scene 3
    ;;
  small)
    echo "== TORUS_SMALL off (config 1, sequence) =="
    timeout 1800 python -m toroidal_ray_tracing_tpu.experiments.configs \
      --run 1 --backend pallas --sequence --frames 240
    echo "== TORUS_SMALL on =="
    TRT_TORUS_SMALL=1 timeout 1800 python -m \
      toroidal_ray_tracing_tpu.experiments.configs \
      --run 1 --backend pallas --sequence --frames 240
    ;;
  ladder)
    timeout 7200 python bench.py --ladder
    echo "remember: refresh PERF.md + CLAUDE.md state from LADDER.json"
    ;;
  *)
    echo "usage: $0 {smoke|microab|small|ladder}" >&2
    exit 2
    ;;
esac
