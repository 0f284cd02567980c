#!/bin/bash
# Round-5 close-out measurement chain (serial — the tunnel chip must be
# idle per window; see CLAUDE.md timing notes). Run from the repo root.
set -x
cd "$(dirname "$0")/.."

# 1. config-7 pass breakdown (VERDICT r4 #3 roofline evidence)
timeout 3000 python -m toroidal_ray_tracing_tpu.experiments.microbench \
    --scene 7 --k 4 > /tmp/r5_micro7.log 2>&1

# 2. the full reference experiment on hardware: overlapped capture
#    (VERDICT #4) + quantified reprojection stats + point-size sweep
#    (VERDICT #6); refreshes artifacts/toroidal_experiment
timeout 6000 python scripts/toroidal_experiment.py > /tmp/r5_exp.log 2>&1

# 3. TPU smoke suite (10 Mosaic-parity cases incl. the grouped stream
#    kernel; compiles are uncached across sessions — slow)
TRT_TEST_PLATFORM=axon timeout 3000 python -m pytest \
    tests/test_tpu_smoke.py -q > /tmp/r5_smoke.log 2>&1

echo "chain done"
