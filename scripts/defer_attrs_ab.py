"""Same-session end-to-end A/B of deferred attribute interpolation
(TRT_DEFER_ATTRS) on the mesh ladder rows, plus the NOGATE re-test the
deferral re-opens (the round-4 STREAM_NOGATE refutation was measured WITH
the in-kernel epilogue, whose ~2.5 us dispatches made pruning precious;
Woop-only dispatches are ~0.5 us, so the slab chain may now cost more
than it saves).

Each cell runs in a subprocess (the flags are read at module import).

Run: python scripts/defer_attrs_ab.py   (TPU, ~40 min first time)
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BODY = r"""
import sys
sys.path.insert(0, {root!r})
from toroidal_ray_tracing_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
from toroidal_ray_tracing_tpu.experiments.configs import run_scenario
_, stats = run_scenario({scene}, backend='pallas', frames={frames},
                        sequence=True)
print("RESULT", {label!r}, round(stats['mrays_per_s'], 2), flush=True)
"""

CELLS = [
    (8, 4, {"TRT_DEFER_ATTRS": "1"}, "c8 defer"),
    (8, 4, {"TRT_DEFER_ATTRS": "1", "TRT_STREAM_NOGATE": "1"},
     "c8 defer+nogate"),
    (6, 16, {"TRT_DEFER_ATTRS": "0"}, "c6 epilogue"),
    (6, 16, {"TRT_DEFER_ATTRS": "1"}, "c6 defer"),
    (7, 16, {"TRT_DEFER_ATTRS": "0"}, "c7 epilogue"),
    (7, 16, {"TRT_DEFER_ATTRS": "1"}, "c7 defer"),
]


def main():
    for scene, frames, envs, label in CELLS:
        env = dict(os.environ)
        env.update(envs)
        out = subprocess.run(
            [sys.executable, "-c",
             BODY.format(root=ROOT, scene=scene, frames=frames,
                         label=label)],
            env=env, capture_output=True, text=True, timeout=3000)
        line = [ln for ln in out.stdout.splitlines() if "RESULT" in ln]
        print(line[-1] if line else f"{label}: FAILED\n{out.stderr[-1500:]}",
              flush=True)


if __name__ == "__main__":
    main()
