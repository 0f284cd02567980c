"""Headline benchmark: Mrays/sec/chip, 1080p, 3-bounce reflective scene.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}

vs_baseline is the ratio against the BASELINE.json target of 100 Mrays/s/chip
(the reference publishes no numbers of its own — BASELINE.md).

Measurement protocol (IMPORTANT): on the axon TPU tunnel, dispatch is
fire-and-forget — `block_until_ready()` can return before the device has
actually executed anything, so naive timing over-reports by 100x+ (round-1's
recorded 382 Mrays/s was such an artifact; the true figure was ~16). Every
timing window here therefore ends by fetching a scalar reduction of the last
frame's output, which drains the execution queue: the window measures real,
completed device work.

Ray accounting matches the reference's traceRayEXT semantics: one closest-hit
query per live ray per bounce plus one shadow ray per lit hit
(raytrace.rgen:75-108, raytrace.rchit:89-120) — counted on device by the
wavefront loop, NOT as width*height*bounces.
"""

import json
import sys
import time

import numpy as np


def main():
    backend = "pallas"
    if "--jnp" in sys.argv:
        backend = "jnp"
    width, height = 1920, 1080
    frames = int(next((a.split("=")[1] for a in sys.argv
                       if a.startswith("--frames=")), 4))

    import jax

    from toroidal_ray_tracing_tpu.cameras import PinholeCamera
    from toroidal_ray_tracing_tpu.render import render
    from toroidal_ray_tracing_tpu.scene import (RenderSettings, build_scene,
                                                procedural)

    scene = jax.device_put(build_scene(procedural.scene_multi_torus(
        analytic=True)))
    cam = PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0))
    settings = RenderSettings.default(max_depth=3)

    import math

    import jax.numpy as jnp

    from toroidal_ray_tracing_tpu.render.renderer import _frame_jit

    # an animated F-frame orbit scanned inside ONE jit: sustained device
    # throughput of a real capture loop, without the tunnel's ~40 ms
    # per-dispatch round trip (an infrastructure artifact, not a TPU cost);
    # per-frame camera params differ, so XLA cannot hoist the loop body
    def orbit_params(f):
        a = 2.0 * math.pi * f / max(frames, 1)
        cam = PinholeCamera(eye=(8.0 * math.cos(a), 5.0, 8.0 * math.sin(a)),
                            center=(0.0, 0.5, 0.0))
        return cam.ray_params(width, height, settings)

    stack = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *[orbit_params(f) for f in range(frames)])
    key = jax.random.PRNGKey(0)

    def make_run(bk):
        @jax.jit
        def run(scene, settings, stack):
            def step(carry, p):
                color, hp, o, d, nr = _frame_jit.__wrapped__(
                    scene, settings, p, key, PinholeCamera, width, height,
                    bk, False)
                return carry + nr, color[0, 0]
            total, _ = jax.lax.scan(step, jnp.float32(0), stack)
            return total
        return run

    def drain(x):
        # a 4-byte fetch forces the queue to finish (block_until_ready is
        # not sufficient on the tunnel — see module docstring)
        return float(x)

    try:
        run = make_run(backend)
        drain(run(scene, settings, stack))  # compile + warm up
    except Exception as e:
        if backend == "pallas":  # fall back if the kernel path regresses
            print(f"WARNING: pallas backend failed, falling back to jnp: "
                  f"{type(e).__name__}: {str(e)[:500]}", file=sys.stderr)
            backend = "jnp"
            run = make_run(backend)
            drain(run(scene, settings, stack))
        else:
            raise

    # best of three fetch-drained windows (tunnel timing variance)
    best_dt = None
    total_rays = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        total_rays = drain(run(scene, settings, stack))
        dt = time.perf_counter() - t0
        best_dt = dt if best_dt is None else min(best_dt, dt)

    mrays = total_rays / best_dt / 1e6
    n_chips = max(len(jax.devices()), 1)
    value = mrays / n_chips

    from toroidal_ray_tracing_tpu.utils import roofline

    if "--ladder" in sys.argv:
        _write_ladder(backend, value, roofline.mfu(value, scene))

    print(json.dumps({
        "metric": "Mrays/sec/chip @1080p 3-bounce reflective "
                  f"({backend} backend, fetch-drained timing)",
        "value": round(value, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(value / 100.0, 3),
        "mfu": round(roofline.mfu(value, scene), 4),
    }))


def _write_ladder(backend, headline, headline_mfu):
    """Run the 5-scenario BASELINE ladder and write LADDER.json."""
    import os

    from toroidal_ray_tracing_tpu.experiments.configs import (SCENARIOS,
                                                              run_scenario)
    from toroidal_ray_tracing_tpu.utils import roofline

    rows = []
    for n in sorted(SCENARIOS):
        sc = SCENARIOS[n]
        frames = None if sc.animate_frames else 6
        _, stats = run_scenario(n, backend=backend, frames=frames)
        row = dict(stats)
        if "mrays_per_s" in stats:
            row["mfu"] = round(roofline.mfu(stats["mrays_per_s"],
                                            sc.build()), 4)
        # sustained-throughput mode: frames scanned inside one jit (the
        # per-frame number above additionally pays the tunnel's ~40 ms
        # dispatch round trip per frame, which dominates small frames).
        # Small frames get the reference's 60-frames-per-step cadence
        # (main.cpp:337-341) so the single dispatch RTT amortizes away.
        seq_frames = {1: 60, 2: 60, 3: 16, 4: 16, 5: 8, 6: 16}[n]
        _, seq = run_scenario(n, backend=backend, frames=seq_frames,
                              sequence=True)
        row["mrays_per_s_sequence"] = seq["mrays_per_s"]
        row["mfu_sequence"] = round(roofline.mfu(seq["mrays_per_s"],
                                                 sc.build()), 4)
        rows.append(row)
    out = {
        "protocol": "fetch-drained timing (see bench.py docstring); "
                    "mrays_per_s includes per-frame dispatch round trips; "
                    "mrays_per_s_sequence scans frames inside one jit "
                    "(sustained device throughput)",
        "backend": backend,
        "headline_mrays_per_s_per_chip": headline,
        "headline_mfu": round(headline_mfu, 4),
        "ladder": rows,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "LADDER.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"ladder_written": path}), file=sys.stderr)


if __name__ == "__main__":
    main()
