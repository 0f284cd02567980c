"""Per-phase accounting of the render_frames (batch front door) vs
render_sequence gap — VERDICT round-4 item 2.

LADDER round-4: config 1 = 68.8 batch vs 123.3 sequence, config 4 = 85.7
vs 116.2, with the tunnel RTT already amortized over the batch (one
dispatch per 48/6 frames). This script isolates where the residual goes by
timing jit'd sub-pipelines over the SAME frame batch (fetch-drained: every
window ends with a scalar fetch of the ray counter):

  seq         render_sequence protocol (keep_images=False) — the target
  rows        scan of raygen+trace per frame, outputs = raw (3, N) rows
              (no transpose, no unswizzle, no (H, W, 3) materialization)
  color       + ONE transpose+unswizzle (color only) per frame
  quartet     + all FOUR (color, hitpos, origin, dir) = _frames_jit dumps
  frames      the real render_frames front door (dumps=True)
  frames0     the real render_frames front door (dumps=False)
  grouped_k   frames front door with k frames' rays traced as one
              wavefront per scan step (config 1 only; the sequence
              protocol already groups ~29 frames per step)

Usage: python scripts/batch_gap_diag.py [--scene N] [--frames K]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from toroidal_ray_tracing_tpu.experiments.configs import SCENARIOS
from toroidal_ray_tracing_tpu.render import render_frames, render_sequence
from toroidal_ray_tracing_tpu.render.renderer import (_as_device_scene,
                                                      autofill_pixel_spread)
from toroidal_ray_tracing_tpu.trace.wavefront import trace_rays
from toroidal_ray_tracing_tpu.utils.profiling import enable_compile_cache

F32 = np.float32


def _timed(run, reps=3):
    total = run()  # compile + warm
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        total = run()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, total


@functools.partial(jax.jit, static_argnames=("cam_cls", "width", "height",
                                             "backend", "mode", "group"))
def _probe_jit(scene, settings, param_stack, cam_cls, width, height,
               backend, mode, group=1):
    """mode: rows | color | quartet (see module docstring)."""
    from toroidal_ray_tracing_tpu.cameras.pinhole import (block_unswizzle,
                                                          pick_block)

    block = pick_block(width, height)
    n = width * height
    shape = (height, width, 3)

    def frame(rays_total, params):
        os, ds = [], []
        for g in range(group):
            p_g = (jax.tree_util.tree_map(lambda x: x[g], params)
                   if group > 1 else params)
            o, d = cam_cls.device_rays(p_g, width, height, settings,
                                       xp=jnp, jitter=None, block=block,
                                       rows=True)
            os.append(o)
            ds.append(d)
        o = jnp.concatenate(os, axis=1) if group > 1 else os[0]
        d = jnp.concatenate(ds, axis=1) if group > 1 else ds[0]
        color, hitpos, nr = trace_rays(scene, settings, o, d,
                                       backend=backend, rows=True)
        rays_total = rays_total + nr
        if mode == "rows":
            return rays_total, (color, hitpos, o, d)
        unsw = lambda a, g: block_unswizzle(  # noqa: E731
            jnp, a[:, g * n:(g + 1) * n].T, width, height, block
            ).reshape(shape)
        outs = []
        for g in range(group):
            if mode == "color":
                outs.append((unsw(color, g),))
            else:
                outs.append((unsw(color, g), unsw(hitpos, g), unsw(o, g),
                             unsw(d, g)))
        stk = tuple(jnp.stack([ou[i] for ou in outs])
                    if group > 1 else outs[0][i]
                    for i in range(len(outs[0])))
        return rays_total, stk

    n_frames = jax.tree_util.tree_leaves(param_stack)[0].shape[0]
    if group > 1:
        steps = n_frames // group
        param_stack = jax.tree_util.tree_map(
            lambda x: x.reshape((steps, group) + x.shape[1:]), param_stack)
    total, outs = jax.lax.scan(frame, jnp.float32(0), param_stack)
    return total, outs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", type=int, default=4)
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--backend", default="pallas")
    args = ap.parse_args()

    enable_compile_cache()
    sc = SCENARIOS[args.scene]
    n_frames = args.frames or {1: 48, 2: 12}.get(args.scene, 6)
    scene = _as_device_scene(sc.build())
    st = autofill_pixel_spread(sc.settings(), sc.camera_at(0), sc.width,
                               sc.height)
    cams = sc.cameras_seq(n_frames)
    cam_cls = type(cams[0])
    params = [c.ray_params(sc.width, sc.height, st) for c in cams]
    stack = jax.device_put(jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *params))

    results = {}

    def report(name, dt, total):
        mrays = total / dt / 1e6
        results[name] = round(mrays, 1)
        print(f"{name:>12}: {dt * 1e3:8.1f} ms  {mrays:7.1f} Mrays/s",
              flush=True)

    # sequence protocol (the target)
    seq_frames = {1: 240, 2: 60, 3: 16, 4: 16, 5: 8, 6: 16, 8: 4}.get(
        args.scene, 16)
    seq_cams = sc.cameras_seq(seq_frames)

    def run_seq():
        out = render_sequence(scene, seq_cams, sc.width, sc.height, st,
                              backend=args.backend, spp=sc.spp,
                              keep_images=False)
        return float(out["rays_traced"])

    dt, total = _timed(run_seq)
    report("seq", dt, total)

    for mode in ("rows", "color", "quartet"):
        def run_probe(mode=mode):
            total, _ = _probe_jit(scene, st, stack, cam_cls, sc.width,
                                  sc.height, args.backend, mode)
            return float(total)

        dt, total = _timed(run_probe)
        report(mode, dt, total)

    # _frames_jit direct (prebuilt param stack): isolates the host-side
    # per-call prep in render_frames (ray_params + np.stack + device_put)
    # from the device pipeline
    from toroidal_ray_tracing_tpu.render.renderer import _frames_jit

    for name, dumps in (("fj", True), ("fj0", False)):
        def run_fj(dumps=dumps):
            total, _ = _frames_jit(scene, st, stack,
                                   jax.random.PRNGKey(0), cam_cls,
                                   sc.width, sc.height, args.backend,
                                   sc.spp, dumps, group=1)
            return float(total)

        dt, total = _timed(run_fj)
        report(name, dt, total)

    for dumps in (True, False):
        def run_frames(dumps=dumps):
            out = render_frames(scene, cams, sc.width, sc.height, st,
                                backend=args.backend, spp=sc.spp,
                                dumps=dumps)
            return float(out["rays_traced"])

        dt, total = _timed(run_frames)
        report("frames" if dumps else "frames0", dt, total)

    if sc.width * sc.height <= 512 * 512:
        for group in (8, 16):
            if n_frames % group:
                continue

            def run_grouped(group=group):
                total, _ = _probe_jit(scene, st, stack, cam_cls, sc.width,
                                      sc.height, args.backend, "quartet",
                                      group=group)
                return float(total)

            dt, total = _timed(run_grouped)
            report(f"grouped_{group}", dt, total)

    print(json.dumps({"scene": args.scene, "frames": n_frames,
                      "results": results}))


if __name__ == "__main__":
    main()
