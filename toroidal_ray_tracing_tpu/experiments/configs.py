"""The BASELINE.json scenario ladder as runnable configurations.

The reference has no config system — scene selection and camera poses are
blocks of commented-out code (VKT/ray_tracing__before/main.cpp:124-132,
200-219; SURVEY.md §5 "Config / flag system"). Here each scenario is a
dataclass: `python -m toroidal_ray_tracing_tpu.experiments.configs --run 3`.

Scenarios (BASELINE.json "configs"):
  1. single torus, primary rays only, 256x256, flat shading
  2. torus + ground plane, Lambertian + hard shadows, 512x512
  3. multi-torus with specular reflections, 3 bounces, 1080p
  4. instanced torus grid (~1k), TLAS-style culling, 1080p, 5 bounces
  5. 4K animated camera fly-through, jittered AA (sustained throughput)
Extensions beyond the BASELINE five:
  6. tessellated-mesh multi-torus (23k tris) — the triangle-kernel row
  7. textured mesh scene — the trilinear-mip-sampling row
"""

from __future__ import annotations

import argparse
import dataclasses
import math
import os
import time
from typing import Callable, Optional

import numpy as np

from toroidal_ray_tracing_tpu.cameras import PinholeCamera
from toroidal_ray_tracing_tpu.render import render, tonemap
from toroidal_ray_tracing_tpu.scene import RenderSettings, build_scene, procedural


@dataclasses.dataclass
class Scenario:
    name: str
    scene: Callable
    width: int
    height: int
    max_depth: int
    spp: int = 1
    camera: Optional[PinholeCamera] = None
    animate_frames: int = 0  # >0: fly-through
    tile_rows: Optional[int] = None  # band rendering for very large frames

    def build(self):
        return build_scene(self.scene())

    def camera_at(self, frame: int = 0):
        if self.camera is not None and self.animate_frames == 0:
            return self.camera
        # orbiting fly-through for the animated scenario
        a = 2.0 * math.pi * frame / max(self.animate_frames, 1)
        eye = (10.0 * math.cos(a), 5.0 + 1.5 * math.sin(2 * a),
               10.0 * math.sin(a))
        return PinholeCamera(eye=eye, center=(0.0, 0.5, 0.0))

    def cameras_seq(self, frames: int):
        """Per-frame cameras for sequence (scan-in-one-jit) rendering. Static
        scenarios get an orbit of the configured eye about the vertical axis
        through the look-at center — the reference's frame loop likewise
        animates the camera between captures (CameraManip.updateAnim,
        VKT/ray_tracing__before/main.cpp:296)."""
        if self.animate_frames:
            return [self.camera_at(f) for f in range(frames)]
        eye = np.asarray(self.camera.eye, np.float64)
        ctr = np.asarray(self.camera.center, np.float64)
        rel = eye - ctr
        cams = []
        for f in range(frames):
            a = 2.0 * math.pi * f / frames
            c, s = math.cos(a), math.sin(a)
            rot = np.array([rel[0] * c + rel[2] * s, rel[1],
                            -rel[0] * s + rel[2] * c])
            cams.append(PinholeCamera(eye=tuple(ctr + rot),
                                      center=tuple(ctr)))
        return cams

    def settings(self):
        return RenderSettings.default(max_depth=self.max_depth)


SCENARIOS = {
    1: Scenario("config1_single_torus",
                lambda: procedural.scene_single_torus(analytic=True),
                256, 256, 1,
                camera=PinholeCamera(eye=(6.0, 3.0, 6.0))),
    2: Scenario("config2_torus_plane",
                lambda: procedural.scene_torus_plane(analytic=True),
                512, 512, 1,
                camera=PinholeCamera(eye=(7.0, 4.0, 7.0),
                                     center=(0.0, 0.5, 0.0))),
    3: Scenario("config3_multi_torus",
                lambda: procedural.scene_multi_torus(analytic=True),
                1920, 1080, 3,
                camera=PinholeCamera(eye=(8.0, 5.0, 8.0),
                                     center=(0.0, 0.5, 0.0))),
    4: Scenario("config4_instanced_grid",
                lambda: procedural.scene_instanced_torus_grid(n=1024),
                1920, 1080, 5,
                camera=PinholeCamera(eye=(25.0, 18.0, 25.0),
                                     center=(0.0, 0.0, 0.0))),
    5: Scenario("config5_4k_flythrough",
                lambda: procedural.scene_multi_torus(analytic=True),
                3840, 2160, 3, spp=2, animate_frames=8),
    # extension beyond the BASELINE five: the reference's real workload is
    # triangle meshes (OBJ models), so track a tessellated-mesh scenario —
    # 23k triangles crosses TRI_GATE_MIN and exercises the exact
    # visit-list triangle traversal
    6: Scenario("config6_mesh_torus",
                lambda: procedural.scene_multi_torus(analytic=False),
                1920, 1080, 3,
                camera=PinholeCamera(eye=(8.0, 5.0, 8.0),
                                     center=(0.0, 0.5, 0.0))),
    # extension: textured workload — every primary hit samples the mip
    # atlas (the reference's OBJ models are all textured via map_Kd;
    # raytrace.rchit:79-84), tracking the trilinear-sampling hot path the
    # untextured rows never touch
    7: Scenario("config7_textured",
                procedural.scene_textured_mesh,
                1920, 1080, 3,
                camera=PinholeCamera(eye=(8.0, 5.0, 8.0),
                                     center=(0.0, 0.5, 0.0))),
    # extension: a >1M-triangle tessellated mesh — crosses TRI_STREAM_MIN,
    # so the HBM-streamed superblock kernel (ops/tri_stream.py) carries the
    # whole frame; keeps the "meshes beyond VMEM" path perf-visible
    8: Scenario("config8_streamed_mesh",
                procedural.scene_hires_mesh,
                1920, 1080, 2,
                camera=PinholeCamera(eye=(6.0, 4.0, 6.0),
                                     center=(0.0, 0.6, 0.0))),
}


def run_scenario(num: int, backend: str = "jnp", out_dir: str | None = None,
                 frames: int | None = None, sequence: bool = False,
                 raster: bool = False):
    sc = SCENARIOS[num]
    scene = sc.build()
    st = sc.settings()
    n_frames = frames if frames is not None else max(sc.animate_frames, 1)

    if raster:
        # the reference UI's "use raster" checkbox (main.cpp renderUI /
        # m_useRaytracer): same scene + camera through the z-buffered
        # raster pipeline instead of the ray tracer
        from toroidal_ray_tracing_tpu.render.raster import raster_render

        out = raster_render(scene, sc.camera_at(0), sc.width, sc.height, st)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            from PIL import Image

            img = np.asarray(tonemap(out["image"]))
            Image.fromarray(
                (np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(out_dir, f"{sc.name}_raster.png"))
        return out, {"scenario": sc.name, "frames": 1, "protocol": "raster"}

    if sequence:
        # sustained-throughput mode: all frames scanned inside one jit
        # (render.render_sequence) — no per-frame dispatch round trips, as
        # in the reference's continuous frame loop (main.cpp:269-403)
        from toroidal_ray_tracing_tpu.render import render_sequence

        n_frames = max(n_frames, 2)
        cams = sc.cameras_seq(n_frames)

        def run():
            out = render_sequence(scene, cams, sc.width, sc.height, st,
                                  backend=backend, spp=sc.spp,
                                  keep_images=False)
            return float(out["rays_traced"])  # fetch drains the queue

        total = run()  # compile + warm up
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            total = run()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return None, {"scenario": sc.name, "frames": n_frames,
                      "rays_per_frame": total / n_frames,
                      "mrays_per_s": total / best / 1e6,
                      "protocol": "sequence"}

    # Front-door batch mode: all frames render through render_frames — ONE
    # device dispatch per batch returning every frame's FULL RenderedData
    # quartet (image + hit/ray dumps), so the tunnel's ~40 ms dispatch RTT
    # amortizes across the batch instead of taxing every frame (round-3's
    # per-frame render() protocol put config 1 at 2.3 Mrays/s — pure RTT).
    # Timing truth on the TPU tunnel: block_until_ready() can return before
    # the device has executed anything (fire-and-forget dispatch) — only a
    # host fetch drains the queue, so each timed window ends by fetching
    # the batch's ray counter.
    from toroidal_ray_tracing_tpu.render import render_frames

    cams = [sc.camera_at(f) for f in range(n_frames)]
    # skip the per-frame hit/ray dump buffers when the batch would press on
    # HBM (F x 4 x 3 x H x W f32; an 8-frame 4K batch with dumps is ~3.2 GB
    # — channel-major buffers are dense, so 64M pixels ≈ 3 GB of dumps)
    dumps = sc.width * sc.height * n_frames <= 64 * 1024 * 1024

    def run():
        out = render_frames(scene, cams, sc.width, sc.height, st,
                            backend=backend, spp=sc.spp, dumps=dumps)
        return out, float(out["rays_traced"])  # fetch drains the queue

    last, total_rays = run()  # compile + warm up
    best = None
    if n_frames > 1:
        for _ in range(3):
            t0 = time.perf_counter()
            last, total_rays = run()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        from PIL import Image

        # render_frames emits channel-major (3, H, W); moveaxis on host is a
        # zero-copy view
        img = np.moveaxis(np.asarray(tonemap(last["images"][-1])), 0, -1)
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"{sc.name}.png"))

    stats = {"scenario": sc.name, "frames": n_frames,
             "rays_per_frame": total_rays / n_frames}
    if best:
        stats["mrays_per_s"] = total_rays / best / 1e6
    return last, stats


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run", type=int, required=True, choices=sorted(SCENARIOS))
    ap.add_argument("--backend", default="jnp", choices=["jnp", "pallas"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--sequence", action="store_true",
                    help="scan all frames inside one jit (sustained "
                         "throughput, no per-frame dispatch round trips)")
    ap.add_argument("--raster", action="store_true",
                    help="render through the z-buffered raster pipeline "
                         "(the reference UI's 'use raster' checkbox)")
    args = ap.parse_args(argv)
    from toroidal_ray_tracing_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    _, stats = run_scenario(args.run, args.backend, args.out, args.frames,
                            sequence=args.sequence, raster=args.raster)
    print(stats)


if __name__ == "__main__":
    main()
