"""The reference's full research experiment, end to end on real hardware.

Three stages, exactly the reference's app pipeline (VERDICT r3 #4):
  1. CAPTURE  — 1080p toroidal-camera rho sweep 4.0..10.0, dumping per-step
     position/color text files (app 1: main.cpp:239-257,337-341,376-402).
  2. GTRUTH   — pinhole ground-truth render of the same scene
     (app 3: ray_tracing_reflections/hello_vulkan.cpp:1065-1111).
  3. REPROJECT — splat every captured rho step's point cloud from the
     gTruth pose and compare (app 2: before_second/hello_vulkan.cpp:
     496-628, 781-826), producing the per-rho RMSE table that is the
     experiment's research output.

Writes dumps + PNGs under artifacts/toroidal_experiment/ (text dumps are
gitignored — ~80 MB each at 1080p; the committed outputs are the PNGs and
summary.json) and prints the RMSE table for PERF.md.

Run: python scripts/toroidal_experiment.py [--width 1920 --height 1080]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "toroidal_experiment"))
    args = ap.parse_args(argv)

    from toroidal_ray_tracing_tpu.cameras import PinholeCamera, ToroidalCamera
    from toroidal_ray_tracing_tpu.experiments import gtruth, reproject, rho_sweep
    from toroidal_ray_tracing_tpu.scene import RenderSettings, procedural
    from toroidal_ray_tracing_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    os.makedirs(args.out, exist_ok=True)
    W, H = args.width, args.height

    # the flagship reflective multi-torus scene; the toroidal camera rides
    # the rho-ring around it (the reference's capture pose, main.cpp:123-133)
    sd = procedural.scene_multi_torus(analytic=True)
    cam_t = ToroidalCamera(eye=(0.0, 1.5, 0.0), center=(8.0, 0.0, 0.0))
    st = RenderSettings.default(max_depth=10)  # the gTruth depth default

    t0 = time.perf_counter()
    files = rho_sweep.run_sweep(sd, args.out, cam_t, W, H, st,
                                backend=args.backend, save_rays=True)
    t_capture = time.perf_counter() - t0
    print(f"capture: {len(files)} dump files in {t_capture:.1f} s",
          flush=True)

    cam_p = PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0))
    t0 = time.perf_counter()
    gtruth.run_gtruth(sd, args.out, "toroidal", cam_p, W, H, st,
                      backend=args.backend, save_png=True)
    t_gtruth = time.perf_counter() - t0
    print(f"gTruth: {t_gtruth:.1f} s", flush=True)

    t0 = time.perf_counter()
    results = reproject.run_reproject_all(
        args.out, "toroidal", cam_p, W, H, W, H, save_png=True)
    t_reproject = time.perf_counter() - t0

    print(f"\nreproject+compare: {t_reproject:.1f} s")
    print(f"{'rho':>6}  {'RMSE':>9}  {'covered':>9}  {'holes':>9}  "
          f"{'coverage':>9}  {'points':>9}")
    for r in results:
        print(f"{r['rho']:6.1f}  {r['rmse']:9.6f}  "
              f"{r.get('rmse_covered', 0):9.6f}  "
              f"{r.get('rmse_holes', 0):9.6f}  {r['coverage']:9.4f}  "
              f"{r['n_points']:9d}")

    # point-size sweep at the curve's min / endpoints (VERDICT r4 item 6:
    # does fatter splatting — coverage — or renderer error dominate?),
    # plus the depth-aware hole-filled extension at the reference size
    sweep = {}
    for ps, fh in ((2.5, 0.0), (3.5, 0.0), (5.0, 0.0), (2.5, 7.0)):
        rows = {}
        for rho in (4.0, 7.5, 10.0):
            tag = f"ps{ps}" + (f"fh{fh}" if fh else "")
            _, _, stats = reproject.run_reproject(
                args.out, rho, "toroidal", cam_p, W, H, W, H,
                save_png=False, tag=tag, point_size=ps, fill_holes=fh)
            rows[str(rho)] = {k: round(v, 6) if isinstance(v, float) else v
                              for k, v in stats.items() if k != "rho"}
        sweep[f"point_size={ps}" + (f",fill={fh}" if fh else "")] = rows
        print(f"point size {ps}{' +fill ' + str(fh) if fh else ''}: "
              + "  ".join(f"rho {k}: rmse {v['rmse']} cov {v['coverage']}"
                          for k, v in rows.items()))

    summary = {
        "width": W, "height": H, "backend": args.backend,
        "capture_seconds": round(t_capture, 1),
        "gtruth_seconds": round(t_gtruth, 1),
        "reproject_seconds": round(t_reproject, 1),
        "rmse_by_rho": {str(r["rho"]): round(r["rmse"], 6)
                        for r in results},
        "stats_by_rho": {str(r["rho"]): {
            "rmse_covered": round(r.get("rmse_covered", -1.0), 6),
            "rmse_holes": round(r.get("rmse_holes", -1.0), 6),
            "coverage": round(r["coverage"], 6),
            "n_points": r["n_points"]} for r in results},
        "point_size_sweep": sweep,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
