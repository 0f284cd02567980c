"""App-2 driver: point-cloud reprojection of a toroidal capture.

Replicates VKT/ray_tracing__before_second: load one rho step's position +
color dumps (`loadPoints`, hello_vulkan.cpp:496-628), splat them from a
pinhole camera, and dump `data/<scene>ptCloudImage_10.txt`
(hello_vulkan.cpp:781-826). Also compares against a gTruth dump when present
(the comparison the reference did outside the repo — SURVEY.md §0).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from toroidal_ray_tracing_tpu.cameras import PinholeCamera
from toroidal_ray_tracing_tpu.io import dumps
from toroidal_ray_tracing_tpu.pointcloud import splat_points
from toroidal_ray_tracing_tpu.render.renderer import tonemap


def run_reproject(capture_dir: str, rho: float, scene_name: str,
                  camera: PinholeCamera | None = None,
                  width: int = 1920, height: int = 1080,
                  capture_width: int = 1920, capture_height: int = 1080,
                  out_dir: str | None = None, save_png: bool = True):
    """Returns (image, written_files). Raises if the dumps are missing or
    mismatched (app 2 throws on length mismatch, hello_vulkan.cpp:636-639)."""
    if camera is None:
        camera = PinholeCamera(eye=(10.0, 0.0, 0.0), center=(0.0, 0.0, 0.0))
    out_dir = out_dir or capture_dir
    pos, col = dumps.read_position_color(capture_dir, rho,
                                         capture_width, capture_height)
    img = splat_points(pos, col, camera, width, height)
    img_np = np.asarray(img)
    written = [dumps.write_ptcloud_image(out_dir, scene_name, img_np)]
    if save_png:
        from PIL import Image

        png = os.path.join(out_dir, f"{scene_name}ptCloudImage.png")
        Image.fromarray(
            (np.clip(np.asarray(tonemap(img)), 0, 1) * 255).astype(np.uint8)
        ).save(png)
        written.append(png)

    gtruth_path = os.path.join(out_dir, "data", f"{scene_name}gTruth.txt")
    rmse = None
    if os.path.exists(gtruth_path):
        gt = dumps.read_points(gtruth_path).reshape(height, width, 3)
        rmse = float(np.sqrt(np.mean((img_np - gt) ** 2)))
    return img_np, written, rmse


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--capture", required=True, help="dir with data/ dumps")
    ap.add_argument("--rho", type=float, default=10.0)
    ap.add_argument("--name", default="scene")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--capture-width", type=int, default=1920)
    ap.add_argument("--capture-height", type=int, default=1080)
    ap.add_argument("--eye", type=float, nargs=3, default=(10.0, 0.0, 0.0))
    ap.add_argument("--center", type=float, nargs=3, default=(0.0, 0.0, 0.0))
    args = ap.parse_args(argv)

    cam = PinholeCamera(eye=tuple(args.eye), center=tuple(args.center))
    img, files, rmse = run_reproject(
        args.capture, args.rho, args.name, cam, args.width, args.height,
        args.capture_width, args.capture_height)
    print(f"wrote {files}" + (f"; RMSE vs gTruth: {rmse:.4g}" if rmse else ""))


if __name__ == "__main__":
    main()
