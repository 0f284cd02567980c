"""App-3 driver: pinhole ground-truth renders (`ray_tracing_reflections`).

Replicates VKT/ray_tracing_reflections: the stock pinhole camera with the
iterative specular-reflection loop (maxDepth default 10, hello_vulkan.h:157)
dumping `data/<scene>gTruth.txt` (hello_vulkan.cpp:1065-1111, main.cpp:315-330).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from toroidal_ray_tracing_tpu.cameras import PinholeCamera
from toroidal_ray_tracing_tpu.io import dumps
from toroidal_ray_tracing_tpu.render import render, tonemap
from toroidal_ray_tracing_tpu.scene import RenderSettings, build_scene


def run_gtruth(scene_def, out_dir: str, scene_name: str,
               camera: PinholeCamera | None = None,
               width: int = 1920, height: int = 1080,
               settings: RenderSettings | None = None,
               backend: str = "jnp", save_png: bool = True):
    if camera is None:
        camera = PinholeCamera(eye=(10.0, 0.0, 0.0), center=(0.0, 0.0, 0.0))
    if settings is None:
        settings = RenderSettings.default(max_depth=10)
    os.makedirs(out_dir, exist_ok=True)
    out = render(scene_def if hasattr(scene_def, "triangles")
                 else build_scene(scene_def),
                 camera, width, height, settings, backend=backend)
    image = np.asarray(out["image"])
    path = dumps.write_gtruth(out_dir, scene_name, image)
    written = [path]
    if save_png:
        png = os.path.join(out_dir, f"{scene_name}gTruth.png")
        _save_png(png, np.asarray(tonemap(image)))
        written.append(png)
    return written


def _save_png(path: str, img) -> None:
    from PIL import Image

    Image.fromarray((np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
                    ).save(path)


def main(argv=None):
    from toroidal_ray_tracing_tpu.experiments.scene_args import (
        add_scene_args, scene_def_from_args)

    ap = argparse.ArgumentParser(description=__doc__)
    add_scene_args(ap)  # --scene NAME | --obj PATH[@x,y,z[,s[,ry]]] ...
    ap.add_argument("--out", required=True)
    ap.add_argument("--name", default=None, help="scene tag in the filename")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--backend", default="jnp", choices=["jnp", "pallas"])
    ap.add_argument("--eye", type=float, nargs=3, default=(10.0, 0.0, 0.0))
    ap.add_argument("--center", type=float, nargs=3, default=(0.0, 0.0, 0.0))
    ap.add_argument("--max-depth", type=int, default=10)
    args = ap.parse_args(argv)

    scene_def = scene_def_from_args(args)
    cam = PinholeCamera(eye=tuple(args.eye), center=tuple(args.center))
    st = RenderSettings.default(max_depth=args.max_depth)
    files = run_gtruth(scene_def, args.out, args.name or args.scene, cam,
                       args.width, args.height, st, backend=args.backend)
    print(f"wrote {files}")


if __name__ == "__main__":
    main()
