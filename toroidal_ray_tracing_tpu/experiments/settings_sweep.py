"""Live render-parameter sweeps: the reference's ImGui tweak panel as a CLI.

The reference exposes light type / position / intensity and the bounce cap
as *interactive* controls mutated between frames without any pipeline
rebuild (`renderUI`, VKT/ray_tracing__before/main.cpp:279-290, pushed to the
shaders through PushConstantRay each frame). `RenderSettings` is the
PushConstantRay clone and is a plain jit ARGUMENT here, so the TPU analog of
"drag the slider" is: stack one RenderSettings per sweep step and `lax.scan`
the whole sweep inside ONE jit — zero recompiles, exactly like the GPU
re-running the same pipeline with new push constants.

    python -m toroidal_ray_tracing_tpu.experiments.settings_sweep \
        --scene multi_torus --param light_intensity --values 20 60 100 180 \
        --out /tmp/sweep

Sweepable parameters (all PushConstantRay fields, main.cpp:279-290):
  light_intensity   point-light power
  light_x/y/z       light position component
  light_type        0 = point, 1 = infinite (directional)
  max_depth         bounce cap (hello_vulkan.h:153's maxDepth slider)
  rho               toroidal-camera ring radius
"""

from __future__ import annotations

import argparse
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from toroidal_ray_tracing_tpu.render import render_sequence  # noqa: F401  (doc xref)
from toroidal_ray_tracing_tpu.render.renderer import (_as_device_scene,
                                                      _frame_jit,
                                                      autofill_pixel_spread,
                                                      tonemap)
from toroidal_ray_tracing_tpu.scene import RenderSettings, build_scene

F32 = np.float32
I32 = np.int32

PARAMS = ("light_intensity", "light_x", "light_y", "light_z", "light_type",
          "max_depth", "rho")


def _apply(settings: RenderSettings, name: str, value) -> RenderSettings:
    if name == "light_intensity":
        return settings._replace(light=settings.light._replace(
            intensity=F32(value)))
    if name in ("light_x", "light_y", "light_z"):
        axis = "xyz".index(name[-1])
        pos = np.asarray(settings.light.position, F32).copy()
        pos[axis] = value
        return settings._replace(light=settings.light._replace(position=pos))
    if name == "light_type":
        return settings._replace(light=settings.light._replace(
            type=I32(int(value))))
    if name == "max_depth":
        return settings._replace(max_depth=I32(int(value)))
    if name == "rho":
        return settings._replace(rho=F32(value))
    raise ValueError(f"unknown sweep parameter {name!r} (one of {PARAMS})")


@functools.partial(jax.jit, static_argnames=("cam_cls", "width", "height",
                                             "backend"))
def _sweep_jit(scene, settings_stack, cam_params, cam_cls, width, height,
               backend):
    key = jax.random.PRNGKey(0)

    def frame(_, st):
        color, _, _, _, nr = _frame_jit.__wrapped__(
            scene, st, cam_params, key, cam_cls, width, height, backend,
            False)
        return 0, (color.reshape(height, width, 3), nr)

    _, (imgs, nrays) = jax.lax.scan(frame, 0, settings_stack)
    return imgs, nrays


def sweep(scene, camera, width, height, base_settings, param: str, values,
          backend: str = "jnp"):
    """Render one frame per value of `param`, all inside one jit.

    Returns {"images": (S, H, W, 3) linear, "rays_traced": (S,)}."""
    base = autofill_pixel_spread(base_settings, camera, width, height)
    variants = [_apply(base, param, v) for v in values]
    stack = jax.device_put(jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *variants))
    scene = _as_device_scene(scene)
    params = jax.device_put(camera.ray_params(width, height, base))
    imgs, nrays = _sweep_jit(scene, stack, params, type(camera), width,
                             height, backend)
    return {"images": imgs, "rays_traced": nrays}


def main(argv=None):
    from PIL import Image

    from toroidal_ray_tracing_tpu.cameras import PinholeCamera
    from toroidal_ray_tracing_tpu.experiments.scene_args import (
        add_scene_args, scene_def_from_args)

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    add_scene_args(ap)
    ap.add_argument("--out", required=True)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--backend", default="jnp", choices=["jnp", "pallas"])
    ap.add_argument("--eye", type=float, nargs=3, default=(8.0, 5.0, 8.0))
    ap.add_argument("--center", type=float, nargs=3, default=(0.0, 0.5, 0.0))
    ap.add_argument("--param", required=True, choices=PARAMS)
    ap.add_argument("--values", type=float, nargs="+", required=True)
    ap.add_argument("--max-depth", type=int, default=10)
    args = ap.parse_args(argv)

    scene = build_scene(scene_def_from_args(args))
    cam = PinholeCamera(eye=tuple(args.eye), center=tuple(args.center))
    st = RenderSettings.default(max_depth=args.max_depth)
    out = sweep(scene, cam, args.width, args.height, st, args.param,
                args.values, backend=args.backend)
    os.makedirs(args.out, exist_ok=True)
    imgs = np.asarray(tonemap(jnp.asarray(out["images"])))
    files = []
    for i, v in enumerate(args.values):
        tag = f"{args.param}_{v:g}".replace(".", "p")
        path = os.path.join(args.out, f"sweep_{i:03d}_{tag}.png")
        Image.fromarray(
            (np.clip(imgs[i], 0.0, 1.0) * 255.0).astype(np.uint8)).save(path)
        files.append(path)
        print(f"{args.param}={v:g} rays={float(out['rays_traced'][i]):.0f} "
              f"-> {path}")
    return files


if __name__ == "__main__":
    main()
