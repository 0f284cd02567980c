"""Pass-level microbenchmarks: where does a frame's time go?

Times each stage of the wavefront loop in isolation on the flagship scene
(config 3): the triangle kernel, the torus kernel, shade, raygen. Each
timed window scans K iterations inside ONE jit (inputs perturbed by the
loop index to defeat CSE) and ends with a scalar fetch — the only honest
protocol on the fire-and-forget tunnel (see bench.py docstring).

Usage: python -m toroidal_ray_tracing_tpu.experiments.microbench [--rays N]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

F32 = np.float32


def timed_scan(fn, k, *args):
    """Mean seconds per fn() call: lax.scan k iterations in one jit, fetch
    once. fn(i, *args) must return a scalar-reducible array."""
    @jax.jit
    def run(*args):
        def step(c, i):
            return c + fn(i, *args), None
        out, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(k))
        return out
    float(run(*args))  # compile + warm
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / k


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=2 * 1024 * 1024)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--scene", type=int, default=3, choices=[3, 4, 6, 7])
    args = ap.parse_args(argv)

    from toroidal_ray_tracing_tpu.cameras import PinholeCamera
    from toroidal_ray_tracing_tpu.ops import trace_kernel as tk
    from toroidal_ray_tracing_tpu.scene import (RenderSettings, build_scene,
                                                procedural)
    from toroidal_ray_tracing_tpu.trace import intersect as isect
    from toroidal_ray_tracing_tpu.trace.shade import shade

    n = args.rays
    sd = {3: lambda: procedural.scene_multi_torus(True),
          4: lambda: procedural.scene_instanced_torus_grid(n=1024),
          6: lambda: procedural.scene_multi_torus(False),
          7: procedural.scene_textured_mesh}[args.scene]()
    scene = jax.device_put(build_scene(sd))
    eye = (25.0, 18.0, 25.0) if args.scene == 4 else (8.0, 5.0, 8.0)
    ctr = (0.0, 0.0, 0.0) if args.scene == 4 else (0.0, 0.5, 0.0)
    cam = PinholeCamera(eye=eye, center=ctr)
    st = RenderSettings.default(max_depth=3)
    n = (n // 2048) * 2048  # kernel ray-tile alignment
    side = int(np.ceil(np.sqrt(n)))
    if args.scene == 7:
        # the textured scene's shade() must mip (the render path's
        # autofill_pixel_spread equivalent) or the sample pass is level-0
        st = st._replace(pixel_spread=F32(cam.pixel_spread(side, side)))
    o_h, d_h = cam.generate_rays(side, side, st, xp=np)
    o = jax.device_put(jnp.asarray(o_h[:n].T))   # (3, N) rows
    d = jax.device_put(jnp.asarray(d_h[:n].T))
    geom = isect.geom_from_scene(scene)
    geom = jax.device_put(geom)
    tmax = jnp.full((n,), F32(10000.0))
    k = args.k

    def perturb(i, dirs):
        # rotate directions a hair so scan steps aren't CSE'd
        eps = (i.astype(F32) + 1.0) * F32(1e-6)
        return dirs.at[0].add(eps)

    def tri_pass(i, o, d, tmax):
        dd = perturb(i, d)
        out = tk.tri_closest_hit_pallas(
            o, dd, tmax, geom.woop_o, geom.woop_d, geom.cluster_lo,
            geom.cluster_hi, scene.cluster_size)
        return jnp.sum(out[0][:8])

    def tor_pass(i, o, d, tmax):
        dd = perturb(i, d)
        out = tk.torus_closest_hit_pallas(
            o, dd, tmax, geom.tor_w2o, geom.tor_major, geom.tor_minor,
            geom.tor_center, geom.tor_bound)
        return jnp.sum(out[0][:8])

    def full_hit(i, o, d, tmax):
        dd = perturb(i, d)
        hit = tk.closest_hit_pallas(scene, geom, o, dd, tmax,
                                    want_attrs=True)
        return jnp.sum(hit.t[:8])

    def shade_pass(i, o, d, tmax):
        dd = perturb(i, d)
        hit = tk.closest_hit_pallas(scene, geom, o, dd, tmax,
                                    want_attrs=True)
        sh = shade(scene, st, o, dd, hit, backend="pallas")
        return jnp.sum(sh.hit_value[:8])

    # occlusion (shadow-ray) passes: primary hit points toward the light —
    # the EXACT query shade() issues, isolated (raytrace.rchit:89-120)
    lpos = jnp.asarray(st.light.position, F32)[:, None]

    def _shadow_rays(o, d):
        hit = tk.closest_hit_pallas(scene, geom, o, d, tmax)
        hp = o + jnp.minimum(hit.t, F32(1.0e8))[None, :] * d
        ldir = lpos - hp
        ldist = jnp.linalg.norm(ldir, axis=0)
        L = ldir / jnp.maximum(ldist, F32(1e-20))[None, :]
        stmax = jnp.where(hit.kind >= 0, ldist, F32(0.0))
        return hp, L, stmax

    def occl_pass(i, o, d, tmax):
        dd = perturb(i, d)
        hp, L, stmax = jax.lax.stop_gradient(_shadow_rays(o, dd))
        hit = tk.closest_hit_pallas(scene, geom, hp, L, stmax,
                                    occlusion=True)
        return jnp.sum((hit.kind >= 0).astype(F32)[:8]) + jnp.sum(stmax[:8])

    def occl_base(i, o, d, tmax):
        # the shadow-ray *setup* alone (closest hit + ray build), so
        # occl_pass - occl_base isolates the occlusion query itself
        dd = perturb(i, d)
        hp, L, stmax = _shadow_rays(o, dd)
        return jnp.sum(hp[0, :8]) + jnp.sum(stmax[:8])

    # trilinear mipmapped sampling cost in isolation (the known
    # gather-based cliff, CLAUDE.md): n random uvs + lods against a
    # 512x512 mip chain — scene-independent. Built OUTSIDE the traced
    # bodies (arrays created inside a scan trace leak as tracers into the
    # next timed_scan). Two rows A/B the single-gather quad-pack path
    # against the pre-pack 4-tap control.
    import types

    from toroidal_ray_tracing_tpu.scene.build import build_texture_atlas
    from toroidal_ray_tracing_tpu.trace.shade import _sample_texture

    _rng = np.random.default_rng(5)
    tex_fake = types.SimpleNamespace(textures=jax.tree.map(
        jnp.asarray,
        build_texture_atlas([_rng.uniform(size=(512, 512, 3)).astype(F32)])))

    def _texture_pass(quad, backend="jnp"):
        def body(i, o, d, tmax):
            # perturb by the loop index (protocol: break CSE/hoisting — an
            # i-independent body gets lifted out of the scan and
            # under-reports by ~k, measured 30x on CPU)
            uv = (o[:2] * F32(0.137) + d[:2]
                  + i.astype(F32) * F32(0.0101)) % 1.0
            lod = (tmax * 0 + jnp.abs(d[0] + i * F32(1e-6)) * 6.0)
            tid = jnp.zeros(o.shape[1], jnp.int32)
            c = _sample_texture(tex_fake, tid, uv, lod, quad=quad,
                                backend=backend)
            return jnp.sum(c[:, :8])
        return body

    texture_pass = _texture_pass(True)
    texture_pass_taps = _texture_pass(False)
    texture_pass_kernel = _texture_pass(True, backend="pallas")

    rows = [
        ("texture sample (quad-pack)", timed_scan(texture_pass, k, o, d,
                                                  tmax)),
        ("texture sample (4-tap)", timed_scan(texture_pass_taps, k, o, d,
                                              tmax)),
        ("texture sample (mosaic)", timed_scan(texture_pass_kernel, k, o,
                                               d, tmax)),
        ("tri kernel", timed_scan(tri_pass, k, o, d, tmax)),
        ("torus kernel", timed_scan(tor_pass, k, o, d, tmax)),
        ("hit (tri+torus+attrs)", timed_scan(full_hit, k, o, d, tmax)),
        ("hit + shade (incl shadow)", timed_scan(shade_pass, k, o, d, tmax)),
        ("hit + shadow-ray setup", timed_scan(occl_base, k, o, d, tmax)),
        ("hit + setup + occlusion", timed_scan(occl_pass, k, o, d, tmax)),
    ]
    print(f"# scene config {args.scene}, {n} rays, {k}-iter scans")
    for name, s in rows:
        print(f"{name:28s} {s*1e3:8.2f} ms  "
              f"({n / s / 1e6:8.1f} Mrays/s equivalent)")


if __name__ == "__main__":
    main()
