"""Hardware A/B: config 7's REAL trilinear sample pass, Mosaic gather
kernel (ops/tex_kernel.py) vs the XLA quad-gather path, plus the span
block-visit statistics that decide the kernel's cost model.

The kernel walks each 128-ray span's [blo, bhi] table-block range per mip
level; the probe measured ~97 ns per (span, block) 2-gather visit, so the
kernel wins iff the average visit count stays small. This script traces
config 7's primary rays (1080p), derives the exact (uv, lod) stream
shade() would sample with, then:
  1. prints the per-span block-range width distribution for both
     trilinear taps (the V in cost = 16384 x V x 2 x ~150 ns);
  2. times the isolated sample pass on the REAL indices, kernel vs XLA.

Run on an IDLE chip: python scripts/tex_kernel_ab.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

F32 = np.float32


def main():
    from toroidal_ray_tracing_tpu.cameras import PinholeCamera
    from toroidal_ray_tracing_tpu.experiments.microbench import timed_scan
    from toroidal_ray_tracing_tpu.ops import tex_kernel
    from toroidal_ray_tracing_tpu.ops import trace_kernel as tk
    from toroidal_ray_tracing_tpu.scene import (RenderSettings, build_scene,
                                                procedural)
    from toroidal_ray_tracing_tpu.trace import intersect as isect
    from toroidal_ray_tracing_tpu.trace import shade as sh

    scene = jax.device_put(build_scene(procedural.scene_textured_mesh()))
    geom = jax.device_put(isect.geom_from_scene(scene))
    atlas = scene.textures
    print("atlas texels:", int(atlas.data4q.shape[0]),
          "kernel applicable:", tex_kernel.kernel_applicable(atlas),
          flush=True)

    cam = PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0))
    st = RenderSettings.default(max_depth=3)
    from toroidal_ray_tracing_tpu.render.renderer import autofill_pixel_spread
    st = autofill_pixel_spread(st, cam, 1920, 1080)
    o_h, d_h = PinholeCamera.device_rays(cam.ray_params(1920, 1080, st),
                                         1920, 1080, st, block=8, rows=True)
    n = (o_h.shape[1] // 2048) * 2048
    o = jax.device_put(jnp.asarray(o_h[:, :n], jnp.float32))
    d = jax.device_put(jnp.asarray(d_h[:, :n], jnp.float32))
    tmax = jnp.full((n,), F32(10000.0))

    @jax.jit
    def uv_lod(o, d, tmax):
        hit = tk.closest_hit_pallas(scene, geom, o, d, tmax,
                                    want_attrs=True)
        a = hit.attrs
        tid = jnp.maximum(jnp.where(hit.kind == 1, -1, a.texture_id), 0)
        (dim0,) = sh._tex_meta(
            atlas, tid, (jnp.maximum(atlas.sizes[:, 0, 0],
                                     atlas.sizes[:, 0, 1]),))
        lod = sh.mip_lod(jnp, hit.t, jnp.asarray(st.pixel_spread, F32),
                         a.tex_density, dim0.astype(F32))
        valid = (a.texture_id >= 0) & (hit.kind == 0)
        return a.uv, lod, tid, valid

    uv, lod, tid, valid = jax.tree.map(jax.device_put, uv_lod(o, d, tmax))
    print("textured rays:", int(jnp.sum(valid)), "of", n, flush=True)

    # --- visit statistics (the kernel's cost driver) ---
    (nl,) = sh._tex_meta(atlas, tid, (atlas.n_levels,))
    l = jnp.clip(lod, 0.0, (nl - 1).astype(F32))
    l0 = jnp.floor(l).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, nl - 1)
    for name, lev in (("tap0", l0), ("tap1", l1)):
        f, _, _ = sh._quad_index(scene, tid, lev, uv)
        b = np.asarray(f >> 10).reshape(-1, 128)
        v = np.asarray(valid).reshape(-1, 128)
        blo = np.where(v, b, 10 ** 9).min(axis=1)
        bhi = np.where(v, b, -1).max(axis=1)
        w = np.maximum(bhi - blo + 1, 0)
        w = w[bhi >= 0]
        print(f"{name}: spans {len(w)}, block-range width mean "
              f"{w.mean():.2f} p50 {np.percentile(w, 50):.0f} p90 "
              f"{np.percentile(w, 90):.0f} p99 {np.percentile(w, 99):.0f} "
              f"max {w.max()}", flush=True)

    # --- timed A/B on the real sampling stream ---
    def sample(i, uv, lod, tid, backend):
        uvp = uv + i.astype(F32) * F32(1e-7)
        c = sh._sample_texture(scene, tid, uvp, lod, backend=backend,
                               valid=valid)
        return jnp.sum(c[:, :8])

    def s_xla(i, uv, lod, tid):
        return sample(i, uv, lod, tid, "jnp")

    def s_kern(i, uv, lod, tid):
        return sample(i, uv, lod, tid, "pallas")

    k = 8
    t_x = timed_scan(s_xla, k, uv, lod, tid)
    t_k = timed_scan(s_kern, k, uv, lod, tid)
    print(f"sample pass per {n / 1e6:.1f}M rays: XLA quad-gather "
          f"{t_x * 1e3:7.2f} ms   mosaic kernel {t_k * 1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
