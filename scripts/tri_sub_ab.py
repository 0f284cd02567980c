"""Hardware A/B: gated triangle kernel span/tile widths (TRI_SUB/TILE).

VERDICT r3 #3: the triangle kernel still dispatches 128-ray Woop spans
while TRT_TORUS_SUB=512 widening bought config 4 +9.5% by amortizing the
~1.4 us/dispatch fixed chain. This measures the closest-hit and any-hit
triangle passes on the config-6 mesh (23k tris, gated exact visit lists)
at (sub, tile) = (128,1024) default / (256,1024) / (512,1024) /
(512,2048) / (1024,2048).

Run on an IDLE chip: python scripts/tri_sub_ab.py
(each width is a fresh Mosaic compile — remote compiles take minutes).
"""
import importlib
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
    from toroidal_ray_tracing_tpu.scene import build_scene, procedural
    from toroidal_ray_tracing_tpu.trace import intersect as isect

    scene = jax.device_put(
        build_scene(procedural.scene_multi_torus(analytic=False)))
    geom = jax.device_put(isect.geom_from_scene(scene))
    print("tris:", geom.woop_o.shape[2], "clusters:",
          geom.cluster_lo.shape[0], flush=True)

    cam = PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0))
    o_h, d_h = PinholeCamera.device_rays(cam.ray_params(1920, 1080),
                                         1920, 1080, block=8, rows=True)
    n = (o_h.shape[1] // 2048) * 2048  # 1080p frame, ray-tile aligned
    o = jax.device_put(jnp.asarray(o_h[:, :n], jnp.float32))
    d = jax.device_put(jnp.asarray(d_h[:, :n], jnp.float32))
    tmax = jnp.full((n,), F32(10000.0))
    k = 8

    for sub, tile in ((128, 1024), (256, 1024), (512, 1024),
                      (512, 2048), (1024, 2048)):
        os.environ["TRT_TRI_SUB"] = str(sub)
        os.environ["TRT_TRI_TILE"] = str(tile)
        import toroidal_ray_tracing_tpu.ops.tri_kernel as tk
        importlib.reload(tk)
        assert tk.TRI_SUB == sub and tk.TRI_RAY_TILE_GATED == tile

        def tri_pass(i, o, d, tmax, occl=False):
            dd = d.at[0].add((i.astype(F32) + 1.0) * F32(1e-6))
            out = tk.tri_closest_hit_pallas(
                o, dd, tmax, geom.woop_o, geom.woop_d, geom.cluster_lo,
                geom.cluster_hi, int(scene.cluster_size), occlusion=occl)
            return jnp.sum(out[0][:8])

        def tri_occl(i, o, d, tmax):
            return tri_pass(i, o, d, tmax, occl=True)

        t_c = timed_scan(tri_pass, k, o, d, tmax)
        t_o = timed_scan(tri_occl, k, o, d, tmax)
        print(f"sub={sub:5d} tile={tile:5d}: closest {t_c * 1e3:7.2f} ms  "
              f"any-hit {t_o * 1e3:7.2f} ms  per 2M-ray pass", flush=True)


if __name__ == "__main__":
    main()
