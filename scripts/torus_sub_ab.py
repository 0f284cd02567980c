"""Hardware A/B: gated torus kernel span width (TORUS_SUB).

The gated quartic dispatch is latency-bound (~2.7 us serial chain per
(chunk, span) block; chunk=32 cost only 3% more than 16 per dispatch), and
config 4's visit lists average 4.68 span-dispatches per (tile, chunk)
visit — so widening the span amortizes the chain over more rays and should
cut the pass several-fold. This measures the closest-hit and any-hit torus
passes on the config-4 scene (1024 tori) at sub = 128/256/512/1024.

Run on an IDLE chip: python scripts/torus_sub_ab.py
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
        build_scene(procedural.scene_instanced_torus_grid(n=1024)))
    geom = jax.device_put(isect.geom_from_scene(scene))

    cam = PinholeCamera(eye=(25.0, 18.0, 25.0), center=(0.0, 0.0, 0.0))
    o_h, d_h = PinholeCamera.device_rays(cam.ray_params(1920, 1080),
                                         1920, 1080, block=8, rows=True)
    n = (o_h.shape[1] // 2048) * 2048  # 1080p frame, ray-tile aligned
    o = jax.device_put(jnp.asarray(o_h[:, :n], jnp.float32))
    d = jax.device_put(jnp.asarray(d_h[:, :n], jnp.float32))
    tmax = jnp.full((n,), F32(10000.0))
    k = 8

    for sub in (128, 256, 512, 1024):
        os.environ["TRT_TORUS_SUB"] = str(sub)
        # TORUS_SUB is read from the env at import in ops.torus_kernel
        # (the defining module after the round-4 split)
        import toroidal_ray_tracing_tpu.ops.torus_kernel as tk
        importlib.reload(tk)
        assert tk.TORUS_SUB == sub

        def tor_pass(i, o, d, tmax, occl=False):
            dd = d.at[0].add((i.astype(F32) + 1.0) * F32(1e-6))
            out = tk.torus_closest_hit_pallas(
                o, dd, tmax, geom.tor_w2o, geom.tor_major, geom.tor_minor,
                geom.tor_center, geom.tor_bound, occlusion=occl)
            return jnp.sum(out[0][:8])

        def tor_occl(i, o, d, tmax):
            return tor_pass(i, o, d, tmax, occl=True)

        t_c = timed_scan(tor_pass, k, o, d, tmax)
        t_o = timed_scan(tor_occl, k, o, d, tmax)
        print(f"sub={sub:5d}: closest {t_c * 1e3:7.2f} ms  "
              f"any-hit {t_o * 1e3:7.2f} ms  per 2M-ray pass", flush=True)


if __name__ == "__main__":
    main()
