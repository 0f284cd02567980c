"""Config-6 dispatch-count diagnostic (CPU): is the loose-tri hoist firing,
and how many cluster dispatches does the triangle gate emit with vs without
the far-boxed tail? PERF.md's roofline expected the hoist to cut dispatches
38.8% (55 -> 85-90 Mrays/s); the measured ladder row barely moved
(53.7 -> 55.7) — this isolates whether the dispatch reduction happened.

Run: python scripts/c6_dispatch_diag.py   (CPU, ~1 min)
"""
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from toroidal_ray_tracing_tpu.cameras.pinhole import PinholeCamera  # noqa: E402
from toroidal_ray_tracing_tpu.ops import trace_kernel as tk  # noqa: E402
from toroidal_ray_tracing_tpu.scene import build_scene, procedural  # noqa: E402

F32 = np.float32


def main():
    scene = build_scene(procedural.scene_multi_torus(analytic=False))
    cs = scene.cluster_size
    T = scene.triangles.woop_o.shape[2]
    n_cl = scene.cluster_lo.shape[0]
    live = np.asarray(scene.triangles.valid).reshape(n_cl, cs).sum(axis=1)
    print(f"tris(table)={T} clusters={n_cl} cs={cs} "
          f"loose_tris={scene.loose_tris}")
    print(f"live per cluster: min={live.min()} max={live.max()} "
          f"n_loose_clusters={(live <= 8).sum()} (live>0: "
          f"{((live > 0) & (live <= 8)).sum()})")

    # primary rays, 1080p, block-major order — same as the ladder frame
    cam = PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0))
    o, d = PinholeCamera.device_rays(cam.ray_params(1920, 1080), 1920, 1080,
                                     block=8, rows=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    n = o.shape[1]
    # gated triangle mode: ray_tile=TRI_RAY_TILE_GATED, span=TRI_SUB
    pad = (-n) % tk.TRI_RAY_TILE_GATED
    if pad:
        o = jnp.concatenate([o, jnp.zeros((3, pad), jnp.float32)], axis=1)
        d = jnp.concatenate([d, jnp.ones((3, pad), jnp.float32)], axis=1)
    tmax = jnp.full((o.shape[1],), tk.BIG, jnp.float32)

    clo = jnp.asarray(scene.cluster_lo)
    chi = jnp.asarray(scene.cluster_hi)
    rank = jnp.arange(n_cl, dtype=jnp.int32)

    L = int(scene.loose_tris)
    n_tail = (L + cs - 1) // cs if L else 0

    def count(clo, chi, label):
        _, vbits, cnt = jax.jit(tk._chunk_visit_lists, static_argnums=(6, 7))(
            o, d, tmax, clo, chi, rank, tk.TRI_RAY_TILE_GATED, tk.TRI_SUB)
        c = int(jnp.sum(cnt))
        spans = int(jnp.sum(jax.lax.population_count(vbits)))
        print(f"{label}: {c} tile-visits, {spans} span-dispatches "
              f"({spans / (o.shape[1] / tk.TRI_SUB):.2f} per "
              f"{tk.TRI_SUB}-ray span)")
        return spans

    full = count(clo, chi, "all clusters (no hoist)")
    if n_tail:
        far = jnp.full((n_tail, 3), F32(2.0e38))
        clo_h = jnp.concatenate([clo[:n_cl - n_tail], far], axis=0)
        chi_h = jnp.concatenate([chi[:n_cl - n_tail], far], axis=0)
        hoisted = count(clo_h, chi_h, "far-boxed tail (hoist)")
        print(f"hoist removes {100 * (1 - hoisted / full):.1f}% of "
              "dispatches")
    else:
        print("loose_tris == 0: the hoist is NOT firing for this scene")


if __name__ == "__main__":
    main()
