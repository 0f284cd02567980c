"""Config-6 visit-entry fusion sizing (CPU) — VERDICT r4 item 7.

Counts, on config 6's real primary rays (1080p block-major spans) and its
real 181 SAH clusters, how many (span, cluster) dispatches the exact gate
emits today (D1) vs under PAIR fusion (memory-adjacent clusters 2i/2i+1
merged into one dispatch when EITHER passes: D2). The per-dispatch chain
(slab + vector->scalar reduce + branch) is ~1.1 us and a 128-tri Woop
~0.33 us (PERF.md: 1.43 us total), so fusion wins iff
D2 x (1.1 + 2 x 0.33) < D1 x 1.43, i.e. D2 < 0.81 x D1.

Also prints the shadow-pass counts (quarter-res hit points toward the
light, like scripts/c6_dispatch_diag.py) since the occlusion sweep pays
the same chain.

Run: python scripts/c6_pair_diag.py   (CPU, ~2 min)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def span_cluster_mask(scene, geom, o, d, tmax, sub=128):
    from toroidal_ray_tracing_tpu.ops.kernel_common import _span_candidates

    return np.asarray(_span_candidates(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax),
        jnp.asarray(geom.cluster_lo), jnp.asarray(geom.cluster_hi), sub))


def report(tag, m):
    C = m.shape[1]
    Cp = C // 2 * 2
    d1 = int(m.sum())
    pair = m[:, 0:Cp:2] | m[:, 1:Cp:2]
    d2 = int(pair.sum()) + int(m[:, Cp:].sum())
    # quad fusion for scale
    Cq = C // 4 * 4
    quad = m[:, 0:Cq:4] | m[:, 1:Cq:4] | m[:, 2:Cq:4] | m[:, 3:Cq:4]
    d4 = int(quad.sum()) + int(m[:, Cq:].sum())
    t1 = d1 * 1.43
    t2 = d2 * (1.10 + 2 * 0.33)
    t4 = d4 * (1.10 + 4 * 0.33)
    print(f"{tag}: D1={d1} ({d1 / m.shape[0]:.2f}/span)  D2={d2} "
          f"({d2 / d1:.2%})  D4={d4} ({d4 / d1:.2%})  modeled us: "
          f"{t1:.0f} vs pair {t2:.0f} vs quad {t4:.0f}")


def main():
    from toroidal_ray_tracing_tpu.cameras import PinholeCamera, generate_rays
    from toroidal_ray_tracing_tpu.scene import (RenderSettings, build_scene,
                                                procedural)
    from toroidal_ray_tracing_tpu.trace.intersect import geom_from_scene
    from toroidal_ray_tracing_tpu.ops.trace_kernel import closest_hit_pallas

    scene = build_scene(procedural.scene_multi_torus(False))
    geom = geom_from_scene(scene)
    cam = PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0))
    st = RenderSettings.default(max_depth=3)

    o, d = generate_rays(cam, 1920, 1080, st, xp=np)
    o, d = np.asarray(o).T, np.asarray(d).T
    n = o.shape[1] // 128 * 128
    o, d = o[:, :n], d[:, :n]
    tmax = np.full((n,), 1e4, np.float32)
    report("primary 1080p", span_cluster_mask(scene, geom, o, d, tmax))

    # shadow pass at quarter res (needs hit points)
    o4, d4 = generate_rays(cam, 480, 270, st, xp=np)
    o4, d4 = np.asarray(o4).T, np.asarray(d4).T
    n4 = o4.shape[1] // 128 * 128
    o4, d4 = o4[:, :n4], d4[:, :n4]
    tm4 = jnp.full((n4,), np.float32(1e4))
    hit = closest_hit_pallas(scene, geom, jnp.asarray(o4), jnp.asarray(d4),
                             tm4)
    hp = np.asarray(o4 + np.minimum(np.asarray(hit.t), 1e8)[None, :] * d4)
    lpos = np.asarray(st.light.position, np.float32)[:, None]
    ldir = lpos - hp
    ldist = np.linalg.norm(ldir, axis=0)
    L = ldir / np.maximum(ldist, 1e-20)[None, :]
    stmax = np.where(np.asarray(hit.kind) >= 0, ldist, 0.0).astype(np.float32)
    report("shadow  q-res", span_cluster_mask(scene, geom, hp, L, stmax))


if __name__ == "__main__":
    main()
