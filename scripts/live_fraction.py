"""Per-bounce live-ray fractions for the ladder scenes (CPU, jnp path).

Sizes the win of extra wavefront compaction buckets: the bounce loop
currently packs live spans and shrinks the dispatch only when every live
span fits in an n/8 prefix (wavefront.COMPACT_FACTOR). A mirror floor
(config 6) keeps bounce-1 live near the floor's screen coverage — if
that is ~0.5, an n/2 bucket halves bounce-1's gate/kernel/shade cost.

Run: python scripts/live_fraction.py [--scene 3|6] [--side 512]
"""
import argparse

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from toroidal_ray_tracing_tpu.cameras import PinholeCamera  # noqa: E402
from toroidal_ray_tracing_tpu.scene import (RenderSettings, build_scene,  # noqa: E402
                                            procedural)
from toroidal_ray_tracing_tpu.trace.intersect import closest_hit  # noqa: E402
from toroidal_ray_tracing_tpu.trace.shade import shade  # noqa: E402

F32 = np.float32
SPAN = 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", type=int, default=6, choices=[3, 4, 6, 7])
    ap.add_argument("--side", type=int, default=512)
    args = ap.parse_args()

    sd = {3: lambda: procedural.scene_multi_torus(True),
          4: lambda: procedural.scene_instanced_torus_grid(n=1024),
          6: lambda: procedural.scene_multi_torus(False),
          7: procedural.scene_textured_mesh}[args.scene]()
    scene = build_scene(sd)
    eye = (25.0, 18.0, 25.0) if args.scene == 4 else (8.0, 5.0, 8.0)
    ctr = (0.0, 0.0, 0.0) if args.scene == 4 else (0.0, 0.5, 0.0)
    cam = PinholeCamera(eye=eye, center=ctr)
    st = RenderSettings.default(max_depth=5 if args.scene == 4 else 3)
    o, d = cam.generate_rays(args.side, args.side, st, xp=np)
    o = jnp.asarray(o.T)
    d = jnp.asarray(d.T)
    n = o.shape[1]
    active = jnp.ones((n,), bool)

    print(f"# scene {args.scene}, {args.side}x{args.side} = {n} rays")
    for depth in range(int(st.max_depth)):
        tmax = jnp.where(active, F32(10000.0), F32(0.0))
        hit = closest_hit(scene, o, d, tmax=tmax, backend="jnp")
        sh = shade(scene, st, o, d, hit, backend="jnp")
        nxt = active & ~sh.done & (depth + 1 < int(st.max_depth))
        live_sp = jnp.any(nxt.reshape(-1, SPAN), axis=1)
        frac = float(jnp.mean(nxt)) if n else 0.0
        sfrac = float(jnp.mean(live_sp))
        shadow = float(jnp.mean((active & sh.shadow_rays)))
        print(f"bounce {depth}: live {float(jnp.mean(active)):6.3f} "
              f"shadow-rays {shadow:6.3f} -> next live {frac:6.3f} "
              f"(live spans {sfrac:6.3f})")
        o = jnp.where(nxt[None, :], sh.next_origin, o)
        d = jnp.where(nxt[None, :], sh.next_dir, d)
        active = nxt
        if not bool(jnp.any(active)):
            break


if __name__ == "__main__":
    main()
