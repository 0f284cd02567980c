"""Config-4 dispatch-count diagnostic (CPU): how many torus-chunk span
dispatches does the exact gate emit for the 1k-instance grid, for the
primary pass and for the shadow (occlusion) pass?

Config 4 (1024 Morton-sorted tori, 32x32 grid, 1080p, camera (25,18,25))
is the one BASELINE ladder row hovering at the 100 Mrays/s target
(96.9-101.2 across sessions). This isolates whether its cost is
dispatch-count-bound (spans x chunks visited), gate-bound (O(C x N) slab),
or neither (shade/occlusion setup) — pairing with the hardware phase
breakdown from `microbench --scene 4`.

Primary-pass counts run at full 1080p (slab tests only — cheap). The
shadow pass needs actual hit points, so it runs at quarter res (480x270,
same block-major span structure; frusta are 4x wider per pixel, so its
per-span counts slightly OVER-estimate 1080p coherence loss) — the
quarter-res primary row is printed alongside to calibrate that bias.

Run: python scripts/c4_dispatch_diag.py   (CPU, ~2 min)
"""
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from toroidal_ray_tracing_tpu.cameras.pinhole import PinholeCamera  # noqa: E402
from toroidal_ray_tracing_tpu.ops import trace_kernel as tk  # noqa: E402
from toroidal_ray_tracing_tpu.scene import (RenderSettings, build_scene,  # noqa: E402
                                            procedural)
from toroidal_ray_tracing_tpu.trace import intersect as isect  # noqa: E402

F32 = np.float32


def rays_for(w, h):
    cam = PinholeCamera(eye=(25.0, 18.0, 25.0), center=(0.0, 0.0, 0.0))
    o, d = PinholeCamera.device_rays(cam.ray_params(w, h), w, h,
                                     block=8, rows=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    pad = (-o.shape[1]) % tk.TORUS_RAY_TILE
    if pad:
        o = jnp.concatenate([o, jnp.zeros((3, pad), jnp.float32)], axis=1)
        d = jnp.concatenate([d, jnp.ones((3, pad), jnp.float32)], axis=1)
    return o, d


def half_stats(o, d, tmax, hlo, hhi, label):
    """Of the (span, 16-chunk) pairs that pass the chunk gate, how many
    pass via only ONE 8-torus half? (The candidate eval could then run
    (8, sub) instead of (16, sub) — half the quartic flops, same dispatch
    count.) hlo/hhi: (2C, 3) half-chunk boxes, halves of chunk c at rows
    2c / 2c+1."""
    ids, bits, cnt = jax.jit(tk._chunk_visit_lists, static_argnums=(6, 7))(
        o, d, tmax, hlo, hhi,
        jnp.arange(hlo.shape[0], dtype=jnp.int32), tk.TORUS_RAY_TILE,
        tk.TORUS_SUB)
    # reconstruct per-(tile, half) span masks from the sorted entries
    nt = bits.shape[0]
    C2 = hlo.shape[0]
    mask = np.zeros((nt, C2), np.int64)
    ids_h = np.asarray(ids)
    bits_h = np.asarray(bits)
    np.put_along_axis(mask, ids_h, bits_h, axis=1)
    h0 = mask[:, 0::2]
    h1 = mask[:, 1::2]
    both = 0
    single = 0
    for s in range(8):
        b0 = (h0 >> s) & 1
        b1 = (h1 >> s) & 1
        both += int(((b0 & b1) == 1).sum())
        single += int(((b0 ^ b1) == 1).sum())
    tot = both + single
    print(f"{label}: {tot} (span, chunk) passes at half granularity: "
          f"{single} single-half ({100 * single / max(tot, 1):.1f}%), "
          f"{both} both-halves")


def span_stats(o, d, tmax, clo, chi, rank, label):
    ids, vbits, cnt = jax.jit(
        tk._chunk_visit_lists, static_argnums=(6, 7))(
        o, d, tmax, clo, chi, rank, tk.TORUS_RAY_TILE, tk.TORUS_SUB)
    pc = np.asarray(jax.lax.population_count(vbits)).sum(axis=1)  # per tile
    spans_total = int(pc.sum())
    n_spans = o.shape[1] // tk.TORUS_SUB
    live = int(np.asarray(jnp.sum((tmax > 1e-3))))
    per_span = np.asarray(jax.lax.population_count(vbits))
    print(f"{label}: {spans_total} span-dispatches over {n_spans} spans "
          f"({spans_total / max(n_spans, 1):.2f}/span; live rays "
          f"{live}/{o.shape[1]}), tile-visits {int(jnp.sum(cnt))} "
          f"(p95 tile visits "
          f"{np.percentile(np.asarray(cnt)[:, 0], 95):.0f})")
    del per_span
    return spans_total


def main():
    scene = build_scene(procedural.scene_instanced_torus_grid(n=1024))
    geom = isect.geom_from_scene(scene)
    K = geom.tor_major.shape[0]
    chunk = tk.GATED_TORUS_CHUNK
    Kp = ((K + chunk - 1) // chunk) * chunk
    w2o_rows = jnp.asarray(geom.tor_w2o).reshape(K, 12)
    rad = jnp.stack([jnp.asarray(geom.tor_major),
                     jnp.asarray(geom.tor_minor)], axis=1)
    if Kp != K:
        pad = Kp - K
        w2o_rows = jnp.concatenate(
            [w2o_rows,
             jnp.tile(jnp.eye(3, 4, dtype=F32).reshape(1, 12), (pad, 1))])
        rad = jnp.concatenate(
            [rad, jnp.tile(jnp.asarray([[0.0, -1.0]], F32), (pad, 1))])
    _, _, clo, chi = tk._torus_boxes(w2o_rows, rad, chunk)
    _, _, hlo, hhi = tk._torus_boxes(w2o_rows, rad, chunk // 2)
    C = Kp // chunk
    print(f"K={K} chunk={chunk} C={C} chunks; tris={scene.loose_tris} "
          f"loose (plane)")

    st = RenderSettings.default(max_depth=5)
    lpos = jnp.asarray(st.light.position, F32)[:, None]

    for (w, h) in [(1920, 1080), (480, 270)]:
        o, d = rays_for(w, h)
        mean_o = jnp.mean(o, axis=1)
        cdist = jnp.linalg.norm(
            jnp.maximum(jnp.maximum(clo - mean_o[None, :],
                                    mean_o[None, :] - chi), 0.0), axis=1)
        rank = jnp.argsort(jnp.argsort(cdist)).astype(jnp.int32)
        tmax = jnp.full((o.shape[1],), tk.BIG, jnp.float32)
        span_stats(o, d, tmax, clo, chi, rank, f"primary {w}x{h}")
        half_stats(o, d, tmax, hlo, hhi, f"primary {w}x{h}")

        if w > 1000:
            continue  # shadow diag at quarter res only (jnp hit is O(N*K))
        hit = isect.closest_hit(scene, o, d, tmax, backend="jnp", geom=geom)
        hp = o + jnp.minimum(hit.t, F32(1.0e8))[None, :] * d
        ldir = lpos - hp
        ldist = jnp.linalg.norm(ldir, axis=0)
        L = ldir / jnp.maximum(ldist, F32(1e-20))[None, :]
        stmax = jnp.where(hit.kind >= 0, ldist, F32(0.0))
        frac_lit = float(jnp.mean((stmax > 1e-3).astype(F32)))
        mean_o = jnp.mean(hp, axis=1)
        cdist = jnp.linalg.norm(
            jnp.maximum(jnp.maximum(clo - mean_o[None, :],
                                    mean_o[None, :] - chi), 0.0), axis=1)
        srank = jnp.argsort(jnp.argsort(cdist)).astype(jnp.int32)
        print(f"  shadow rays: {frac_lit * 100:.1f}% of rays hit "
              "(lit, query issued)")
        span_stats(hp, L, stmax, clo, chi, srank, f"shadow  {w}x{h}")
        half_stats(hp, L, stmax, hlo, hhi, f"shadow  {w}x{h}")


if __name__ == "__main__":
    main()
