"""Config-8 grouped-streaming sizing diagnostic (CPU).

VERDICT round-4 item 1: every ray tile re-streams the same superblocks;
grouping G resident ray tiles per grid step would amortize each DMA over
the group. This measures, on config 8's REAL primary rays (1080p,
block-major span order) and its real superblock boxes:

  - per-tile visited-superblock counts (the current kernel's DMA count)
  - per-group UNION counts for G in {2, 4, 8, 16, 32}  (the grouped
    kernel's DMA count)
  - pair counts (span-dispatch work — identical in both designs)
  - the p99/max union + pair counts that set the grouped kernel's static
    SMEM caps (Vcap block entries, Pmax span slots)

Run: python scripts/c8_group_diag.py   (CPU, a few min — 1.18M-tri build)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from toroidal_ray_tracing_tpu.experiments.configs import SCENARIOS  # noqa: E402


def main():
    import jax.numpy as jnp

    from toroidal_ray_tracing_tpu.cameras import generate_rays
    from toroidal_ray_tracing_tpu.ops import tri_stream
    from toroidal_ray_tracing_tpu.ops.kernel_common import (
        BIG, F32, TMIN, _inv_dir, _slab_cols)
    from toroidal_ray_tracing_tpu.trace.intersect import geom_from_scene

    sc = SCENARIOS[8]
    scene = sc.build()
    geom = geom_from_scene(scene)
    st = sc.settings()
    o, d = generate_rays(sc.camera_at(0), sc.width, sc.height, st, xp=np)
    o, d = np.asarray(o).T, np.asarray(d).T          # (3, N) rows
    n = o.shape[1]
    tmax = np.full((n,), 10000.0, np.float32)

    # superblock grouping exactly as tri_closest_hit_stream does
    C = geom.cluster_lo.shape[0]
    cluster = scene.cluster_size
    T = geom.woop_o.shape[2]
    g = max(1, -(-C // tri_stream.STREAM_GATE_BOXES))
    g = min(g, max(1, tri_stream.STREAM_MAX_SB // cluster))
    S = -(-C // g)
    print(f"tris={T} clusters={C} sb_tris={g * cluster} S={S}")

    clo = np.asarray(geom.cluster_lo)
    chi = np.asarray(geom.cluster_hi)
    if S * g != C:
        pad = S * g - C
        clo = np.concatenate([clo, np.full((pad, 3), 1e30, np.float32)])
        chi = np.concatenate([chi, np.full((pad, 3), 1e30, np.float32)])
    empty = clo[:, 0:1] > 1e29
    chi_eff = np.where(empty, -1e30, chi)
    sb_lo = clo.reshape(S, g, 3).min(axis=1)
    sb_hi = chi_eff.reshape(S, g, 3).max(axis=1)
    all_empty = empty.reshape(S, g, 1).all(axis=1)
    sb_hi = np.where(all_empty, sb_lo, sb_hi)

    # exact per-span candidate mask, blocked (the gate's math)
    sub = 128
    Sp = n // sub
    span_mask = np.zeros((Sp, S), bool)
    oj = jnp.asarray(o)
    inv = jnp.stack([_inv_dir(jnp.asarray(d)[k]) for k in range(3)])
    tm = jnp.asarray(tmax)

    B = 64
    Sb = ((S + B - 1) // B) * B
    lo_p = np.concatenate([sb_lo, np.full((Sb - S, 3), 2e38, np.float32)])
    hi_p = np.concatenate([sb_hi, np.full((Sb - S, 3), 2e38, np.float32)])

    @jax.jit
    def block(lo_b, hi_b):
        tn, tf = _slab_cols(lo_b, hi_b, oj[0][None, :], oj[1][None, :],
                            oj[2][None, :], inv[0][None, :], inv[1][None, :],
                            inv[2][None, :])
        hit = (tn <= jnp.minimum(tf, tm[None, :])) & (tf >= TMIN) \
            & (tm[None, :] > TMIN)
        return jnp.any(hit.reshape(B, Sp, sub), axis=2)

    for i in range(0, Sb, B):
        m = np.asarray(block(jnp.asarray(lo_p[i:i + B]),
                             jnp.asarray(hi_p[i:i + B])))
        span_mask[:, :] |= False  # keep dtype
        hi_idx = min(i + B, S)
        span_mask[:, i:hi_idx] |= m[:hi_idx - i].T

    ray_tile = 1024
    n_sub = ray_tile // sub
    nt = n // ray_tile
    tile_mask = span_mask.reshape(nt, n_sub, S).any(axis=1)
    pairs_total = int(span_mask.sum())
    print(f"spans={Sp} tiles={nt} pairs(span,block)={pairs_total} "
          f"({pairs_total / Sp:.2f}/span)")
    per_tile = tile_mask.sum(axis=1)
    print(f"per-tile visits: total={per_tile.sum()} mean={per_tile.mean():.1f}"
          f" p99={np.percentile(per_tile, 99):.0f} max={per_tile.max()}")

    for G in (2, 4, 8, 16, 32):
        ngr = -(-nt // G)
        tm_p = np.zeros((ngr * G, S), bool)
        tm_p[:nt] = tile_mask
        sm_p = np.zeros((ngr * G * n_sub, S), bool)
        sm_p[:nt * n_sub] = span_mask
        gm = tm_p.reshape(ngr, G, S).any(axis=1)
        un = gm.sum(axis=1)
        pg = sm_p.reshape(ngr, G * n_sub, S).sum(axis=(1, 2))
        print(f"G={G:3d}: union total={un.sum():7d} mean={un.mean():7.1f} "
              f"p99={np.percentile(un, 99):7.0f} max={un.max():5d} "
              f"dma_reduction={per_tile.sum() / un.sum():.2f}x | "
              f"pairs/group mean={pg.mean():7.1f} "
              f"p99={np.percentile(pg, 99):7.0f} max={pg.max():6d}")


if __name__ == "__main__":
    main()
