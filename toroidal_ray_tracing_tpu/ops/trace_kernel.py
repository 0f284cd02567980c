"""Fused Pallas closest-hit orchestration — the `vkCmdTraceRaysKHR` fast path.

The jnp reference path materializes (rays x prims) arrays in HBM between the
matmul and the argmin. The kernels here fuse the whole query flash-attention
style: for each tile of rays, stream primitive tiles through VMEM, run the
Woop test (triangles) or the Ferrari quartic (tori) on-chip, and keep a
running (t, index, u, v) argmin in registers/VMEM — the pair matrix never
touches HBM.

Layout notes (Mosaic): rays live on *lanes* — every per-ray quantity is a
(1, R) row and boundary arrays are (4, N) / (1, N), which stay dense in HBM.
(The previous rays-on-sublanes layout used (N, 4) / (N, 1) boundary buffers,
which TPU tiling pads to 128 lanes: ~1 GB per buffer at 2M rays, ~20 GB of
XLA temps for a 1080p wavefront. Dense rows cut that to ~66 MB/buffer.)
Per-primitive quantities sit on sublanes as (K, 1) columns, so pair tiles
are (prims, rays) and argmin reductions run over sublanes.

Structure per grid step (one ray tile): both kernels walk a front-to-back
VISIT LIST of primitive blocks (triangle clusters / 8-torus chunks) read
from SMEM, with the pair test (Woop MXU contraction / Ferrari quartic)
dispatched per 128-lane span. Culling is hybrid (the TLAS/BLAS traversal
analog, SURVEY.md §2B):
  * big scenes (T > TRI_GATE_MIN tris or K > 64 tori): exact per-ray slab
    gates computed by vectorized XLA (_chunk_visit_lists) compact each
    tile's candidate blocks and per-span bits before the kernel runs;
  * small scenes: constant all-blocks visit rows — in-kernel slab gates
    against the running best do the culling (the XLA gate would cost more
    than the short walk it prunes).

Both kernels support an any-hit `occlusion` mode for shadow queries: a ray
with any in-range hit rejects all remaining clusters/chunks (the
TerminateOnFirstHit | SkipClosestHit analog, raytrace.rchit:96-109).

Module layout (split in round 4; this module re-exports everything so
`ops.trace_kernel` stays the single public namespace):
  kernel_common.py — ray-row packing, visit-list ABI, slab tests, XLA gate
  tri_kernel.py    — VMEM-resident triangle kernel
  tri_stream.py    — HBM-streamed triangle kernel (>VMEM meshes)
  torus_kernel.py  — chunk-layout + folded small-K torus kernels
  (this file)      — scene-level orchestration: loose-tri hoist, attr
                     tables, tri+torus combination (`closest_hit_pallas`)

Replaces: driver BVH traversal behind traceRayEXT (raytrace.rgen:77,
raytrace.rchit:98).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from toroidal_ray_tracing_tpu.scene.types import Scene
from toroidal_ray_tracing_tpu.trace import intersect as _isect

# Re-exports: external code (tests, scripts, experiments, utils.roofline)
# addresses everything through this namespace. `noqa: F401` — that IS the
# purpose.
from toroidal_ray_tracing_tpu.ops.kernel_common import (  # noqa: F401
    _DN0, BIG, F32, MAX_SPANS, TMIN, _chunk_visit_lists, _const_visit_rows,
    _interpret, _inv_dir, _pack_visit_rows, _rays_to_rows, _slab_cols)
from toroidal_ray_tracing_tpu.ops.tri_kernel import (  # noqa: F401
    RAY_TILE, TRI_GATE_MIN, TRI_MERGED, TRI_RAY_TILE_GATED, TRI_SUB,
    _tri_kernel, tri_closest_hit_pallas)
from toroidal_ray_tracing_tpu.ops.tri_stream import (  # noqa: F401
    STREAM_GATE_BOXES, STREAM_MAX_SB, TRI_STREAM_MIN, _tri_stream_kernel,
    tri_closest_hit_stream)
from toroidal_ray_tracing_tpu.ops.torus_kernel import (  # noqa: F401
    GATED_TORUS_CHUNK, TORUS_CHUNK, TORUS_NEWTON_OCCL, TORUS_OCCL_EARLY,
    TORUS_RAY_TILE, TORUS_SMALL_ENABLE, TORUS_SMALL_MAX_K,
    TORUS_SMALL_MAX_RAYS, TORUS_SMALL_TILE, TORUS_SMALL_WORK_MAX, TORUS_SUB,
    TORUS_TILE, _obj_normal_to_world, _torus_boxes, _torus_kernel,
    _torus_obj_normal, _torus_quartic_coeffs, _torus_small_kernel,
    _w2o_rays, torus_closest_hit_pallas, torus_closest_hit_small)


DEFER_ATTRS = os.environ.get("TRT_DEFER_ATTRS", "0") == "1"
# Defer the triangle shading-attribute interpolation OUT of the kernel
# walk: the kernels emit only (t, idx, u, v) and the winner's attrs
# compose afterwards as ONE XLA row-gather over the packed 37-row table
# plus two fused FMAs. Built on the config-8 split's finding that an
# UNPRUNED dispatch with the epilogue prices at ~3.6 us — but MEASURED
# AND REJECTED as the default (PERF.md round 5, same-session sequence
# A/Bs): config 8 12.87 -> 8.48, config 6 64.9 -> 58.2, config 7
# 49.2 -> 45.3 Mrays/s. Two reasons: the slab gate already prunes the
# epilogue down to the ~34k dispatches that actually win, and the
# (N, 37) row gather + (T, 37) transpose price far above the
# ~1 row/cycle ideal on a 1.7M-row table. Kept behind TRT_DEFER_ATTRS=1
# (bit-exact parity-tested) for workloads with un-prunable attr passes.
TORUS_DEFER = os.environ.get("TRT_TORUS_DEFER", "0") == "1"
TORUS_DEFER_MAX_K = 512
# Torus-side deferral (separate flag: different economics from the
# triangle gather path — for K <= TORUS_DEFER_MAX_K tori every per-ray
# w2o/material lookup lowers as a fused K-deep select chain, no gathers
# at all). MEASURED AND REJECTED as default (PERF.md round 5,
# same-session sequence A/B): config 3 184.8 -> 158.3, config 1
# 110.7 -> 105.9 Mrays/s — the in-kernel epilogue is already amortized
# into the chunk dispatch, while the deferred path re-runs the
# world->object transform + quartic-point normal over ALL rays every
# bounce. Kept behind TRT_TORUS_DEFER=1 (parity-tested).


def _attr_gather(tables, idx_local, u, v, hit):
    """(21, N) interpolated ShadeAttrs rows for per-ray winners: ONE row
    gather of the concatenated (37, T) attr table + fused interpolation.
    Replaces both the kernels' per-dispatch pick-matmul epilogues and the
    loose prepass's one-hot matmuls when DEFER_ATTRS."""
    a0, a1, a2 = tables
    T = a0.shape[1]
    rows = jnp.concatenate([a0, a1, a2], axis=0)      # (37, T)
    g = rows.T[jnp.clip(idx_local, 0, T - 1)]         # (N, 37) row gather
    gt = g.T                                          # (37, N) — lane = N
    top = gt[0:8] + u[None, :] * gt[21:29] + v[None, :] * gt[29:37]
    attr = jnp.concatenate([top, gt[8:21]], axis=0)   # (21, N)
    return jnp.where(hit[None, :], attr, F32(0.0))


def _torus_attr_defer(geom, mat_table, origins, dirs, kt, ki, hit):
    """(15, N) deferred torus attrs [world nrm(3), material(12)] for
    per-ray winners — the XLA mirror of _torus_kernel's per-dispatch
    epilogue, identical math to shade()'s jnp torus branch
    (trace/shade.py:275-300). Only used when K <= TEX_TINY_MAX: every
    per-ray lookup lowers to fused K-deep select chains, never (N,)
    flat gathers (~18 ms/2M rays each)."""
    from toroidal_ray_tracing_tpu.geom import torus as torus_geom
    from toroidal_ray_tracing_tpu.trace.shade import _tiny_lookup

    K = geom.tor_major.shape[0]
    W12 = jnp.asarray(geom.tor_w2o).reshape(K, 12)
    cols = tuple(W12[:, i] for i in range(12)) \
        + tuple(mat_table[:, i] for i in range(12)) \
        + (jnp.asarray(geom.tor_major),)
    sel = _tiny_lookup(cols, ki, K)
    w = sel[0:12]
    mat = sel[12:24]
    rmaj = sel[24]

    t = jnp.minimum(kt, F32(1.0e8))
    hx = origins[0] + t * dirs[0]
    hy = origins[1] + t * dirs[1]
    hz = origins[2] + t * dirs[2]
    p_obj = jnp.stack([
        w[0] * hx + w[1] * hy + w[2] * hz + w[3],
        w[4] * hx + w[5] * hy + w[6] * hz + w[7],
        w[8] * hx + w[9] * hy + w[10] * hz + w[11],
    ], axis=0)                                        # (3, N)
    n_obj = torus_geom.torus_normal(jnp, p_obj.T, rmaj)
    nx, ny, nz = n_obj[:, 0], n_obj[:, 1], n_obj[:, 2]
    # inverse-transpose transform: rotation rows applied as columns
    n_tor = jnp.stack([
        nx * w[0] + ny * w[4] + nz * w[8],
        nx * w[1] + ny * w[5] + nz * w[9],
        nx * w[2] + ny * w[6] + nz * w[10],
    ], axis=0)                                        # (3, N)
    attr = jnp.concatenate([n_tor, jnp.stack(mat, axis=0)], axis=0)
    return jnp.where(hit[None, :], attr, F32(0.0))


def _material_rows(scene: Scene, mat_id):
    """Per-primitive baked material table (P, 12):
    [ambient(3), diffuse(3), specular(3), shininess, illum, texture_id]."""
    mats = scene.materials
    return jnp.concatenate([
        jnp.asarray(mats.ambient)[mat_id],
        jnp.asarray(mats.diffuse)[mat_id],
        jnp.asarray(mats.specular)[mat_id],
        jnp.asarray(mats.shininess)[mat_id][:, None],
        jnp.asarray(mats.illum)[mat_id].astype(F32)[:, None],
        jnp.asarray(mats.texture_id)[mat_id].astype(F32)[:, None],
    ], axis=1)


def _tri_attr_tables(scene: Scene, geom):
    """((21,Tl), (8,Tl), (8,Tl)) interpolation tables for the geometry
    slice: attr = A0[p] + u*A1[p] + v*A2[p]. Rows 0-7 are [pos, nrm, uv];
    rows 8-19 the baked material; row 20 the uv texel density (mip LOD)."""
    tris = scene.triangles
    duv1 = jnp.asarray(tris.uv1) - jnp.asarray(tris.uv0)
    duv2 = jnp.asarray(tris.uv2) - jnp.asarray(tris.uv0)
    uv_area = jnp.abs(duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0])
    world_area = jnp.linalg.norm(
        jnp.cross(jnp.asarray(tris.e1), jnp.asarray(tris.e2)), axis=-1)
    density = jnp.sqrt(uv_area / jnp.maximum(world_area, F32(1e-30)))
    a0 = jnp.concatenate([
        jnp.asarray(tris.v0), jnp.asarray(tris.n0), jnp.asarray(tris.uv0),
        _material_rows(scene, jnp.asarray(tris.mat_id)),
        density[:, None],
    ], axis=1).T
    a1 = jnp.concatenate([
        jnp.asarray(tris.e1),
        jnp.asarray(tris.n1) - jnp.asarray(tris.n0),
        jnp.asarray(tris.uv1) - jnp.asarray(tris.uv0)], axis=1).T
    a2 = jnp.concatenate([
        jnp.asarray(tris.e2),
        jnp.asarray(tris.n2) - jnp.asarray(tris.n0),
        jnp.asarray(tris.uv2) - jnp.asarray(tris.uv0)], axis=1).T
    t_local = geom.woop_o.shape[2]
    if t_local != tris.count:
        sl = lambda a: jax.lax.dynamic_slice_in_dim(  # noqa: E731
            a, geom.tri_offset, t_local, axis=1)
        a0, a1, a2 = sl(a0), sl(a1), sl(a2)
    return a0, a1, a2


def _loose_tri_hit(origins, dirs, tmax, woop_o, woop_d, base: int, L: int):
    """Dense XLA closest-hit over the loose tail rows [base, base+L).

    Loose triangles (scene.loose_tris — spatially fat rows like a ground
    plane, compacted to the table tail by build._split_loose_clusters) are
    brute-forced here instead of dispatched in-kernel: their whole-scene
    AABBs made every ray tile visit their cluster (38.8% of all dispatches
    on the 23k-tri ladder mesh for 2 plane triangles). Row-native, no
    per-ray gathers; (L, N) temporaries with L <= build.LOOSE_TOTAL_MAX."""
    n = origins.shape[1]
    oh = jnp.concatenate([origins, jnp.ones((1, n), F32)], axis=0)   # (4, N)
    wo = jax.lax.slice_in_dim(woop_o, base, base + L, axis=2)        # (3,4,L)
    wd = jax.lax.slice_in_dim(woop_d, base, base + L, axis=2)        # (3,3,L)
    hp = jnp.einsum("kal,an->kln", wo, oh, precision="highest")      # (3,L,N)
    dp = jnp.einsum("kal,an->kln", wd, dirs, precision="highest")
    dz = dp[2]
    dz_ok = jnp.abs(dz) > F32(1e-12)
    inv = jnp.where(dz_ok, F32(1.0), F32(0.0)) / jnp.where(dz_ok, dz,
                                                           F32(1.0))
    t = -hp[2] * inv
    uu = hp[0] + t * dp[0]
    vv = hp[1] + t * dp[1]
    ok = dz_ok & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0) \
        & (t >= TMIN) & (t <= tmax[None, :])
    t = jnp.where(ok, t, BIG).astype(F32)
    tb = jnp.min(t, axis=0)                                          # (N,)
    rows = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    idx = jnp.min(jnp.where(t <= tb[None, :], rows, L), axis=0)
    idx = jnp.minimum(idx, L - 1).astype(jnp.int32)
    pick = rows == idx[None, :]
    miss = tb >= BIG
    ub = jnp.where(miss, F32(0.0), jnp.sum(jnp.where(pick, uu, 0.0), axis=0))
    vb = jnp.where(miss, F32(0.0), jnp.sum(jnp.where(pick, vv, 0.0), axis=0))
    return tb, idx, ub.astype(F32), vb.astype(F32)


def _loose_attr(tables, base: int, L: int, idx, u_, v_, hit):
    """(21, N) interpolated ShadeAttrs rows for the loose prepass winners —
    the XLA mirror of _tri_kernel's attr epilogue, as one-hot matmuls (the
    per-ray alternative is a gather: ~1 row/cycle on TPU)."""
    a0, a1, a2 = tables
    sl = lambda a: jax.lax.slice_in_dim(a, base, base + L, axis=1)  # noqa: E731
    onehot = ((idx[None, :] == jnp.arange(L, dtype=jnp.int32)[:, None])
              & hit[None, :]).astype(F32)                            # (L, N)
    A0 = jnp.einsum("al,ln->an", sl(a0), onehot, precision="highest")
    A1 = jnp.einsum("al,ln->an", sl(a1), onehot, precision="highest")
    A2 = jnp.einsum("al,ln->an", sl(a2), onehot, precision="highest")
    top = A0[:8] + u_[None, :] * A1 + v_[None, :] * A2
    return jnp.concatenate([top, A0[8:]], axis=0)


def closest_hit_pallas(scene: Scene, geom, origins, dirs, tmax,
                       want_attrs: bool = False, occlusion: bool = False):
    """Fused closest-hit over the geometry slice. Pads the ray batch to the
    kernel tile and combines triangle + torus results. With want_attrs the
    kernels also emit the winner's interpolated shading attributes
    (Hit.attrs), eliminating shade()'s per-ray table gathers. With occlusion
    (shadow/any-hit queries, raytrace.rchit:96-109's TerminateOnFirstHit),
    the kernels stop refining a ray once it has any in-range hit — only
    Hit.kind >= 0 is meaningful then. origins/dirs: (3, N) rows."""
    assert not (want_attrs and occlusion)
    n = origins.shape[1]
    pad = (-n) % RAY_TILE
    if pad:
        origins = jnp.concatenate([origins, jnp.zeros((3, pad), F32)], axis=1)
        dirs = jnp.concatenate([dirs, jnp.ones((3, pad), F32)], axis=1)
        tmax = jnp.concatenate([tmax, jnp.zeros((pad,), F32)])

    has_tris = bool(np.any(np.asarray(scene.triangles.valid))) if isinstance(
        scene.triangles.valid, np.ndarray) else True
    has_tori = bool(np.any(np.asarray(scene.tori.valid))) if isinstance(
        scene.tori.valid, np.ndarray) else True

    np_ = origins.shape[1]
    t_best = jnp.full((np_,), BIG, F32)
    kind = jnp.full((np_,), -1, jnp.int32)
    prim = jnp.zeros((np_,), jnp.int32)
    u = jnp.zeros((np_,), F32)
    v = jnp.zeros((np_,), F32)
    tri_attr = tor_attr = None

    if has_tris:
        T_local = geom.woop_o.shape[2]
        cs = scene.cluster_size
        n_cl = geom.cluster_lo.shape[0]
        if n_cl * cs == T_local:
            # slice-aligned clusters (the whole scene, or a prims-axis shard
            # cut on cluster boundaries by pad_scene_for_mesh)
            clo, chi = geom.cluster_lo, geom.cluster_hi
        else:
            # hand-built slice not cut on cluster boundaries: treat it as one
            # uncullable block
            cs = T_local
            clo = jnp.full((1, 3), -3e38, F32)
            chi = jnp.full((1, 3), 3e38, F32)
        tables = _tri_attr_tables(scene, geom) if want_attrs else None
        # deferred attrs: kernels emit (t, idx, u, v) only; the winner's
        # attrs compose below as one row gather (see DEFER_ATTRS)
        defer = want_attrs and DEFER_ATTRS

        # loose-triangle hoist: test the tail rows densely in XLA, tighten
        # the kernel's tmax with their hits (extra behind-the-floor chunk
        # culling), and cull the tail clusters outright. Skipped on
        # prims-axis shards (T_local != scene table), where the tail keeps
        # its real AABB and the owning shard's kernel tests it normally.
        L = scene.loose_tris
        hoist = (L > 0 and n_cl * cs == T_local
                 and T_local == scene.triangles.woop_o.shape[2])
        n_tail = (L + cs - 1) // cs if hoist else 0
        tri_tmax = tmax
        loose_attr = None
        if hoist:
            base = T_local - n_tail * cs
            lt, lidx, lu, lv = _loose_tri_hit(
                origins, dirs, tmax, geom.woop_o, geom.woop_d, base, L)
            lhit = lt < BIG
            t_best = jnp.where(lhit, lt, t_best)
            kind = jnp.where(lhit, 0, kind)
            prim = jnp.where(lhit, base + lidx + geom.tri_offset, prim)
            u = jnp.where(lhit, lu, u)
            v = jnp.where(lhit, lv, v)
            if want_attrs and not defer:
                loose_attr = _loose_attr(tables, base, L, lidx, lu, lv, lhit)
            far = jnp.full((n_tail, 3), F32(2.0e38))
            clo = jnp.concatenate([clo[:n_cl - n_tail], far], axis=0)
            chi = jnp.concatenate([chi[:n_cl - n_tail], far], axis=0)
            if occlusion:
                tri_tmax = jnp.where(lhit, F32(0.0), tmax)
            else:
                tri_tmax = jnp.minimum(tmax, lt)

        if hoist and n_tail == n_cl:
            # the hoist covered every live triangle (plane-only scene):
            # no triangle kernel launch at all — the dense XLA prepass IS
            # the triangle pass
            if want_attrs and not defer:
                tri_attr = loose_attr
        else:
            stream = (T_local > TRI_STREAM_MIN and cs % 128 == 0
                      and n_cl * cs == T_local)
            launch = (tri_closest_hit_stream if stream
                      else tri_closest_hit_pallas)
            out = launch(
                origins, dirs, tri_tmax, geom.woop_o, geom.woop_d, clo, chi,
                cs, attr_tables=None if defer else tables,
                occlusion=occlusion)
            tt, ti, tu, tv = out[:4]
            better = tt < t_best
            if want_attrs and not defer:
                tri_attr = out[4]                    # (21, Np)
                if loose_attr is not None:
                    tri_attr = jnp.where(better[None, :], tri_attr,
                                         loose_attr)
            t_best = jnp.where(better, tt, t_best)
            kind = jnp.where(better, 0, kind)
            prim = jnp.where(better, ti + geom.tri_offset, prim)
            u = jnp.where(better, tu, u)
            v = jnp.where(better, tv, v)

        if defer:
            tri_attr = _attr_gather(tables, prim - geom.tri_offset, u, v,
                                    kind == 0)

    if has_tori:
        if want_attrs:
            mat_table = _material_rows(
                scene, jnp.asarray(scene.tori.mat_id))
            k_local = geom.tor_major.shape[0]
            if k_local != scene.tori.count:
                mat_table = jax.lax.dynamic_slice_in_dim(
                    mat_table, geom.tor_offset, k_local, axis=0)
        else:
            mat_table = None
        # torus-side deferral: only for small K, where every per-ray
        # lookup is a fused select chain — at K > TORUS_DEFER_MAX_K the
        # deferred path would need (N,) row gathers that cost more than
        # the epilogue it removes (config 4's K=1024 grid keeps the
        # in-kernel epilogue)
        tor_defer = (want_attrs and TORUS_DEFER
                     and geom.tor_major.shape[0] <= TORUS_DEFER_MAX_K)
        # fold triangle hits into the torus query's tmax: torus groups (and
        # individual tori) behind nearer triangle geometry skip the quartic
        # via the kernels' entry-distance tests
        if has_tris and occlusion:
            # an occluded ray needs no torus query at all
            tor_tmax = jnp.where(t_best < BIG, F32(0.0), tmax)
        elif has_tris:
            tor_tmax = jnp.minimum(tmax, t_best)
        else:
            tor_tmax = tmax
        out = torus_closest_hit_pallas(
            origins, dirs, tor_tmax, geom.tor_w2o, geom.tor_major,
            geom.tor_minor, geom.tor_center, geom.tor_bound,
            mat_table=None if tor_defer else mat_table,
            occlusion=occlusion)
        kt, ki = out[:2]
        if want_attrs and not tor_defer:
            tor_attr = out[2]                        # (15, Np)
        better = kt < t_best
        t_best = jnp.where(better, kt, t_best)
        kind = jnp.where(better, 1, kind)
        prim = jnp.where(better, ki + geom.tor_offset, prim)
        if tor_defer:
            tor_attr = _torus_attr_defer(geom, mat_table, origins, dirs,
                                         kt, ki, kind == 1)

    sl = lambda x: x[:n]  # noqa: E731
    attrs = None
    if want_attrs:
        is_tor = (kind == 1)[None, :]
        if tri_attr is None:
            tri_attr = jnp.zeros((21, np_), F32)
        if tor_attr is None:
            tor_attr = jnp.zeros((15, np_), F32)
        # torus world position = o + t d (computed in shade); the pos rows
        # carry the triangle's barycentric-exact position only. All fields
        # stay ROWS — plain slices of the kernels' (A, N) outputs, no
        # re-stacking (shade is row-native)
        nrm = jnp.where(is_tor, tor_attr[0:3], tri_attr[3:6])
        mat = jnp.where(is_tor, tor_attr[3:15], tri_attr[8:20])
        slr = lambda m: m[:, :n]  # noqa: E731
        attrs = _isect.ShadeAttrs(
            pos=slr(tri_attr[0:3]),
            nrm=slr(nrm),
            uv=slr(tri_attr[6:8]),
            ambient=slr(mat[0:3]),
            diffuse=slr(mat[3:6]),
            specular=slr(mat[6:9]),
            shininess=sl(mat[9]),
            illum=jnp.round(sl(mat[10])).astype(jnp.int32),
            texture_id=jnp.round(sl(mat[11])).astype(jnp.int32),
            tex_density=jnp.where(sl(kind == 1), F32(0.0),
                                  sl(tri_attr[20])),
        )
    return _isect.Hit(t=sl(t_best), kind=sl(kind), prim=sl(prim),
                      u=sl(u), v=sl(v), attrs=attrs)
