"""Fused Pallas closest-hit kernels — the `vkCmdTraceRaysKHR` fast path.

The jnp reference path materializes (rays x prims) arrays in HBM between the
matmul and the argmin. These kernels fuse the whole query flash-attention
style: for each tile of rays, stream primitive tiles through VMEM, run the
Woop test (triangles) or the Ferrari quartic (tori) on-chip, and keep a
running (t, index, u, v) argmin in registers/VMEM — the pair matrix never
touches HBM.

Layout notes (Mosaic): rays live on *sublanes* — every per-ray quantity is a
(R, 1) column so it broadcasts against (R, C) pair tiles without relayouts;
per-primitive rows are (1, C). Boundary arrays are (N, 1).

Structure per grid step (one ray tile):
  * triangles: whole Woop table resident in VMEM; `lax.cond` skips a cluster
    when no live ray intersects its AABB (the TLAS/BLAS culling analog,
    SURVEY.md §2B).
  * tori: bounding-sphere prepass masks pairs; tile-level `lax.cond` skips
    the quartic for tiles no ray can touch.

Replaces: driver BVH traversal behind traceRayEXT (raytrace.rgen:77,
raytrace.rchit:98).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from toroidal_ray_tracing_tpu.geom import torus as torus_geom
from toroidal_ray_tracing_tpu.scene.types import Scene
from toroidal_ray_tracing_tpu.trace import intersect as _isect

F32 = np.float32
BIG = F32(3.0e38)
TMIN = F32(0.001)

RAY_TILE = 256       # rays per grid step (triangle kernel)
TORUS_RAY_TILE = 64  # rays per grid step (torus kernel; the quartic DAG is
                     # ~400 SSA values deep — 64x128 tiles keep the Mosaic
                     # scoped-vmem stack within its 16 MB budget)
TORUS_TILE = 128     # tori per tile (full lane width)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Triangle kernel
# ---------------------------------------------------------------------------


def _tri_kernel(o_ref, d_ref, tmax_ref, woop_o_ref, woop_d_ref,
                clo_ref, chi_ref,
                t_out, idx_out, u_out, v_out, *, cluster: int):
    """One grid step = one ray tile vs all triangles (cluster-culled).

    o/d: (R, 4) homogeneous origins ([o,1]) and dirs ([d,0]).
    woop_o/woop_d: (3, 4, T). clo/chi: (C, 4) cluster AABBs (xyz + pad).
    outs: (R, 1) accumulators.
    """
    R = o_ref.shape[0]
    T = woop_o_ref.shape[2]
    n_clusters = T // cluster

    oh = o_ref[...]               # (R, 4)
    d = d_ref[...]                # (R, 4)
    tmax = tmax_ref[...]          # (R, 1)

    # slab-test reciprocal directions (zero components -> +/-inf behavior)
    d_ok = jnp.abs(d) > F32(1e-30)
    inv_d = jnp.where(d_ok, F32(1.0), F32(0.0)) / jnp.where(d_ok, d, F32(1.0))
    inv_d = jnp.where(d_ok, inv_d, jnp.where(d >= 0, F32(3e38), F32(-3e38)))

    # accumulators live in the output refs (VMEM-resident across the loop);
    # @pl.when predication instead of lax.cond carries — carried tuples
    # through cond/fori make Mosaic's register allocator spill wildly
    t_out[...] = jnp.full((R, 1), BIG, F32)
    idx_out[...] = jnp.zeros((R, 1), jnp.int32)
    u_out[...] = jnp.zeros((R, 1), F32)
    v_out[...] = jnp.zeros((R, 1), F32)

    def body(j, _):
        base = j * cluster
        t_best = t_out[...]

        # --- cluster cull: does any ray enter this cluster's AABB closer
        # than its current best hit? ---
        lo = clo_ref[j]           # (4,) broadcasts over (R, 4)
        hi = chi_ref[j]
        t0 = (lo - oh) * inv_d
        t1 = (hi - oh) * inv_d
        tn = jnp.max(jnp.minimum(t0, t1)[:, :3], axis=1, keepdims=True)
        tf = jnp.min(jnp.maximum(t0, t1)[:, :3], axis=1, keepdims=True)
        box_hit = (tn <= jnp.minimum(tf, jnp.minimum(t_best, tmax))) \
            & (tf >= TMIN) & (tmax > TMIN)        # (R, 1)

        @pl.when(jnp.any(box_hit))
        def _():
            wo = woop_o_ref[:, :, pl.ds(base, cluster)]   # (3, 4, C)
            wd = woop_d_ref[:, :, pl.ds(base, cluster)]
            hp = jax.lax.Precision.HIGHEST
            opx = jnp.dot(oh, wo[0], precision=hp)        # (R, C)
            opy = jnp.dot(oh, wo[1], precision=hp)
            opz = jnp.dot(oh, wo[2], precision=hp)
            dpx = jnp.dot(d, wd[0], precision=hp)
            dpy = jnp.dot(d, wd[1], precision=hp)
            dpz = jnp.dot(d, wd[2], precision=hp)

            dz_ok = jnp.abs(dpz) > F32(1e-12)
            inv_dz = jnp.where(dz_ok, F32(1.0), F32(0.0)) / \
                jnp.where(dz_ok, dpz, F32(1.0))
            t = -opz * inv_dz
            u = opx + t * dpx
            v = opy + t * dpy
            hit = dz_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) \
                & (t >= TMIN) & (t <= tmax)
            t = jnp.where(hit, t, BIG)

            # select-based argmin (no gathers on TPU): smallest column
            # achieving the row minimum, then one-hot select of u/v
            t_tile = jnp.min(t, axis=1, keepdims=True)    # (R, 1)
            cols = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            arg = jnp.min(jnp.where(t <= t_tile, cols, cluster), axis=1,
                          keepdims=True)                  # (R, 1)
            pick = cols == arg
            u_sel = jnp.sum(jnp.where(pick, u, 0.0), axis=1, keepdims=True)
            v_sel = jnp.sum(jnp.where(pick, v, 0.0), axis=1, keepdims=True)
            better = t_tile < t_out[...]
            t_out[...] = jnp.where(better, t_tile, t_out[...])
            idx_out[...] = jnp.where(better, base + arg, idx_out[...])
            u_out[...] = jnp.where(better, u_sel, u_out[...])
            v_out[...] = jnp.where(better, v_sel, v_out[...])

        return 0

    jax.lax.fori_loop(0, n_clusters, body, 0)


@functools.partial(jax.jit, static_argnames=("cluster",))
def tri_closest_hit_pallas(origins, dirs, tmax, woop_o, woop_d,
                           cluster_lo, cluster_hi, cluster: int):
    """origins/dirs: (N, 3); woop_o: (3, 4, T); woop_d: (3, 3, T);
    cluster_*: (C, 3). N must be a multiple of RAY_TILE."""
    n = origins.shape[0]
    T = woop_o.shape[2]
    assert n % RAY_TILE == 0, n
    nt = n // RAY_TILE

    oh = jnp.concatenate([origins, jnp.ones((n, 1), F32)], axis=1)
    d4 = jnp.concatenate([dirs, jnp.zeros((n, 1), F32)], axis=1)
    tm = tmax.reshape(n, 1)
    # pad woop_d input dim 3 -> 4 so both matmuls share the (R, 4) operand
    wd4 = jnp.concatenate([woop_d, jnp.zeros((3, 1, T), woop_d.dtype)], axis=1)
    clo = jnp.concatenate(
        [cluster_lo, jnp.zeros((cluster_lo.shape[0], 1), F32)], axis=1)
    chi = jnp.concatenate(
        [cluster_hi, jnp.zeros((cluster_hi.shape[0], 1), F32)], axis=1)

    ray_spec = pl.BlockSpec((RAY_TILE, 4), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    t, idx, u, v = pl.pallas_call(
        functools.partial(_tri_kernel, cluster=cluster),
        grid=(nt,),
        in_specs=[ray_spec, ray_spec, col_spec, full, full, full, full],
        out_specs=[col_spec, col_spec, col_spec, col_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), F32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), F32),
            jax.ShapeDtypeStruct((n, 1), F32),
        ],
        interpret=_interpret(),
    )(oh, d4, tm, woop_o, wd4, clo, chi)
    return t.reshape(n), idx.reshape(n), u.reshape(n), v.reshape(n)


# ---------------------------------------------------------------------------
# Torus kernel
# ---------------------------------------------------------------------------


def _torus_kernel(o_ref, d_ref, tmax_ref, w2o_ref, rad_ref, sph_ref,
                  t_out, idx_out, *, torus_tile: int):
    """One (ray tile, torus tile) pair per grid step.

    Per-torus data arrives TRANSPOSED — each field is a natural (1, Kt) row
    slice. (The obvious (Kt, field) layout needs a sublane->lane relayout
    per field use, which made Mosaic materialize ~140 MB of spill slots.)
    Output blocks are revisited across the inner (torus) grid dimension and
    accumulate the running argmin.

    w2o: (12, K) — rows of the 3x4 world->object transform.
    rad: (2, K)  — [major; minor] (minor < 0 => padding, never hits).
    sph: (4, K)  — world bounding sphere [cx; cy; cz; radius].
    """
    R = o_ref.shape[0]
    j = pl.program_id(1)
    base = j * torus_tile

    oh = o_ref[...]
    d = d_ref[...]
    tmax = tmax_ref[...]          # (R, 1)

    ox, oy, oz = oh[:, 0:1], oh[:, 1:2], oh[:, 2:3]   # (R, 1)
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]

    @pl.when(j == 0)
    def _():
        t_out[...] = jnp.full((R, 1), BIG, F32)
        idx_out[...] = jnp.zeros((R, 1), jnp.int32)

    if True:  # one torus tile per program (refs are block-indexed)
        sph = sph_ref[...]                            # (4, Kt)
        cx, cy, cz, cr = (sph[0:1, :], sph[1:2, :], sph[2:3, :], sph[3:4, :])

        # ray/sphere prepass: |cross(c-o, d)|^2 <= r^2 |d|^2, not behind
        mx, my, mz = cx - ox, cy - oy, cz - oz        # (R, Kt)
        qx = my * dz - mz * dy
        qy = mz * dx - mx * dz
        qz = mx * dy - my * dx
        d2 = dx * dx + dy * dy + dz * dz
        near = qx * qx + qy * qy + qz * qz <= cr * cr * d2
        proj = mx * dx + my * dy + mz * dz
        m2 = mx * mx + my * my + mz * mz
        ahead = (proj >= 0.0) | (m2 <= cr * cr)
        cand = near & ahead & (tmax > TMIN)           # (R, Kt)

        @pl.when(jnp.any(cand))
        def _():
            w = w2o_ref[...]                          # (12, Kt)

            def row(i):
                return w[i:i + 1, :]

            # ray into each torus's object frame (affine, t-preserving)
            oxo = row(0) * ox + row(1) * oy + row(2) * oz + row(3)
            oyo = row(4) * ox + row(5) * oy + row(6) * oz + row(7)
            ozo = row(8) * ox + row(9) * oy + row(10) * oz + row(11)
            dxo = row(0) * dx + row(1) * dy + row(2) * dz
            dyo = row(4) * dx + row(5) * dy + row(6) * dz
            dzo = row(8) * dx + row(9) * dy + row(10) * dz

            rad = rad_ref[...]                        # (2, Kt)
            Rmaj = rad[0:1, :]
            rmin = rad[1:2, :]

            # quartic coefficients, component-wise
            # (geom/torus.py torus_coefficients, kept 2D for Mosaic)
            m = dxo * dxo + dyo * dyo + dzo * dzo
            m = jnp.maximum(m, F32(1e-30))
            tshift = -(oxo * dxo + oyo * dyo + ozo * dzo) / m
            px = oxo + tshift * dxo
            py = oyo + tshift * dyo
            pz = ozo + tshift * dzo
            od = px * dxo + py * dyo + pz * dzo
            oo = px * px + py * py + pz * pz
            R2 = Rmaj * Rmaj
            k = oo + R2 - rmin * rmin
            dxz2 = dxo * dxo + dzo * dzo
            oxz_dxz = px * dxo + pz * dzo
            oxz2 = px * px + pz * pz
            inv4 = F32(1.0) / (m * m)
            b3 = 4.0 * m * od * inv4
            b2 = (2.0 * m * k + 4.0 * od * od - 4.0 * R2 * dxz2) * inv4
            b1 = (4.0 * od * k - 8.0 * R2 * oxz_dxz) * inv4
            b0 = (k * k - 4.0 * R2 * oxz2) * inv4

            troot = torus_geom.quartic_min_positive(
                jnp, b3, b2, b1, b0,
                TMIN - tshift, tmax - tshift, newton_iters=3,
                extra_valid=cand & (rmin > 0.0), cubic="newton")
            t = jnp.where(troot < BIG, troot + tshift, BIG)

            t_tile = jnp.min(t, axis=1, keepdims=True)
            cols = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            arg = jnp.min(jnp.where(t <= t_tile, cols, torus_tile), axis=1,
                          keepdims=True)
            better = t_tile < t_out[...]
            t_out[...] = jnp.where(better, t_tile, t_out[...])
            idx_out[...] = jnp.where(better, base + arg, idx_out[...])


@functools.partial(jax.jit, static_argnames=("torus_tile",))
def torus_closest_hit_pallas(origins, dirs, tmax, w2o, major, minor,
                             center, bound, torus_tile: int = TORUS_TILE):
    n = origins.shape[0]
    K = major.shape[0]
    assert n % TORUS_RAY_TILE == 0
    Kp = ((K + torus_tile - 1) // torus_tile) * torus_tile

    oh = jnp.concatenate([origins, jnp.ones((n, 1), F32)], axis=1)
    d4 = jnp.concatenate([dirs, jnp.zeros((n, 1), F32)], axis=1)
    tm = tmax.reshape(n, 1)

    # transposed field-major layouts (see _torus_kernel docstring)
    w2o_rows = jnp.asarray(w2o).reshape(K, 12).T
    rad = jnp.stack([jnp.asarray(major), jnp.asarray(minor)], axis=0)
    sph = jnp.concatenate([jnp.asarray(center).T,
                           jnp.asarray(bound)[None, :]], axis=0)
    if Kp != K:
        pad = Kp - K
        w2o_rows = jnp.concatenate(
            [w2o_rows,
             jnp.tile(jnp.eye(3, 4, dtype=F32).reshape(12, 1), (1, pad))],
            axis=1)
        rad = jnp.concatenate(
            [rad, jnp.tile(jnp.asarray([[0.0], [-1.0]], F32), (1, pad))],
            axis=1)
        sph = jnp.concatenate(
            [sph, jnp.tile(jnp.asarray([[1e30], [1e30], [1e30], [0.0]], F32),
                           (1, pad))], axis=1)

    nt = n // TORUS_RAY_TILE
    n_torus_tiles = Kp // torus_tile
    # grid: ray tiles outer, torus tiles inner — output blocks depend only on
    # the ray tile, so revisits across the inner dimension are contiguous
    ray_spec = pl.BlockSpec((TORUS_RAY_TILE, 4), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((TORUS_RAY_TILE, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    tor_spec = lambda w: pl.BlockSpec(  # noqa: E731
        (w, torus_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM)

    t, idx = pl.pallas_call(
        functools.partial(_torus_kernel, torus_tile=torus_tile),
        grid=(nt, n_torus_tiles),
        in_specs=[ray_spec, ray_spec, col_spec,
                  tor_spec(12), tor_spec(2), tor_spec(4)],
        out_specs=[col_spec, col_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), F32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        interpret=_interpret(),
    )(oh, d4, tm, w2o_rows, rad, sph)
    return t.reshape(n), idx.reshape(n)


# ---------------------------------------------------------------------------
# Combined entry used by trace.intersect
# ---------------------------------------------------------------------------


def closest_hit_pallas(scene: Scene, geom, origins, dirs, tmax):
    """Fused closest-hit over the geometry slice. Pads the ray batch to the
    kernel tile and combines triangle + torus results."""
    n = origins.shape[0]
    pad = (-n) % RAY_TILE
    if pad:
        origins = jnp.concatenate([origins, jnp.zeros((pad, 3), F32)])
        dirs = jnp.concatenate([dirs, jnp.ones((pad, 3), F32)])
        tmax = jnp.concatenate([tmax, jnp.zeros((pad,), F32)])

    has_tris = bool(np.any(np.asarray(scene.triangles.valid))) if isinstance(
        scene.triangles.valid, np.ndarray) else True
    has_tori = bool(np.any(np.asarray(scene.tori.valid))) if isinstance(
        scene.tori.valid, np.ndarray) else True

    np_ = origins.shape[0]
    t_best = jnp.full((np_,), BIG, F32)
    kind = jnp.full((np_,), -1, jnp.int32)
    prim = jnp.zeros((np_,), jnp.int32)
    u = jnp.zeros((np_,), F32)
    v = jnp.zeros((np_,), F32)

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
        tt, ti, tu, tv = tri_closest_hit_pallas(
            origins, dirs, tmax, geom.woop_o, geom.woop_d, clo, chi, cs)
        better = tt < t_best
        t_best = jnp.where(better, tt, t_best)
        kind = jnp.where(better, 0, kind)
        prim = jnp.where(better, ti + geom.tri_offset, prim)
        u = jnp.where(better, tu, u)
        v = jnp.where(better, tv, v)

    if has_tori:
        kt, ki = torus_closest_hit_pallas(
            origins, dirs, tmax, geom.tor_w2o, geom.tor_major,
            geom.tor_minor, geom.tor_center, geom.tor_bound)
        better = kt < t_best
        t_best = jnp.where(better, kt, t_best)
        kind = jnp.where(better, 1, kind)
        prim = jnp.where(better, ki + geom.tor_offset, prim)

    sl = lambda x: x[:n]  # noqa: E731
    return _isect.Hit(t=sl(t_best), kind=sl(kind), prim=sl(prim),
                      u=sl(u), v=sl(v))
