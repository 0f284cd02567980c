"""Fused Pallas torus closest-hit kernels (Ferrari quartic on the VPU).

Two layouts for two scales:

* `_torus_kernel` (chunk layout): tori on sublanes, rays on lanes — a
  visited 8/16-torus chunk evaluates the quartic on (chunk, sub) blocks.
  Gated scenes (K > 64) walk exact XLA visit lists; small scenes walk
  every chunk behind in-kernel slab gates.
* `_torus_small_kernel` (folded layout, K <= 8): rays on BOTH vreg axes —
  K full-occupancy quartics instead of one chunk-padded eval (a 1-torus
  scene pays 8x in the chunk layout).

Replaces: the torus analog of driver BVH traversal behind traceRayEXT
(raytrace.rgen:77, raytrace.rchit:98); analytic tori are a framework
extension required by BASELINE.json (the reference has none).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from toroidal_ray_tracing_tpu.geom import torus as torus_geom
from toroidal_ray_tracing_tpu.ops.kernel_common import (
    _DN0, BIG, F32, MAX_SPANS, TMIN, _chunk_visit_lists, _const_visit_rows,
    _interpret, _inv_dir, _pack_visit_rows, _rays_to_rows, _slab_cols)

TORUS_RAY_TILE = 1024  # rays per grid step (torus kernel); small scenes
                       # (K <= 64) bump to 2048 — fewer grid steps once the
                       # chunk walk is short
TORUS_TILE = 32        # unused; kept so callers passing torus_tile= keep
                       # working (culling granularity is TORUS_CHUNK now)

TORUS_SUB = int(os.environ.get("TRT_TORUS_SUB", "512"))
                       # rays per quartic sub-tile in GATED mode: the visit
                       # entry's bits gate the quartic per (chunk, SUB)
                       # block. 128 (one vreg per op) does exact minimal
                       # work, but the dispatch has a large fixed cost and
                       # the 1k-grid's visit lists average 4.7 span-hits
                       # per (tile, chunk) — wider spans amortize it.
                       # Measured on config 4 (1080p frame, per 2M-ray
                       # pass, closest/any-hit): 128 = 13.3/12.9 ms,
                       # 256 = 11.5/11.8, 512 = 11.7/11.2,
                       # 1024 = 12.8/13.4 (over-widened: extra quartic
                       # work beats the dispatch savings). 512 wins the
                       # end-to-end ladder A/B +9.5% (61.7 -> 67.6 Mrays/s
                       # 2-frame sequence). Env knob: TRT_TORUS_SUB.
                       # (Ungated mode already runs whole-tile spans.)
TORUS_CHUNK = 8        # tori per visited chunk, ungated scenes (the
                       # minimum dynamic sublane slice granularity; K <= 64
                       # scenes round Kp up to this, so bigger chunks would
                       # just pad the quartic — 16 cost the 4-torus headline
                       # scene +40%)
TORUS_NEWTON_OCCL = 3     # Newton polish iterations in the ANY-HIT quartic
                          # (experimented below; closest-hit always uses 3)
TORUS_OCCL_EARLY = False  # gated any-hit: gate each dispatch on "some ray
                          # in the span is still unoccluded". Measured on
                          # config 4's real shadow rays (63% of lanes
                          # toward the light, tmax = light distance): only
                          # 7.4% ever occlude, so the vector->scalar
                          # reduce+branch is pure overhead (27.2 ms vs
                          # 24.2 off). Kept as a flag: scenes with heavy
                          # mutual shadowing would flip the trade.
GATED_TORUS_CHUNK = 16  # tori per chunk with exact visit lists: halves the
                       # gate and chunk-walk overheads; on the 1k-instance
                       # grid 16 beats both 8 (30 ms) and 32 (25.7 ms) at
                       # 24.9 ms per 2M-ray dispatch


def _w2o_rays(w, ox, oy, oz, dx, dy, dz):
    """Affine object-frame ray transform (t-preserving), component-wise.
    w: 12-sequence of row-major world-to-object entries — SMEM scalars
    (small-K kernel) or (Kc, 1) column slices (chunk kernel); both
    broadcast against the ray rows. Shared so the two torus-kernel
    layouts can never drift numerically."""
    oxo = w[0] * ox + w[1] * oy + w[2] * oz + w[3]
    oyo = w[4] * ox + w[5] * oy + w[6] * oz + w[7]
    ozo = w[8] * ox + w[9] * oy + w[10] * oz + w[11]
    dxo = w[0] * dx + w[1] * dy + w[2] * dz
    dyo = w[4] * dx + w[5] * dy + w[6] * dz
    dzo = w[8] * dx + w[9] * dy + w[10] * dz
    return oxo, oyo, ozo, dxo, dyo, dzo


def _torus_quartic_coeffs(oxo, oyo, ozo, dxo, dyo, dzo, Rmaj, rmin):
    """Monic quartic coefficients in the shifted frame (geom/torus.py
    torus_coefficients, kept component-wise for Mosaic). Returns
    (b3, b2, b1, b0, tshift, px, py, pz)."""
    m = jnp.maximum(dxo * dxo + dyo * dyo + dzo * dzo, F32(1e-30))
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
    return b3, b2, b1, b0, tshift, px, py, pz


def _torus_obj_normal(px, py, pz, dxo, dyo, dzo, troot, Rmaj, hitm):
    """Object-space torus normal at p* + troot*d (geom/torus.py
    torus_normal: p - R * normalize((x, 0, z)), inlined component-wise).
    Misses are sanitized (BIG roots would produce 0*inf NaNs)."""
    ts = jnp.where(hitm, troot, 0.0)
    pxh = px + ts * dxo
    pyh = py + ts * dyo
    pzh = pz + ts * dzo
    xz = jnp.sqrt(jnp.maximum(pxh * pxh + pzh * pzh, F32(1e-30)))
    scale = F32(1.0) - Rmaj / xz
    return pxh * scale, pyh, pzh * scale


def _obj_normal_to_world(w, nx, ny, nz):
    """World normal via the inverse-transpose: w2o's rotation rows applied
    as columns. w: 12-sequence as in _w2o_rays."""
    return (nx * w[0] + ny * w[4] + nz * w[8],
            nx * w[1] + ny * w[5] + nz * w[9],
            nx * w[2] + ny * w[6] + nz * w[10])


def _torus_kernel(visit_ref, o_ref, d_ref, tmax_ref, w2o_ref,
                  rad_ref, lo_ref, hi_ref, *refs, sub: int, chunk: int,
                  emit_attrs: bool, occlusion: bool = False,
                  gated: bool = True, span_gate: bool = True):
    """One grid step = one ray tile, which walks ONLY its pre-culled chunk
    visit list (front-to-back; see _chunk_visit_lists). A visit entry's
    span bits say which `sub`-lane spans have candidate rays, so dispatch
    is pure scalar-core bit tests and the quartic (plus a per-span slab
    refine against the running best) runs only on the exact (chunk, span)
    blocks some ray can touch.

    visit_ref: (1, Cp) i32 SMEM block — this tile's packed visit row,
    laid out [cnt, id0, bits0, id1, bits1, ...] of (chunk_id, span_bits)
    entry pairs
    (see _chunk_visit_lists's caller).
    Per-torus tables (w2o (Kp, 12), rad (Kp, 2), lo/hi (Kp, 3) world
    AABBs — 32 f32/torus, ~128 KB at 1k tori) stay fully VMEM-resident; a
    visited chunk dynamically slices `chunk` of their rows on sublanes.

    Culling is slab-tested world AABBs — much tighter than bounding spheres
    for flat/tilted tori (a 0.35/0.12 grid torus has AABB half-height 0.12
    vs sphere radius 0.47, so grazing rays cull ~4x more).

    With emit_attrs, a per-torus material table mat_ref (Kp, 12) rides
    along and a (15, R) output carries the winner's world-space normal
    (rows 0-2, unnormalized) + material fields (rows 3-14) — computed
    in-kernel so shade() needs no per-ray gathers.

    occlusion: any-hit semantics (shadow rays) — once a ray has ANY
    in-range hit its slab bound goes negative, rejecting every later chunk
    (the TerminateOnFirstHit | SkipClosestHit analog, raytrace.rchit:96-109).
    """
    if emit_attrs:
        mat_ref, t_out, idx_out, attr_out = refs
    else:
        t_out, idx_out = refs
    R = o_ref.shape[1]
    n_sub = R // sub

    t_out[...] = jnp.full((1, R), BIG, F32)
    idx_out[...] = jnp.zeros((1, R), jnp.int32)
    if emit_attrs:
        attr_out[...] = jnp.zeros((15, R), F32)

    def _quartic(base, ls):
        """Closest quartic root for the chunk's 8 tori vs one `sub`-lane
        span of rays. ls: the span's static lane slice. All per-ray rows
        are RE-LOADED from the refs at the span's offset (Mosaic rejects
        broadcast ops against lane-sliced *values* — "Invalid input
        layout" — while ref loads start a fresh, offset-free layout), and
        the per-torus slab refine is recomputed here against the running
        best (tighter than the tile-level gate mask)."""
        w = w2o_ref[pl.ds(base, chunk), :]          # (Kc, 12)

        def col(i):
            return w[:, i:i + 1]

        oxs, oys, ozs = o_ref[0:1, ls], o_ref[1:2, ls], o_ref[2:3, ls]
        dxs, dys, dzs = d_ref[0:1, ls], d_ref[1:2, ls], d_ref[2:3, ls]
        tms = tmax_ref[0:1, ls]

        if not span_gate:
            # gated dispatch: the XLA visit bits are EXACT per span (some
            # ray in the span has a candidate in this chunk), so an
            # in-kernel slab refine almost never prunes — measured on the
            # 1k-grid ladder scene, running-best pruning removes only ~1%
            # of candidates (1.29 -> 1.28 dispatches/span) while the slab
            # + vector->scalar reduce + branch cost as much as the
            # quartic they would skip. Run the quartic unconditionally;
            # the [TMIN, tmax] root range check keeps correctness.
            if occlusion and TORUS_OCCL_EARLY:
                # ...except for any-hit: a span whose rays ALL have a hit
                # already needs nothing more — the visit bits can't see
                # hits found mid-walk, and in shadowed regions most spans
                # occlude on the first front-to-back chunk, so this one
                # reduce+branch skips the rest of the walk outright (the
                # TerminateOnFirstHit analog, raytrace.rchit:96-109)
                alive = (t_out[0:1, ls] >= BIG) & (tms > TMIN)

                @pl.when(jnp.any(alive))
                def _go_any():
                    _quartic_eval(base, ls, col,
                                  jnp.broadcast_to(alive, (chunk, sub)),
                                  oxs, oys, ozs, dxs, dys, dzs, tms)
                return
            cand = jnp.broadcast_to(tms > TMIN, (chunk, sub))
            _quartic_eval(base, ls, col, cand, oxs, oys, ozs, dxs,
                          dys, dzs, tms)
            return

        t_cur0 = t_out[0:1, ls]
        if occlusion:
            tlim = jnp.where(t_cur0 < BIG, F32(-1.0), tms)
        else:
            tlim = jnp.minimum(tms, t_cur0)
        lo = lo_ref[pl.ds(base, chunk), :]            # (Kc, 3)
        hi = hi_ref[pl.ds(base, chunk), :]
        tn, tf = _slab_cols(lo, hi, oxs, oys, ozs,
                            _inv_dir(dxs), _inv_dir(dys), _inv_dir(dzs))
        cand = (tn <= jnp.minimum(tf, tlim)) & (tf >= TMIN) \
            & (tms > TMIN)                            # (Kc, sub)

        # ungated small-scene walk: the chunk-box gate and the running-
        # best term in `cand` are the ONLY culling (constant all-chunks
        # visit rows) — one vector->scalar reduce + branch per span pays
        # for the full (8, sub) quartics it skips many times over
        @pl.when(jnp.any(cand))
        def _go():
            _quartic_eval(base, ls, col, cand, oxs, oys, ozs, dxs,
                          dys, dzs, tms)

    def _quartic_eval(base, ls, col, cand, oxs, oys, ozs, dxs, dys, dzs,
                      tms):
        w12 = [col(i) for i in range(12)]
        oxo, oyo, ozo, dxo, dyo, dzo = _w2o_rays(
            w12, oxs, oys, ozs, dxs, dys, dzs)

        rad = rad_ref[pl.ds(base, chunk), :]        # (Kc, 2)
        Rmaj = rad[:, 0:1]
        rmin = rad[:, 1:2]

        b3, b2, b1, b0, tshift, px, py, pz = _torus_quartic_coeffs(
            oxo, oyo, ozo, dxo, dyo, dzo, Rmaj, rmin)
        troot = torus_geom.quartic_min_positive(
            jnp, b3, b2, b1, b0,
            TMIN - tshift, tms - tshift,
            newton_iters=TORUS_NEWTON_OCCL if occlusion else 3,
            extra_valid=cand & (rmin > 0.0), cubic="newton")
        t = jnp.where(troot < BIG, troot + tshift, BIG)

        t_tile = jnp.min(t, axis=0, keepdims=True)
        t_cur = t_out[0:1, ls]
        if occlusion:
            # any-hit: existence only — skip the argmin/index select
            t_out[0:1, ls] = jnp.minimum(t_tile, t_cur)
            return
        rows = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
        arg = jnp.min(jnp.where(t <= t_tile, rows, chunk),
                      axis=0, keepdims=True)
        better = t_tile < t_cur
        t_out[0:1, ls] = jnp.where(better, t_tile, t_cur)
        idx_out[0:1, ls] = jnp.where(better, base + arg, idx_out[0:1, ls])

        if emit_attrs:
            hitm = t < BIG
            pick = (rows == arg) & hitm
            pickf = pick.astype(jnp.float32)
            nx, ny, nz = _torus_obj_normal(px, py, pz, dxo, dyo, dzo,
                                           troot, Rmaj, hitm)
            nwx, nwy, nwz = _obj_normal_to_world(w12, nx, ny, nz)
            nrm = jnp.concatenate([
                jnp.sum(pickf * nwx, axis=0, keepdims=True),
                jnp.sum(pickf * nwy, axis=0, keepdims=True),
                jnp.sum(pickf * nwz, axis=0, keepdims=True)], axis=0)
            mat = jax.lax.dot_general(
                mat_ref[pl.ds(base, chunk), :], pickf, _DN0,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)   # (12, sub)
            new = jnp.concatenate([nrm, mat], axis=0)
            attr_cur = attr_out[:, ls]
            attr_out[:, ls] = jnp.where(better, new, attr_cur)

    def visit_step(v, _):
        # visit entry pair: [chunk id, span bits] with bit j = "span j has
        # a candidate ray" (exact per-ray gate, _chunk_visit_lists). Span
        # dispatch is pure scalar-core work — no tile-wide vector ops run
        # for spans whose bit is clear.
        c = visit_ref[0, 1 + 2 * v]
        bits = visit_ref[0, 2 + 2 * v]
        base = pl.multiple_of(c * chunk, 8)
        for j in range(n_sub):
            ls = slice(j * sub, (j + 1) * sub)

            @pl.when(((bits >> j) & 1) == 1)
            def _(base=base, ls=ls):
                _quartic(base, ls)

        return 0

    if gated:
        # dead tiles already have cnt == 0 from the XLA gate
        jax.lax.fori_loop(0, visit_ref[0, 0], visit_step, 0)
    else:
        # ungated small scenes feed constant all-chunks visit rows: skip
        # dead tiles (tmax=0 bounce cull) with one whole-tile reduce
        @pl.when(jnp.any(tmax_ref[...] > TMIN))
        def _walk():
            jax.lax.fori_loop(0, visit_ref[0, 0], visit_step, 0)


def _torus_boxes(w2o_rows, rad, chunk):
    """Per-torus world AABBs + `chunk`-torus chunk AABBs.

    Tight world AABBs from the object-space torus box (R+r, r, R+r): the
    o2w rotation is the adjugate inverse of w2o's rotation rows, the
    world center solves o2w t = -inv(rot) @ t, and half-extents use the
    |M| h trick. Much tighter than the center/bound sphere for flat or
    tilted tori, and derived here so GeomSlice's ABI is unchanged.

    Dead/padding rows (minor radius <= 0) are MASKED out of the chunk
    reduction — reducing over their 2e38 point boxes would blow a mixed
    alive+padding chunk (any K % chunk != 0 scene) up to a near-infinite
    box that sorts near-first and passes the gate for nearly every span.
    A fully-dead chunk keeps a far point box (an inverted lo>hi box would
    conservatively PASS the per-axis-swapped slab test).

    w2o_rows: (Kp, 12); rad: (Kp, 2) [major, minor]; Kp % chunk == 0.
    Returns (tor_lo, tor_hi, chunk_lo, chunk_hi). Shared by the kernel
    launcher and utils.roofline's post-cull work model (lockstep matters:
    the model must count the same candidates the kernel visits).
    """
    r0 = w2o_rows[:, 0:3]
    r1 = w2o_rows[:, 4:7]
    r2 = w2o_rows[:, 8:11]
    tv = jnp.stack([w2o_rows[:, 3], w2o_rows[:, 7], w2o_rows[:, 11]], axis=1)
    c0 = jnp.cross(r1, r2)
    c1 = jnp.cross(r2, r0)
    c2 = jnp.cross(r0, r1)
    det = jnp.sum(r0 * c0, axis=1, keepdims=True)
    inv_det = jnp.where(jnp.abs(det) > F32(1e-30), F32(1.0), F32(0.0)) / \
        jnp.where(jnp.abs(det) > F32(1e-30), det, F32(1.0))
    o2w_rot = jnp.stack([c0, c1, c2], axis=2) * inv_det[:, :, None]  # (K,3,3)
    wc = -jnp.einsum("kij,kj->ki", o2w_rot, tv, precision="highest")
    rmin_abs = jnp.abs(rad[:, 1])
    h_obj = jnp.stack([rad[:, 0] + rmin_abs, rmin_abs,
                       rad[:, 0] + rmin_abs], axis=1)
    h_w = jnp.einsum("kij,kj->ki", jnp.abs(o2w_rot), h_obj,
                     precision="highest")
    alive_k = (rad[:, 1] > 0.0)[:, None]
    # padding rows get a far-away point box: coherent tiles cull it in the
    # visit-list gate (an inverted box would conservatively pass)
    tor_lo = jnp.where(alive_k, wc - h_w, F32(2.0e38)).astype(F32)
    tor_hi = jnp.where(alive_k, wc + h_w, F32(2.0e38)).astype(F32)

    Kp = w2o_rows.shape[0]
    C = Kp // chunk
    any_alive = jnp.any(alive_k.reshape(C, chunk), axis=1)[:, None]  # (C, 1)
    clo = jnp.min(tor_lo.reshape(C, chunk, 3), axis=1)   # dead rows: +2e38
    chi = jnp.max(jnp.where(alive_k, wc + h_w,
                            F32(-2.0e38)).reshape(C, chunk, 3), axis=1)
    chi = jnp.where(any_alive, chi, F32(2.0e38))
    return tor_lo, tor_hi, clo, chi


@functools.partial(jax.jit, static_argnames=("torus_tile", "ray_tile",
                                             "occlusion"))
def torus_closest_hit_pallas(origins, dirs, tmax, w2o, major, minor,
                             center, bound, torus_tile: int = TORUS_TILE,
                             ray_tile: int = TORUS_RAY_TILE,
                             mat_table=None, occlusion: bool = False):
    """origins/dirs: (3, N) rows. torus_tile is accepted for API stability
    but unused — culling granularity is TORUS_CHUNK/GATED_TORUS_CHUNK
    chunks and TORUS_SUB lane spans (_chunk_visit_lists / _torus_kernel)."""
    del torus_tile
    n = origins.shape[1]
    K = major.shape[0]
    if (TORUS_SMALL_ENABLE and K <= TORUS_SMALL_MAX_K
            and n <= max(TORUS_SMALL_MAX_RAYS, TORUS_SMALL_WORK_MAX // K)
            and n % TORUS_SMALL_TILE == 0):
        # tiny torus sets: the rays-on-sublanes kernel runs K full-occupancy
        # quartics instead of one chunk-padded (8, rays) eval
        return torus_closest_hit_small(origins, dirs, tmax, w2o, major,
                                       minor, mat_table=mat_table,
                                       occlusion=occlusion)
    gated = K > 64
    chunk = GATED_TORUS_CHUNK if gated else TORUS_CHUNK
    if not gated and n % 2048 == 0:
        # small scenes: halve the grid steps (fixed per-step cost dominates
        # once the quartic table walk is short)
        ray_tile = max(ray_tile, 2048)
    if n < ray_tile:
        ray_tile = n
    assert n % ray_tile == 0, (n, ray_tile)
    if gated:
        sub = TORUS_SUB if ray_tile % TORUS_SUB == 0 else ray_tile
        while ray_tile // sub > MAX_SPANS:  # one i32 bits word per entry
            sub *= 2
    else:
        # ungated: the XLA gate costs more than a short chunk walk saves
        # (a K=8 per-torus gate measured 2.2 ms per 2M-ray dispatch vs a
        # ~6 ms whole kernel); spans = whole tile, one reduce-gate per
        # (tile, chunk) inside the kernel, dead tiles skip via any_live
        sub = ray_tile
    Kp = ((K + chunk - 1) // chunk) * chunk

    oh, d4, tm = _rays_to_rows(origins, dirs, tmax)

    # per-torus fields row-major: field slices are (Kc, 1) columns in-kernel
    w2o_rows = jnp.asarray(w2o).reshape(K, 12)
    rad = jnp.stack([jnp.asarray(major), jnp.asarray(minor)], axis=1)
    if Kp != K:
        pad = Kp - K
        w2o_rows = jnp.concatenate(
            [w2o_rows,
             jnp.tile(jnp.eye(3, 4, dtype=F32).reshape(1, 12), (pad, 1))],
            axis=0)
        rad = jnp.concatenate(
            [rad, jnp.tile(jnp.asarray([[0.0, -1.0]], F32), (pad, 1))],
            axis=0)

    tor_lo, tor_hi, clo, chi = _torus_boxes(w2o_rows, rad, chunk)
    C = Kp // chunk
    mean_o = jnp.mean(origins, axis=1)
    cdist = jnp.linalg.norm(
        jnp.maximum(jnp.maximum(clo - mean_o[None, :],
                                mean_o[None, :] - chi), 0.0), axis=1)
    rank = jnp.argsort(jnp.argsort(cdist)).astype(jnp.int32)

    nt = n // ray_tile
    if gated:
        vids, vbits, cnt = _chunk_visit_lists(origins, dirs, tmax, clo,
                                              chi, rank, ray_tile, sub)
    else:
        # the kernel's in-kernel gates do all the culling
        order = jnp.argsort(cdist).astype(jnp.int32)
        vids, vbits, cnt = _const_visit_rows(order, nt)
    ray_spec = pl.BlockSpec((4, ray_tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, ray_tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    tor_spec = lambda w: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    packed, visit_spec = _pack_visit_rows(vids, vbits, cnt, nt, C)

    emit_attrs = mat_table is not None
    in_specs = [visit_spec, ray_spec, ray_spec, row_spec,
                tor_spec(12), tor_spec(2), tor_spec(3), tor_spec(3)]
    operands = [packed, oh, d4, tm, w2o_rows, rad, tor_lo, tor_hi]
    out_specs = [row_spec, row_spec]
    out_shape = [
        jax.ShapeDtypeStruct((1, n), F32),
        jax.ShapeDtypeStruct((1, n), jnp.int32),
    ]
    if emit_attrs:
        mt = jnp.asarray(mat_table)                 # (K, 12)
        if Kp != K:
            mt = jnp.concatenate(
                [mt, jnp.zeros((Kp - K, 12), F32)], axis=0)
        in_specs.append(tor_spec(12))
        operands.append(mt)
        out_specs.append(pl.BlockSpec((15, ray_tile), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((15, n), F32))

    out = pl.pallas_call(
        functools.partial(_torus_kernel, sub=sub, chunk=chunk,
                          emit_attrs=emit_attrs, occlusion=occlusion,
                          gated=gated, span_gate=not gated),
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*operands)
    res = (out[0].reshape(n), out[1].reshape(n))
    return res + ((out[2],) if emit_attrs else ())


# ---------------------------------------------------------------------------
# Small-K torus kernel: rays fold onto SUBLANES
# ---------------------------------------------------------------------------

# Dispatch gate for the folded kernel: parity-verified in interpret mode,
# Mosaic-compiled + parity-checked on hardware (tests/test_tpu_smoke.py),
# and measured faster (config 1 sequence 115.9 vs 107.3 Mrays/s).
# TRT_TORUS_SMALL=0 reverts to the chunk kernel for A/B.
TORUS_SMALL_ENABLE = os.environ.get("TRT_TORUS_SMALL", "1") == "1"
TORUS_SMALL_MAX_K = 8   # tori: at or below this, the folded kernel beats the
                        # chunk-vectorized one — the chunk layout evaluates
                        # the quartic on (chunk=8, rays) blocks no matter how
                        # few rows are real (a single-torus scene pays 8x),
                        # while this kernel runs K full-occupancy (8, tm)
                        # evals, one per REAL torus
TORUS_SMALL_TILE = 2048  # rays per grid step (8 sublane rows x 256 lanes)
TORUS_SMALL_MAX_RAYS = 1 << 20  # the folded kernel brute-forces all K
                        # quartics per ray (no visit-list culling), so it
                        # wins only while the chunk kernel's fixed per-
                        # dispatch cost dominates: measured on hardware
                        # +8% at 72k rays (config 1), +9% at 426k
                        # (config 2), -2% at 4.7M (config 3), -9% at
                        # per-band 4K frames (config 5)
TORUS_SMALL_WORK_MAX = int(os.environ.get("TRT_TORUS_SMALL_WORK",
                                          str(4 << 20)))
                        # K-aware extension of the ray gate: the folded
                        # kernel's cost is ~K full-width quartic passes, so
                        # its viable ray count scales ~1/K. The losses
                        # above were all K=4 scenes (configs 3/5); the K=1
                        # scenes WON at ~2M-ray batched calls (config 1 =
                        # 119.0 and config 2 = 210.6 on the 2026-08-18
                        # pre-gate ladder vs 108.8/180.6 after the flat 1M
                        # gate re-routed their 30/8-frame batches to the
                        # chunk kernel). n <= WORK_MAX/K keeps K=4 at the
                        # measured 1M cutoff and restores K<=3's headroom.


def _torus_small_kernel(par_ref, o_ref, d_ref, tmax_ref, *refs,
                        k_real: int, emit_attrs: bool, occlusion: bool,
                        newton_iters: int):
    """Closest/any-hit vs <= TORUS_SMALL_MAX_K tori with rays on BOTH vreg
    axes: a tile is (8 sublanes x tm lanes) = 8*tm rays, so every quartic
    element is a real ray and the per-torus parameters enter as SMEM
    scalars. The chunk kernel's layout (_torus_kernel) instead pins tori to
    sublanes, which wastes (8 - K)/8 of every vector op on padding rows —
    measured 3.9 ms per 2M-ray dispatch on a 1-torus scene where this
    shape does 1/8 the math.

    par_ref: (1, P) f32 SMEM — per torus 32 scalars
    [w2o rows (12), Rmaj, rmin, box lo (3), box hi (3), mat (12)].
    o_ref/d_ref: (24, tm) = 3 components x 8 sublane rows; tmax_ref: (8, tm).
    Outputs: t (8, tm), idx (8, tm) i32 [+ attrs (120, tm) = 15 fields x 8
    rows — callers reshape back to (15, N) with free row-major views].
    """
    if emit_attrs:
        t_out, idx_out, attr_out = refs
    else:
        t_out, idx_out = refs
        attr_out = None
    tm = o_ref.shape[1]
    shape = (8, tm)

    t_out[...] = jnp.full(shape, BIG, F32)
    idx_out[...] = jnp.zeros(shape, jnp.int32)
    if emit_attrs:
        attr_out[...] = jnp.zeros((120, tm), F32)

    ox, oy, oz = o_ref[0:8, :], o_ref[8:16, :], o_ref[16:24, :]
    dx, dy, dz = d_ref[0:8, :], d_ref[8:16, :], d_ref[16:24, :]
    tms = tmax_ref[...]
    invx, invy, invz = _inv_dir(dx), _inv_dir(dy), _inv_dir(dz)

    def scal(k, i):
        return par_ref[0, 32 * k + i]

    # one whole-tile gate against the union of the K boxes (the chunk
    # kernel's per-tile chunk-box gate, same granularity): dead tiles
    # (tmax=0 bounce cull) and off-scene tiles skip everything
    ulo = [scal(0, 14 + a) for a in range(3)]
    uhi = [scal(0, 17 + a) for a in range(3)]
    for k in range(1, k_real):
        ulo = [jnp.minimum(ulo[a], scal(k, 14 + a)) for a in range(3)]
        uhi = [jnp.maximum(uhi[a], scal(k, 17 + a)) for a in range(3)]
    tn = jnp.maximum(jnp.maximum(
        jnp.minimum((ulo[0] - ox) * invx, (uhi[0] - ox) * invx),
        jnp.minimum((ulo[1] - oy) * invy, (uhi[1] - oy) * invy)),
        jnp.minimum((ulo[2] - oz) * invz, (uhi[2] - oz) * invz))
    tf = jnp.minimum(jnp.minimum(
        jnp.maximum((ulo[0] - ox) * invx, (uhi[0] - ox) * invx),
        jnp.maximum((ulo[1] - oy) * invy, (uhi[1] - oy) * invy)),
        jnp.maximum((ulo[2] - oz) * invz, (uhi[2] - oz) * invz))
    any_cand = (tn <= jnp.minimum(tf, tms)) & (tf >= TMIN) & (tms > TMIN)

    @pl.when(jnp.any(any_cand))
    def _go():
        best = jnp.full(shape, BIG, F32)
        barg = jnp.zeros(shape, jnp.int32)
        nrm_acc = [jnp.zeros(shape, F32) for _ in range(3)]
        mat_acc = [jnp.zeros(shape, F32) for _ in range(12)]

        for k in range(k_real):
            w = [scal(k, i) for i in range(12)]
            rmaj, rmin = scal(k, 12), scal(k, 13)
            blo = [scal(k, 14 + a) for a in range(3)]
            bhi = [scal(k, 17 + a) for a in range(3)]

            # per-torus slab against the running best (and any-hit early
            # bound) — a vector mask, no branch
            tnk = jnp.maximum(jnp.maximum(
                jnp.minimum((blo[0] - ox) * invx, (bhi[0] - ox) * invx),
                jnp.minimum((blo[1] - oy) * invy, (bhi[1] - oy) * invy)),
                jnp.minimum((blo[2] - oz) * invz, (bhi[2] - oz) * invz))
            tfk = jnp.minimum(jnp.minimum(
                jnp.maximum((blo[0] - ox) * invx, (bhi[0] - ox) * invx),
                jnp.maximum((blo[1] - oy) * invy, (bhi[1] - oy) * invy)),
                jnp.maximum((blo[2] - oz) * invz, (bhi[2] - oz) * invz))
            if occlusion:
                bound = jnp.where(best < BIG, F32(-1.0), tms)
            else:
                bound = jnp.minimum(tms, best)
            cand = (tnk <= jnp.minimum(tfk, bound)) & (tfk >= TMIN) \
                & (tms > TMIN) & (rmin > 0.0)

            oxo, oyo, ozo, dxo, dyo, dzo = _w2o_rays(
                w, ox, oy, oz, dx, dy, dz)
            b3, b2, b1, b0, tshift, px, py, pz = _torus_quartic_coeffs(
                oxo, oyo, ozo, dxo, dyo, dzo, rmaj, rmin)
            troot = torus_geom.quartic_min_positive(
                jnp, b3, b2, b1, b0, TMIN - tshift, tms - tshift,
                newton_iters=newton_iters, extra_valid=cand, cubic="newton")
            t = jnp.where(troot < BIG, troot + tshift, BIG)

            if occlusion:
                best = jnp.minimum(best, t)
                continue
            better = t < best
            best = jnp.where(better, t, best)
            barg = jnp.where(better, k, barg)
            if emit_attrs:
                hitm = better
                nx, ny, nz = _torus_obj_normal(px, py, pz, dxo, dyo, dzo,
                                               troot, rmaj, t < BIG)
                nwx, nwy, nwz = _obj_normal_to_world(w, nx, ny, nz)
                for a, nw in enumerate((nwx, nwy, nwz)):
                    nrm_acc[a] = jnp.where(hitm, nw, nrm_acc[a])
                for c in range(12):
                    mat_acc[c] = jnp.where(hitm, scal(k, 20 + c),
                                           mat_acc[c])

        t_out[...] = best
        if not occlusion:
            idx_out[...] = barg
            if emit_attrs:
                for a in range(3):
                    attr_out[8 * a:8 * (a + 1), :] = nrm_acc[a]
                for c in range(12):
                    attr_out[8 * (3 + c):8 * (4 + c), :] = mat_acc[c]


def torus_closest_hit_small(origins, dirs, tmax, w2o, major, minor,
                            mat_table=None, occlusion: bool = False):
    """Launcher for _torus_small_kernel (K <= TORUS_SMALL_MAX_K tori).

    Rays re-pack so each grid step sees 8 sublane rows x tm lanes of
    CONSECUTIVE rays (one compact block-swizzled patch — the same cull
    frustum quality as the chunk kernel's lane tiles): (3, N) ->
    (3, G, 8, tm) -> transpose(0, 2, 1, 3) -> (24, G*tm). The transpose
    moves ~24 MB per 2M rays once per dispatch (~0.1 ms), far below the
    (8 - K)/8 quartic padding it eliminates."""
    n = origins.shape[1]
    K = major.shape[0]
    tile = TORUS_SMALL_TILE
    assert n % tile == 0 and K <= TORUS_SMALL_MAX_K, (n, K)
    tm = tile // 8
    G = n // tile
    m = G * tm

    def fold(a, rows):                     # (rows, N) -> (rows*8, m)
        return a.reshape(rows, G, 8, tm).transpose(0, 2, 1, 3) \
                .reshape(rows * 8, m)

    o8 = fold(jnp.asarray(origins), 3)
    d8 = fold(jnp.asarray(dirs), 3)
    tm8 = fold(jnp.asarray(tmax).reshape(1, n), 1)

    w2o_rows = jnp.asarray(w2o).reshape(K, 12)
    rad = jnp.stack([jnp.asarray(major), jnp.asarray(minor)], axis=1)
    tor_lo, tor_hi, _, _ = _torus_boxes(w2o_rows, rad, min(K, 8))
    mat = (jnp.asarray(mat_table) if mat_table is not None
           else jnp.zeros((K, 12), F32))
    par = jnp.concatenate([w2o_rows, rad, tor_lo[:K], tor_hi[:K], mat],
                          axis=1)                                 # (K, 32)
    P = ((32 * K + 127) // 128) * 128
    par = jnp.concatenate(
        [par.reshape(1, 32 * K), jnp.zeros((1, P - 32 * K), F32)], axis=1)

    emit_attrs = mat_table is not None
    par_spec = pl.BlockSpec((1, P), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    ray_spec = pl.BlockSpec((24, tm), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    tmax_spec = pl.BlockSpec((8, tm), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    out_specs = [tmax_spec, tmax_spec]
    out_shape = [jax.ShapeDtypeStruct((8, m), F32),
                 jax.ShapeDtypeStruct((8, m), jnp.int32)]
    if emit_attrs:
        out_specs.append(pl.BlockSpec((120, tm), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((120, m), F32))

    out = pl.pallas_call(
        functools.partial(
            _torus_small_kernel, k_real=K, emit_attrs=emit_attrs,
            occlusion=occlusion,
            newton_iters=TORUS_NEWTON_OCCL if occlusion else 3),
        grid=(G,),
        in_specs=[par_spec, ray_spec, ray_spec, tmax_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(par, o8, d8, tm8)

    def unfold(a, rows):                   # (rows*8, m) -> (rows, N)
        return a.reshape(rows, 8, G, tm).transpose(0, 2, 1, 3) \
                .reshape(rows, n)

    t = unfold(out[0], 1).reshape(n)
    idx = unfold(out[1], 1).reshape(n)
    res = (t, idx)
    if emit_attrs:
        attr120 = unfold(out[2], 15)       # (15, N)
        res = res + (attr120,)
    return res
