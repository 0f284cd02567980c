"""Fused Pallas closest-hit kernels — the `vkCmdTraceRaysKHR` fast path.

The jnp reference path materializes (rays x prims) arrays in HBM between the
matmul and the argmin. These kernels fuse the whole query flash-attention
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

Replaces: driver BVH traversal behind traceRayEXT (raytrace.rgen:77,
raytrace.rchit:98).
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
from toroidal_ray_tracing_tpu.scene.types import Scene
from toroidal_ray_tracing_tpu.trace import intersect as _isect

F32 = np.float32
BIG = F32(3.0e38)
TMIN = F32(0.001)

RAY_TILE = 2048      # rays per grid step (triangle kernel; lane axis) —
                     # swept on v5e: 2048 is ~2.4x faster than 256 (fewer
                     # grid steps, wider VPU rows); 4096 exceeds VMEM
TORUS_RAY_TILE = 1024  # rays per grid step (torus kernel); small scenes
                       # (K <= 64) bump to 2048 — fewer grid steps once the
                       # chunk walk is short
TORUS_TILE = 32        # unused; kept so callers passing torus_tile= keep
                       # working (culling granularity is TORUS_CHUNK now)

_DN0 = (((0,), (0,)), ((), ()))  # contract dim 0 of both operands

# A visit entry is a PAIR of i32 SMEM words: [block_id, span_bits]. Split
# words (vs the earlier id | bits << 16 packing) remove both scale caps:
# ids span a full 31 bits (2^31 blocks — no triangle/torus count ceiling
# from the visit ABI) and up to 32 span bits fit, so 4096-lane ray tiles
# keep exact 128-lane span dispatch. The extra SMEM word per entry is free
# (the walk's scalar reads measured ~0 vs the ~2 us/grid-step floor the
# bigger tiles amortize).
MAX_SPANS = 32


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _rays_to_rows(origins, dirs, tmax):
    """(3, N) ray rows -> (4, N) homogeneous rows + (1, N) tmax. A pure
    sublane concat — the old (N, 3) column inputs needed a real XLA
    transpose here, costing multiple ms per 2M rays per kernel call."""
    n = origins.shape[1]
    oh = jnp.concatenate([origins, jnp.ones((1, n), F32)], axis=0)
    d4 = jnp.concatenate([dirs, jnp.zeros((1, n), F32)], axis=0)
    return oh, d4, tmax.reshape(1, n)


def _pack_visit_rows(ids, bits, cnt, nt, C):
    """Interleave per-tile visit rows [cnt, id0, bits0, id1, bits1, ...,
    pad] into the flat (1, nt*Cp) layout Mosaic SMEM blocks require (2D,
    sublane dim equal to the array's, lane dim 128-aligned), blocked
    (1, Cp) per grid step."""
    Cp = ((2 * C + 1 + 127) // 128) * 128
    inter = jnp.stack([ids, bits], axis=2).reshape(nt, 2 * C)
    packed = jnp.concatenate(
        [cnt, inter, jnp.zeros((nt, Cp - 1 - 2 * C), jnp.int32)], axis=1)
    spec = pl.BlockSpec((1, Cp), lambda i: (0, i),
                        memory_space=pltpu.SMEM)
    return packed.reshape(1, nt * Cp), spec


def _const_visit_rows(order, nt):
    """Constant all-chunks visit rows (front-to-back, single whole-tile
    span: bit 0 set) for ungated dispatches — the in-kernel gates do all
    the culling."""
    C = order.shape[0]
    ids = jnp.broadcast_to(order[None, :], (nt, C))
    bits = jnp.ones((nt, C), jnp.int32)
    cnt = jnp.full((nt, 1), C, jnp.int32)
    return ids, bits, cnt


# ---------------------------------------------------------------------------
# Triangle kernel
# ---------------------------------------------------------------------------


def _inv_dir(dc):
    """Slab-test reciprocal (zero components -> +/-inf behavior)."""
    ok = jnp.abs(dc) > F32(1e-30)
    r = jnp.where(ok, F32(1.0), F32(0.0)) / jnp.where(ok, dc, F32(1.0))
    return jnp.where(ok, r, jnp.where(dc >= 0, F32(3e38), F32(-3e38)))


def _slab_cols(lo, hi, ox, oy, oz, ivx, ivy, ivz):
    """AABB slab entry/exit for boxes-on-sublanes vs rays-on-lanes:
    lo/hi (K, 3) column tables, per-ray rows (1, R). Returns (tn, tf),
    each (K, R). Used identically by the XLA gate and the in-kernel
    refine — keep them in lockstep (the gate must stay a superset)."""
    t0x = (lo[:, 0:1] - ox) * ivx
    t1x = (hi[:, 0:1] - ox) * ivx
    t0y = (lo[:, 1:2] - oy) * ivy
    t1y = (hi[:, 1:2] - oy) * ivy
    t0z = (lo[:, 2:3] - oz) * ivz
    t1z = (hi[:, 2:3] - oz) * ivz
    tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                 jnp.minimum(t0y, t1y)),
                     jnp.minimum(t0z, t1z))
    tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                 jnp.maximum(t0y, t1y)),
                     jnp.maximum(t0z, t1z))
    return tn, tf


TRI_SUB = 128          # rays per Woop sub-span in gated mode
TRI_RAY_TILE_GATED = 1024  # rays per grid step in gated mode
TRI_GATE_MIN = 8192    # tris: below this the XLA visit-list gate costs
                       # more than the short cluster walk it would prune
TRI_MERGED = False     # single (8, 6C) x (8, sub) contraction instead of
                       # six K=4 dots — measured NEUTRAL-to-slightly-slower
                       # on v5e (the kernel is VPU-epilogue-bound, not
                       # MXU-fill-bound); kept because the packed table's
                       # 6*cluster lane stride is what a future
                       # sub-128 cluster size would need


def _tri_kernel(visit_ref, clo_ref, chi_ref, o_ref, d_ref, tmax_ref,
                woop_o_ref, woop_d_ref, wrows_ref, *refs, cluster: int,
                sub: int, emit_attrs: bool, occlusion: bool = False,
                gated: bool = True, index_order: bool = False,
                vpu_dots: bool = False, skip_box: bool = False,
                merged: bool = False):
    """One grid step = one ray tile, walking its cluster visit list.

    Structure mirrors _torus_kernel: visit_ref is the tile's packed SMEM
    row [cnt, id0, bits0, id1, bits1, ...] of (cluster_id, span_bits)
    entry pairs.
    A dispatched (cluster, span) first re-runs the span-vs-cluster-AABB
    slab against the RUNNING best (clo/chi are SMEM scalar tables), then
    the Woop unit-triangle test as (4, C)x(4, sub) MXU contractions with a
    select-based argmin.

    gated: entries carry exact per-span candidate bits from
    _chunk_visit_lists. Ungated (small scenes): constant all-cluster rows,
    span = whole tile, plus a whole-tile any_live skip.
    index_order: visit entry ids are ignored and clusters walk in index
    order (required when `cluster` is not lane-aligned — a dynamic
    SMEM-loaded id defeats Mosaic's slice-alignment prover, while
    loop-var * cluster stays provable).

    o/d: (4, R) homogeneous origins ([o,1]^T) and dirs ([d,0]^T).
    woop_o/woop_d: (3, 4, T). outs: (1, R) accumulators (+ (21, R) attrs).
    With emit_attrs, per-triangle attribute tables a0/a1/a2 ((21,T)/(8,T)/
    (8,T)) ride along and the kernel emits interpolated shading attributes
    via pick-masked matmuls — XLA row-gathers cost ~1 row/cycle (8+ ms per
    2M-ray gather), so gathering 9+ attribute tables in shade() dominated
    whole frames.

    occlusion: any-hit semantics (shadow rays) — once a ray has ANY hit in
    range, every later cluster is rejected for it outright
    (TerminateOnFirstHit | SkipClosestHit, raytrace.rchit:96-109).
    """
    if emit_attrs:
        a0_ref, a1_ref, a2_ref, t_out, idx_out, u_out, v_out, attr_out = refs
    else:
        t_out, idx_out, u_out, v_out = refs
    R = o_ref.shape[1]
    n_sub = R // sub

    # accumulators live in the output refs (VMEM-resident across the loop);
    # @pl.when predication instead of lax.cond carries — carried tuples
    # through cond/fori make Mosaic's register allocator spill wildly
    t_out[...] = jnp.full((1, R), BIG, F32)
    idx_out[...] = jnp.zeros((1, R), jnp.int32)
    u_out[...] = jnp.zeros((1, R), F32)
    v_out[...] = jnp.zeros((1, R), F32)
    if emit_attrs:
        attr_out[...] = jnp.zeros((21, R), F32)

    def _woop(c, base, ls):
        """Woop test of one cluster vs one `sub`-lane span. Rays re-load
        from the refs at the span's offset (broadcast ops against
        lane-sliced values are invalid Mosaic layouts)."""
        oh = o_ref[:, ls]                 # (4, sub)
        d = d_ref[:, ls]
        tmax = tmax_ref[0:1, ls]
        t_cur = t_out[0:1, ls]
        if occlusion:
            bound = jnp.where(t_cur < BIG, F32(-1.0), tmax)
        else:
            bound = jnp.minimum(t_cur, tmax)

        if skip_box:
            # single-cluster scenes: the box gate can't skip ahead to
            # anything (there is nothing after this cluster), and its
            # slab + vector->scalar any() reduce cost MORE per tile than
            # just running the tiny Woop test; any_live already skips
            # dead tiles. (Skipping it in gated MULTI-cluster mode was
            # measured WORSE: the running-best/occlusion `bound` in the
            # slab prunes whole spans as front-to-back visits tighten
            # t_cur, which the exact-at-gate-time visit bits can't see.)
            box_hit = None
        else:
            # span-vs-cluster slab against the running best (SMEM
            # scalars): prunes spans whose candidates were overtaken
            # since gate time
            ox, oy, oz = oh[0:1], oh[1:2], oh[2:3]
            invx = _inv_dir(d[0:1])
            invy = _inv_dir(d[1:2])
            invz = _inv_dir(d[2:3])
            t0x = (clo_ref[c, 0] - ox) * invx
            t1x = (chi_ref[c, 0] - ox) * invx
            t0y = (clo_ref[c, 1] - oy) * invy
            t1y = (chi_ref[c, 1] - oy) * invy
            t0z = (clo_ref[c, 2] - oz) * invz
            t1z = (chi_ref[c, 2] - oz) * invz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            box_hit = (tn <= jnp.minimum(tf, bound)) \
                & (tf >= TMIN) & (tmax > TMIN)    # (1, sub)

        def _run_woop():
            hp = jax.lax.Precision.HIGHEST
            if merged:
                # ONE (6C, 8) x (8, sub) MXU contraction instead of six
                # K=4 dots: the six products are pipeline-fill-latency
                # bound (K=4 uses 3% of the systolic array), so merging
                # them amortizes five fills; the zero-padded halves of the
                # packed rows make origin rows contract only with oh and
                # direction rows only with d. woop_o_ref here is the
                # packed (6T, 8) table (cluster-major row groups).
                base6 = pl.multiple_of(c * (6 * cluster), 128)
                w6 = woop_o_ref[:, pl.ds(base6, 6 * cluster)]     # (8, 6C)
                z = jnp.concatenate([oh, d], axis=0)              # (8, sub)
                r6 = jax.lax.dot_general(
                    w6, z, _DN0, precision=hp,
                    preferred_element_type=jnp.float32)           # (6C, sub)
                opx = r6[0 * cluster:1 * cluster]
                opy = r6[1 * cluster:2 * cluster]
                opz = r6[2 * cluster:3 * cluster]
                dpx = r6[3 * cluster:4 * cluster]
                dpy = r6[4 * cluster:5 * cluster]
                dpz = r6[5 * cluster:6 * cluster]
            elif vpu_dots:
                # tiny clusters: six K=4 MXU matmuls are all pipeline-fill
                # latency (~4 us/tile for an 8-triangle scene); broadcast
                # MACs over (C, 1) column slices of the row-major table
                # run the same contraction in ~40 vector ops
                w = wrows_ref[pl.ds(base, cluster), :]    # (C, 24)

                def dotv(off, b):
                    acc = w[:, off:off + 1] * b[0:1]
                    for i in range(1, 4):
                        acc = acc + w[:, off + i:off + i + 1] * b[i:i + 1]
                    return acc                            # (C, sub)

                opx = dotv(0, oh)
                opy = dotv(4, oh)
                opz = dotv(8, oh)
                dpx = dotv(12, d)
                dpy = dotv(16, d)
                dpz = dotv(20, d)
            else:
                wo = woop_o_ref[:, :, pl.ds(base, cluster)]   # (3, 4, C)
                wd = woop_d_ref[:, :, pl.ds(base, cluster)]

                def dot0(a, b):  # (4, C) x (4, sub) -> (C, sub)
                    return jax.lax.dot_general(
                        a, b, _DN0, precision=hp,
                        preferred_element_type=jnp.float32)

                opx = dot0(wo[0], oh)
                opy = dot0(wo[1], oh)
                opz = dot0(wo[2], oh)
                dpx = dot0(wd[0], d)
                dpy = dot0(wd[1], d)
                dpz = dot0(wd[2], d)

            dz_ok = jnp.abs(dpz) > F32(1e-12)
            inv_dz = jnp.where(dz_ok, F32(1.0), F32(0.0)) / \
                jnp.where(dz_ok, dpz, F32(1.0))
            t = -opz * inv_dz
            u = opx + t * dpx
            v = opy + t * dpy
            hit = dz_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) \
                & (t >= TMIN) & (t <= tmax)
            t = jnp.where(hit, t, BIG)

            t_tile = jnp.min(t, axis=0, keepdims=True)    # (1, sub)
            if occlusion:
                # any-hit: only "did something hit" matters — skip the
                # argmin/one-hot selects (idx/u/v are undefined outputs)
                t_out[0:1, ls] = jnp.minimum(t_tile, t_cur)
                return
            # select-based argmin (no gathers on TPU): smallest row
            # achieving the column minimum, then one-hot select of u/v
            rows = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
            arg = jnp.min(jnp.where(t <= t_tile, rows, cluster), axis=0,
                          keepdims=True)
            pick = rows == arg
            better = t_tile < t_cur
            t_out[0:1, ls] = jnp.where(better, t_tile, t_cur)
            idx_out[0:1, ls] = jnp.where(better, base + arg,
                                         idx_out[0:1, ls])
            if not emit_attrs:
                # u/v feed shade()'s gather-based barycentric path only;
                # with emit_attrs the interpolation happens below via the
                # pick-mask matmuls and Hit.u/v go unread
                u_sel = jnp.sum(jnp.where(pick, u, 0.0), axis=0,
                                keepdims=True)
                v_sel = jnp.sum(jnp.where(pick, v, 0.0), axis=0,
                                keepdims=True)
                u_out[0:1, ls] = jnp.where(better, u_sel, u_out[0:1, ls])
                v_out[0:1, ls] = jnp.where(better, v_sel, v_out[0:1, ls])

            if emit_attrs:
                # interpolated attributes of the winning triangle, selected
                # on the MXU: attr = A0[p] + u*A1[p] + v*A2[p] with p the
                # per-ray pick, expressed as (A, C) @ (C, sub) matmuls over
                # the pick mask (K = C: full MXU contraction, unlike the
                # K=4 Woop dots)
                pickf = pick.astype(jnp.float32)
                a0 = a0_ref[:, pl.ds(base, cluster)]     # (21, C)
                a1 = a1_ref[:, pl.ds(base, cluster)]     # (8, C)
                a2 = a2_ref[:, pl.ds(base, cluster)]     # (8, C)
                n0 = jnp.dot(a0, pickf, precision=hp,
                             preferred_element_type=jnp.float32)
                n1 = jnp.dot(a1, pickf * jnp.where(pick, u, 0.0),
                             precision=hp,
                             preferred_element_type=jnp.float32)
                n2 = jnp.dot(a2, pickf * jnp.where(pick, v, 0.0),
                             precision=hp,
                             preferred_element_type=jnp.float32)
                new = jnp.concatenate([n0[0:8] + n1 + n2, n0[8:21]], axis=0)
                attr_cur = attr_out[:, ls]
                attr_out[:, ls] = jnp.where(better, new, attr_cur)

        if skip_box:
            _run_woop()
        else:
            pl.when(jnp.any(box_hit))(_run_woop)

    def body(v, _):
        bits = visit_ref[0, 2 + 2 * v]
        if index_order:
            # single cluster (scene/build adapts cluster_size so multi-
            # cluster tables are always 128-aligned): static offsets
            c = 0
            base = 0
        else:
            c = visit_ref[0, 1 + 2 * v]
            base = pl.multiple_of(c * cluster, 128)
        for j in range(n_sub):
            ls = slice(j * sub, (j + 1) * sub)

            @pl.when(((bits >> j) & 1) == 1)
            def _(c=c, base=base, ls=ls):
                _woop(c, base, ls)

        return 0

    if gated:
        jax.lax.fori_loop(0, visit_ref[0, 0], body, 0)
    else:
        @pl.when(jnp.any(tmax_ref[...] > TMIN))
        def _walk():
            jax.lax.fori_loop(0, visit_ref[0, 0], body, 0)


@functools.partial(jax.jit, static_argnames=("cluster", "ray_tile",
                                             "occlusion"))
def tri_closest_hit_pallas(origins, dirs, tmax, woop_o, woop_d,
                           cluster_lo, cluster_hi, cluster: int,
                           ray_tile: int = RAY_TILE, attr_tables=None,
                           occlusion: bool = False):
    """origins/dirs: (3, N) rows; woop_o: (3, 4, T); woop_d: (3, 3, T);
    cluster_*: (C, 3). N must be a multiple of ray_tile. attr_tables:
    optional ((21,T), (8,T), (8,T)) shading-attribute tables — when given,
    a fifth (21, N) output carries the winner's interpolated attributes.

    Culling is hybrid like the torus kernel: big meshes (T > TRI_GATE_MIN)
    get exact XLA visit lists with 128-lane span bits (_chunk_visit_lists
    over the cluster AABBs); small ones walk every cluster behind in-kernel
    slab gates (the XLA gate would cost more than it prunes)."""
    n = origins.shape[1]
    T = woop_o.shape[2]
    emit_attrs = attr_tables is not None
    n_clusters = cluster_lo.shape[0]

    gated = T > TRI_GATE_MIN and cluster % 128 == 0 and n % 1024 == 0
    if gated:
        # span width (TRI_SUB), not tile width, sets the culling frustum
        # granularity now that visit entries carry split span-bit words;
        # tile 1024 still measured best (sub-tile VMEM working set)
        ray_tile = min(ray_tile, TRI_RAY_TILE_GATED)
        sub = TRI_SUB
    else:
        if n < ray_tile:
            ray_tile = n
        sub = ray_tile
    assert n % ray_tile == 0, n
    nt = n // ray_tile

    oh, d4, tm = _rays_to_rows(origins, dirs, tmax)
    # pad woop_d input dim 3 -> 4 so both matmuls share the (4, R) operand
    wd4 = jnp.concatenate([woop_d, jnp.zeros((3, 1, T), woop_d.dtype)], axis=1)

    merged = gated and T % cluster == 0 and TRI_MERGED
    if merged:
        # pack the six Woop row blocks cluster-major into ONE (8, 6T) table
        # for the kernel's merged (8, 6C) x (8, sub) contraction: lane
        # [c*6C + k*C + i] = component k of triangle c*C+i, with the
        # origin components in sublanes 0-3 and direction components in
        # 4-7 (each zero in the other half, so one [oh; d] operand serves
        # both contractions). Sublanes-8 x lanes-6T keeps the table dense
        # in VMEM (a (6T, 8) layout would lane-pad 16x and OOM scoped
        # VMEM).
        z34 = jnp.zeros((3, 4, T), F32)
        w68 = jnp.concatenate([
            jnp.concatenate([woop_o, z34], axis=1),
            jnp.concatenate([z34, wd4], axis=1)], axis=0)   # (6, 8, T)
        n_cl = T // cluster
        w6pack = (w68.reshape(6, 8, n_cl, cluster)
                  .transpose(1, 2, 0, 3).reshape(8, 6 * T))

    ray_spec = pl.BlockSpec((4, ray_tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, ray_tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    # front-to-back cluster visit order (by distance from the batch's mean
    # origin): near clusters fill t_best first, so the slab tests prune far
    # clusters outright instead of merely masking their pairs
    clo = jnp.asarray(cluster_lo)
    chi = jnp.asarray(cluster_hi)
    mean_o = jnp.mean(origins, axis=1)
    cdist = jnp.linalg.norm(
        jnp.maximum(jnp.maximum(clo - mean_o[None, :],
                                mean_o[None, :] - chi), 0.0), axis=1)
    index_order = False
    if gated:
        rank = jnp.argsort(jnp.argsort(cdist)).astype(jnp.int32)
        vids, vbits, cnt = _chunk_visit_lists(origins, dirs, tmax, clo,
                                              chi, rank, ray_tile, sub)
    elif n_clusters > 1 and cluster % 128 == 0:
        vids, vbits, cnt = _const_visit_rows(
            jnp.argsort(cdist).astype(jnp.int32), nt)
    else:
        # a single (possibly unaligned) cluster: a dynamic SMEM-loaded id
        # defeats Mosaic's lane-alignment prover, so the kernel uses
        # static offset 0 (scene/build guarantees multi-cluster tables are
        # 128-aligned: cluster_size only shrinks when one cluster holds
        # the whole soup)
        assert n_clusters == 1, (n_clusters, cluster)
        index_order = True
        vids, vbits, cnt = _const_visit_rows(
            jnp.arange(n_clusters, dtype=jnp.int32), nt)
    packed, visit_spec = _pack_visit_rows(vids, vbits, cnt, nt,
                                          n_clusters)

    # row-major table for the tiny-cluster VPU dot path (cols 0-11:
    # woop_o[k][i] at k*4+i; 12-23: padded woop_d). Only materialized when
    # that path is active: at 23k tris the unused copy cost 2.2 MB of the
    # kernel's 16 MB scoped-VMEM budget and OOMed the big-mesh compile.
    vpu_dots = cluster <= 32
    if vpu_dots:
        wrows = jnp.concatenate(
            [woop_o.transpose(2, 0, 1).reshape(T, 12),
             wd4.transpose(2, 0, 1).reshape(T, 12)], axis=1)
    else:
        wrows = jnp.zeros((8, 24), F32)  # placeholder (kernel ignores it)
    in_specs = [visit_spec, smem, smem, ray_spec, ray_spec, row_spec,
                full, full, full]
    if merged:
        # the packed table rides in the woop_o slot; woop_d is unused
        operands = [packed, cluster_lo, cluster_hi, oh, d4, tm, w6pack,
                    jnp.zeros((3, 1, 8), F32), wrows]
    else:
        operands = [packed, cluster_lo, cluster_hi, oh, d4, tm, woop_o,
                    wd4, wrows]
    out_specs = [row_spec, row_spec, row_spec, row_spec]
    out_shape = [
        jax.ShapeDtypeStruct((1, n), F32),
        jax.ShapeDtypeStruct((1, n), jnp.int32),
        jax.ShapeDtypeStruct((1, n), F32),
        jax.ShapeDtypeStruct((1, n), F32),
    ]
    if emit_attrs:
        in_specs += [full, full, full]
        operands += list(attr_tables)
        out_specs.append(pl.BlockSpec((21, ray_tile), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((21, n), F32))

    out = pl.pallas_call(
        functools.partial(_tri_kernel, cluster=cluster, sub=sub,
                          emit_attrs=emit_attrs, occlusion=occlusion,
                          gated=gated, index_order=index_order,
                          vpu_dots=vpu_dots, skip_box=n_clusters == 1,
                          merged=merged),
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*operands)
    t, idx, u, v = out[:4]
    res = (t.reshape(n), idx.reshape(n), u.reshape(n), v.reshape(n))
    return res + ((out[4],) if emit_attrs else ())


# ---------------------------------------------------------------------------
# Streamed (HBM-resident) triangle kernel — meshes past the VMEM ceiling
# ---------------------------------------------------------------------------

TRI_STREAM_MIN = 65536   # tris: above this the resident kernel's VMEM
                         # tables (~244 B/tri with attrs) blow the ~16 MB
                         # scoped-VMEM budget; Woop/attr tables then stay
                         # in HBM and superblocks stream through a double-
                         # buffered VMEM scratch (the BLAS analog for
                         # driver-managed huge meshes, SURVEY.md §2B)
STREAM_GATE_BOXES = 512  # superblock-count target for the XLA gate: keeps
                         # the O(boxes x rays) exact gate at ~2.8x the
                         # 23k-tri ladder mesh's measured 4.7 ms/2M rays
STREAM_MAX_SB = 4096     # tris per superblock cap (DMA block ~1 MB: 2x
                         # (24+37, SB) f32 double-buffered scratch)


def _tri_stream_kernel(visit_ref, slo_ref, shi_ref, o_ref, d_ref, tmax_ref,
                       w24_ref, *refs, sb_tris: int, sub: int,
                       emit_attrs: bool, occlusion: bool):
    """One grid step = one ray tile, walking its SUPERBLOCK visit list with
    double-buffered HBM->VMEM DMA of each visited superblock's packed Woop
    (24, sb_tris) and attr (37, sb_tris) tables. Structure otherwise
    mirrors _tri_kernel with cluster := sb_tris: the visit bits are exact
    per 128-lane span (gate over superblock AABBs), a dispatched
    (superblock, span) re-runs the slab against the running best from SMEM
    boxes, then one Woop pass over the whole streamed block.

    The DMA for visit entry v+1 is issued before entry v is processed, so
    at ~1.5 us of HBM traffic per block the copies hide behind the
    multi-us Woop pass of the previous block."""
    if emit_attrs:
        (a37_ref, t_out, idx_out, u_out, v_out, attr_out,
         wbuf, abuf, sems) = refs
    else:
        t_out, idx_out, u_out, v_out, wbuf, sems = refs
        a37_ref = abuf = None
    R = o_ref.shape[1]
    n_sub = R // sub

    t_out[...] = jnp.full((1, R), BIG, F32)
    idx_out[...] = jnp.zeros((1, R), jnp.int32)
    u_out[...] = jnp.zeros((1, R), F32)
    v_out[...] = jnp.zeros((1, R), F32)
    if emit_attrs:
        attr_out[...] = jnp.zeros((21, R), F32)

    cnt = visit_ref[0, 0]

    def _copy(v, slot):
        c = visit_ref[0, 1 + 2 * v]
        off = pl.multiple_of(c * sb_tris, 128)
        pltpu.make_async_copy(
            w24_ref.at[:, pl.ds(off, sb_tris)], wbuf.at[slot],
            sems.at[slot, 0]).start()
        if emit_attrs:
            pltpu.make_async_copy(
                a37_ref.at[:, pl.ds(off, sb_tris)], abuf.at[slot],
                sems.at[slot, 1]).start()

    def _wait(slot):
        pltpu.make_async_copy(
            w24_ref.at[:, pl.ds(0, sb_tris)], wbuf.at[slot],
            sems.at[slot, 0]).wait()
        if emit_attrs:
            pltpu.make_async_copy(
                a37_ref.at[:, pl.ds(0, sb_tris)], abuf.at[slot],
                sems.at[slot, 1]).wait()

    def _span(c, slot, ls):
        oh = o_ref[:, ls]                 # (4, sub)
        d = d_ref[:, ls]
        tmax = tmax_ref[0:1, ls]
        t_cur = t_out[0:1, ls]
        if occlusion:
            bound = jnp.where(t_cur < BIG, F32(-1.0), tmax)
        else:
            bound = jnp.minimum(t_cur, tmax)

        # span-vs-superblock slab against the running best (SMEM boxes)
        ox, oy, oz = oh[0:1], oh[1:2], oh[2:3]
        invx = _inv_dir(d[0:1])
        invy = _inv_dir(d[1:2])
        invz = _inv_dir(d[2:3])
        t0x = (slo_ref[c, 0] - ox) * invx
        t1x = (shi_ref[c, 0] - ox) * invx
        t0y = (slo_ref[c, 1] - oy) * invy
        t1y = (shi_ref[c, 1] - oy) * invy
        t0z = (slo_ref[c, 2] - oz) * invz
        t1z = (shi_ref[c, 2] - oz) * invz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        box_hit = (tn <= jnp.minimum(tf, bound)) \
            & (tf >= TMIN) & (tmax > TMIN)        # (1, sub)

        def _run_woop():
            hp = jax.lax.Precision.HIGHEST

            def dot0(r0, b):  # (4, SB) x (4, sub) -> (SB, sub)
                return jax.lax.dot_general(
                    wbuf[slot, r0:r0 + 4, :], b, _DN0, precision=hp,
                    preferred_element_type=jnp.float32)

            opx = dot0(0, oh)
            opy = dot0(4, oh)
            opz = dot0(8, oh)
            dpx = dot0(12, d)
            dpy = dot0(16, d)
            dpz = dot0(20, d)

            dz_ok = jnp.abs(dpz) > F32(1e-12)
            inv_dz = jnp.where(dz_ok, F32(1.0), F32(0.0)) / \
                jnp.where(dz_ok, dpz, F32(1.0))
            t = -opz * inv_dz
            u = opx + t * dpx
            v = opy + t * dpy
            hit = dz_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) \
                & (t >= TMIN) & (t <= tmax)
            t = jnp.where(hit, t, BIG)

            t_tile = jnp.min(t, axis=0, keepdims=True)    # (1, sub)
            if occlusion:
                t_out[0:1, ls] = jnp.minimum(t_tile, t_cur)
                return
            rows = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
            arg = jnp.min(jnp.where(t <= t_tile, rows, sb_tris), axis=0,
                          keepdims=True)
            pick = rows == arg
            better = t_tile < t_cur
            t_out[0:1, ls] = jnp.where(better, t_tile, t_cur)
            idx_out[0:1, ls] = jnp.where(better, c * sb_tris + arg,
                                         idx_out[0:1, ls])
            if not emit_attrs:
                u_sel = jnp.sum(jnp.where(pick, u, 0.0), axis=0,
                                keepdims=True)
                v_sel = jnp.sum(jnp.where(pick, v, 0.0), axis=0,
                                keepdims=True)
                u_out[0:1, ls] = jnp.where(better, u_sel, u_out[0:1, ls])
                v_out[0:1, ls] = jnp.where(better, v_sel, v_out[0:1, ls])

            if emit_attrs:
                pickf = pick.astype(jnp.float32)
                a0 = abuf[slot, 0:21, :]                  # (21, SB)
                a1 = abuf[slot, 21:29, :]                 # (8, SB)
                a2 = abuf[slot, 29:37, :]                 # (8, SB)
                n0 = jnp.dot(a0, pickf, precision=hp,
                             preferred_element_type=jnp.float32)
                n1 = jnp.dot(a1, pickf * jnp.where(pick, u, 0.0),
                             precision=hp,
                             preferred_element_type=jnp.float32)
                n2 = jnp.dot(a2, pickf * jnp.where(pick, v, 0.0),
                             precision=hp,
                             preferred_element_type=jnp.float32)
                new = jnp.concatenate([n0[0:8] + n1 + n2, n0[8:21]], axis=0)
                attr_cur = attr_out[:, ls]
                attr_out[:, ls] = jnp.where(better, new, attr_cur)

        pl.when(jnp.any(box_hit))(_run_woop)

    @pl.when(cnt > 0)
    def _prologue():
        _copy(0, 0)

    def body(v, _):
        slot = jax.lax.rem(v, 2)

        @pl.when(v + 1 < cnt)
        def _prefetch():
            _copy(v + 1, jax.lax.rem(v + 1, 2))

        _wait(slot)
        c = visit_ref[0, 1 + 2 * v]
        bits = visit_ref[0, 2 + 2 * v]
        for j in range(n_sub):
            ls = slice(j * sub, (j + 1) * sub)

            @pl.when(((bits >> j) & 1) == 1)
            def _(c=c, slot=slot, ls=ls):
                _span(c, slot, ls)

        return 0

    jax.lax.fori_loop(0, cnt, body, 0)


@functools.partial(jax.jit, static_argnames=("cluster", "ray_tile",
                                             "occlusion"))
def tri_closest_hit_stream(origins, dirs, tmax, woop_o, woop_d,
                           cluster_lo, cluster_hi, cluster: int,
                           ray_tile: int = 1024, attr_tables=None,
                           occlusion: bool = False):
    """Streamed variant of tri_closest_hit_pallas for meshes whose tables
    exceed VMEM (T > TRI_STREAM_MIN; validated to 1M+ triangles). Same
    contract. Clusters group into superblocks of `g` clusters sized so the
    exact XLA gate sees <= STREAM_GATE_BOXES boxes and each DMA block is
    <= STREAM_MAX_SB triangles."""
    n = origins.shape[1]
    T = woop_o.shape[2]
    emit_attrs = attr_tables is not None
    C = cluster_lo.shape[0]
    assert cluster % 128 == 0 and C * cluster == T, (cluster, C, T)

    g = max(1, -(-C // STREAM_GATE_BOXES))
    g = min(g, max(1, STREAM_MAX_SB // cluster))
    S = -(-C // g)
    sb_tris = g * cluster
    Tp = S * sb_tris

    ray_tile = min(ray_tile, n)
    sub = TRI_SUB if ray_tile % TRI_SUB == 0 else ray_tile
    assert n % ray_tile == 0 and ray_tile // sub <= MAX_SPANS
    nt = n // ray_tile

    oh, d4, tm = _rays_to_rows(origins, dirs, tmax)
    wd4 = jnp.concatenate([woop_d, jnp.zeros((3, 1, T), woop_d.dtype)],
                          axis=1)
    w24 = jnp.concatenate([woop_o.reshape(12, T), wd4.reshape(12, T)],
                          axis=0)
    if Tp != T:
        w24 = jnp.concatenate([w24, jnp.zeros((24, Tp - T), F32)], axis=1)

    # superblock AABBs from cluster AABBs. Empty clusters carry far POINT
    # boxes (scene/build): min over lo keeps the real bound, but max over
    # a +FAR hi would blow a mixed superblock up to infinity — mask them.
    clo = jnp.asarray(cluster_lo)
    chi = jnp.asarray(cluster_hi)
    if S * g != C:
        padc = S * g - C
        clo = jnp.concatenate([clo, jnp.full((padc, 3), F32(1e30))])
        chi = jnp.concatenate([chi, jnp.full((padc, 3), F32(1e30))])
    empty = clo[:, 0:1] > F32(1e29)
    chi_eff = jnp.where(empty, F32(-1e30), chi)
    sb_lo = jnp.min(clo.reshape(S, g, 3), axis=1)
    sb_hi = jnp.max(chi_eff.reshape(S, g, 3), axis=1)
    all_empty = jnp.all(empty.reshape(S, g, 1), axis=1)
    sb_hi = jnp.where(all_empty, sb_lo, sb_hi)   # far point, not inverted

    mean_o = jnp.mean(origins, axis=1)
    cdist = jnp.linalg.norm(
        jnp.maximum(jnp.maximum(sb_lo - mean_o[None, :],
                                mean_o[None, :] - sb_hi), 0.0), axis=1)
    rank = jnp.argsort(jnp.argsort(cdist)).astype(jnp.int32)
    vids, vbits, cnt = _chunk_visit_lists(origins, dirs, tmax, sb_lo, sb_hi,
                                          rank, ray_tile, sub)
    packed, visit_spec = _pack_visit_rows(vids, vbits, cnt, nt, S)

    ray_spec = pl.BlockSpec((4, ray_tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, ray_tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    in_specs = [visit_spec, smem, smem, ray_spec, ray_spec, row_spec, hbm]
    operands = [packed, sb_lo, sb_hi, oh, d4, tm, w24]
    out_specs = [row_spec, row_spec, row_spec, row_spec]
    out_shape = [
        jax.ShapeDtypeStruct((1, n), F32),
        jax.ShapeDtypeStruct((1, n), jnp.int32),
        jax.ShapeDtypeStruct((1, n), F32),
        jax.ShapeDtypeStruct((1, n), F32),
    ]
    scratch = [pltpu.VMEM((2, 24, sb_tris), F32),
               pltpu.SemaphoreType.DMA((2, 2))]
    if emit_attrs:
        a0, a1, a2 = attr_tables
        # rows padded 37 -> 40: Mosaic DMA slices must be 8-aligned on the
        # sublane dim
        a37 = jnp.concatenate([a0, a1, a2, jnp.zeros((3, T), F32)], axis=0)
        if Tp != T:
            a37 = jnp.concatenate([a37, jnp.zeros((40, Tp - T), F32)],
                                  axis=1)
        in_specs.append(hbm)
        operands.append(a37)
        out_specs.append(pl.BlockSpec((21, ray_tile), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((21, n), F32))
        scratch.insert(1, pltpu.VMEM((2, 40, sb_tris), F32))

    out = pl.pallas_call(
        functools.partial(_tri_stream_kernel, sb_tris=sb_tris, sub=sub,
                          emit_attrs=emit_attrs, occlusion=occlusion),
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(*operands)
    t, idx, u, v = out[:4]
    res = (t.reshape(n), idx.reshape(n), u.reshape(n), v.reshape(n))
    return res + ((out[4],) if emit_attrs else ())


# ---------------------------------------------------------------------------
# Torus kernel
# ---------------------------------------------------------------------------

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


def _chunk_visit_lists(origins, dirs, tmax, clo, chi, rank, ray_tile, sub):
    """Exact per-ray-tile chunk visit lists with per-span candidate bits,
    computed with plain XLA ops OUTSIDE the kernel (the TLAS traversal
    analog, SURVEY.md §2B).

    Every ray is slab-tested against every 8-torus chunk AABB (vectorized,
    chunk-blocked so temporaries stay ~(8, N)), then reduced to
    "any candidate" per `sub`-lane span. A tile's passing chunks are
    compacted front-to-back by ONE multi-operand lax.sort over the key
    `rank + C * miss` (rank = the chunk's near-to-far position), carrying
    (chunk_id, span_bits) entry pairs as values — the kernel walks the
    first `cnt` entries via SMEM and runs the quartic only on spans whose
    bit is set. Dead tiles/spans (tmax=0 bounce cull) drop out here for
    free.

    The gate costs ~1 us/Mray/chunk-block of dense XLA; it pays for itself
    when the chunk walk it prunes is long (K > ~64 tori). Small scenes
    skip it entirely — see torus_closest_hit_pallas, which feeds the
    kernel constant all-chunks visit rows and relies on the in-kernel
    any_live / per-chunk reduce gates instead (measured: a K=8 per-torus
    exact gate cost 2.2 ms per 2M-ray dispatch, more than the whole
    6-torus kernel).

    (Two earlier designs were slower: scanning all torus groups inside the
    kernel behind per-group SMEM slab gates cost ~16 ms/dispatch on the
    1k-instance grid — 64k sequential (1, R) gates at 1/8 sublane
    occupancy; and a conservative interval-arithmetic gate over sub-tile
    origin/direction boxes visited 4.3x more chunks than this exact test,
    because the per-axis interval products bound the frustum by its
    axis-aligned sweep.)

    origins/dirs: (3, N) rows; tmax: (N,); clo/chi: (C, 3) chunk AABBs;
    rank: (C,) i32 front-to-back rank per chunk id; ray_tile/sub: the
    kernel's tile and span widths (spans per tile <= 32: one i32 bits
    word). Returns (ids (nt, C), bits (nt, C), cnt (nt, 1)) i32 with
    nt = N // ray_tile.
    """
    C = clo.shape[0]
    n = origins.shape[1]
    S = n // sub
    nt = n // ray_tile
    n_sub = ray_tile // sub
    assert n_sub <= MAX_SPANS, n_sub

    inv = [_inv_dir(dirs[k]) for k in range(3)]      # 3 x (N,)
    tm = jnp.minimum(tmax, BIG)

    B = 32  # chunks per block: bounds temporaries to (B, N); 32 re-reads
            # the (3, N) ray rows 4x less often than 8 per box and
            # measured fastest of {8, 16, 32, 64} on both ladder gates
    Cb = ((C + B - 1) // B) * B
    if Cb != C:
        pad = jnp.full((Cb - C, 3), F32(2.0e38))
        clo_b = jnp.concatenate([clo, pad])
        chi_b = jnp.concatenate([chi, pad])
    else:
        clo_b, chi_b = clo, chi

    def block(boxes):
        lo_b, hi_b = boxes                           # (B, 3)
        tn, tf = _slab_cols(lo_b, hi_b,
                            origins[0][None, :], origins[1][None, :],
                            origins[2][None, :],
                            inv[0][None, :], inv[1][None, :],
                            inv[2][None, :])
        # the explicit live term matters: a dead ray (tmax=0 bounce cull)
        # parked ON geometry has its origin inside nearby boxes, where
        # tn < 0 <= min(tf, 0) passes the slab alone
        hit = (tn <= jnp.minimum(tf, tm[None, :])) & (tf >= TMIN) \
            & (tm[None, :] > TMIN)                                 # (B, N)
        return jnp.any(hit.reshape(B, S, sub), axis=2)             # (B, S)

    span_mask = jax.lax.map(
        block, (clo_b.reshape(-1, B, 3), chi_b.reshape(-1, B, 3)))
    span_mask = span_mask.reshape(Cb, S)[:C].T       # (S, C)

    spm = span_mask.reshape(nt, n_sub, C)
    anym = jnp.any(spm, axis=1)                      # (nt, C)
    bits = jnp.zeros((nt, C), jnp.int32)
    for j in range(n_sub):
        bits = bits | (spm[:, j, :].astype(jnp.int32) << j)
    ids = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[None, :], (nt, C))
    key = rank[None, :] + jnp.where(anym, 0, C).astype(jnp.int32)
    key = jnp.broadcast_to(key, (nt, C))
    _, ids, bits = jax.lax.sort((key, ids, bits), dimension=1, num_keys=1)
    cnt = jnp.sum(anym, axis=1).astype(jnp.int32)[:, None]
    return ids, bits, cnt


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


# Combined entry used by trace.intersect
# ---------------------------------------------------------------------------


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
            if want_attrs:
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
            if want_attrs:
                tri_attr = loose_attr
        else:
            stream = (T_local > TRI_STREAM_MIN and cs % 128 == 0
                      and n_cl * cs == T_local)
            launch = (tri_closest_hit_stream if stream
                      else tri_closest_hit_pallas)
            out = launch(
                origins, dirs, tri_tmax, geom.woop_o, geom.woop_d, clo, chi,
                cs, attr_tables=tables, occlusion=occlusion)
            tt, ti, tu, tv = out[:4]
            better = tt < t_best
            if want_attrs:
                tri_attr = out[4]                    # (21, Np)
                if loose_attr is not None:
                    tri_attr = jnp.where(better[None, :], tri_attr,
                                         loose_attr)
            t_best = jnp.where(better, tt, t_best)
            kind = jnp.where(better, 0, kind)
            prim = jnp.where(better, ti + geom.tri_offset, prim)
            u = jnp.where(better, tu, u)
            v = jnp.where(better, tv, v)

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
            mat_table=mat_table, occlusion=occlusion)
        kt, ki = out[:2]
        if want_attrs:
            tor_attr = out[2]                        # (15, Np)
        better = kt < t_best
        t_best = jnp.where(better, kt, t_best)
        kind = jnp.where(better, 1, kind)
        prim = jnp.where(better, ki + geom.tor_offset, prim)

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
