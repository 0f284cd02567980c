"""Fused Pallas triangle closest-hit kernel (VMEM-resident tables).

One grid step = one ray tile walking a front-to-back cluster visit list;
the Woop unit-triangle test runs as (4, C) x (4, sub) MXU contractions with
a select-based argmin, and (with emit_attrs) the winner's interpolated
shading attributes come out of pick-masked matmuls — see ops/trace_kernel.py
for the orchestration and layout rationale.

Replaces: driver BVH traversal behind traceRayEXT (raytrace.rgen:77,
raytrace.rchit:98). Meshes past the VMEM ceiling use ops/tri_stream.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from toroidal_ray_tracing_tpu.ops.kernel_common import (
    _DN0, BIG, F32, TMIN, _chunk_visit_lists, _const_visit_rows, _interpret,
    _inv_dir, _pack_visit_rows, _rays_to_rows)

RAY_TILE = 2048      # rays per grid step (triangle kernel; lane axis) —
                     # swept on v5e: 2048 is ~2.4x faster than 256 (fewer
                     # grid steps, wider VPU rows); 4096 exceeds VMEM

TRI_SUB = int(os.environ.get("TRT_TRI_SUB", "128"))
                       # rays per Woop sub-span in gated mode. Swept on
                       # hardware (scripts/tri_sub_ab.py + end-to-end,
                       # PERF.md round 4): on DENSE primary-ray passes
                       # closest-hit is span-invariant (23.4 ms at both
                       # 128/1024 and 512/2048; Woop-work-bound, unlike
                       # the latency-bound torus quartic) and any-hit
                       # improves ~8% with width — but the FRAME regresses
                       # 17% at (512, 2048) (config 6 sequence 65.4 ->
                       # 53.9 Mrays/s, same session): later bounces are
                       # sparse, and 4x-coarser span candidate bits charge
                       # a whole 512-lane span's Woop work where ~128
                       # lanes have candidates. 128 stays the default;
                       # env knobs TRT_TRI_SUB / TRT_TRI_TILE for A/B,
                       # parity pinned per width by tests/test_pallas.py.
TRI_RAY_TILE_GATED = int(os.environ.get("TRT_TRI_TILE", "1024"))
                       # rays per grid step in gated mode (TRT_TRI_TILE)
TRI_OCCL_NOGATE = os.environ.get("TRT_TRI_OCCL_NOGATE", "0") == "1"
                       # gated ANY-HIT dispatches skip the in-kernel
                       # span-vs-cluster slab + vector->scalar any() reduce
                       # and run the Woop test unconditionally. The visit
                       # bits are already exact per span, so the slab only
                       # prunes spans whose rays ALL occluded mid-walk —
                       # the torus kernel measured that pruning at 7.4%
                       # occlusion rate as pure overhead (TORUS_OCCL_EARLY
                       # note). A/B knob for config 6's 20.6 ms shadow
                       # pass (VERDICT r3 #1); flipped by measurement.
TRI_GATE_MIN = int(os.environ.get("TRT_TRI_GATE_MIN", "2048"))
                       # tris: below this the XLA visit-list gate costs
                       # more than the short cluster walk it would prune.
                       # Was 8192; config 7's 4096-tri mesh measured +17.5%
                       # end-to-end with the gate forced on (42.3 -> 49.8
                       # Mrays/s sequence, same session) — its 33-cluster
                       # ungated walk pays a per-(tile, cluster) slab +
                       # reduce chain every tile while the exact gate costs
                       # ~2 ms/2M rays once per pass. Env knob
                       # TRT_TRI_GATE_MIN.
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

        if skip_box or (occlusion and gated and TRI_OCCL_NOGATE):
            # single-cluster scenes: the box gate can't skip ahead to
            # anything (there is nothing after this cluster), and its
            # slab + vector->scalar any() reduce cost MORE per tile than
            # just running the tiny Woop test; any_live already skips
            # dead tiles. (Skipping it in gated MULTI-cluster mode was
            # measured WORSE for CLOSEST hit: the running-best/occlusion
            # `bound` in the slab prunes whole spans as front-to-back
            # visits tighten t_cur, which the exact-at-gate-time visit
            # bits can't see. TRI_OCCL_NOGATE A/Bs the same skip for
            # gated ANY-HIT, where pruning only fires once a whole span
            # occluded — extra Woop finds are harmless there.)
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

        if box_hit is None:
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
        if n % ray_tile != 0:
            ray_tile = 1024
        sub = min(TRI_SUB, ray_tile)
        assert ray_tile % sub == 0, (ray_tile, sub)
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
