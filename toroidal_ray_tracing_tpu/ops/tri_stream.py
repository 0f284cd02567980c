"""Streamed (HBM-resident) triangle kernel — meshes past the VMEM ceiling.

Same contract as ops/tri_kernel.tri_closest_hit_pallas; clusters group into
superblocks whose packed Woop/attr tables stream through a double-buffered
VMEM scratch (the BLAS analog for driver-managed huge meshes, SURVEY.md
§2B; validated to 1M+ triangles).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from toroidal_ray_tracing_tpu.ops.kernel_common import (
    _DN0, BIG, F32, MAX_SPANS, TMIN, _chunk_visit_lists,
    _chunk_visit_lists_hier, _interpret, _inv_dir, _pack_visit_rows,
    _rays_to_rows, _span_candidates, _span_mask_to_lists)
from toroidal_ray_tracing_tpu.ops.tri_kernel import TRI_SUB

TRI_STREAM_MIN = 65536   # tris: above this the resident kernel's VMEM
                         # tables (~244 B/tri with attrs) blow the ~16 MB
                         # scoped-VMEM budget; Woop/attr tables then stay
                         # in HBM and superblocks stream through a double-
                         # buffered VMEM scratch (the BLAS analog for
                         # driver-managed huge meshes, SURVEY.md §2B)
STREAM_GATE_BOXES = int(os.environ.get("TRT_STREAM_BOXES", "512"))
                         # superblock-count target for the XLA gate for
                         # SMALL streamed meshes (the SB cap below binds
                         # first on big ones). Env knob TRT_STREAM_BOXES.
STREAM_HIER_MIN = int(os.environ.get("TRT_STREAM_HIER", "0"))
                         # superblock count above which the exact XLA gate
                         # runs HIERARCHICALLY (_chunk_visit_lists_hier:
                         # conservative interval L1 per span + exact L2 on
                         # top-32 candidates) instead of dense O(S x rays).
                         # MEASURED AND DISABLED on config 8 (PERF.md
                         # round 4): the hier gate only reached 47.4 ms vs
                         # 52.9 dense (top_k + scatter swallow the L1
                         # pair savings) while interval-L1 overflow
                         # fallbacks inflated kernel span-dispatches 2.3x
                         # (33.3k -> 77.9k) — end-to-end 12.9 -> 11.7
                         # Mrays/s. Kept behind TRT_STREAM_HIER (=min S)
                         # for meshes where S >> 3340 flips the trade;
                         # 0 = always dense.
STREAM_NOGATE = os.environ.get("TRT_STREAM_NOGATE", "0") == "1"
                         # skip the in-kernel span-vs-superblock slab +
                         # vector->scalar reduce and run the Woop pass
                         # unconditionally on every visited (block, span):
                         # at SB = 512 the (512, 128) Woop is ~0.5 us while
                         # the slab + reduce chain is ~1.1 us — the gate
                         # can cost more than the work it prunes. A/B knob.
STREAM_DIAG = os.environ.get("TRT_STREAM_DIAG", "")
                         # TIMING-ONLY diagnostic modes (results are WRONG;
                         # never set outside scripts/c8_stream_split.py):
                         # "nodma"  — visit walk + span dispatch over
                         #            whatever is resident in the scratch
                         #            slot (no HBM copies): isolates the
                         #            DMA cost of the streamed design.
                         # "nospan" — DMA walk only, span dispatch skipped:
                         #            isolates the per-visit DMA + loop
                         #            overhead from the span chains.
STREAM_SUB = int(os.environ.get("TRT_STREAM_SUB", "0"))
                         # override the span width (0 = TRI_SUB default):
                         # wider spans amortize the per-dispatch floor at
                         # proportionally more Woop work per dispatch.
STREAM_MAX_SB = int(os.environ.get("TRT_STREAM_SB", "512"))
                         # tris per superblock cap. Swept end-to-end on
                         # config 8 (1.18M tris, 1080p sequence, same
                         # session): 3456 (old default) = 3.7 Mrays/s,
                         # 2048 = 4.9, 1024 = 7.0, **512 = 12.9**,
                         # 256 = 9.5 (the O(S x rays) exact gate starts
                         # to dominate). Coarse blocks brute-force whole
                         # superblocks per visited span — the roofline
                         # model (cluster-granularity) implied ~27x
                         # overtest at 3456. Env knob TRT_STREAM_SB.
                         # (Meshes >>10M tris will want a hierarchical
                         # gate before more SB shrinking: S = C/4 boxes
                         # make the gate itself O(S x N).)


def _span_dispatch(box_ref, o_ref, d_ref, tmax_ref, t_out, idx_out, u_out,
                   v_out, attr_out, wbuf, abuf, c, slot, ls, *,
                   sb_tris: int, emit_attrs: bool, occlusion: bool):
    """One (superblock, span) dispatch: span-vs-box slab against the
    running best, then a Woop pass over the streamed block in VMEM slot
    `slot`. `ls` indexes the span's lanes — a static python slice (the
    per-tile kernel) or a pl.ds with a 128-aligned dynamic offset (the
    grouped kernel); every value is loaded fresh from a ref, so both
    forms see clean offset-free layouts. Shared by both streamed kernels
    so the slab/Woop math can never drift between them."""
    oh = o_ref[:, ls]                 # (4, sub)
    d = d_ref[:, ls]
    tmax = tmax_ref[0:1, ls]
    t_cur = t_out[0:1, ls]
    if occlusion:
        bound = jnp.where(t_cur < BIG, F32(-1.0), tmax)
    else:
        bound = jnp.minimum(t_cur, tmax)

    if STREAM_NOGATE:
        # exact visit bits already gate the dispatch; the Woop hit
        # check below still bounds by tmax, and the argmin/any-hit
        # accumulators absorb redundant finds — `bound` pruning is a
        # perf device only, never a correctness one
        del bound
        box_hit = None
    else:
        # span-vs-superblock slab against the running best (SMEM
        # boxes, flat-packed: [lo0 lo1 lo2 hi0 hi1 hi2] at 6*c)
        ox, oy, oz = oh[0:1], oh[1:2], oh[2:3]
        invx = _inv_dir(d[0:1])
        invy = _inv_dir(d[1:2])
        invz = _inv_dir(d[2:3])
        b6 = 6 * c
        t0x = (box_ref[0, b6 + 0] - ox) * invx
        t1x = (box_ref[0, b6 + 3] - ox) * invx
        t0y = (box_ref[0, b6 + 1] - oy) * invy
        t1y = (box_ref[0, b6 + 4] - oy) * invy
        t0z = (box_ref[0, b6 + 2] - oz) * invz
        t1z = (box_ref[0, b6 + 5] - oz) * invz
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

    if box_hit is None:
        _run_woop()
    else:
        pl.when(jnp.any(box_hit))(_run_woop)


def _tri_stream_kernel(visit_ref, box_ref, o_ref, d_ref, tmax_ref,
                       w24_ref, *refs, sb_tris: int, sub: int,
                       emit_attrs: bool, occlusion: bool):
    """One grid step = one ray tile, walking its SUPERBLOCK visit list with
    double-buffered HBM->VMEM DMA of each visited superblock's packed Woop
    (24, sb_tris) and attr (37, sb_tris) tables. Structure otherwise
    mirrors _tri_kernel with cluster := sb_tris: the visit bits are exact
    per 128-lane span (gate over superblock AABBs), a dispatched
    (superblock, span) re-runs the slab against the running best from SMEM
    boxes, then one Woop pass over the whole streamed block.

    box_ref: (1, 6*Sp) f32 SMEM — superblock AABBs packed flat
    [lo0 lo1 lo2 hi0 hi1 hi2]*S. (A (S, 3) SMEM table pads every row to
    128 lanes — 42x waste, 836 KB at S=1670, straight past the 1 MB SMEM
    budget; the flat row packs densely, so superblock counts up to ~40k
    fit.)

    The DMA for visit entry v+1 is issued before entry v is processed, so
    at ~1.5 us of HBM traffic per block the copies hide behind the
    multi-us Woop pass of the previous block."""
    if emit_attrs:
        (a37_ref, t_out, idx_out, u_out, v_out, attr_out,
         wbuf, abuf, sems) = refs
    else:
        t_out, idx_out, u_out, v_out, wbuf, sems = refs
        a37_ref = abuf = attr_out = None
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
        _span_dispatch(box_ref, o_ref, d_ref, tmax_ref, t_out, idx_out,
                       u_out, v_out, attr_out if emit_attrs else None,
                       wbuf, abuf, c, slot, ls, sb_tris=sb_tris,
                       emit_attrs=emit_attrs, occlusion=occlusion)

    dma_on = STREAM_DIAG != "nodma"
    span_on = STREAM_DIAG != "nospan"

    @pl.when(cnt > 0)
    def _prologue():
        if dma_on:
            _copy(0, 0)

    def body(v, _):
        slot = jax.lax.rem(v, 2)

        if dma_on:
            @pl.when(v + 1 < cnt)
            def _prefetch():
                _copy(v + 1, jax.lax.rem(v + 1, 2))

            _wait(slot)
        c = visit_ref[0, 1 + 2 * v]
        bits = visit_ref[0, 2 + 2 * v]
        if span_on:
            for j in range(n_sub):
                ls = slice(j * sub, (j + 1) * sub)

                @pl.when(((bits >> j) & 1) == 1)
                def _(c=c, slot=slot, ls=ls):
                    _span(c, slot, ls)
        else:
            # keep the scalar reads live so the walk isn't DCE'd (vector
            # store — Mosaic cannot store scalars to VMEM)
            val = (c + bits).astype(F32) + BIG
            t_out[0:1, 0:128] = jnp.minimum(t_out[0:1, 0:128], val)

        return 0

    jax.lax.fori_loop(0, cnt, body, 0)


def _tri_stream_grouped_kernel(blocks_ref, box_ref, o_ref, d_ref, tmax_ref,
                               w24_ref, *refs, sb_tris: int, sub: int,
                               nw: int, vcap: int, emit_attrs: bool,
                               occlusion: bool):
    """Grouped variant: one grid step = G ray tiles resident at once, so
    each visited superblock streams through VMEM ONCE PER GROUP instead of
    once per tile (cross-tile DMA reuse, VERDICT r4 item 1 — the per-tile
    walk re-streamed the same blocks 6.2x at G=16 on config 8's primary
    rays, scripts/c8_group_diag.py).

    blocks_ref: (1, Bp) SMEM — this group's packed visit row
    [nb, (block_id, bits_w0..bits_w{nw-1}) * vcap]: the UNION of the
    group's visited superblocks, front-to-back, each with spg = G*n_sub
    span-candidate bits packed into nw i32 words. The span walk checks
    whole words first (a zero word skips 32 spans at one scalar test), so
    the bit-scan count stays at the per-tile kernel's level while the
    DMA/wait/loop overhead drops with the union.

    Span dispatch uses pl.ds lane offsets ((w*32+j)*sub, provably
    128-aligned) into the (4, G*ray_tile) resident ray rows — one copy of
    the span body in the binary, unlike a static per-span unroll."""
    if emit_attrs:
        (a37_ref, t_out, idx_out, u_out, v_out, attr_out,
         wbuf, abuf, sems) = refs
    else:
        t_out, idx_out, u_out, v_out, wbuf, sems = refs
        a37_ref = abuf = attr_out = None
    R = o_ref.shape[1]

    t_out[...] = jnp.full((1, R), BIG, F32)
    idx_out[...] = jnp.zeros((1, R), jnp.int32)
    u_out[...] = jnp.zeros((1, R), F32)
    v_out[...] = jnp.zeros((1, R), F32)
    if emit_attrs:
        attr_out[...] = jnp.zeros((21, R), F32)

    cnt = blocks_ref[0, 0]
    ew = 1 + nw   # words per entry

    def _copy(v, slot):
        c = blocks_ref[0, 1 + ew * v]
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

    @pl.when(cnt > 0)
    def _prologue():
        _copy(0, 0)

    def body(v, _):
        slot = jax.lax.rem(v, 2)

        @pl.when(v + 1 < cnt)
        def _prefetch():
            _copy(v + 1, jax.lax.rem(v + 1, 2))

        _wait(slot)
        base = 1 + ew * v
        c = blocks_ref[0, base]
        for w in range(nw):
            bits = blocks_ref[0, base + 1 + w]

            @pl.when(bits != 0)
            def _(bits=bits, w=w, c=c, slot=slot):
                def bitloop(j, _):
                    @pl.when(((bits >> j) & 1) == 1)
                    def _():
                        off = pl.multiple_of((w * 32 + j) * sub, 128)
                        _span_dispatch(
                            box_ref, o_ref, d_ref, tmax_ref, t_out,
                            idx_out, u_out, v_out, attr_out, wbuf, abuf,
                            c, slot, pl.ds(off, sub), sb_tris=sb_tris,
                            emit_attrs=emit_attrs, occlusion=occlusion)
                    return 0

                jax.lax.fori_loop(0, 32, bitloop, 0)

        return 0

    jax.lax.fori_loop(0, cnt, body, 0)


def _group_visit_rows(span_mask, rank, ngroups, spg, vcap):
    """(spans, S) per-span candidate mask -> per-GROUP packed union rows
    [nb, (id, bits_w0..bits_w{nw-1}) * vcap] for the grouped kernel, plus
    the overflow flag (any group's union exceeding vcap falls back to the
    per-tile kernel — correctness never depends on the cap).

    The sort here is (ngroups, S) — G x smaller than the per-tile pack's
    (nt, S), which pays for the extra word packing."""
    S = span_mask.shape[1]
    vcap = min(vcap, S)   # a union can never exceed S blocks
    nw = -(-spg // 32)
    spm = span_mask.reshape(ngroups, spg, S)
    anym = jnp.any(spm, axis=1)                        # (ngroups, S)
    nb = jnp.sum(anym, axis=1).astype(jnp.int32)       # (ngroups,)
    words = []
    for w in range(nw):
        bw = jnp.zeros((ngroups, S), jnp.int32)
        for j in range(min(32, spg - 32 * w)):
            bw = bw | (spm[:, 32 * w + j, :].astype(jnp.int32) << j)
        words.append(bw)
    ids = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :],
                           (ngroups, S))
    key = rank[None, :] + jnp.where(anym, 0, S).astype(jnp.int32)
    key = jnp.broadcast_to(key, (ngroups, S))
    sorted_ = jax.lax.sort((key, ids) + tuple(words), dimension=1,
                           num_keys=1)
    ids_s = sorted_[1][:, :vcap]
    words_s = [wv[:, :vcap] for wv in sorted_[2:]]
    # entries beyond nb carry garbage ids but ZERO bits only if we mask:
    live = jnp.arange(vcap)[None, :] < nb[:, None]
    ids_s = jnp.where(live, ids_s, 0)
    words_s = [jnp.where(live, wv, 0) for wv in words_s]
    inter = jnp.stack([ids_s] + words_s, axis=2).reshape(
        ngroups, (1 + nw) * vcap)
    nb_c = jnp.minimum(nb, vcap)[:, None]
    row = jnp.concatenate([nb_c, inter], axis=1)
    Bp = ((row.shape[1] + 127) // 128) * 128
    if Bp != row.shape[1]:
        row = jnp.concatenate(
            [row, jnp.zeros((ngroups, Bp - row.shape[1]), jnp.int32)],
            axis=1)
    spec = pl.BlockSpec((1, Bp), lambda i: (0, i),
                        memory_space=pltpu.SMEM)
    overflow = jnp.any(nb > vcap)
    return row.reshape(1, ngroups * Bp), spec, overflow


STREAM_GROUP = int(os.environ.get("TRT_STREAM_GROUP", "0"))
                         # ray tiles resident per grouped-kernel grid step
                         # (0 = off, the default). Each visited superblock
                         # DMAs once per GROUP: G=16 cut DMA count 6.2x on
                         # config 8's primary pass (scripts/c8_group_diag
                         # .py) — but the same-session sequence A/B was
                         # PERF-NEUTRAL (12.95 vs 12.87 Mrays/s; PERF.md
                         # round 5): double-buffering already hides the
                         # streamed bytes, so the row is span-chain-bound,
                         # not DMA-bound. Kept (parity- and smoke-tested)
                         # for workloads that are genuinely DMA-bound.
                         # VMEM at G=16: ~2.2 MB of rays+outputs beside
                         # the 256 KB scratch.
STREAM_VCAP = int(os.environ.get("TRT_STREAM_VCAP", "1024"))
                         # union superblocks per group the packed SMEM row
                         # can hold (measured max 684 at G=16 on config
                         # 8's primaries); overflow falls back to the
                         # per-tile kernel via lax.cond — never drops work


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
    sub0 = STREAM_SUB or TRI_SUB
    sub = sub0 if ray_tile % sub0 == 0 else ray_tile
    assert n % ray_tile == 0 and ray_tile // sub <= MAX_SPANS
    use_hier = bool(STREAM_HIER_MIN) and S >= STREAM_HIER_MIN
    use_group = STREAM_GROUP > 1 and not STREAM_DIAG and not use_hier
    n0 = n
    if use_group:
        # pad the batch so whole groups of G ray tiles exist; pad rays are
        # dead (tmax = 0) — the gate's live term drops their spans, so
        # they cost no visits, only lanes
        gpad = (-n) % (STREAM_GROUP * ray_tile)
        if gpad:
            origins = jnp.concatenate(
                [origins, jnp.zeros((3, gpad), F32)], axis=1)
            dirs = jnp.concatenate(
                [dirs, jnp.ones((3, gpad), F32)], axis=1)
            tmax = jnp.concatenate([tmax, jnp.zeros((gpad,), F32)])
            n = n0 + gpad
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
    # superblock boxes flat-packed for SMEM (see _tri_stream_kernel)
    box6 = jnp.concatenate([sb_lo, sb_hi], axis=1).reshape(1, 6 * S)
    pad6 = (-6 * S) % 128
    if pad6:
        box6 = jnp.concatenate([box6, jnp.zeros((1, pad6), F32)], axis=1)

    if emit_attrs:
        a0, a1, a2 = attr_tables
        # rows padded 37 -> 40: Mosaic DMA slices must be 8-aligned on the
        # sublane dim
        a37 = jnp.concatenate([a0, a1, a2, jnp.zeros((3, T), F32)], axis=0)
        if Tp != T:
            a37 = jnp.concatenate([a37, jnp.zeros((40, Tp - T), F32)],
                                  axis=1)
    else:
        a37 = None

    hbm = pl.BlockSpec(memory_space=pl.ANY)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def _launch(kernel, grid, tile, visit_packed, visit_spec, **kw):
        ray_spec = pl.BlockSpec((4, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        row_spec = pl.BlockSpec((1, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        in_specs = [visit_spec, smem, ray_spec, ray_spec, row_spec, hbm]
        operands = [visit_packed, box6, oh, d4, tm, w24]
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
            in_specs.append(hbm)
            operands.append(a37)
            out_specs.append(pl.BlockSpec((21, tile), lambda i: (0, i),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((21, n), F32))
            scratch.insert(1, pltpu.VMEM((2, 40, sb_tris), F32))
        return tuple(pl.pallas_call(
            functools.partial(kernel, sb_tris=sb_tris, sub=sub,
                              emit_attrs=emit_attrs, occlusion=occlusion,
                              **kw),
            grid=(grid,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=_interpret(),
        )(*operands))

    n_sub = ray_tile // sub
    if use_group:
        # cross-tile DMA reuse: ONE exact candidate mask feeds either the
        # grouped union pack (each superblock DMAs once per G-tile group)
        # or, when a group's union overflows the SMEM row cap, the
        # per-tile pack — lax.cond runs only the taken branch, so the
        # fallback's sort costs nothing on the common path
        span_mask = _span_candidates(origins, dirs, tmax, sb_lo, sb_hi,
                                     sub)
        G = STREAM_GROUP
        spg = G * n_sub
        nw = -(-spg // 32)
        ngroups = nt // G
        vcap = min(STREAM_VCAP, S)
        grow, gspec, overflow = _group_visit_rows(span_mask, rank,
                                                  ngroups, spg, vcap)

        def _tile_branch(_):
            ids, bits, cnt = _span_mask_to_lists(span_mask, rank, nt,
                                                 n_sub)
            packed, vspec = _pack_visit_rows(ids, bits, cnt, nt, S)
            return _launch(_tri_stream_kernel, nt, ray_tile, packed,
                           vspec)

        def _group_branch(_):
            return _launch(_tri_stream_grouped_kernel, ngroups,
                           G * ray_tile, grow, gspec, nw=nw, vcap=vcap)

        out = jax.lax.cond(overflow, _tile_branch, _group_branch, None)
    else:
        gate = _chunk_visit_lists_hier if use_hier else _chunk_visit_lists
        vids, vbits, cnt = gate(origins, dirs, tmax, sb_lo, sb_hi,
                                rank, ray_tile, sub)
        packed, visit_spec = _pack_visit_rows(vids, vbits, cnt, nt, S)
        out = _launch(_tri_stream_kernel, nt, ray_tile, packed, visit_spec)

    t, idx, u, v = out[:4]
    res = (t.reshape(n)[:n0], idx.reshape(n)[:n0], u.reshape(n)[:n0],
           v.reshape(n)[:n0])
    return res + ((out[4][:, :n0],) if emit_attrs else ())
