"""Shared Mosaic-kernel infrastructure: ray row packing, visit-list ABI,
slab tests, and the vectorized XLA visit-list gate (the TLAS traversal
analog, SURVEY.md §2B) used by all trace kernels.

Split out of ops/trace_kernel.py (round 4): the triangle, streamed-triangle
and torus kernels all share this layout/ABI — keeping it in one module
guarantees the gate and the in-kernel refines can never drift (the gate
must stay a superset of what the kernels test).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = np.float32
BIG = F32(3.0e38)
TMIN = F32(0.001)

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
    n = origins.shape[1]
    nt = n // ray_tile
    n_sub = ray_tile // sub
    assert n_sub <= MAX_SPANS, n_sub
    span_mask = _span_candidates(origins, dirs, tmax, clo, chi, sub)
    return _span_mask_to_lists(span_mask, rank, nt, n_sub)


def _span_candidates(origins, dirs, tmax, clo, chi, sub):
    """The exact per-(span, box) candidate mask underlying the gate:
    every ray slab-tested against every box (vectorized, box-blocked so
    temporaries stay ~(B, N)), reduced to "any candidate" per `sub`-lane
    span. Returns (N // sub, C) bool. Shared by the per-tile and grouped
    packers so both kernels gate on identical candidates."""
    C = clo.shape[0]
    n = origins.shape[1]
    S = n // sub

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
    return span_mask.reshape(Cb, S)[:C].T            # (S, C)


def _span_mask_to_lists(span_mask, rank, nt, n_sub):
    """(spans, C) per-span candidate mask -> per-TILE compacted visit
    lists (the sort/pack tail shared by the dense and hierarchical
    gates). Returns (ids (nt, C), bits (nt, C), cnt (nt, 1)) i32."""
    C = span_mask.shape[1]
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


def _chunk_visit_lists_hier(origins, dirs, tmax, clo, chi, rank, ray_tile,
                            sub, maxv: int = 32):
    """Hierarchical variant of _chunk_visit_lists for LARGE box counts.

    The dense gate's cost is O(C x N) exact slabs — 53 ms per 2M-ray pass
    at C = 3340 (config 8). This computes the same per-span candidate
    bits in two levels:

      L1 — conservative interval-frustum test per (span, box): each
      128-ray span is summarized by per-component origin/inv-direction
      intervals over its VALID rays (NaN/dead rays masked out so they
      can't poison the interval), and the slab evaluates in interval
      arithmetic (4-product bounds; inv intervals straddling zero blow
      up to +/-inf = conservative pass). O(C x spans) — 128x fewer pairs
      than the dense gate. Strictly a SUPERSET of the exact per-ray test.
      (Interval gates were measured 4.3x looser than exact as FINAL
      lists — here they only feed L2, so looseness costs L2 flops, not
      kernel dispatches.)

      L2 — exact per-ray slab, but only on each span's top-`maxv`
      front-to-back L1 candidates (lax.top_k + a row gather of their
      boxes): O(N x maxv). Spans whose L1 candidate count exceeds maxv
      fall back to their (conservative) L1 bits — correctness never
      depends on maxv, only the kernel's visit efficiency.

    Same return contract as _chunk_visit_lists; with no L1 overflow the
    output is BIT-IDENTICAL to the dense gate (L1 superset + L2 exact).
    """
    C = clo.shape[0]
    n = origins.shape[1]
    Sp = n // sub
    nt = n // ray_tile
    n_sub = ray_tile // sub
    assert n_sub <= MAX_SPANS, n_sub

    inv = jnp.stack([_inv_dir(dirs[k]) for k in range(3)])     # (3, N)
    tm = jnp.minimum(tmax, BIG)
    valid = (jnp.isfinite(origins).all(axis=0)
             & jnp.isfinite(dirs).all(axis=0) & (tm > TMIN))   # (N,)

    def _ival(a):
        av = a.reshape(3, Sp, sub)
        m = valid.reshape(1, Sp, sub)
        lo = jnp.min(jnp.where(m, av, BIG), axis=2)            # (3, Sp)
        hi = jnp.max(jnp.where(m, av, -BIG), axis=2)
        return lo, hi

    o_lo, o_hi = _ival(origins)
    i_lo, i_hi = _ival(inv)
    tm_ub = jnp.max(jnp.where(valid, tm, 0.0).reshape(Sp, sub), axis=1)
    any_valid = jnp.any(valid.reshape(Sp, sub), axis=1)

    # L1: (Sp, C) conservative bits, blocked over boxes
    B = 32
    Cb = ((C + B - 1) // B) * B
    if Cb != C:
        pad = jnp.full((Cb - C, 3), F32(2.0e38))
        clo_b = jnp.concatenate([clo, pad])
        chi_b = jnp.concatenate([chi, pad])
    else:
        clo_b, chi_b = clo, chi

    def l1_block(boxes):
        lo_b, hi_b = boxes                                     # (B, 3)
        tn_lb = jnp.full((B, Sp), -BIG)
        tf_ub = jnp.full((B, Sp), BIG)
        for a in range(3):
            pmins, pmaxs = [], []
            for b in (lo_b[:, a:a + 1], hi_b[:, a:a + 1]):     # (B, 1)
                u1 = b - o_hi[a][None, :]                      # (B, Sp)
                u2 = b - o_lo[a][None, :]
                p = [u1 * i_lo[a][None, :], u1 * i_hi[a][None, :],
                     u2 * i_lo[a][None, :], u2 * i_hi[a][None, :]]
                pmins.append(jnp.minimum(jnp.minimum(p[0], p[1]),
                                         jnp.minimum(p[2], p[3])))
                pmaxs.append(jnp.maximum(jnp.maximum(p[0], p[1]),
                                         jnp.maximum(p[2], p[3])))
            tn_lb = jnp.maximum(tn_lb, jnp.minimum(pmins[0], pmins[1]))
            tf_ub = jnp.minimum(tf_ub, jnp.maximum(pmaxs[0], pmaxs[1]))
        return ((tn_lb <= jnp.minimum(tf_ub, tm_ub[None, :]))
                & (tf_ub >= TMIN) & any_valid[None, :])        # (B, Sp)

    cand = jax.lax.map(l1_block, (clo_b.reshape(-1, B, 3),
                                  chi_b.reshape(-1, B, 3)))
    cand = cand.reshape(Cb, Sp)[:C].T                          # (Sp, C)

    # top-maxv candidates per span, front-to-back
    sel_key = jnp.where(cand, (C - rank)[None, :], -1)         # (Sp, C)
    topv, ids = jax.lax.top_k(sel_key, maxv)                   # (Sp, maxv)
    entry_ok = topv >= 0
    n_cand = jnp.sum(cand, axis=1)                             # (Sp,)
    overflow = n_cand > maxv

    # L2: exact per-ray slab on the candidates, blocked over span chunks
    blo = clo[ids]                                             # (Sp, V, 3)
    bhi = chi[ids]
    SPC = 2048 if Sp % 2048 == 0 else (1024 if Sp % 1024 == 0 else Sp)
    nchunks = Sp // SPC

    def l2_chunk(args):
        lo_c, hi_c, o_c, i_c, tm_c = args
        # lo/hi: (SPC, V, 3); o/i: (3, SPC, sub); tm: (SPC, sub)
        tn = jnp.full((SPC, maxv, sub), -BIG)
        tf = jnp.full((SPC, maxv, sub), BIG)
        for a in range(3):
            t0 = (lo_c[:, :, a, None] - o_c[a][:, None, :]) \
                * i_c[a][:, None, :]
            t1 = (hi_c[:, :, a, None] - o_c[a][:, None, :]) \
                * i_c[a][:, None, :]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        hit = (tn <= jnp.minimum(tf, tm_c[:, None, :])) & (tf >= TMIN) \
            & (tm_c[:, None, :] > TMIN)
        return jnp.any(hit, axis=2)                            # (SPC, V)

    exact = jax.lax.map(l2_chunk, (
        blo.reshape(nchunks, SPC, maxv, 3),
        bhi.reshape(nchunks, SPC, maxv, 3),
        origins.reshape(3, nchunks, SPC, sub).transpose(1, 0, 2, 3),
        inv.reshape(3, nchunks, SPC, sub).transpose(1, 0, 2, 3),
        tm.reshape(nchunks, SPC, sub),
    )).reshape(Sp, maxv)
    exact = exact & entry_ok

    # densify back to (Sp, C) and apply the overflow fallback (L1 bits)
    span_rows = jnp.broadcast_to(jnp.arange(Sp)[:, None], (Sp, maxv))
    span_mask = jnp.zeros((Sp, C), bool).at[span_rows, ids].max(exact)
    span_mask = jnp.where(overflow[:, None], cand, span_mask)
    return _span_mask_to_lists(span_mask, rank, nt, n_sub)
