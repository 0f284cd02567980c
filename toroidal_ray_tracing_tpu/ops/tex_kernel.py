"""In-kernel texture gather — the hardware sampler's fetch stage on the VPU.

XLA lowers a per-ray flat (N,) gather to ~18 ms per 2M rays REGARDLESS of
table size (measured, scripts/gather_bench.py) — a compiler floor, not an
HBM limit; two mip levels of quad-packed taps cost ~36 ms of config 7's
sample pass. Mosaic instead exposes per-vreg gathers (tpu.dynamic_gather
via jnp.take_along_axis: out[a,b] = x[idx[a,b], b] along sublanes, or
x[a, idx[a,b]] along lanes), so a (8, 128) table vreg answers a whole
128-ray span's lookups in TWO chained gather ops:

    g = take_along_axis(block, c_bcast, axis=1)   # g[a,l] = block[a, c_l]
    v = take_along_axis(g, r_bcast, axis=0)       # v[a,l] = block[r_l, c_l]

with (r, c) = the within-block (sublane, lane) coordinates broadcast
across sublanes (the composition is only correct for sublane-constant
indices — hence spans of 128 LANE rays, not folded tiles).

Rays are traced in block-major pixel order (cameras/pinhole), so a span's
texel indices cluster: an XLA prepass computes each span's [block_lo,
block_hi] index range per mip level (masked min/max — two segment reduces,
~0.1 ms), and the kernel walks only that range, select-accumulating hits.
The atlas itself (quad-packed u32 words, TextureAtlas.data4q) stays fully
VMEM-resident — the analog of the reference sampler's texture cache
(raytrace.rchit:79-84 samples inside the hit shader on hardware too).

Replaces: XLA's gather lowering for `_bilinear_level`'s two row-gathers
(trace/shade.py) when the atlas fits VMEM; shade falls back to the XLA
path otherwise (TRT_TEX_KERNEL=0 forces the fallback for A/B).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from toroidal_ray_tracing_tpu.ops.kernel_common import _interpret

I32 = jnp.int32

TEX_KERNEL_ENABLE = os.environ.get("TRT_TEX_KERNEL", "1") == "1"
TEX_KERNEL_MAX_TEXELS = 400_000   # ~4.6 MB of i32x3 VMEM table (covers a
                                  # 512x512 texture + full mip chain at
                                  # ~350k texels); larger atlases fall back
                                  # to the XLA gather, which is
                                  # table-size-blind
TEX_TILE = 1024                   # rays per grid step (8 spans x 128 lanes)
_SPAN = 128
_NSPAN = TEX_TILE // _SPAN


def _tex_kernel(rng_ref, f0_ref, f1_ref, tab_ref, out_ref, *, B: int):
    """One grid step = 1024 rays. For each mip level k and 128-lane span j,
    walk the span's [blo, bhi] table-block range (SMEM words) and gather
    each ray's quad word per channel from the (8, 128) block vreg.

    rng_ref: (1, 128) SMEM — this tile's packed ranges: per (level k,
    span j) FOUR words at [k*4*_NSPAN + 4*j ...] = [loA, hiA, loB, hiB],
    the span's mean-split block intervals (bimodal index sets — a span
    crossing a repeat-wrap boundary or a mip-level boundary clusters at
    two far-apart block ranges; one [lo, hi] interval would walk the
    whole gap, measured mean 19 blocks on config 7 vs ~3 post-split).
    f0/f1_ref: (1, TEX_TILE) flat texel indices (level 0' and 1' of the
    trilinear pair). tab_ref: (3*B*8, 128) i32 — channel-major blocked
    atlas. out_ref: (6, TEX_TILE) i32 — rows 3k+ch = level k channel ch.
    """
    out_ref[...] = jnp.zeros((6, TEX_TILE), I32)

    for k, f_ref in enumerate((f0_ref, f1_ref)):
        for j in range(_NSPAN):
            ls = slice(j * _SPAN, (j + 1) * _SPAN)
            f = jnp.broadcast_to(f_ref[0:1, ls], (8, _SPAN))
            c = f & 127
            r = (f >> 7) & 7
            b = f >> 10
            w0 = k * 4 * _NSPAN + 4 * j

            def body(bb, _, c=c, r=r, b=b, ls=ls, k=k):
                mask = (b == bb)[0:1, :]
                for ch in range(3):
                    base = pl.multiple_of((ch * B + bb) * 8, 8)
                    tb = tab_ref[pl.ds(base, 8), :]            # (8, 128)
                    g = jnp.take_along_axis(tb, c, axis=1)
                    v = jnp.take_along_axis(g, r, axis=0)
                    row = 3 * k + ch
                    cur = out_ref[row:row + 1, ls]
                    out_ref[row:row + 1, ls] = jnp.where(mask, v[0:1, :],
                                                         cur)
                return 0

            # empty ranges (no valid ray on that side) have lo > hi:
            # zero iterations
            jax.lax.fori_loop(rng_ref[0, w0], rng_ref[0, w0 + 1] + 1,
                              body, 0)
            jax.lax.fori_loop(rng_ref[0, w0 + 2], rng_ref[0, w0 + 3] + 1,
                              body, 0)


def _span_ranges(f, valid, n, B):
    """(N,) flat indices -> per-(tile, span) MEAN-SPLIT block range pairs,
    packed [loA, hiA, loB, hiB]. A span's block set is often bimodal (uv
    repeat-wrap puts rays at both edges of a level; trilinear taps mix
    adjacent mip levels), so one [lo, hi] interval walks the whole gap;
    splitting at the midpoint covers each cluster tightly. Unimodal spans
    cost nothing extra: the two sub-ranges tile the original. Masked
    reduces: sides with no valid ray get lo > hi (zero kernel iterations).
    """
    nt = n // TEX_TILE
    b = (f >> 10).reshape(nt, _NSPAN, _SPAN)
    v = valid.reshape(nt, _NSPAN, _SPAN)
    big = B + 1

    def rng(m):
        lo = jnp.min(jnp.where(m, b, big), axis=2)
        hi = jnp.max(jnp.where(m, b, -1), axis=2)
        return lo, hi

    lo0, hi0 = rng(v)
    mid = (lo0 + hi0) >> 1
    loA, hiA = rng(v & (b <= mid[:, :, None]))
    loB, hiB = rng(v & (b > mid[:, :, None]))
    return jnp.stack([loA, hiA, loB, hiB], axis=2).reshape(nt, 4 * _NSPAN)


@functools.partial(jax.jit, static_argnames=())
def quad_gather_pallas(data4q, f0, f1, valid):
    """Gather the quad-packed words of two mip taps per ray.

    data4q: (T, 3) u32 atlas; f0/f1: (N,) i32 flat texel indices (already
    include the level/texture offset); valid: (N,) bool — invalid rays
    return zero words and do not widen any span's block range.

    Returns (q0, q1): each (3, N) u32.
    """
    T = data4q.shape[0]
    n = f0.shape[0]
    pad_n = (-n) % TEX_TILE
    if pad_n:
        zi = jnp.zeros((pad_n,), I32)
        f0 = jnp.concatenate([f0, zi])
        f1 = jnp.concatenate([f1, zi])
        valid = jnp.concatenate([valid, jnp.zeros((pad_n,), bool)])
    np_ = n + pad_n
    nt = np_ // TEX_TILE

    B = -(-T // TEX_TILE)
    tab = jax.lax.bitcast_convert_type(jnp.asarray(data4q), I32)  # (T, 3)
    if B * TEX_TILE != T:
        tab = jnp.concatenate(
            [tab, jnp.zeros((B * TEX_TILE - T, 3), I32)], axis=0)
    tab = tab.T.reshape(3 * B * 8, 128)

    f0 = jnp.asarray(f0, I32)
    f1 = jnp.asarray(f1, I32)
    r0 = _span_ranges(f0, valid, np_, B)
    r1 = _span_ranges(f1, valid, np_, B)
    # per-tile packed row: [level0 range pairs (4*_NSPAN), level1 pairs],
    # padded to 128 lanes (SMEM blocks need 128-aligned rows)
    packed = jnp.concatenate(
        [r0, r1, jnp.zeros((nt, 128 - 8 * _NSPAN), I32)], axis=1)

    row = lambda: pl.BlockSpec((1, TEX_TILE), lambda i: (0, i),  # noqa: E731
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_tex_kernel, B=B),
        grid=(nt,),
        in_specs=[pl.BlockSpec((1, 128), lambda i: (0, i),
                               memory_space=pltpu.SMEM),
                  row(), row(),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((6, TEX_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((6, np_), I32),
        interpret=_interpret(),
    )(packed.reshape(1, nt * 128), f0.reshape(1, np_), f1.reshape(1, np_),
      tab)
    out = jax.lax.bitcast_convert_type(out, jnp.uint32)
    return out[0:3, :n], out[3:6, :n]


def kernel_applicable(atlas) -> bool:
    """Whether the in-kernel gather path can serve this atlas."""
    return (TEX_KERNEL_ENABLE
            and int(np.asarray(atlas.data4q.shape[0])) <= TEX_KERNEL_MAX_TEXELS
            and int(np.asarray(atlas.data4q.shape[0])) > 1)
