"""Closest-hit / any-hit queries on device — the `traceRayEXT` replacement.

Two interchangeable backends:

* `jnp` reference path (this module): Woop-transform matmuls + argmin,
  chunked over rays with `lax.map` so the (rays x tris) intermediates stay
  bounded. XLA places the two thin matmuls on the MXU.
* Pallas fast path (`ops/trace_kernel.py`): same math fused into a
  flash-attention-style kernel — the (rays x tris) matrix never leaves VMEM,
  with per-tile cluster culling. Selected via `backend="pallas"`.

Multi-chip: intersection geometry can be *sharded over primitives* (a
"tensor-parallel" axis). Each device tests its triangle/torus slice
(`GeomSlice`), then per-ray winners combine with a lexicographic
`lax.pmin` over the mesh axis — the renderer's only collective
(SURVEY.md §2C: the reference's single-GPU pipeline has none at all).

Hit kinds: 0 = triangle, 1 = torus, -1 = miss (the miss-shader branch,
raytrace.rmiss).
"""

from __future__ import annotations

from typing import NamedTuple, Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from toroidal_ray_tracing_tpu.geom import torus as torus_geom
from toroidal_ray_tracing_tpu.geom.triangle import intersect_woop
from toroidal_ray_tracing_tpu.scene.types import Scene

F32 = np.float32
BIG = F32(3.0e38)
TMIN = F32(0.001)     # raytrace.rgen:61
TMAX = F32(10000.0)   # raytrace.rgen:62
_INT_MAX = np.int32(2147483647)


class ShadeAttrs(NamedTuple):
    """Interpolated shading attributes of the winning primitive, emitted by
    the Pallas kernels (pick-masked MXU matmuls over the primitive tables in
    VMEM). XLA row-gathers run ~1 row/cycle on TPU — gathering these 9
    tables in shade() cost more than the intersection itself. Vector fields
    are ROWS ((3, N)), the kernels' native layout — shade consumes them
    without any transpose."""

    pos: Any         # (3, N) barycentric-exact position (triangles only)
    nrm: Any         # (3, N) unnormalized shading normal (world space)
    uv: Any          # (2, N)
    ambient: Any     # (3, N)
    diffuse: Any     # (3, N)
    specular: Any    # (3, N)
    shininess: Any   # (N,)
    illum: Any       # (N,) i32
    texture_id: Any  # (N,) i32
    tex_density: Any  # (N,) uv-texel density for mip LOD (tris only)


class Hit(NamedTuple):
    t: Any       # (N,) f32, BIG on miss
    kind: Any    # (N,) i32: 0 tri, 1 torus, -1 miss
    prim: Any    # (N,) i32 index into triangles or tori (global)
    u: Any       # (N,) f32 triangle barycentric
    v: Any       # (N,) f32
    attrs: Any = None  # Optional[ShadeAttrs] (pallas backend, want_attrs)


class GeomSlice(NamedTuple):
    """The intersection-only geometry a device tests: possibly a shard of the
    scene's primitives. Offsets map local indices back to global ids.

    Culling metadata travels with the slice so the Pallas kernels keep their
    cluster/bounding-sphere prepasses under primitive sharding (each shard
    culls against its own clusters — the TLAS-per-shard analog)."""

    woop_o: Any      # (4, 3, Tl)
    woop_d: Any      # (3, 3, Tl)
    tri_offset: Any  # () i32
    cluster_lo: Any  # (Cl, 3) — AABBs of this slice's triangle clusters
    cluster_hi: Any  # (Cl, 3)
    tor_w2o: Any     # (Kl, 3, 4)
    tor_major: Any   # (Kl,)
    tor_minor: Any   # (Kl,)
    tor_offset: Any  # () i32
    tor_center: Any  # (Kl, 3) — world bounding-sphere centers
    tor_bound: Any   # (Kl,)   — world bounding-sphere radii


def geom_from_scene(scene: Scene) -> GeomSlice:
    return GeomSlice(
        woop_o=scene.triangles.woop_o,
        woop_d=scene.triangles.woop_d,
        tri_offset=jnp.asarray(0, jnp.int32),
        cluster_lo=scene.cluster_lo,
        cluster_hi=scene.cluster_hi,
        tor_w2o=scene.tori.world_to_obj,
        tor_major=scene.tori.major_radius,
        tor_minor=scene.tori.minor_radius,
        tor_offset=jnp.asarray(0, jnp.int32),
        tor_center=scene.tori.center,
        tor_bound=scene.tori.bound_radius,
    )


def _ray_chunk(n_rays: int, n_prims: int, budget: int = 1 << 24) -> int:
    """Rays per lax.map chunk so chunk*T intermediates stay ~64 MB."""
    c = max(256, budget // max(n_prims, 1))
    c = 1 << (c.bit_length() - 1)
    while n_rays % c != 0 and c > 1:
        c //= 2
    return max(c, 1)


def _tri_hit_chunk(geom: GeomSlice, o, d, tmax):
    """Per-chunk nearest triangle via the Woop test. o/d: (c, 3)."""
    t, u, v, _ = intersect_woop(jnp, o, d, geom.woop_o, geom.woop_d,
                                TMIN, tmax[:, None])
    prim = jnp.argmin(t, axis=1)
    rows = jnp.arange(o.shape[0])
    return (t[rows, prim], prim.astype(jnp.int32) + geom.tri_offset,
            u[rows, prim], v[rows, prim])


def _torus_hit_chunk(geom: GeomSlice, o, d, tmax):
    """Per-chunk nearest torus. Rays are transformed into every torus's
    object space (affine t-preserving trick, cf. raytrace.rchit:50)."""
    W = geom.tor_w2o  # (K, 3, 4)
    oo = jnp.einsum("nj,kij->nki", o, W[:, :, :3], precision="highest") + W[None, :, :, 3]
    dd = jnp.einsum("nj,kij->nki", d, W[:, :, :3], precision="highest")
    t, _ = torus_geom.torus_intersect(
        jnp, oo, dd, geom.tor_major[None, :], geom.tor_minor[None, :],
        TMIN, tmax[:, None], newton_iters=3)
    prim = jnp.argmin(t, axis=1)
    return (t[jnp.arange(o.shape[0]), prim],
            prim.astype(jnp.int32) + geom.tor_offset)


def combine_hits_over_axis(hit: Hit, axis: str) -> Hit:
    """Merge per-shard winners into the global nearest hit (lexicographic
    min on (t, prim*2+kind) so ties resolve deterministically)."""
    t = jax.lax.pmin(hit.t, axis)
    on_min = (hit.t == t) & (hit.kind >= 0)
    key = jnp.where(on_min, hit.prim * 2 + hit.kind, _INT_MAX)
    key = jax.lax.pmin(key, axis)
    pick = on_min & (hit.prim * 2 + hit.kind == key)
    u = jax.lax.pmax(jnp.where(pick, hit.u, -BIG), axis)
    v = jax.lax.pmax(jnp.where(pick, hit.v, -BIG), axis)
    missed = key == _INT_MAX
    attrs = hit.attrs
    if attrs is not None:
        # exactly one shard holds the winner: zero the rest and sum over ICI
        def merge(a):
            m = pick if a.ndim == 1 else pick[None, :]  # rows: (C, N)
            zero = jnp.zeros((), a.dtype)
            return jax.lax.psum(jnp.where(m, a, zero), axis)

        attrs = jax.tree_util.tree_map(merge, attrs)
    return Hit(
        t=t,
        kind=jnp.where(missed, -1, key & 1).astype(jnp.int32),
        prim=jnp.where(missed, 0, key >> 1).astype(jnp.int32),
        u=jnp.where(missed, F32(0.0), u),
        v=jnp.where(missed, F32(0.0), v),
        attrs=attrs,
    )


def closest_hit(scene: Scene, origins, dirs, tmax=None, backend: str = "jnp",
                geom: Optional[GeomSlice] = None,
                prim_axis: Optional[str] = None,
                want_attrs: bool = False, occlusion: bool = False) -> Hit:
    """Nearest hit for every ray. origins/dirs: (3, N) f32 ROWS (rays on
    the minor axis — the kernels' native layout; no transposes anywhere on
    the hot path).

    geom: geometry to test (defaults to the whole scene). prim_axis: mesh
    axis name to combine partial hits over (geom is then this device's
    shard). want_attrs: emit interpolated ShadeAttrs from the kernels
    (pallas backend only; the jnp path shades via gathers). occlusion:
    any-hit semantics — kernels stop refining once a ray has any in-range
    hit (only Hit.kind >= 0 is meaningful).
    """
    n = origins.shape[1]
    if tmax is None:
        tmax = jnp.full((n,), TMAX, F32)
    else:
        tmax = jnp.broadcast_to(jnp.asarray(tmax, F32), (n,))
    if geom is None:
        geom = geom_from_scene(scene)

    if backend == "pallas":
        from toroidal_ray_tracing_tpu.ops.trace_kernel import closest_hit_pallas

        hit = closest_hit_pallas(scene, geom, origins, dirs, tmax,
                                 want_attrs=want_attrs, occlusion=occlusion)
    else:
        hit = _closest_hit_jnp(scene, geom, origins, dirs, tmax)

    if prim_axis is not None:
        hit = combine_hits_over_axis(hit, prim_axis)
    return hit


def _closest_hit_jnp(scene: Scene, geom: GeomSlice, origins, dirs, tmax) -> Hit:
    # reference path: transpose rows back to (N, 3) columns once (its math
    # and lax.map chunking are easiest left column-major)
    origins, dirs = origins.T, dirs.T
    n = origins.shape[0]
    n_tris = int(geom.woop_o.shape[2])
    n_tori = int(geom.tor_major.shape[0])
    # static skips: a scene with no real tris/tori still carries 1 padded row
    has_tris = bool(np.any(np.asarray(scene.triangles.valid))) if isinstance(
        scene.triangles.valid, np.ndarray) else True
    has_tori = bool(np.any(np.asarray(scene.tori.valid))) if isinstance(
        scene.tori.valid, np.ndarray) else True

    chunk = _ray_chunk(n, max(n_tris, n_tori * 8))
    pad = (-n) % chunk
    o = jnp.concatenate([origins, jnp.zeros((pad, 3), F32)]) if pad else origins
    d = jnp.concatenate([dirs, jnp.ones((pad, 3), F32)]) if pad else dirs
    tm = jnp.concatenate([tmax, jnp.zeros((pad,), F32)]) if pad else tmax

    def chunk_fn(args):
        oc, dc, tc = args
        t_best = jnp.full((oc.shape[0],), BIG, F32)
        kind = jnp.full((oc.shape[0],), -1, jnp.int32)
        prim = jnp.zeros((oc.shape[0],), jnp.int32)
        u = jnp.zeros((oc.shape[0],), F32)
        v = jnp.zeros((oc.shape[0],), F32)
        if has_tris:
            tt, tp, tu, tv = _tri_hit_chunk(geom, oc, dc, tc)
            better = tt < t_best
            t_best = jnp.where(better, tt, t_best)
            kind = jnp.where(better, 0, kind)
            prim = jnp.where(better, tp, prim)
            u = jnp.where(better, tu, u)
            v = jnp.where(better, tv, v)
        if has_tori:
            kt, kp = _torus_hit_chunk(geom, oc, dc, tc)
            better = kt < t_best
            t_best = jnp.where(better, kt, t_best)
            kind = jnp.where(better, 1, kind)
            prim = jnp.where(better, kp, prim)
        return t_best, kind, prim, u, v

    nchunks = (n + pad) // chunk
    t, kind, prim, u, v = jax.lax.map(
        chunk_fn,
        (o.reshape(nchunks, chunk, 3), d.reshape(nchunks, chunk, 3),
         tm.reshape(nchunks, chunk)))
    flat = lambda x: x.reshape(-1)[:n]  # noqa: E731
    return Hit(t=flat(t), kind=flat(kind), prim=flat(prim), u=flat(u), v=flat(v))


@jax.custom_vjp
def _closest_hit_pallas_diff(scene, origins, dirs, tmax):
    from toroidal_ray_tracing_tpu.ops.trace_kernel import closest_hit_pallas

    return closest_hit_pallas(scene, geom_from_scene(scene), origins, dirs,
                              tmax)


def _chd_fwd(scene, origins, dirs, tmax):
    return (_closest_hit_pallas_diff(scene, origins, dirs, tmax),
            (scene, origins, dirs, tmax))


def _chd_bwd(res, ct):
    # flash-attention-style recompute: the backward pass re-derives the hit
    # on the dense jnp path (O(rays x prims), offline-acceptable) and pulls
    # the cotangents through ITS vjp — the Mosaic kernels never need one.
    # Integer outputs (kind/prim) carry symbolic-zero cotangents; only
    # (t, u, v) flow.
    scene, origins, dirs, tmax = res

    def f(scene, origins, dirs, tmax):
        h = _closest_hit_jnp(scene, geom_from_scene(scene), origins, dirs,
                             tmax)
        return h.t, h.u, h.v

    _, vjp = jax.vjp(f, scene, origins, dirs, tmax)
    return vjp((ct.t, ct.u, ct.v))


_closest_hit_pallas_diff.defvjp(_chd_fwd, _chd_bwd)


def closest_hit_diff(scene: Scene, origins, dirs, tmax=None) -> Hit:
    """Differentiable closest-hit on the PALLAS backend.

    The Mosaic kernels define no VJP; this wrapper runs them for the primal
    and recomputes the backward pass through the jnp reference path (whose
    argmin-gather formulation reverse-differentiates fine) — enabling
    inverse rendering at kernel speed (`trace_rays_fixed(backend="pallas")`,
    a capability the reference's hardware pipeline cannot express at all).
    origins/dirs: (3, N) rows."""
    n = origins.shape[1]
    if tmax is None:
        tmax = jnp.full((n,), TMAX, F32)
    else:
        tmax = jnp.broadcast_to(jnp.asarray(tmax, F32), (n,))
    return _closest_hit_pallas_diff(scene, origins, dirs, tmax)


def any_hit(scene: Scene, origins, dirs, tmax, backend: str = "jnp",
            geom: Optional[GeomSlice] = None,
            prim_axis: Optional[str] = None):
    """Occlusion query (shadow rays: TerminateOnFirstHit | SkipClosestHit,
    raytrace.rchit:96-109). Dense evaluation — returns a bool mask. The
    pallas backend runs the kernels in any-hit mode: a ray with any
    in-range hit rejects all remaining clusters/groups outright (the
    TerminateOnFirstHit analog)."""
    hit = closest_hit(scene, origins, dirs, tmax=tmax, backend=backend,
                      geom=geom, prim_axis=prim_axis,
                      occlusion=backend == "pallas")
    return hit.kind >= 0
