"""Closest-hit / any-hit queries on device — the `traceRayEXT` replacement.

Two interchangeable backends:

* `jnp` reference path (this module): Woop-transform matmuls + argmin,
  chunked over rays with `lax.map` so the (rays x tris) intermediates stay
  bounded. XLA places the two thin matmuls on the MXU.
* Pallas fast path (`ops/trace_kernel.py`): same math fused into a
  flash-attention-style kernel — the (rays x tris) matrix never leaves VMEM,
  with per-tile cluster culling. Selected via `backend="pallas"`.

Hit kinds: 0 = triangle, 1 = torus, -1 = miss (the miss-shader branch,
raytrace.rmiss).
"""

from __future__ import annotations

from typing import NamedTuple, Any

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


class Hit(NamedTuple):
    t: Any       # (N,) f32, BIG on miss
    kind: Any    # (N,) i32: 0 tri, 1 torus, -1 miss
    prim: Any    # (N,) i32 index into triangles or tori
    u: Any       # (N,) f32 triangle barycentric
    v: Any       # (N,) f32


def _ray_chunk(n_rays: int, n_prims: int, budget: int = 1 << 24) -> int:
    """Rays per lax.map chunk so chunk*T intermediates stay ~64 MB."""
    c = max(256, budget // max(n_prims, 1))
    c = 1 << (c.bit_length() - 1)
    while n_rays % c != 0 and c > 1:
        c //= 2
    return max(c, 1)


def _tri_hit_chunk(scene: Scene, o, d, tmax):
    """Per-chunk nearest triangle via the Woop test. o/d: (c, 3)."""
    tris = scene.triangles
    t, u, v, _ = intersect_woop(jnp, o, d, tris.woop_o, tris.woop_d, TMIN, tmax[:, None])
    prim = jnp.argmin(t, axis=1)
    n = o.shape[0]
    rows = jnp.arange(n)
    return t[rows, prim], prim.astype(jnp.int32), u[rows, prim], v[rows, prim]


def _torus_hit_chunk(scene: Scene, o, d, tmax):
    """Per-chunk nearest torus. o/d: (c, 3). Rays are transformed into every
    torus's object space (affine t-preserving trick, cf. raytrace.rchit:50)."""
    tor = scene.tori
    W = tor.world_to_obj  # (K, 3, 4)
    oo = jnp.einsum("nj,kij->nki", o, W[:, :, :3], precision="highest") + W[None, :, :, 3]
    dd = jnp.einsum("nj,kij->nki", d, W[:, :, :3], precision="highest")
    t, _ = torus_geom.torus_intersect(
        jnp, oo, dd, tor.major_radius[None, :], tor.minor_radius[None, :],
        TMIN, tmax[:, None], newton_iters=3)
    prim = jnp.argmin(t, axis=1)
    return t[jnp.arange(o.shape[0]), prim], prim.astype(jnp.int32)


def closest_hit(scene: Scene, origins, dirs, tmax=None, backend: str = "jnp") -> Hit:
    """Nearest hit for every ray. origins/dirs: (N, 3) f32."""
    n = origins.shape[0]
    if tmax is None:
        tmax = jnp.full((n,), TMAX, F32)
    else:
        tmax = jnp.broadcast_to(jnp.asarray(tmax, F32), (n,))

    if backend == "pallas":
        from toroidal_ray_tracing_tpu.ops.trace_kernel import closest_hit_pallas

        return closest_hit_pallas(scene, origins, dirs, tmax)

    has_tris = bool(np.any(np.asarray(scene.triangles.valid))) if isinstance(
        scene.triangles.valid, np.ndarray) else True
    has_tori = bool(np.any(np.asarray(scene.tori.valid))) if isinstance(
        scene.tori.valid, np.ndarray) else True

    chunk = _ray_chunk(n, max(scene.num_triangles, scene.num_tori * 8))
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
            tt, tp, tu, tv = _tri_hit_chunk(scene, oc, dc, tc)
            better = tt < t_best
            t_best = jnp.where(better, tt, t_best)
            kind = jnp.where(better, 0, kind)
            prim = jnp.where(better, tp, prim)
            u = jnp.where(better, tu, u)
            v = jnp.where(better, tv, v)
        if has_tori:
            kt, kp = _torus_hit_chunk(scene, oc, dc, tc)
            better = kt < t_best
            t_best = jnp.where(better, kt, t_best)
            kind = jnp.where(better, 1, kind)
            prim = jnp.where(better, kp, prim)
        return t_best, kind, prim, u, v

    nchunks = (n + pad) // chunk
    o = o.reshape(nchunks, chunk, 3)
    d = d.reshape(nchunks, chunk, 3)
    tm = tm.reshape(nchunks, chunk)
    t, kind, prim, u, v = jax.lax.map(chunk_fn, (o, d, tm))
    flat = lambda x: x.reshape(-1)[:n]  # noqa: E731
    return Hit(t=flat(t), kind=flat(kind), prim=flat(prim), u=flat(u), v=flat(v))


def any_hit(scene: Scene, origins, dirs, tmax, backend: str = "jnp"):
    """Occlusion query (shadow rays: TerminateOnFirstHit | SkipClosestHit,
    raytrace.rchit:96-109). Dense evaluation — returns a bool mask."""
    hit = closest_hit(scene, origins, dirs, tmax=tmax, backend=backend)
    return hit.kind >= 0
