"""Ray-triangle intersection, vectorized over ray x triangle tiles.

Replaces the hardware traversal+intersection behind `traceRayEXT`
(VKT/ray_tracing__before/shaders/raytrace.rgen:77, raytrace.rchit:98) with two
formulations:

* `moller_trumbore` — the classic test, used by the NumPy oracle and for
  small cross-checks.
* `intersect_woop` — Woop unit-triangle test against precomputed per-triangle
  affine transforms (`Scene.triangles.woop_o/woop_d`). The transform applies
  as two thin matmuls, which XLA/Pallas place on the MXU; the per-pair
  epilogue is ~10 VPU ops. This is the hot formulation.

All functions are backend-generic: pass `xp = numpy` or `xp = jax.numpy`.
"""

from __future__ import annotations

import numpy as np

F32 = np.float32
BIG = F32(3.0e38)  # "no hit" sentinel t


def moller_trumbore(xp, origins, dirs, v0, e1, e2, tmin, tmax, eps=1e-8):
    """Batched Möller–Trumbore.

    origins/dirs: (N, 3); v0/e1/e2: (T, 3).
    Returns (t, u, v, hit): each (N, T); t == BIG where no hit.
    """
    o = origins[:, None, :]
    d = dirs[:, None, :]
    v0 = v0[None, :, :]
    e1 = e1[None, :, :]
    e2 = e2[None, :, :]

    pvec = xp.cross(d, e2)
    det = xp.sum(e1 * pvec, axis=-1)
    det_ok = xp.abs(det) > eps
    inv_det = xp.where(det_ok, F32(1.0), F32(0.0)) / xp.where(det_ok, det, F32(1.0))
    tvec = o - v0
    u = xp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = xp.cross(tvec, e1)
    v = xp.sum(d * qvec, axis=-1) * inv_det
    t = xp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (
        (xp.abs(det) > eps)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= tmin)
        & (t <= tmax)
    )
    t = xp.where(hit, t, BIG)
    return t.astype(F32), u.astype(F32), v.astype(F32), hit


def intersect_woop(xp, origins, dirs, woop_o, woop_d, tmin, tmax):
    """Woop unit-triangle test via matmuls.

    origins/dirs: (N, 3); woop_o: (3, 4, T); woop_d: (3, 3, T) — output
    component x input dim x triangle (each component is one thin matmul).

    Returns (t, u, v, hit) each (N, T).
    """
    N = origins.shape[0]
    T = woop_o.shape[2]
    oh = xp.concatenate([origins, xp.ones((N, 1), dtype=origins.dtype)], axis=1)
    if xp is np:
        op = np.einsum("na,kat->nkt", oh, woop_o)
        dp = np.einsum("na,kat->nkt", dirs, woop_d)
    else:
        # TPU MXU defaults to bf16 passes for f32 matmuls — ray/triangle
        # coordinates need full fp32 (HIGHEST = 6-pass bf16 emulation)
        op = xp.einsum("na,kat->nkt", oh, woop_o, precision="highest")
        dp = xp.einsum("na,kat->nkt", dirs, woop_d, precision="highest")

    dz = dp[:, 2, :]
    dz_ok = xp.abs(dz) > F32(1e-12)
    inv_dz = xp.where(dz_ok, F32(1.0), F32(0.0)) / xp.where(dz_ok, dz, F32(1.0))
    t = -op[:, 2, :] * inv_dz
    u = op[:, 0, :] + t * dp[:, 0, :]
    v = op[:, 1, :] + t * dp[:, 1, :]
    hit = (
        (xp.abs(dz) > F32(1e-12))
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= tmin)
        & (t <= tmax)
    )
    t = xp.where(hit, t, BIG)
    return t.astype(F32), u.astype(F32), v.astype(F32), hit


def ray_aabb(xp, origins, inv_dirs, lo, hi, tmin, tmax):
    """Slab test: rays (N,3) x boxes (C,3). Returns hit mask (N, C).

    `inv_dirs` = 1/dirs with +/-inf where a component is 0 (IEEE slab test).
    """
    o = origins[:, None, :]
    inv_d = inv_dirs[:, None, :]
    t0 = (lo[None, :, :] - o) * inv_d
    t1 = (hi[None, :, :] - o) * inv_d
    tnear = xp.max(xp.minimum(t0, t1), axis=-1)
    tfar = xp.min(xp.maximum(t0, t1), axis=-1)
    return (tnear <= xp.minimum(tfar, tmax)) & (tfar >= tmin)
