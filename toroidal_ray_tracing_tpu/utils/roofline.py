"""Roofline / MFU accounting for the trace kernels.

The reference publishes no perf counters at all (BASELINE.md); the driver's
mandate is Mrays/s/chip *and* an answer to "is that good for this
hardware?". This module models the arithmetic a traceRayEXT-equivalent
query costs on our kernels and converts measured Mrays/s into a
fraction-of-peak (MFU-style) figure.

Two work models:

* `brute_flops_per_ray(scene)` — the all-pairs upper bound: every ray tests
  every triangle (6 Woop dots + ~25 VPU ops/pair) and every torus (~600-op
  Ferrari quartic + slab). This is what the kernels are *provisioned* for,
  not what they execute: the culling hierarchy (visit lists, span bits,
  running-best pruning) exists precisely to skip most of it.
* `measured_flops_per_ray(scene, origins, dirs)` — the post-cull model: the
  same slab gates the kernels use (triangle cluster AABBs; `_torus_boxes`
  chunk AABBs, imported from the kernel module so the two can't drift)
  are evaluated on a sample of the actual primary-ray batch, and each ray
  is charged only for its candidate (ray, cluster/chunk) pairs, plus the
  gate's own slab cost and shading. This tracks the work the kernel
  dispatches within ~2x (span-granularity dispatch and in-kernel refine
  gates are not modeled).

`mfu()` uses the post-cull model and is capped at 1.0 — it is a
utilization, and a number labeled MFU above 1 is an accounting bug by
definition. The brute-force/post-cull ratio is reported separately as
`cull_speedup` (how much work the acceleration structure removes — the
quantity that previously leaked into LADDER.json as an "MFU" of 1.76).

Peak: TPU v5e ~197 TFLOP/s bf16 on the MXU. The kernels run f32 at
precision=HIGHEST (6 bf16 passes per f32 matmul) and most non-matmul work
on the VPU, so peak-f32 here is taken as 197/4 ≈ 49 TFLOP/s — the usual
convention for f32-equivalent MFU on v5e. Treat the absolute number as a
~2x-accurate roofline, not a measurement.
"""

from __future__ import annotations

import numpy as np

V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32 = V5E_PEAK_BF16 / 4.0

TRI_FLOPS_PER_PAIR = 6 * 8 + 25      # Woop dots + hit test/argmin
TORUS_FLOPS_PER_PAIR = 25 + 600      # slab refine + quartic solve
SHADE_FLOPS_PER_RAY = 300
GATE_FLOPS_PER_BOX = 30              # slab test of one ray vs one AABB
MAX_SAMPLE_RAYS = 1 << 18            # gate-measurement subsample bound


def brute_flops_per_ray(scene) -> float:
    """All-pairs (provisioned) f32 ops per traceRayEXT-equivalent query."""
    T = int(np.asarray(scene.triangles.valid).shape[0])
    K = int(np.asarray(scene.tori.major_radius).shape[0])
    return (T * TRI_FLOPS_PER_PAIR + K * TORUS_FLOPS_PER_PAIR
            + SHADE_FLOPS_PER_RAY)


# back-compat alias (round-2 name)
flops_per_ray = brute_flops_per_ray


def _slab_hits(lo, hi, o, d):
    """Mean boxes hit per ray. lo/hi: (C, 3); o/d: (N, 3) numpy.
    Blocked over rays and boxes so temporaries stay ~(4096, 256, 3)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(np.abs(d) > 1e-30, 1.0 / np.where(d == 0, 1, d),
                       np.where(d >= 0, 3e38, -3e38)).astype(np.float32)
    total = 0.0
    RB, CB = 4096, 256
    for r0 in range(0, o.shape[0], RB):
        ob = o[r0:r0 + RB, None, :]
        ib = inv[r0:r0 + RB, None, :]
        for c0 in range(0, lo.shape[0], CB):
            t0 = (lo[None, c0:c0 + CB, :] - ob) * ib
            t1 = (hi[None, c0:c0 + CB, :] - ob) * ib
            tn = np.minimum(t0, t1).max(axis=2)
            tf = np.maximum(t0, t1).min(axis=2)
            total += float(((tn <= tf) & (tf >= 1e-3)).sum())
    return total / o.shape[0]


def measured_flops_per_ray(scene, origins, dirs) -> float:
    """Post-cull f32 ops per primary query, measured by running the
    kernels' own box gates on (a sample of) this ray batch.

    origins/dirs: (N, 3) primary rays (numpy or jax arrays)."""
    from toroidal_ray_tracing_tpu.ops.trace_kernel import (
        GATED_TORUS_CHUNK, TORUS_CHUNK, _torus_boxes)

    o = np.asarray(origins, np.float32).reshape(-1, 3)
    d = np.asarray(dirs, np.float32).reshape(-1, 3)
    stride = max(1, o.shape[0] // MAX_SAMPLE_RAYS)
    o, d = o[::stride], d[::stride]

    flops = float(SHADE_FLOPS_PER_RAY)

    tri_valid = np.asarray(scene.triangles.valid)
    if tri_valid.any():
        clo = np.asarray(scene.cluster_lo)
        chi = np.asarray(scene.cluster_hi)
        cs = int(scene.cluster_size)
        hits = _slab_hits(clo, chi, o, d)
        flops += hits * cs * TRI_FLOPS_PER_PAIR
        flops += clo.shape[0] * GATE_FLOPS_PER_BOX

    tor_minor = np.asarray(scene.tori.minor_radius)
    if (tor_minor > 0).any():
        K = tor_minor.shape[0]
        chunk = GATED_TORUS_CHUNK if K > 64 else TORUS_CHUNK
        Kp = ((K + chunk - 1) // chunk) * chunk
        w2o = np.asarray(scene.tori.world_to_obj).reshape(K, 12)
        rad = np.stack([np.asarray(scene.tori.major_radius), tor_minor],
                       axis=1).astype(np.float32)
        if Kp != K:
            w2o = np.concatenate(
                [w2o, np.tile(np.eye(3, 4, dtype=np.float32).reshape(1, 12),
                              (Kp - K, 1))], axis=0)
            rad = np.concatenate(
                [rad, np.tile(np.asarray([[0.0, -1.0]], np.float32),
                              (Kp - K, 1))], axis=0)
        _, _, clo, chi = (np.asarray(x) for x in
                          _torus_boxes(w2o, rad, chunk))
        hits = _slab_hits(clo, chi, o, d)
        flops += hits * chunk * TORUS_FLOPS_PER_PAIR
        flops += clo.shape[0] * GATE_FLOPS_PER_BOX

    return flops


def mfu(mrays_per_s: float, scene, rays=None,
        peak_flops: float = V5E_PEAK_F32) -> float:
    """Fraction of peak implied by a measured Mrays/s on this scene.

    rays: optional (origins, dirs) — the scenario's primary batch; with it
    the post-cull measured model is used, without it the brute-force model
    (exact only for scenes too small to gate). Capped at 1.0: an MFU is a
    utilization; work *skipped* by culling belongs in `cull_speedup`."""
    if rays is not None:
        fpr = measured_flops_per_ray(scene, *rays)
    else:
        fpr = brute_flops_per_ray(scene)
    return min(mrays_per_s * 1e6 * fpr / peak_flops, 1.0)


def cull_speedup(scene, rays) -> float:
    """How much of the provisioned all-pairs work the culling hierarchy
    removes: brute-force flops / post-cull measured flops (>= 1 when the
    gates prune anything). This is the number that must NOT be called MFU."""
    return brute_flops_per_ray(scene) / measured_flops_per_ray(scene, *rays)
