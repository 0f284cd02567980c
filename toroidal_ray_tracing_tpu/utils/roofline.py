"""Roofline / MFU accounting for the trace kernels.

The reference publishes no perf counters at all (BASELINE.md); the driver's
mandate is Mrays/s/chip *and* an answer to "is that good for this
hardware?". This module models the arithmetic a traceRayEXT-equivalent
query costs on our kernels and converts measured Mrays/s into a
fraction-of-peak (MFU-style) figure.

The model is intentionally simple and documented rather than exact:

* triangle query: every ray tests all T (cluster culling only *skips* work,
  so this is the upper bound the kernel is provisioned for) —
  6 Woop dot products (4 MACs each) + ~25 VPU ops per (ray, tri) pair.
* torus query: sphere prepass ~25 ops per (ray, torus) pair; the Ferrari
  quartic (~600 f32 ops) runs only on candidate pairs — we charge it on
  every pair as the provisioned upper bound.
* shading/attribute emission: ~300 ops per ray (attribute matmuls, Phong,
  normal math).

Peak: TPU v5e ~197 TFLOP/s bf16 on the MXU. The kernels run f32 at
precision=HIGHEST (6 bf16 passes per f32 matmul) and most non-matmul work
on the VPU, so peak-f32 here is taken as 197/4 ≈ 49 TFLOP/s — the usual
convention for f32-equivalent MFU on v5e. Treat the absolute number as a
~2x-accurate roofline, not a measurement.

Because the model charges the BRUTE-FORCE pair count, a value above 1.0 is
not an error: it means the culling hierarchy (visit lists + span bits +
running-best pruning) is skipping most of the provisioned work — i.e. the
kernel beats the all-pairs roofline, as any acceleration structure should
on a big scene (the 1k-instance grid reports >1 after the exact visit-list
kernel).
"""

from __future__ import annotations

import numpy as np

V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32 = V5E_PEAK_BF16 / 4.0

TRI_FLOPS_PER_PAIR = 6 * 8 + 25      # Woop dots + hit test/argmin
TORUS_FLOPS_PER_PAIR = 25 + 600      # sphere prepass + quartic solve
SHADE_FLOPS_PER_RAY = 300


def flops_per_ray(scene) -> float:
    """Modeled f32 ops per traceRayEXT-equivalent query on this scene."""
    T = int(np.asarray(scene.triangles.valid).shape[0])
    K = int(np.asarray(scene.tori.major_radius).shape[0])
    return (T * TRI_FLOPS_PER_PAIR + K * TORUS_FLOPS_PER_PAIR
            + SHADE_FLOPS_PER_RAY)


def mfu(mrays_per_s: float, scene, peak_flops: float = V5E_PEAK_F32) -> float:
    """Fraction of peak implied by a measured Mrays/s on this scene."""
    return mrays_per_s * 1e6 * flops_per_ray(scene) / peak_flops
