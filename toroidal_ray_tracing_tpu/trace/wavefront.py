"""Wavefront bounce loop over a ray-state pytree.

The reference already expresses bounces iteratively in raygen (the payload
round-trip at VKT/ray_tracing__before/shaders/raytrace.rgen:75-108, derived in
VKT/ray_tracing_reflections/README.md:118-208 to avoid deep shader recursion).
That loop maps 1:1 onto `lax.while_loop` over a RayState pytree with a live
mask; the loop exits as soon as no ray wants another bounce
(`prd.done == 1 || depth >= maxDepth`).

Layout: the loop runs ROW-major — per-ray vectors are (3, N), the Pallas
kernels' and shade()'s native layout, so no transpose ever runs inside the
bounce loop. `trace_rays` accepts either layout at the boundary
(`rows=False` keeps the public (N, 3) contract and transposes once).
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple, Any

import jax
import jax.numpy as jnp
import numpy as np

from toroidal_ray_tracing_tpu.scene.types import RenderSettings, Scene
from toroidal_ray_tracing_tpu.trace.intersect import closest_hit
from toroidal_ray_tracing_tpu.trace.shade import shade

F32 = np.float32

COMPACT_SPAN = 128    # live-ray compaction granularity = the kernels' span
                      # width; whole spans stay contiguous so the permute
                      # is cheap 512 B row gathers, not per-ray gathers
                      # (~150x cheaper — XLA element gathers run 1/cycle)
COMPACT_FACTORS = tuple(
    int(f) for f in os.environ.get("TRT_COMPACT_FACTORS", "2,4,8").split(",")
    if f)                 # shrunken-dispatch buckets: when every live span
                      # fits in the first n/f lanes, the bounce traces and
                      # shades only that prefix (the reference's dead rays
                      # exit the rgen loop for free, raytrace.rgen:100-103
                      # — this is the TPU analog). The mirror-floor ladder
                      # scenes measure 15.2% live SPANS at bounce 2
                      # (scripts/live_fraction.py), so n/4 catches bounce 2
                      # and n/2 the partially-live bounce 1. Each extra
                      # bucket costs one more set of Mosaic kernel compiles
                      # (and nothing at run time), so the list stays short.
                      # The batch pads itself to _compact_align() lanes so
                      # the buckets exist at ANY frame size: 1080p
                      # (2,073,600 rays) is divisible by no f*2048, and
                      # before the pad every >=1080p config silently ran
                      # all bounces dense — the dead lanes tile-cull inside
                      # the kernels, so the pad costs ~0.35% dense work at
                      # 1080p while enabling 2-8x lighter late bounces.


def _compact_align() -> int:
    """Lane count the wavefront pads ray batches to so every compaction
    bucket size (n/f, f in COMPACT_FACTORS) is a whole multiple of the
    2048-lane kernel tile (16384 for the default factors)."""
    a = 2048
    for f in COMPACT_FACTORS:
        a = math.lcm(a, f * 2048)
    return a


class RayState(NamedTuple):
    """Vectorized `hitPayload` + raygen locals (raycommon.glsl:2-12,
    rgen:64-73). Vector fields are rows: (3, N)."""

    origin: Any        # (3, N)
    dir: Any           # (3, N)
    hit_value: Any     # (3, N) accumulated color
    attenuation: Any   # (3, N) prd.attenuation
    hit_position: Any  # (3, N) first-hit position (RenderedData.pos)
    active: Any        # (N,) bool — still bouncing
    any_active: Any    # () bool — global (cross-device) "some ray bouncing"
    depth: Any         # () i32
    rays_traced: Any   # () i32 — traceRayEXT-equivalent count (exact; the
                       #   old f32 accumulator lost integer precision >2^24)


def trace_rays(scene: Scene, settings: RenderSettings, origins, dirs,
               backend: str = "jnp", geom=None, prim_axis=None,
               ray_axis=None, rows: bool = False):
    """Run the bounce loop for a batch of primary rays.

    origins/dirs: (N, 3) by default; rows=True takes/returns (3, N) rows
    directly (what the fused raygen path feeds — zero layout changes on the
    whole hot path).

    geom/prim_axis: primitive-sharded intersection (see intersect.py).
    ray_axis: mesh axis the ray batch is sharded over — only used to make the
    early-exit decision globally consistent (devices must agree on the
    iteration count; the pmin combine inside the body is collective).

    Returns (hit_value, hit_position, rays_traced): the color and first-hit
    buffers the raygen writes to `RenderedData` (rgen:110-115), in the same
    layout as the inputs.
    """
    if not rows:
        origins, dirs = origins.T, dirs.T
    n0 = origins.shape[1]
    # pad the batch so the compaction bucket sizes divide it (see
    # COMPACT_FACTORS): pad lanes start inactive, trace with tmax = 0
    # (tile-culled inside the kernels), and are sliced off before return
    pad = ((-n0) % _compact_align()) if backend == "pallas" else 0
    if pad > n0:
        pad = 0   # tiny batches (tests, probes): 2-250x padding overhead
                  # would dwarf any bucket win; the kernels' own RAY_TILE
                  # padding already handles alignment there
    if pad:
        origins = jnp.concatenate([origins, jnp.zeros((3, pad), F32)], axis=1)
        dirs = jnp.concatenate([dirs, jnp.ones((3, pad), F32)], axis=1)
    n = n0 + pad
    max_depth = jnp.asarray(settings.max_depth, jnp.int32)

    init = RayState(
        origin=origins,
        dir=dirs,
        hit_value=jnp.zeros((3, n), F32),
        attenuation=jnp.ones((3, n), F32),
        hit_position=jnp.zeros((3, n), F32),
        active=(jnp.arange(n) < n0 if pad else jnp.ones((n,), bool)),
        any_active=jnp.asarray(True),
        depth=jnp.asarray(0, jnp.int32),
        rays_traced=jnp.asarray(0, jnp.int32),
    )

    # live-ray compaction (pallas path): permute whole COMPACT_SPAN-lane
    # spans so live spans pack to the front, then trace/shade only an n/8
    # prefix once every live span fits in it. The permutation is a pure
    # relabeling — all per-ray state travels together, and span_orig
    # carries each slot's original span id so outputs unpermute once at
    # the end.
    sizes = [n]
    for f in COMPACT_FACTORS:
        if n % (f * 2048) == 0 and n // f >= 2048:
            sizes.append(n // f)        # multiple of the 2048 kernel tile
    sizes = tuple(sizes)                # strictly decreasing
    compact = backend == "pallas" and len(sizes) > 1
    n_spans = n // COMPACT_SPAN if compact else 1

    def cond(carry):
        state, _ = carry
        # the rgen loop is a do-while (rgen:75-108): it always traces the
        # primary segment, even when maxDepth <= 0
        return state.any_active & ((state.depth < max_depth)
                                   | (state.depth == 0))

    def _bounce(state: RayState, nb: int) -> RayState:
        """One bounce over the first nb rays (the full batch, or the
        packed live prefix — the suffix is then all-dead by bucket
        construction and carries over untouched)."""
        pre = (lambda a: a[:, :nb]) if nb != n else (lambda a: a)
        act = state.active[:nb] if nb != n else state.active
        # dead rays trace with tmax = 0: the kernels' tile culls then skip
        # them entirely
        seg_tmax = jnp.where(act, F32(10000.0), F32(0.0))
        hit = closest_hit(scene, pre(state.origin), pre(state.dir),
                          tmax=seg_tmax, backend=backend, geom=geom,
                          prim_axis=prim_axis,
                          want_attrs=backend == "pallas")
        sh = shade(scene, settings, pre(state.origin), pre(state.dir), hit,
                   backend=backend, geom=geom, prim_axis=prim_axis)

        live = act[None, :]
        # rchit multiplies prd.attenuation before rgen accumulates
        # (rchit:127 runs inside traceRayEXT, before rgen:92)
        attenuation = jnp.where(live, pre(state.attenuation) * sh.atten_factor,
                                pre(state.attenuation))
        hit_value = jnp.where(live,
                              pre(state.hit_value) + sh.hit_value * attenuation,
                              pre(state.hit_value))
        record_first = ((state.depth == 0) & act)[None, :]
        hit_position = jnp.where(record_first, sh.hit_position,
                                 pre(state.hit_position))

        active = act & ~sh.done & (state.depth + 1 < max_depth)
        origin = jnp.where(active[None, :], sh.next_origin, pre(state.origin))
        direction = jnp.where(active[None, :], sh.next_dir, pre(state.dir))

        # the early-exit decision must be identical on every device (the
        # body contains collectives when prim_axis is set)
        any_active = jnp.any(active)
        for ax in (ray_axis, prim_axis):
            if ax is not None:
                any_active = jax.lax.pmax(any_active.astype(jnp.int32), ax) > 0

        # traceRayEXT-equivalent count: one closest-hit per live ray plus one
        # shadow ray per lit hit (raytrace.rchit:90-109)
        rays = state.rays_traced + jnp.sum(act.astype(jnp.int32)) \
            + jnp.sum((act & sh.shadow_rays).astype(jnp.int32))

        if nb != n:
            catr = lambda p, full: jnp.concatenate(  # noqa: E731
                [p, full[:, nb:]], axis=1)
            origin = catr(origin, state.origin)
            direction = catr(direction, state.dir)
            hit_value = catr(hit_value, state.hit_value)
            attenuation = catr(attenuation, state.attenuation)
            hit_position = catr(hit_position, state.hit_position)
            active = jnp.concatenate([active, state.active[nb:]])

        return RayState(
            origin=origin, dir=direction, hit_value=hit_value,
            attenuation=attenuation, hit_position=hit_position,
            active=active, any_active=any_active, depth=state.depth + 1,
            rays_traced=rays,
        )

    def body(carry):
        state, span_orig = carry
        if not compact:
            return _bounce(state, n), span_orig

        live = jnp.any(state.active.reshape(n_spans, COMPACT_SPAN), axis=1)
        perm = jnp.argsort(~live, stable=True)       # live spans first
        prow = lambda a: a.reshape(  # noqa: E731
            a.shape[0], n_spans, COMPACT_SPAN)[:, perm].reshape(a.shape[0], n)
        state = RayState(
            origin=prow(state.origin), dir=prow(state.dir),
            hit_value=prow(state.hit_value),
            attenuation=prow(state.attenuation),
            hit_position=prow(state.hit_position),
            active=state.active.reshape(n_spans, COMPACT_SPAN)[perm]
                                .reshape(n),
            any_active=state.any_active, depth=state.depth,
            rays_traced=state.rays_traced)
        span_orig = span_orig[perm]

        live_rays = jnp.sum(live.astype(jnp.int32)) * COMPACT_SPAN
        # smallest prefix that holds every live span (sizes is decreasing)
        bucket = jnp.zeros((), jnp.int32)
        for j in range(1, len(sizes)):
            bucket = jnp.where(live_rays <= sizes[j], jnp.int32(j), bucket)
        # collectives inside the bounce require a mesh-uniform branch:
        # pmin picks the larger (always-safe) size
        for ax in (ray_axis, prim_axis):
            if ax is not None:
                bucket = jax.lax.pmin(bucket, ax)
        state = jax.lax.switch(
            bucket, [functools.partial(_bounce, nb=sz) for sz in sizes],
            state)
        return state, span_orig

    span_orig0 = jnp.arange(n_spans, dtype=jnp.int32)
    final, span_orig = jax.lax.while_loop(cond, body, (init, span_orig0))
    hv, hp = final.hit_value, final.hit_position
    if compact:
        inv = jnp.argsort(span_orig)
        unrow = lambda a: a.reshape(  # noqa: E731
            3, n_spans, COMPACT_SPAN)[:, inv].reshape(3, n)
        hv, hp = unrow(hv), unrow(hp)
    if pad:
        hv, hp = hv[:, :n0], hp[:, :n0]
    if not rows:
        hv, hp = hv.T, hp.T
    # f32 at the boundary: callers accumulate across spp/bands/devices where
    # relative (not unit) precision suffices for the Mrays/s statistic
    return hv, hp, final.rays_traced.astype(F32)


def trace_rays_fixed(scene: Scene, settings: RenderSettings, origins, dirs,
                     depth: int, backend: str = "jnp"):
    """Differentiable variant: a static-depth `lax.scan` bounce loop.

    `lax.while_loop` is not reverse-mode differentiable; with a fixed trip
    count the whole render becomes a pure differentiable function of the
    scene pytree (torus radii/transforms, materials, lights) — enabling
    inverse rendering / gradient-based scene fitting, something the
    reference's hardware pipeline cannot express. Semantics match
    `trace_rays` for rays that terminate within `depth` bounces.

    backend="pallas" runs the Mosaic kernels for the primal and recomputes
    the backward pass through the jnp path (intersect.closest_hit_diff);
    shading then uses the gather formulation (no kernel attrs), which
    reverse-differentiates fine. origins/dirs: (N, 3).
    """
    from toroidal_ray_tracing_tpu.trace.intersect import closest_hit_diff

    origins, dirs = origins.T, dirs.T
    n = origins.shape[1]

    def step(state, i):
        origin, direction, hit_value, attenuation, hit_position, active = state
        seg_tmax = jnp.where(active, F32(10000.0), F32(0.0))
        if backend == "pallas":
            hit = closest_hit_diff(scene, origin, direction, tmax=seg_tmax)
        else:
            hit = closest_hit(scene, origin, direction, tmax=seg_tmax,
                              backend=backend)
        sh = shade(scene, settings, origin, direction, hit, backend="jnp")

        live = active[None, :]
        attenuation = jnp.where(live, attenuation * sh.atten_factor,
                                attenuation)
        hit_value = jnp.where(live, hit_value + sh.hit_value * attenuation,
                              hit_value)
        record_first = ((i == 0) & active)[None, :]
        hit_position = jnp.where(record_first, sh.hit_position, hit_position)

        active = active & ~sh.done
        origin = jnp.where(active[None, :], sh.next_origin, origin)
        direction = jnp.where(active[None, :], sh.next_dir, direction)
        return (origin, direction, hit_value, attenuation, hit_position,
                active), None

    init = (origins, dirs, jnp.zeros((3, n), F32), jnp.ones((3, n), F32),
            jnp.zeros((3, n), F32), jnp.ones((n,), bool))
    (_, _, hit_value, _, hit_position, _), _ = jax.lax.scan(
        step, init, jnp.arange(max(depth, 1)))
    return hit_value.T, hit_position.T
