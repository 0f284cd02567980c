"""Multi-chip SPMD rendering over a 2D device mesh.

The reference is single-GPU (SURVEY.md §2C); on TPU we scale over an ICI mesh
with two axes:

* "rays"  — data parallelism: the pixel/angle grid is sharded; zero
  communication during tracing (the analog of `vkCmdTraceRaysKHR`'s
  per-pixel launch grid, hello_vulkan.cpp:954).
* "prims" — primitive ("tensor") parallelism: each device intersects a slice
  of the triangle/torus soup; per-ray winners merge with a lexicographic
  `pmin` over ICI (intersect.combine_hits_over_axis). Useful when the scene
  is large and rays are few, or combined with "rays" on big slices.

Everything runs inside one `jax.shard_map`, so the whole bounce loop is a
single SPMD program; the early-exit `while_loop` condition is made globally
consistent with a `pmax` (trace/wavefront.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from toroidal_ray_tracing_tpu.cameras import generate_rays
from toroidal_ray_tracing_tpu.scene.types import (RenderSettings, Scene,
                                                  TriangleSoup, TorusSoup)
from toroidal_ray_tracing_tpu.trace.intersect import GeomSlice
from toroidal_ray_tracing_tpu.trace.wavefront import trace_rays

F32 = np.float32
I32 = np.int32


def make_mesh(n_ray_shards: Optional[int] = None, n_prim_shards: int = 1,
              devices=None) -> Mesh:
    """Build a ("rays", "prims") mesh. Defaults: all devices on "rays"."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_ray_shards is None:
        n_ray_shards = n // n_prim_shards
    assert n_ray_shards * n_prim_shards == n, (
        f"mesh {n_ray_shards}x{n_prim_shards} != {n} devices")
    arr = np.asarray(devices).reshape(n_ray_shards, n_prim_shards)
    return Mesh(arr, axis_names=("rays", "prims"))


def pad_scene_for_mesh(scene: Scene, n_prim_shards: int) -> Scene:
    """Pad triangle clusters and the torus batch so primitive counts divide
    evenly across the "prims" axis — with shard cuts landing on cluster
    boundaries, so each shard culls against whole clusters of its own
    (GeomSlice.cluster_lo/hi)."""
    scene = _pad_triangles_for_mesh(scene, n_prim_shards)
    K = scene.tori.count
    return _pad_tori_for_mesh(scene, K, n_prim_shards)


def _pad_triangles_for_mesh(scene: Scene, n_prim_shards: int) -> Scene:
    """Append guaranteed-miss triangles (and empty clusters) until the
    triangle count divides into whole clusters per shard."""
    cs = scene.cluster_size
    T = scene.triangles.count
    step = cs * n_prim_shards
    Tp = ((T + step - 1) // step) * step
    if Tp == T:
        return scene
    pad = Tp - T
    if scene.loose_tris:
        # padding clusters land AFTER the loose tail, breaking the
        # tail-at-end layout the hoist slices; per-shard slices skip the
        # hoist anyway (trace_kernel.closest_hit_pallas checks T_local), so
        # just drop the marker — tail clusters keep their real AABBs and the
        # owning shard's kernel tests them like any other cluster
        scene = scene.replace(loose_tris=0)
    tri = scene.triangles

    def cat(a, fill, shape):
        return np.concatenate(
            [np.asarray(a), np.full(shape, fill, np.asarray(a).dtype)], axis=0)

    # padding Woop transforms follow build._woop_matrices' degenerate
    # convention: W = 0, c = (0, 0, 1) => d'z = 0 => never hits
    woop_o_pad = np.zeros((3, 4, pad), F32)
    woop_o_pad[2, 3, :] = 1.0
    triangles = TriangleSoup(
        v0=cat(tri.v0, 0.0, (pad, 3)), e1=cat(tri.e1, 0.0, (pad, 3)),
        e2=cat(tri.e2, 0.0, (pad, 3)), n0=cat(tri.n0, 0.0, (pad, 3)),
        n1=cat(tri.n1, 0.0, (pad, 3)), n2=cat(tri.n2, 0.0, (pad, 3)),
        uv0=cat(tri.uv0, 0.0, (pad, 2)), uv1=cat(tri.uv1, 0.0, (pad, 2)),
        uv2=cat(tri.uv2, 0.0, (pad, 2)),
        c0=cat(tri.c0, 0.0, (pad, 3)), c1=cat(tri.c1, 0.0, (pad, 3)),
        c2=cat(tri.c2, 0.0, (pad, 3)),
        mat_id=cat(tri.mat_id, 0, (pad,)),
        instance_id=cat(tri.instance_id, -1, (pad,)),
        valid=cat(tri.valid, False, (pad,)),
        woop_o=np.concatenate([np.asarray(tri.woop_o), woop_o_pad], axis=2),
        woop_d=np.concatenate([np.asarray(tri.woop_d),
                               np.zeros((3, 3, pad), F32)], axis=2),
    )
    pad_cl = pad // cs
    # far-away POINT boxes: every coherent ray tile culls them. (An
    # inverted lo>hi box would conservatively PASS the slab test — the
    # per-axis min/max swap turns it into an infinite interval.)
    FAR = F32(1e30)
    cluster_lo = np.concatenate(
        [np.asarray(scene.cluster_lo), np.full((pad_cl, 3), FAR, F32)], axis=0)
    cluster_hi = np.concatenate(
        [np.asarray(scene.cluster_hi), np.full((pad_cl, 3), FAR, F32)], axis=0)
    return dataclasses.replace(scene, triangles=triangles,
                               cluster_lo=cluster_lo, cluster_hi=cluster_hi)


def _pad_tori_for_mesh(scene: Scene, K: int, n_prim_shards: int) -> Scene:
    Kp = ((K + n_prim_shards - 1) // n_prim_shards) * n_prim_shards
    if Kp == K:
        return scene
    pad = Kp - K
    eye34 = np.tile(np.eye(4, dtype=F32)[:3], (pad, 1, 1))
    tor = scene.tori

    def cat(a, b):
        return np.concatenate([np.asarray(a), b], axis=0)

    tori = TorusSoup(
        world_to_obj=cat(tor.world_to_obj, eye34),
        obj_to_world=cat(tor.obj_to_world, eye34),
        major_radius=cat(tor.major_radius, np.zeros(pad, F32)),
        minor_radius=cat(tor.minor_radius, np.full(pad, -1.0, F32)),
        mat_id=cat(tor.mat_id, np.zeros(pad, I32)),
        instance_id=cat(tor.instance_id, np.full(pad, -1, I32)),
        valid=cat(tor.valid, np.zeros(pad, bool)),
        center=cat(tor.center, np.full((pad, 3), 1e30, F32)),
        bound_radius=cat(tor.bound_radius, np.zeros(pad, F32)),
    )
    return dataclasses.replace(scene, tori=tori)


@functools.partial(jax.jit, static_argnames=("mesh", "backend", "n_rays",
                                             "n_prims"))
def _trace_sharded(scene, settings, origins, dirs, mesh, backend, n_rays,
                   n_prims):
    ray_axis = "rays" if n_rays > 1 else None
    prim_axis = "prims" if n_prims > 1 else None

    def body(scene, settings, o, d, woop_o, woop_d, clo, chi,
             tor_w2o, tor_R, tor_r, tor_c, tor_b):
        t_local = woop_o.shape[2]
        k_local = tor_R.shape[0]
        pid = jax.lax.axis_index("prims")
        geom = GeomSlice(
            woop_o=woop_o, woop_d=woop_d,
            tri_offset=(pid * t_local).astype(jnp.int32),
            cluster_lo=clo, cluster_hi=chi,
            tor_w2o=tor_w2o, tor_major=tor_R, tor_minor=tor_r,
            tor_offset=(pid * k_local).astype(jnp.int32),
            tor_center=tor_c, tor_bound=tor_b,
        )
        hv, hp, nr = trace_rays(scene, settings, o, d, backend=backend,
                                geom=geom, prim_axis=prim_axis,
                                ray_axis=ray_axis)
        if ray_axis is not None:
            nr = jax.lax.psum(nr, ray_axis)
        return hv, hp, nr

    tris = scene.triangles
    tor = scene.tori
    out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(),                      # scene (replicated attribute tables)
            P(),                      # settings
            P("rays"), P("rays"),     # origins, dirs
            P(None, None, "prims"),   # woop_o
            P(None, None, "prims"),   # woop_d
            P("prims"), P("prims"),   # cluster_lo, cluster_hi
            P("prims"), P("prims"), P("prims"),  # torus slices
            P("prims"), P("prims"),   # torus centers, bound radii
        ),
        out_specs=(P("rays"), P("rays"), P()),
        check_vma=False,
    )(scene, settings, origins, dirs, tris.woop_o, tris.woop_d,
      scene.cluster_lo, scene.cluster_hi,
      tor.world_to_obj, tor.major_radius, tor.minor_radius,
      tor.center, tor.bound_radius)
    return out


def render_sharded(
    scene: Scene,
    camera,
    width: int,
    height: int,
    settings: RenderSettings | None = None,
    mesh: Optional[Mesh] = None,
    backend: str = "jnp",
    spp: int = 1,
    seed: int = 0,
):
    """SPMD render over a ("rays", "prims") mesh.

    Returns the same dict as `render.renderer.render` plus "rays_traced".
    """
    if settings is None:
        settings = RenderSettings.default()
    from toroidal_ray_tracing_tpu.render.renderer import autofill_pixel_spread
    settings = autofill_pixel_spread(settings, camera, width, height)
    if mesh is None:
        mesh = make_mesh()
    n_rays = mesh.shape["rays"]
    n_prims = mesh.shape["prims"]
    scene = pad_scene_for_mesh(scene, n_prims)

    n = width * height
    pad = (-n) % n_rays
    ray_sharding = NamedSharding(mesh, P("rays"))

    def prep(a, fill=0.0):
        if pad:
            # pad directions with unit vectors: zero-direction rays drive the
            # torus quartic's 1/m^2 terms to inf/NaN and burn work even
            # though their lanes are discarded by unpad
            a = jnp.concatenate([a, jnp.full((pad, 3), F32(fill))])
        return jax.device_put(a, ray_sharding)

    rng = np.random.default_rng(seed)
    acc = hitpos = None
    nrays_total = 0.0
    origins0 = dirs0 = None
    for s in range(max(spp, 1)):
        jitter = None if s == 0 else jnp.asarray(
            rng.random((n, 2), dtype=np.float32))
        o, d = generate_rays(camera, width, height, settings, jitter=jitter)
        o, d = prep(o), prep(d, fill=1.0)
        if s == 0:
            origins0, dirs0 = o, d
        color, hp, nr = _trace_sharded(scene, settings, o, d, mesh, backend,
                                       n_rays, n_prims)
        acc = color if acc is None else acc + color
        nrays_total = nrays_total + nr
        if s == 0:
            hitpos = hp
    color = acc / F32(max(spp, 1))

    shape = (height, width, 3)
    unpad = lambda a: a[:n].reshape(shape)  # noqa: E731
    return {
        "image": unpad(color),
        "hit_position": unpad(hitpos),
        "ray_origin": unpad(origins0),
        "ray_dir": unpad(dirs0),
        "rays_traced": nrays_total,
    }
