"""Device-side closest-hit + miss shading, vectorized over the ray batch.

Line-by-line port of the reference's shading semantics into dense jnp with
masked selects (no divergence — every lane computes every branch and selects):

  raytrace.rchit:26-135  — interpolation, lighting, shadow ray, reflection
  raytrace.rmiss:16-22   — miss = clearColor * 0.8, hitPosition = 0 sentinel
  wavefront.glsl:23-50   — computeDiffuse (Lambert+ambient), computeSpecular
                           (Phong with (2+s)/(2pi) energy factor)

Layout: per-ray vectors are ROWS — (3, N) with components on sublanes and
rays on lanes, matching the Pallas kernels' native layout. The old (N, 3)
column layout forced an XLA transpose per kernel call per bounce (multiple
ms per 2M rays each); row-native shading eliminates every per-bounce
transpose (frames transpose once at the output boundary).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Any

import jax
import jax.numpy as jnp
import numpy as np

from toroidal_ray_tracing_tpu.geom import torus as torus_geom
from toroidal_ray_tracing_tpu.scene.types import (LIGHT_POINT, RenderSettings,
                                                  Scene, tex_dequant)
from toroidal_ray_tracing_tpu.trace.intersect import Hit, any_hit

F32 = np.float32


class ShadeResult(NamedTuple):
    hit_value: Any     # (3, N) prd.hitValue
    hit_position: Any  # (3, N) prd.hitPosition (0 on miss)
    atten_factor: Any  # (3, N) multiplied into prd.attenuation (rchit:127)
    done: Any          # (N,) bool — no reflection requested
    next_origin: Any   # (3, N)
    next_dir: Any      # (3, N)
    shadow_rays: Any   # (N,) bool — a shadow ray was traced (for Mrays stats)


def _reflect(d, n):
    """Rows: (3, N)."""
    return d - 2.0 * jnp.sum(d * n, axis=0, keepdims=True) * n


def _normalize(v):
    return v / jnp.maximum(
        jnp.linalg.norm(v, axis=0, keepdims=True), F32(1e-30))


def mip_lod(xp, t, pixel_spread, tex_density, level0_max_dim):
    """Footprint-based LOD (shared with the oracle so parity is exact):
    texels covered by one pixel at hit distance t = t * pixel_spread *
    uv-density * texture resolution; lod = log2 of that. A cheap analog of
    the hardware sampler's derivative LOD — no ray differentials needed.
    pixel_spread == 0 degenerates to level 0 (log2 -> -inf, clamped)."""
    texels = (xp.minimum(xp.asarray(t, F32), F32(1e8)) * pixel_spread
              * tex_density * level0_max_dim)
    return xp.log2(xp.maximum(texels, F32(1e-20)))


# One quad-packed (N, 3)-u32 gather per mip level instead of four (N, 3)
# f32 tap gathers: 4x fewer gathered rows AND 4x fewer gathered bytes —
# gather throughput on hardware scales with the gathered table's
# residency (~7 ms / 2M rows VMEM-resident vs ~50 ms HBM-resident), so
# the 12 B/texel sRGB-u8 words (TextureAtlas.data4q) keep realistic
# atlases near the fast regime. The u8 decode happens post-gather, before
# the bilinear blend — exactly the reference's R8G8B8A8_SRGB sampler
# (hello_vulkan.cpp:289). Flip to "0" to A/B the 4-tap path on hardware.
TEX_QUAD_GATHER = os.environ.get("TRT_TEX_QUAD", "1") == "1"

# Per-ray lookups from TINY tables (mip offsets/sizes, per-texture level
# counts) must not lower to XLA gathers: on TPU a flat (N,) gather costs
# ~18 ms per 2M rays REGARDLESS of table size (measured,
# scripts/gather_bench.py — the texel row-gather itself is 8-25 ms, so 9
# metadata gathers were ~110 of the 139 ms sample pass). Below this row
# count, lookups run as a fused compare-select chain instead: one
# elementwise pass over the rays, M scalar selects deep.
TEX_TINY_MAX = 512


def _tiny_lookup(cols, idx, m_count: int):
    """Gather-free per-ray lookup from tiny tables.

    cols: tuple of (M,) arrays; idx: (N,) i32 in [0, m_count). Returns a
    tuple of (N,) arrays. Lowered as m_count fused scalar selects — an
    elementwise chain XLA keeps in registers, vs ~18 ms per 2M rays for
    each (N,) gather it replaces."""
    outs = [jnp.broadcast_to(c[0], idx.shape) for c in cols]
    for k in range(1, m_count):
        sel = idx == k
        outs = [jnp.where(sel, c[k], o) for c, o in zip(cols, outs)]
    return tuple(outs)


def _level_meta(atlas, tex_id, level):
    """(off, hs, ws) per ray for (tex_id, level) — tiny-table lookup."""
    n_tex, L = atlas.offsets.shape
    m = n_tex * L
    if m <= TEX_TINY_MAX:
        return _tiny_lookup(
            (atlas.offsets.reshape(m), atlas.sizes[:, :, 0].reshape(m),
             atlas.sizes[:, :, 1].reshape(m)),
            tex_id * L + level, m)
    return (atlas.offsets[tex_id, level], atlas.sizes[tex_id, level, 0],
            atlas.sizes[tex_id, level, 1])


def _tex_meta(atlas, tex_id, cols):
    """Per-ray lookup of per-TEXTURE columns ((n_tex,) each)."""
    n_tex = atlas.offsets.shape[0]
    if n_tex <= TEX_TINY_MAX:
        return _tiny_lookup(cols, tex_id, n_tex)
    return tuple(c[tex_id] for c in cols)


def _quad_index(scene: Scene, tex_id, level, uv):
    """Flat data4q index + bilinear fractions for one mip level (the
    index/weight half of the quad-gather path, shared by the XLA gather
    and the Mosaic tex kernel so the two can never drift)."""
    off, hs, ws = _level_meta(scene.textures, tex_id, level)
    x = (uv[0] % 1.0) * ws.astype(F32) - F32(0.5)
    y = (uv[1] % 1.0) * hs.astype(F32) - F32(0.5)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[None, :]
    fy = (y - y0)[None, :]
    xi = jnp.mod(x0.astype(jnp.int32), ws)
    yi = jnp.mod(y0.astype(jnp.int32), hs)
    return off + yi * ws + xi, fx, fy


def _blend_quad(q, fx, fy):
    """Bilinear blend of one gathered quad word set. q: (3, N) u32."""
    t00, t10, t01, t11 = (tex_dequant(q, k) for k in range(4))
    return (t00 * (1 - fx) * (1 - fy)
            + t10 * fx * (1 - fy)
            + t01 * (1 - fx) * fy
            + t11 * fx * fy)


def _bilinear_level(scene: Scene, tex_id, level, uv, quad=None, meta=None):
    """Bilinear, repeat addressing, at one mip level of the flat atlas.
    uv: (2, N) rows; returns (3, N). quad overrides TEX_QUAD_GATHER
    (microbench A/B); meta short-circuits the (off, hs, ws) lookup."""
    quad = TEX_QUAD_GATHER if quad is None else quad
    atlas = scene.textures
    off, hs, ws = _level_meta(atlas, tex_id, level) if meta is None else meta
    x = (uv[0] % 1.0) * ws.astype(F32) - F32(0.5)
    y = (uv[1] % 1.0) * hs.astype(F32) - F32(0.5)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[None, :]
    fy = (y - y0)[None, :]

    if quad:
        # data4q rows carry the full 2x2 wrap-addressed neighbourhood of
        # the top-left tap as packed u8 words — one 12-byte gather fetches
        # all four corners; dequant after the gather, before the blend
        # (the R8G8B8A8_SRGB sampler order).
        xi = jnp.mod(x0.astype(jnp.int32), ws)
        yi = jnp.mod(y0.astype(jnp.int32), hs)
        q = atlas.data4q[off + yi * ws + xi].T         # (3, N) u32
        t00, t10, t01, t11 = (tex_dequant(q, k) for k in range(4))
        return (t00 * (1 - fx) * (1 - fy)
                + t10 * fx * (1 - fy)
                + t01 * (1 - fx) * fy
                + t11 * fx * fy)

    def tap(xi, yi):
        xi = jnp.mod(xi.astype(jnp.int32), ws)
        yi = jnp.mod(yi.astype(jnp.int32), hs)
        return atlas.data[off + yi * ws + xi].T        # (3, N)

    return (tap(x0, y0) * (1 - fx) * (1 - fy)
            + tap(x0 + 1, y0) * fx * (1 - fy)
            + tap(x0, y0 + 1) * (1 - fx) * fy
            + tap(x0 + 1, y0 + 1) * fx * fy)


def _sample_texture(scene: Scene, tex_id, uv, lod=None, quad=None,
                    valid=None, backend: str = "jnp"):
    """Trilinear mipmapped sampling — replaces the reference's mipmapped
    `texture(textureSamplers[...])` (raytrace.rchit:83; sampler with a full
    mip chain, hello_vulkan.cpp:315-339). lod=None samples level 0.
    uv: (2, N); returns (3, N).

    backend="pallas" + a VMEM-sized atlas routes BOTH trilinear taps
    through the Mosaic gather kernel (ops/tex_kernel.py) in one launch —
    XLA's flat-gather lowering costs ~18 ms/2M rays per tap regardless of
    table size. valid: rays whose sample is discarded afterwards (miss /
    untextured) — they return zero words and don't widen the kernel's
    per-span table ranges."""
    if lod is None:
        return _bilinear_level(scene, tex_id, jnp.zeros_like(tex_id), uv,
                               quad)
    (nl,) = _tex_meta(scene.textures, tex_id, (scene.textures.n_levels,))
    l = jnp.clip(lod, 0.0, (nl - 1).astype(F32))
    l0 = jnp.floor(l).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, nl - 1)
    f = (l - l0.astype(F32))[None, :]

    if backend == "pallas" and (quad is None or quad):
        from toroidal_ray_tracing_tpu.ops import tex_kernel

        if tex_kernel.kernel_applicable(scene.textures):
            i0, fx0, fy0 = _quad_index(scene, tex_id, l0, uv)
            i1, fx1, fy1 = _quad_index(scene, tex_id, l1, uv)
            if valid is None:
                valid = jnp.ones(i0.shape, bool)
            q0, q1 = tex_kernel.quad_gather_pallas(
                scene.textures.data4q, i0, i1, valid)
            c0 = _blend_quad(q0, fx0, fy0)
            c1 = _blend_quad(q1, fx1, fy1)
            return c0 * (1 - f) + c1 * f

    c0 = _bilinear_level(scene, tex_id, l0, uv, quad)
    c1 = _bilinear_level(scene, tex_id, l1, uv, quad)
    return c0 * (1 - f) + c1 * f


def shade(scene: Scene, settings: RenderSettings, origins, dirs, hit: Hit,
          backend: str = "jnp", geom=None, prim_axis=None) -> ShadeResult:
    """origins/dirs: (3, N) rows."""
    tris = scene.triangles
    tor = scene.tori
    mats = scene.materials

    missed = hit.kind < 0
    prim = jnp.maximum(hit.prim, 0)
    is_tor = hit.kind == 1

    # hit point along the ray (rchit:94,134); t clamped so the BIG miss
    # sentinel doesn't overflow fp32 (missed lanes are masked below)
    ray_hit_pos = origins + jnp.minimum(hit.t, F32(1.0e8))[None, :] * dirs

    if hit.attrs is not None:
        # fast path: the Pallas kernels emitted the winner's interpolated
        # attributes as rows — no per-ray table gathers (8+ ms each at 2M
        # rays) and no layout change
        a = hit.attrs
        world_pos = jnp.where(is_tor[None, :], ray_hit_pos, a.pos)
        nrm = _normalize(a.nrm)
        tri_uv = a.uv
        ambient, diffuse_c, specular_c = a.ambient, a.diffuse, a.specular
        shininess, illum = a.shininess, a.illum
        tex_id = jnp.where(is_tor, -1, a.texture_id)
        return _shade_common(scene, settings, origins, dirs, hit, missed,
                             is_tor, ray_hit_pos, world_pos, nrm, tri_uv,
                             ambient, diffuse_c, specular_c, shininess,
                             illum, tex_id, a.tex_density, backend, geom,
                             prim_axis)

    tri_prim = jnp.where(is_tor, 0, prim)
    tor_prim = jnp.where(is_tor, prim, 0)
    tor_prim = jnp.minimum(tor_prim, tor.world_to_obj.shape[0] - 1)

    # --- triangle attributes, barycentric interpolation (rchit:43-54) ---
    # (jnp reference path: gathers produce (N, 3); transpose to rows after —
    # the pallas path avoids this entirely via kernel-emitted attrs)
    w = F32(1.0) - hit.u - hit.v
    uvw = (w[None, :], hit.u[None, :], hit.v[None, :])
    v0 = tris.v0[tri_prim].T
    tri_pos = v0 + uvw[1] * tris.e1[tri_prim].T + uvw[2] * tris.e2[tri_prim].T
    tri_nrm = (uvw[0] * tris.n0[tri_prim].T + uvw[1] * tris.n1[tri_prim].T
               + uvw[2] * tris.n2[tri_prim].T)
    tri_uv = (uvw[0] * tris.uv0[tri_prim].T + uvw[1] * tris.uv1[tri_prim].T
              + uvw[2] * tris.uv2[tri_prim].T)
    tri_mat = tris.mat_id[tri_prim]

    # --- torus attributes (object-space normal -> world) ---
    # gather the 3x4 world->object transform as 12 separate (N,) columns: a
    # (N, 3, 4) gather gets a {2,1,0:T(4,128)} layout from XLA — 42.7x HBM
    # padding, ~16 GB at 4K — while 1-D gathers stay dense
    W12 = tor.world_to_obj.reshape(-1, 12)

    def wcol(i):
        return W12[:, i][tor_prim]                       # (N,)

    hx, hy, hz = ray_hit_pos[0], ray_hit_pos[1], ray_hit_pos[2]
    p_obj = jnp.stack([
        wcol(0) * hx + wcol(1) * hy + wcol(2) * hz + wcol(3),
        wcol(4) * hx + wcol(5) * hy + wcol(6) * hz + wcol(7),
        wcol(8) * hx + wcol(9) * hy + wcol(10) * hz + wcol(11),
    ], axis=0)                                           # (3, N)
    n_obj = torus_geom.torus_normal(jnp, p_obj.T, tor.major_radius[tor_prim])
    nx, ny, nz = n_obj[:, 0], n_obj[:, 1], n_obj[:, 2]
    # normal transforms by the inverse-transpose = rows of world_to_obj's
    # rotation applied as columns (rchit:54)
    n_tor = jnp.stack([
        nx * wcol(0) + ny * wcol(4) + nz * wcol(8),
        nx * wcol(1) + ny * wcol(5) + nz * wcol(9),
        nx * wcol(2) + ny * wcol(6) + nz * wcol(10),
    ], axis=0)                                           # (3, N)
    tor_mat = tor.mat_id[tor_prim]

    world_pos = jnp.where(is_tor[None, :], ray_hit_pos, tri_pos)
    nrm = _normalize(jnp.where(is_tor[None, :], n_tor, tri_nrm))
    mat_id = jnp.where(is_tor, tor_mat, tri_mat)

    ambient = mats.ambient[mat_id].T
    diffuse_c = mats.diffuse[mat_id].T
    specular_c = mats.specular[mat_id].T
    shininess = mats.shininess[mat_id]
    illum = mats.illum[mat_id]
    tex_id = jnp.where(is_tor, -1, mats.texture_id[mat_id])

    # uv texel density for mip LOD: sqrt(uv area / world area) of the tri
    duv1 = tris.uv1[tri_prim] - tris.uv0[tri_prim]
    duv2 = tris.uv2[tri_prim] - tris.uv0[tri_prim]
    uv_area = jnp.abs(duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0])
    e1g, e2g = tris.e1[tri_prim], tris.e2[tri_prim]
    world_area = jnp.linalg.norm(jnp.cross(e1g, e2g), axis=-1)
    tex_density = jnp.sqrt(uv_area / jnp.maximum(world_area, F32(1e-30)))

    return _shade_common(scene, settings, origins, dirs, hit, missed,
                         is_tor, ray_hit_pos, world_pos, nrm, tri_uv,
                         ambient, diffuse_c, specular_c, shininess,
                         illum, tex_id, tex_density, backend, geom,
                         prim_axis)


def _shade_common(scene, settings, origins, dirs, hit, missed, is_tor,
                  ray_hit_pos, world_pos, nrm, tri_uv, ambient, diffuse_c,
                  specular_c, shininess, illum, tex_id, tex_density,
                  backend, geom, prim_axis) -> ShadeResult:
    # --- light (rchit:57-71) --- (all rows: (3, N); scalars (N,))
    light = settings.light
    lpos = jnp.asarray(light.position, F32)
    is_point = jnp.asarray(light.type, jnp.int32) == LIGHT_POINT
    ldir = lpos[:, None] - world_pos                     # (3, N)
    ldist_pt = jnp.linalg.norm(ldir, axis=0)
    L_pt = ldir / jnp.maximum(ldist_pt[None, :], F32(1e-20))
    L_inf = jnp.broadcast_to(
        (lpos / jnp.maximum(jnp.linalg.norm(lpos), F32(1e-30)))[:, None],
        world_pos.shape)
    L = jnp.where(is_point, L_pt, L_inf)
    ldist = jnp.where(is_point, ldist_pt, F32(100000.0))
    lint = jnp.where(
        is_point,
        jnp.asarray(light.intensity, F32) / jnp.maximum(ldist_pt * ldist_pt, F32(1e-20)),
        jnp.asarray(light.intensity, F32),
    )

    # --- computeDiffuse (wavefront.glsl:23-31) ---
    ndotl = jnp.sum(nrm * L, axis=0)                     # (N,)
    diffuse = diffuse_c * jnp.maximum(ndotl, 0.0)[None, :]
    diffuse = jnp.where((illum >= 1)[None, :], diffuse + ambient, diffuse)

    # texture modulation (rchit:79-84); static skip when scene has no
    # textures (the dummy atlas is a single texel)
    if scene.textures.data4q.shape[0] > 1:
        tid = jnp.maximum(tex_id, 0)
        (dim0,) = _tex_meta(
            scene.textures, tid,
            (jnp.maximum(scene.textures.sizes[:, 0, 0],
                         scene.textures.sizes[:, 0, 1]),))
        dim0 = dim0.astype(F32)
        lod = mip_lod(jnp, hit.t, jnp.asarray(settings.pixel_spread, F32),
                      tex_density, dim0)
        texel = _sample_texture(scene, tid, tri_uv, lod,
                                valid=(tex_id >= 0) & ~missed,
                                backend=backend)
        diffuse = jnp.where((tex_id >= 0)[None, :], diffuse * texel, diffuse)

    # --- shadow ray (rchit:89-120): only where dot(N, L) > 0 ---
    facing = ndotl > 0.0
    need_shadow = facing & ~missed
    # dense any-hit; rays that don't need the query get tmax=0 (never hits)
    shadow_tmax = jnp.where(need_shadow, ldist, F32(0.0))
    # stop_gradient: hard-shadow visibility has zero derivative a.e., and
    # the occlusion query's backward otherwise propagates 0 * inf = NaN
    # residuals from far-sentinel lanes into light/geometry gradients
    sg = jax.lax.stop_gradient
    shadowed = any_hit(scene, sg(ray_hit_pos), sg(L), sg(shadow_tmax),
                       backend=backend, geom=geom, prim_axis=prim_axis)
    shadowed = shadowed & need_shadow

    attenuation_local = jnp.where(shadowed, F32(0.3), F32(1.0))

    # --- computeSpecular (wavefront.glsl:34-50) ---
    kshine = jnp.maximum(shininess, 4.0)
    energy = (F32(2.0) + kshine) / F32(2.0 * np.pi)
    V = _normalize(-dirs)
    Rv = _reflect(-L, nrm)
    spec = energy * jnp.power(jnp.maximum(jnp.sum(V * Rv, axis=0), 0.0),
                              kshine)
    spec = jnp.where((illum >= 2) & facing & ~shadowed, spec, 0.0)
    specular = specular_c * spec[None, :]

    hit_value = (attenuation_local * lint)[None, :] * (diffuse + specular)

    # --- miss (rmiss:16-22) ---
    clear = jnp.asarray(settings.clear_color, F32)[:3] * F32(0.8)
    hit_value = jnp.where(missed[None, :], clear[:, None], hit_value)
    hit_position = jnp.where(missed[None, :], F32(0.0), ray_hit_pos)

    # --- reflection request (rchit:122-131) ---
    reflective = (illum == 3) & ~missed
    atten_factor = jnp.where(reflective[None, :], specular_c, F32(1.0))

    return ShadeResult(
        hit_value=hit_value.astype(F32),
        hit_position=hit_position.astype(F32),
        atten_factor=atten_factor.astype(F32),
        done=~reflective,
        next_origin=world_pos.astype(F32),
        next_dir=_reflect(dirs, nrm).astype(F32),
        shadow_rays=need_shadow,
    )
