"""Pure-NumPy CPU reference renderer — the fidelity oracle.

An independent implementation of the full reference pipeline semantics
(toroidal/pinhole raygen -> closest hit -> shade -> iterative reflection),
used as the RMSE ground truth for the TPU renderer (BASELINE.json: per-pixel
RMSE < 1e-3). Deliberately written the *naive* way — plain Möller–Trumbore
over triangle chunks, float64 quartic for tori, a Python bounce loop — so it
shares no code path with the Woop/Pallas fast path it validates (the raygen
modules are shared: their math is an exact port and is unit-tested on its
own).

Shading semantics ported line-by-line from:
  VKT/ray_tracing__before/shaders/raytrace.rgen:59-116 (bounce loop, miss mix)
  VKT/ray_tracing__before/shaders/raytrace.rchit:26-135 (closest hit)
  VKT/ray_tracing__before/shaders/raytrace.rmiss:16-22  (miss)
  VKT/ray_tracing__before/shaders/wavefront.glsl:23-50  (diffuse/specular)
"""

from __future__ import annotations

import numpy as np

from toroidal_ray_tracing_tpu.geom import torus as torus_geom
from toroidal_ray_tracing_tpu.geom.triangle import moller_trumbore
from toroidal_ray_tracing_tpu.scene.types import LIGHT_POINT, RenderSettings, Scene

F32 = np.float32
BIG = 1.0e30
TMIN = F32(0.001)     # raytrace.rgen:61
TMAX = F32(10000.0)   # raytrace.rgen:62

_TRI_CHUNK = 8192


def _closest_hit(scene: Scene, origins: np.ndarray, dirs: np.ndarray,
                 tmax: np.ndarray | float = TMAX, any_hit: bool = False):
    """Nearest intersection against all triangles + tori.

    Returns dict of per-ray arrays: t, kind (0 tri / 1 torus / -1 miss),
    prim index. With any_hit=True returns only the occlusion mask
    (shadow-ray semantics: TerminateOnFirstHit, raytrace.rchit:96).
    """
    n = origins.shape[0]
    tmax_arr = np.broadcast_to(np.asarray(tmax, F32), (n,)).astype(F32)
    best_t = np.full(n, BIG, F32)
    best_prim = np.full(n, -1, np.int32)
    best_kind = np.full(n, -1, np.int32)
    best_u = np.zeros(n, F32)
    best_v = np.zeros(n, F32)

    tris = scene.triangles
    # iterate ALL rows: with SAH clustering, padding rows are interleaved
    # (not a prefix); they are degenerate (e1=e2=0) and never hit
    nt = int(tris.v0.shape[0])
    for s in range(0, nt, _TRI_CHUNK):
        e = min(s + _TRI_CHUNK, nt)
        t, u, v, hit = moller_trumbore(
            np, origins, dirs, tris.v0[s:e], tris.e1[s:e], tris.e2[s:e],
            TMIN, tmax_arr[:, None])
        t = np.where(hit, t, BIG)
        arg = np.argmin(t, axis=1)
        tbest = t[np.arange(n), arg]
        better = tbest < best_t
        best_t = np.where(better, tbest, best_t)
        best_prim = np.where(better, (s + arg).astype(np.int32), best_prim)
        best_kind = np.where(better, 0, best_kind)
        best_u = np.where(better, u[np.arange(n), arg], best_u)
        best_v = np.where(better, v[np.arange(n), arg], best_v)
        if any_hit and bool((best_t < BIG).all()):
            break

    tor = scene.tori
    kt = int(np.count_nonzero(tor.valid))
    if kt:
        o64 = origins.astype(np.float64)
        d64 = dirs.astype(np.float64)
        for k in range(kt):
            M = tor.world_to_obj[k].astype(np.float64)
            oo = o64 @ M[:, :3].T + M[:, 3]
            dd = d64 @ M[:, :3].T
            t, _ = torus_geom.torus_intersect(
                np, oo, dd, float(tor.major_radius[k]),
                float(tor.minor_radius[k]), float(TMIN),
                tmax_arr.astype(np.float64), newton_iters=3)
            t = t.astype(F32)
            better = t < best_t
            best_t = np.where(better, t, best_t)
            best_prim = np.where(better, k, best_prim)
            best_kind = np.where(better, 1, best_kind)

    if any_hit:
        return best_t < BIG
    return {"t": best_t, "prim": best_prim, "kind": best_kind,
            "u": best_u, "v": best_v}


def _reflect(d, n):
    return d - 2.0 * np.sum(d * n, axis=-1, keepdims=True) * n


def _shade(scene: Scene, settings: RenderSettings, origins, dirs, hit):
    """Port of raytrace.rchit:26-135 + rmiss. Returns per-ray dict."""
    n = origins.shape[0]
    t = hit["t"]
    kind = hit["kind"]
    prim = np.maximum(hit["prim"], 0)
    missed = kind < 0

    tris = scene.triangles
    tor = scene.tori
    mats = scene.materials

    # hit position along the ray (raytrace.rchit:94,134); t clamped so the
    # BIG miss sentinel doesn't overflow fp32 (missed lanes are masked below)
    ray_hit_pos = origins + np.minimum(t, 1.0e8)[:, None] * dirs

    # --- triangle attributes (interpolated) ---
    # clamp: `prim` is a torus index on torus-hit lanes and may exceed the
    # (tightly padded) triangle count; those lanes are masked by kind below
    tp = np.minimum(prim, tris.v0.shape[0] - 1)
    w = 1.0 - hit["u"] - hit["v"]
    bary = np.stack([w, hit["u"], hit["v"]], axis=-1)[:, :, None]
    tri_pos = (np.stack([tris.v0[tp], tris.v0[tp] + tris.e1[tp],
                         tris.v0[tp] + tris.e2[tp]], axis=1) * bary).sum(axis=1)
    tri_nrm = (np.stack([tris.n0[tp], tris.n1[tp], tris.n2[tp]], axis=1)
               * bary).sum(axis=1)
    tri_uv = (np.stack([tris.uv0[tp], tris.uv1[tp], tris.uv2[tp]], axis=1)
              * bary).sum(axis=1)
    tri_mat = tris.mat_id[tp]

    # --- torus attributes ---
    k = np.minimum(prim, tor.world_to_obj.shape[0] - 1)
    M = tor.world_to_obj[k]
    p_obj = np.einsum("nij,nj->ni", M[:, :, :3], ray_hit_pos) + M[:, :, 3]
    n_obj = torus_geom.torus_normal(np, p_obj, tor.major_radius[k])
    # normal transform: row-vector multiply by world_to_obj linear part
    # == inverse-transpose of obj_to_world (cf. raytrace.rchit:54)
    n_w = np.einsum("ni,nij->nj", n_obj, M[:, :, :3])
    n_w /= np.maximum(np.linalg.norm(n_w, axis=-1, keepdims=True), 1e-30)
    tor_mat = tor.mat_id[k]

    is_tor = kind == 1
    world_pos = np.where(is_tor[:, None], ray_hit_pos, tri_pos)
    nrm = np.where(is_tor[:, None], n_w, tri_nrm)
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-30)
    mat_id = np.where(is_tor, tor_mat, tri_mat)

    ambient = mats.ambient[mat_id]
    diffuse_c = mats.diffuse[mat_id]
    specular_c = mats.specular[mat_id]
    shininess = mats.shininess[mat_id]
    illum = mats.illum[mat_id]
    tex_id = np.where(is_tor, -1, mats.texture_id[mat_id])

    # --- light (raytrace.rchit:57-71) ---
    light = settings.light
    lpos = np.asarray(light.position, F32)
    intensity = F32(light.intensity)
    if int(light.type) == LIGHT_POINT:
        ldir = lpos[None, :] - world_pos
        ldist = np.linalg.norm(ldir, axis=-1)
        lint = intensity / np.maximum(ldist * ldist, 1e-20)
        L = ldir / np.maximum(ldist[:, None], 1e-20)
    else:
        L = np.broadcast_to(lpos / np.linalg.norm(lpos), world_pos.shape)
        ldist = np.full(n, 100000.0, F32)
        lint = np.full(n, intensity, F32)

    # --- diffuse (wavefront.glsl:23-31) ---
    ndotl = np.sum(nrm * L, axis=-1)
    diffuse = diffuse_c * np.maximum(ndotl, 0.0)[:, None]
    diffuse = np.where((illum >= 1)[:, None], diffuse + ambient, diffuse)

    # texture modulation (raytrace.rchit:79-84), mip LOD as in trace/shade.py
    has_tex = tex_id >= 0
    if bool(has_tex.any()):
        duv1 = tris.uv1[tp] - tris.uv0[tp]
        duv2 = tris.uv2[tp] - tris.uv0[tp]
        uv_area = np.abs(duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0])
        world_area = np.linalg.norm(np.cross(tris.e1[tp], tris.e2[tp]),
                                    axis=-1)
        density = np.sqrt(uv_area / np.maximum(world_area, 1e-30))
        tid = np.maximum(tex_id, 0)
        sizes = np.asarray(scene.textures.sizes)
        dim0 = np.maximum(sizes[tid, 0, 0], sizes[tid, 0, 1]).astype(F32)
        spread = F32(np.asarray(settings.pixel_spread))
        texels = np.minimum(t, 1e8) * spread * density * dim0
        lod = np.log2(np.maximum(texels, 1e-20))
        texel = _sample_texture(scene, tid, tri_uv, lod)
        diffuse = np.where(has_tex[:, None], diffuse * texel, diffuse)

    # --- shadow ray (raytrace.rchit:89-120) ---
    shadow_origin = ray_hit_pos
    facing = ndotl > 0.0
    shadowed = np.zeros(n, bool)
    if bool(facing.any()):
        idx = np.nonzero(facing & ~missed)[0]
        if idx.size:
            occ = _closest_hit(scene, shadow_origin[idx], L[idx],
                               tmax=ldist[idx], any_hit=True)
            shadowed[idx] = occ

    attenuation_local = np.where(facing & shadowed, F32(0.3), F32(1.0))

    # --- specular (wavefront.glsl:34-50), only lit & unshadowed ---
    kshine = np.maximum(shininess, 4.0)
    energy = (2.0 + kshine) / (2.0 * np.pi)
    V = -dirs / np.maximum(np.linalg.norm(dirs, axis=-1, keepdims=True), 1e-30)
    Rv = _reflect(-L, nrm)
    spec = energy * np.maximum(np.sum(V * Rv, axis=-1), 0.0) ** kshine
    spec = np.where((illum >= 2) & facing & ~shadowed, spec, 0.0)
    specular = specular_c * spec[:, None]

    hit_value = (attenuation_local * lint)[:, None] * (diffuse + specular)

    # --- miss (raytrace.rmiss:16-22) ---
    clear = np.asarray(settings.clear_color, F32)[:3] * F32(0.8)
    hit_value = np.where(missed[:, None], clear[None, :], hit_value)
    hit_position = np.where(missed[:, None], 0.0, ray_hit_pos)

    # --- reflection request (raytrace.rchit:122-131) ---
    reflective = (illum == 3) & ~missed
    next_origin = world_pos
    next_dir = _reflect(dirs, nrm)

    return {
        "hit_value": hit_value.astype(F32),
        "hit_position": hit_position.astype(F32),
        "atten_factor": np.where(reflective[:, None], specular_c, 1.0).astype(F32),
        "done": ~reflective,
        "next_origin": next_origin.astype(F32),
        "next_dir": next_dir.astype(F32),
    }


def _bilinear_level(scene: Scene, tex_id, level, uv):
    """Bilinear, repeat addressing, at one mip level of the flat atlas."""
    atlas = scene.textures
    off = np.asarray(atlas.offsets)[tex_id, level].astype(np.int64)
    hs = np.asarray(atlas.sizes)[tex_id, level, 0].astype(np.int64)
    ws = np.asarray(atlas.sizes)[tex_id, level, 1].astype(np.int64)
    x = (uv[:, 0] % 1.0) * ws.astype(F32) - 0.5
    y = (uv[:, 1] % 1.0) * hs.astype(F32) - 0.5
    x0 = np.floor(x)
    y0 = np.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    data = np.asarray(atlas.data)

    def tap(xi, yi):
        xi = xi.astype(np.int64) % ws
        yi = yi.astype(np.int64) % hs
        return data[off + yi * ws + xi]

    c = (tap(x0, y0) * (1 - fx) * (1 - fy) + tap(x0 + 1, y0) * fx * (1 - fy)
         + tap(x0, y0 + 1) * (1 - fx) * fy + tap(x0 + 1, y0 + 1) * fx * fy)
    return c.astype(F32)


def _sample_texture(scene: Scene, tex_id, uv, lod=None):
    """Trilinear mipmapped sampling (matches trace/shade._sample_texture)."""
    if lod is None:
        return _bilinear_level(scene, tex_id, np.zeros_like(tex_id), uv)
    nl = np.asarray(scene.textures.n_levels)[tex_id]
    lv = np.clip(lod, 0.0, (nl - 1).astype(F32))
    l0 = np.floor(lv).astype(np.int64)
    l1 = np.minimum(l0 + 1, nl - 1)
    f = (lv - l0)[:, None].astype(F32)
    return (_bilinear_level(scene, tex_id, l0, uv) * (1 - f)
            + _bilinear_level(scene, tex_id, l1, uv) * f)


def render_oracle(scene: Scene, camera, width: int, height: int,
                  settings: RenderSettings | None = None):
    """Full render. Returns dict with image (H,W,3) linear color, hit_position
    (H,W,3), ray_origin, ray_dir (the RenderedData quartet,
    host_device.h:101-107)."""
    if settings is None:
        settings = RenderSettings.default()
    from toroidal_ray_tracing_tpu.render.renderer import autofill_pixel_spread
    settings = autofill_pixel_spread(settings, camera, width, height)
    origins, dirs = camera.generate_rays(width, height, settings, xp=np)
    n = origins.shape[0]

    hit_value = np.zeros((n, 3), F32)
    attenuation = np.ones((n, 3), F32)
    first_hit_pos = np.zeros((n, 3), F32)
    active = np.ones(n, bool)
    cur_o, cur_d = origins.copy(), dirs.copy()
    max_depth = int(settings.max_depth)

    # bounce loop: port of raytrace.rgen:75-108 (a do-while — the primary
    # segment always traces, even when maxDepth <= 0)
    for depth in range(max(max_depth, 1)):
        idx = np.nonzero(active)[0]
        if idx.size == 0:
            break
        hit = _closest_hit(scene, cur_o[idx], cur_d[idx])
        sh = _shade(scene, settings, cur_o[idx], cur_d[idx], hit)
        # chit multiplies prd.attenuation *before* rgen accumulates
        # (raytrace.rchit:127 runs before raytrace.rgen:92)
        attenuation[idx] = attenuation[idx] * sh["atten_factor"]
        hit_value[idx] = hit_value[idx] + sh["hit_value"] * attenuation[idx]
        if depth == 0:
            first_hit_pos[idx] = sh["hit_position"]
        done = sh["done"]
        cur_o[idx] = sh["next_origin"]
        cur_d[idx] = sh["next_dir"]
        still = np.zeros(n, bool)
        still[idx[~done]] = True
        active = still

    return {
        "image": hit_value.reshape(height, width, 3),
        "hit_position": first_hit_pos.reshape(height, width, 3),
        "ray_origin": origins.reshape(height, width, 3),
        "ray_dir": dirs.reshape(height, width, 3),
    }
