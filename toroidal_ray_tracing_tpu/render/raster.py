"""Raster debug path — the reference's alternative raster pipeline (L3).

The reference UI can toggle from the ray tracer to a classic raster view of
the same scene (`useRayTracer`, VKT/ray_tracing__before/main.cpp:284,345-354;
pipeline at hello_vulkan.cpp:156-185,404-431). Its fragment shader runs the
same `computeDiffuse`/`computeSpecular` with the raster push constants but
casts no shadow or reflection rays (shaders/frag_shader.frag:56-99).

Here: a pure-jnp z-buffered triangle rasterizer — screen-space edge
functions, perspective-correct attribute interpolation, per-fragment Phong.
Brute-force pixels x triangles, chunked over triangles (it is a debug view,
not the hot path; the analytic tori have no raster analog, matching the
reference whose raster path also draws only the OBJ meshes).

Near-plane clipping: triangles crossing the z_clip = 0 plane are clipped in
homogeneous clip space into up to two sub-triangles (the fixed-function
behavior of the reference's hardware rasterizer). Each sub-vertex carries
its barycentric coordinates in the ORIGINAL triangle, so attribute
interpolation is exact across the clip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from toroidal_ray_tracing_tpu.scene.types import LIGHT_POINT, RenderSettings, Scene

F32 = np.float32
_TRI_CHUNK = 512


def _near_clip(c, bary, valid):
    """Clip triangles against the near plane (z_clip >= 0, Vulkan [0,1] depth).

    c: (T, 3, 4) clip-space vertices; bary: (T, 3, 3) original-triangle
    barycentrics per vertex; valid: (T,).
    Returns (c2, bary2, valid2) with a 2T sub-triangle axis: canonical
    rotation puts the pattern in one of {all-in, one-in, two-in, none};
    one-in yields one sub-triangle, two-in yields two (the clipped quad).
    """
    d = c[:, :, 2]                          # (T, 3) signed near distances
    inside = d >= 0.0
    k = inside.sum(axis=1)                  # (T,)

    # canonical rotation r: k==1 -> the inside vertex lands at slot 0;
    # k==2 -> the outside vertex lands at slot 2 (i.e. slot0/1 inside)
    i0, i1, i2 = inside[:, 0], inside[:, 1], inside[:, 2]
    r1 = jnp.where(i0, 0, jnp.where(i1, 1, 2))
    r2 = jnp.where(~i2, 0, jnp.where(~i0, 1, 2))
    r = jnp.where(k == 1, r1, jnp.where(k == 2, r2, 0))

    idx = (r[:, None] + jnp.arange(3)[None, :]) % 3          # (T, 3)
    cr = jnp.take_along_axis(c, idx[:, :, None], axis=1)     # (T, 3, 4)
    br = jnp.take_along_axis(bary, idx[:, :, None], axis=1)  # (T, 3, 3)
    dr = jnp.take_along_axis(d, idx, axis=1)                 # (T, 3)

    A, B, C = cr[:, 0], cr[:, 1], cr[:, 2]
    bA, bB, bC = br[:, 0], br[:, 1], br[:, 2]
    dA, dB, dC = dr[:, 0:1], dr[:, 1:2], dr[:, 2:3]

    def lerp_at(P, Q, bP, bQ, dP, dQ):
        denom = dP - dQ
        s = dP / jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
        s = jnp.clip(s, 0.0, 1.0)
        return P + s * (Q - P), bP + s * (bQ - bP)

    PAB, bPAB = lerp_at(A, B, bA, bB, dA, dB)   # on edge A->B
    PBC, bPBC = lerp_at(B, C, bB, bC, dB, dC)
    PCA, bPCA = lerp_at(C, A, bC, bA, dC, dA)

    k1 = (k == 1)[:, None]
    k2 = (k == 2)[:, None]
    k3 = (k == 3)[:, None]

    def pick(all3, two, one):
        return jnp.where(k3, all3, jnp.where(k2, two, jnp.where(k1, one, 0.0)))

    # sub-triangle 1: all-in -> (A,B,C); two-in -> (A,B,PBC);
    # one-in -> (A,PAB,PCA)
    t1 = jnp.stack([pick(A, A, A), pick(B, B, PAB), pick(C, PBC, PCA)], axis=1)
    b1 = jnp.stack([pick(bA, bA, bA), pick(bB, bB, bPAB),
                    pick(bC, bPBC, bPCA)], axis=1)
    v1_ok = valid & (k >= 1)
    # sub-triangle 2: only for two-in -> (A, PBC, PCA)
    t2 = jnp.stack([A, PBC, PCA], axis=1)
    b2 = jnp.stack([bA, bPBC, bPCA], axis=1)
    v2_ok = valid & (k == 2)

    return (jnp.concatenate([t1, t2], axis=0),
            jnp.concatenate([b1, b2], axis=0),
            jnp.concatenate([v1_ok, v2_ok], axis=0))


@functools.partial(jax.jit, static_argnames=("width", "height"))
def _raster_jit(scene: Scene, settings: RenderSettings, viewproj, width, height):
    tris = scene.triangles
    mats = scene.materials
    T = tris.v0.shape[0]
    npx = width * height

    # screen-space pixel centers
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=F32),
                          jnp.arange(width, dtype=F32), indexing="ij")
    px = xs.reshape(-1) + F32(0.5)
    py = ys.reshape(-1) + F32(0.5)

    def to_clip(p):
        ph = jnp.concatenate([p, jnp.ones((p.shape[0], 1), F32)], axis=1)
        return jnp.einsum("ni,ji->nj", ph, viewproj, precision="highest")

    clip = jnp.stack([to_clip(tris.v0), to_clip(tris.v0 + tris.e1),
                      to_clip(tris.v0 + tris.e2)], axis=1)      # (T, 3, 4)
    bary0 = jnp.broadcast_to(jnp.eye(3, dtype=F32)[None], (T, 3, 3))
    clip2, bary2, sub_ok = _near_clip(clip, bary0, jnp.asarray(tris.valid))
    sub_orig = jnp.concatenate([jnp.arange(T, dtype=jnp.int32)] * 2)

    def project(cl):
        w = cl[:, 3]
        ok = w > F32(1e-6)
        inv_w = jnp.where(ok, F32(1.0) / jnp.where(ok, w, F32(1.0)), F32(0.0))
        ndc = cl[:, :3] * inv_w[:, None]
        sx = (ndc[:, 0] + F32(1.0)) * F32(0.5) * width
        sy = (ndc[:, 1] + F32(1.0)) * F32(0.5) * height
        return sx, sy, ndc[:, 2], inv_w, ok

    x0, y0, z0, iw0, ok0 = project(clip2[:, 0])
    x1, y1, z1, iw1, ok1 = project(clip2[:, 1])
    x2, y2, z2, iw2, ok2 = project(clip2[:, 2])
    tri_ok = ok0 & ok1 & ok2 & sub_ok
    # original-triangle barycentrics of each sub-vertex, as 9 flat columns
    # (a (npx,3,3) gather later would get a T(4,128) 42x-padded layout)
    bcols = [bary2[:, vi, j] for vi in range(3) for j in range(3)]
    T = 2 * T

    def chunk_body(start, carry):
        zbuf, prim, bu, bv = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, _TRI_CHUNK)  # noqa: E731
        cx0, cy0, cz0 = sl(x0)[None], sl(y0)[None], sl(z0)[None]
        cx1, cy1, cz1 = sl(x1)[None], sl(y1)[None], sl(z1)[None]
        cx2, cy2, cz2 = sl(x2)[None], sl(y2)[None], sl(z2)[None]
        cw0, cw1, cw2 = sl(iw0)[None], sl(iw1)[None], sl(iw2)[None]
        cok = sl(tri_ok)[None]

        # edge functions (screen space), (P, C)
        pxc = px[:, None]
        pyc = py[:, None]
        area = (cx1 - cx0) * (cy2 - cy0) - (cy1 - cy0) * (cx2 - cx0)
        a_ok = jnp.abs(area) > F32(1e-12)
        inv_area = jnp.where(a_ok, F32(1.0), F32(0.0)) / \
            jnp.where(a_ok, area, F32(1.0))
        w0 = ((cx1 - pxc) * (cy2 - pyc) - (cy1 - pyc) * (cx2 - pxc)) * inv_area
        w1 = ((cx2 - pxc) * (cy0 - pyc) - (cy2 - pyc) * (cx0 - pxc)) * inv_area
        w2 = F32(1.0) - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & a_ok & cok
        z = w0 * cz0 + w1 * cz1 + w2 * cz2            # NDC z is screen-linear
        z = jnp.where(inside & (z >= 0.0) & (z <= 1.0), z, F32(2.0))

        zmin = jnp.min(z, axis=1)
        better = zmin < zbuf
        cols = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
        arg = jnp.argmin(z, axis=1)
        rows = jnp.arange(npx)
        return (
            jnp.where(better, zmin, zbuf),
            jnp.where(better, start + arg.astype(jnp.int32), prim),
            jnp.where(better, w0[rows, arg], bu),
            jnp.where(better, w1[rows, arg], bv),
        )

    n_chunks = -(-T // _TRI_CHUNK)
    pad = n_chunks * _TRI_CHUNK - T

    def padt(a, fill):
        return jnp.concatenate([a, jnp.full((pad,) + a.shape[1:], fill,
                                            a.dtype)]) if pad else a

    x0, y0, z0, iw0 = padt(x0, 0), padt(y0, 0), padt(z0, 2.0), padt(iw0, 0)
    x1, y1, z1, iw1 = padt(x1, 0), padt(y1, 0), padt(z1, 2.0), padt(iw1, 0)
    x2, y2, z2, iw2 = padt(x2, 0), padt(y2, 0), padt(z2, 2.0), padt(iw2, 0)
    tri_ok = padt(tri_ok, False)
    bcols = [padt(b, 0.0) for b in bcols]
    sub_orig = padt(sub_orig, 0)

    carry = (jnp.full((npx,), F32(1.5)), jnp.zeros((npx,), jnp.int32),
             jnp.zeros((npx,), F32), jnp.zeros((npx,), F32))
    carry = jax.lax.fori_loop(
        0, n_chunks, lambda i, c: chunk_body(i * _TRI_CHUNK, c), carry)
    zbuf, prim, w0b, w1b = carry
    hit = zbuf <= 1.0
    w2b = F32(1.0) - w0b - w1b

    # perspective-correct interpolation weights (within the sub-triangle)
    pw0 = w0b * iw0[prim]
    pw1 = w1b * iw1[prim]
    pw2 = w2b * iw2[prim]
    denom = jnp.maximum(pw0 + pw1 + pw2, F32(1e-20))
    pw0, pw1, pw2 = pw0 / denom, pw1 / denom, pw2 / denom

    # convert to ORIGINAL-triangle barycentrics via the sub-vertex bary
    # table, then interpolate attributes from the original corners
    b0 = pw0 * bcols[0][prim] + pw1 * bcols[3][prim] + pw2 * bcols[6][prim]
    b1 = pw0 * bcols[1][prim] + pw1 * bcols[4][prim] + pw2 * bcols[7][prim]
    b2 = pw0 * bcols[2][prim] + pw1 * bcols[5][prim] + pw2 * bcols[8][prim]
    orig = sub_orig[prim]

    world_pos = (b0[:, None] * tris.v0[orig]
                 + b1[:, None] * (tris.v0 + tris.e1)[orig]
                 + b2[:, None] * (tris.v0 + tris.e2)[orig])
    nrm = (b0[:, None] * tris.n0[orig] + b1[:, None] * tris.n1[orig]
           + b2[:, None] * tris.n2[orig])
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True),
                            F32(1e-30))
    mat_id = tris.mat_id[orig]
    # perspective-correct uv (vert_shader.vert:63 -> frag_shader.frag:86-91)
    # + the uv texel density the mip-LOD heuristic needs (as in shade())
    uv = (b0[:, None] * tris.uv0[orig] + b1[:, None] * tris.uv1[orig]
          + b2[:, None] * tris.uv2[orig])
    duv1 = tris.uv1[orig] - tris.uv0[orig]
    duv2 = tris.uv2[orig] - tris.uv0[orig]
    uv_area = jnp.abs(duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0])
    world_area = jnp.linalg.norm(
        jnp.cross(tris.e1[orig], tris.e2[orig]), axis=-1)
    tex_density = jnp.sqrt(uv_area / jnp.maximum(world_area, F32(1e-30)))

    # frag_shader.frag:56-99 — computeDiffuse + computeSpecular, no shadows
    light = settings.light
    lpos = jnp.asarray(light.position, F32)
    is_point = jnp.asarray(light.type, jnp.int32) == LIGHT_POINT
    ldir = lpos[None, :] - world_pos
    ldist = jnp.linalg.norm(ldir, axis=-1)
    L = jnp.where(is_point, ldir / jnp.maximum(ldist[:, None], F32(1e-20)),
                  lpos / jnp.maximum(jnp.linalg.norm(lpos), F32(1e-20)))
    lint = jnp.where(is_point,
                     jnp.asarray(light.intensity, F32)
                     / jnp.maximum(ldist * ldist, F32(1e-20)),
                     jnp.asarray(light.intensity, F32))

    ndotl = jnp.sum(nrm * L, axis=-1)
    diffuse = mats.diffuse[mat_id] * jnp.maximum(ndotl, 0.0)[:, None]
    diffuse = jnp.where((mats.illum[mat_id] >= 1)[:, None],
                        diffuse + mats.ambient[mat_id], diffuse)

    # viewDir: from eye to fragment (the raster path has no ray, frag uses
    # the camera position from the uniform)
    # eye = inverse(viewproj) is not available here; pass via settings? the
    # fragment shader uses viewDir = worldPos - eye; we recover the eye from
    # the caller instead (threaded as the last viewproj row trick is fragile)
    return hit, world_pos, nrm, mat_id, diffuse, lint, L, ndotl, uv, tex_density


def raster_render(scene: Scene, camera, width: int, height: int,
                  settings: RenderSettings | None = None):
    """Debug raster view of the triangle geometry (no shadows/reflections).

    Returns {"image": (H, W, 3) linear} — compare with the ray-traced view
    the way the reference's UI checkbox did.
    """
    if settings is None:
        settings = RenderSettings.default()
    from toroidal_ray_tracing_tpu.render.renderer import autofill_pixel_spread
    settings = autofill_pixel_spread(settings, camera, width, height)
    view, proj, _, _ = camera.matrices(width / height)
    viewproj = jnp.asarray((proj @ view).astype(F32))
    (hit, world_pos, nrm, mat_id, diffuse, lint, L, ndotl, uv,
     tex_density) = _raster_jit(scene, settings, viewproj, width, height)

    mats = scene.materials
    eye = jnp.asarray(np.asarray(camera.eye, F32))

    # texture modulate (frag_shader.frag:86-91: diffuse *= texture(txt, uv));
    # same trilinear footprint-LOD sampler as the ray path so the two views
    # stay pixel-identical on unshadowed geometry
    if scene.textures.data4q.shape[0] > 1:
        from toroidal_ray_tracing_tpu.trace.shade import (_sample_texture,
                                                          mip_lod)

        tex_id = jnp.asarray(mats.texture_id)[mat_id]
        tid = jnp.maximum(tex_id, 0)
        dist = jnp.linalg.norm(world_pos - eye[None, :], axis=-1)
        dim0 = jnp.maximum(scene.textures.sizes[tid, 0, 0],
                           scene.textures.sizes[tid, 0, 1]).astype(F32)
        lod = mip_lod(jnp, dist, jnp.asarray(settings.pixel_spread, F32),
                      tex_density, dim0)
        texel = _sample_texture(scene, tid, uv.T, lod).T       # (npx, 3)
        diffuse = jnp.where((tex_id >= 0)[:, None], diffuse * texel, diffuse)
    V = eye[None, :] - world_pos
    V = V / jnp.maximum(jnp.linalg.norm(V, axis=-1, keepdims=True), F32(1e-30))
    kshine = jnp.maximum(jnp.asarray(mats.shininess)[mat_id], 4.0)
    energy = (F32(2.0) + kshine) / F32(2.0 * np.pi)
    R = 2.0 * jnp.sum(L * nrm, axis=-1, keepdims=True) * nrm - L
    spec = energy * jnp.power(
        jnp.maximum(jnp.sum(V * R, axis=-1), 0.0), kshine)
    spec = jnp.where(jnp.asarray(mats.illum)[mat_id] >= 2, spec, 0.0)
    specular = jnp.asarray(mats.specular)[mat_id] * spec[:, None]

    color = lint[:, None] * (diffuse + specular)
    clear = jnp.asarray(settings.clear_color, F32)[:3]
    image = jnp.where(hit[:, None], color, clear[None, :])
    return {"image": image.reshape(height, width, 3)}
