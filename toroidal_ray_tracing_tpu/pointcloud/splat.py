"""Point-cloud reprojection — the TPU-native `ray_tracing__before_second`.

App 2 re-renders the toroidal capture as a point cloud: it zips the
position/color text dumps into a `Point{vec4 pos; vec4 color}` buffer and
rasterizes with POINT_LIST topology, 2.5-px points and LESS depth test from a
normal pinhole camera (VKT/ray_tracing__before_second/hello_vulkan.cpp:
143-270, 313-330; shaders/vert_shader.vert:43-52).

Here: project all points with the same viewProj matrix, then z-buffer them
with scatter-min and resolve colors with a masked scatter-max — a pure-
functional rasterizer (one `jit`, no loops). Point size 2.5 px maps to a 3x3
splat neighborhood covering pixel centers within size/2, like the GL point
rasterization rule.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from toroidal_ray_tracing_tpu.io.dumps import FLOAT_LOWEST

F32 = np.float32
POINT_SIZE = 2.5  # gl_PointSize (vert_shader.vert:51)

_jit_cache: dict = {}


def splat_points(positions, colors, camera, width: int, height: int,
                 clear_color=(1.0, 1.0, 1.0), point_size: float = POINT_SIZE,
                 return_cover: bool = False, fill_holes: float = 0.0):
    """Render a point cloud. positions/colors: (N, 3) float32 (sentinel
    FLOAT_LOWEST rows are dropped, mirroring app 2's `-nan` handling).

    return_cover: also return the (H, W) bool mask of pixels some point
    won plus the surviving point count — the splat-sparsity metrics
    (VERDICT r4 item 6: holes vs renderer error must be separable).
    fill_holes > point_size: FRAMEWORK EXTENSION beyond the reference's
    fixed 2.5-px rasterization — pixels no point covered are resolved by
    a second, fatter splat pass (its own z-buffer, so the fill stays
    depth-aware and occluded points cannot bleed through); base-pass
    pixels are untouched, so the reference-parity image is a strict
    subset of the output.

    Returns (H, W, 3) linear color image (jnp array), or
    (image, cover, n_points) with return_cover.
    """
    positions = np.asarray(positions, F32)
    colors = np.asarray(colors, F32)
    keep = ~np.any(positions <= FLOAT_LOWEST * 0.5, axis=1)
    positions = positions[keep]
    colors = colors[keep]

    view, proj, _, _ = camera.matrices(width / height)
    viewproj = (proj @ view).astype(F32)

    key = (width, height, float(point_size), float(fill_holes))
    if key not in _jit_cache:
        w, h, ps, fh = key

        def run(p, c, m, cc, w=int(w), h=int(h), ps=ps, fh=fh):
            img, won = _splat_core(p, c, m, cc, w, h, ps)
            if fh > ps:
                fimg, fwon = _splat_core(p, c, m, cc, w, h, fh)
                img = jnp.where(won[:, :, None], img, fimg)
                won = won | fwon
            return img, won

        _jit_cache[key] = jax.jit(run)
    img, won = _jit_cache[key](jnp.asarray(positions), jnp.asarray(colors),
                               jnp.asarray(viewproj),
                               jnp.asarray(clear_color, F32))
    if return_cover:
        return img, won, int(positions.shape[0])
    return img


def _splat_core(positions, colors, viewproj, clear, width, height, point_size):
    n = positions.shape[0]
    ph = jnp.concatenate([positions, jnp.ones((n, 1), F32)], axis=1)
    clip = jnp.einsum("ni,ji->nj", ph, viewproj, precision="highest")
    w = clip[:, 3]
    w_ok = w > F32(1e-6)
    ndc = clip[:, :3] / jnp.where(w_ok, w, F32(1.0))[:, None]
    # Vulkan viewport transform: [-1,1] -> pixels, depth in [0,1], LESS test
    px = (ndc[:, 0] + F32(1.0)) * F32(0.5) * width - F32(0.5)
    py = (ndc[:, 1] + F32(1.0)) * F32(0.5) * height - F32(0.5)
    z = ndc[:, 2]
    visible = w_ok & (z >= 0.0) & (z <= 1.0)

    npx = width * height
    half = F32(point_size / 2.0)
    r = int(np.ceil((point_size - 1.0) / 2.0))

    zbuf = jnp.full((npx,), F32(1.0))
    taps = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            xi = jnp.round(px).astype(jnp.int32) + dx
            yi = jnp.round(py).astype(jnp.int32) + dy
            cover = (jnp.abs(xi.astype(F32) - px) <= half) \
                & (jnp.abs(yi.astype(F32) - py) <= half)
            ok = visible & cover & (xi >= 0) & (xi < width) \
                & (yi >= 0) & (yi < height)
            idx = jnp.where(ok, yi * width + xi, 0)
            zi = jnp.where(ok, z, F32(2.0))
            taps.append((idx, zi, ok))
            zbuf = zbuf.at[idx].min(zi)

    # color resolve: a point wins a pixel iff its depth equals the z-buffer.
    # QUIRK DECISION (SURVEY.md §7.5 style): equal-depth ties resolve to the
    # MAX color among the tied points. The reference colors by
    # gl_PrimitiveID (before_second/shaders/frag_shader.frag:43-45), i.e.
    # draw order, which is rasterization-order-dependent on real hardware
    # and not reproducible here; max-color is deterministic and
    # order-independent (exact ties between distinct cloud points are
    # measure-zero for real capture data). Documented, not replicated.
    win_accum = jnp.full((npx, 3), F32(-1.0))
    won = jnp.zeros((npx,), bool)
    for idx, zi, ok in taps:
        winner = ok & (zi <= zbuf[idx])
        win_accum = win_accum.at[idx].max(
            jnp.where(winner[:, None], colors, F32(-1.0)))
        won = won.at[idx].max(winner)
    img = jnp.where(won[:, None], jnp.maximum(win_accum, 0.0),
                    jnp.broadcast_to(clear[:3], (npx, 3)))
    return img.reshape(height, width, 3), won.reshape(height, width)
