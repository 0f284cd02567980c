"""Raster debug path (L3): must agree with the ray tracer on unshadowed
diffuse geometry (the two paths share the shading library, like the
reference's raster/RT toggle — frag_shader.frag vs raytrace.rchit)."""

import numpy as np

from toroidal_ray_tracing_tpu.cameras import PinholeCamera
from toroidal_ray_tracing_tpu.render import render
from toroidal_ray_tracing_tpu.render.raster import raster_render
from toroidal_ray_tracing_tpu.scene import RenderSettings, build_scene, procedural

RES = 48


def test_raster_matches_ray_where_unshadowed():
    # a single plane lit from straight above: no occluders, no shadows, so
    # raster (no shadow rays) and ray tracing must agree exactly
    # geometry fully in front of the camera (the debug rasterizer culls
    # triangles crossing the near plane instead of clipping them)
    sd = procedural.SceneDef()
    sd.add_model(procedural.plane(3.0, material=procedural.matte(
        (0.6, 0.5, 0.4), illum=2, shininess=16.0, specular=(0.3, 0.3, 0.3))))
    scene = build_scene(sd)
    cam = PinholeCamera(eye=(6.0, 7.0, 6.5), center=(0.0, 0.0, 0.0))
    st = RenderSettings.default(max_depth=1,
                                light_position=(2.0, 9.0, 1.0),
                                light_intensity=80.0)
    ray = np.asarray(render(scene, cam, RES, RES, st)["image"])
    ras = np.asarray(raster_render(scene, cam, RES, RES, st)["image"])

    # compare only pixels hit in both (edges rasterize slightly differently)
    ray_hit = np.abs(ray - 0.8).max(axis=-1) > 1e-5   # not clear*0.8
    ras_hit = np.abs(ras - 1.0).max(axis=-1) > 1e-5   # not clear color
    both = ray_hit & ras_hit
    assert both.mean() > 0.1
    diff = np.abs(ray - ras).max(axis=-1)[both]
    assert np.median(diff) < 1e-3
    assert np.percentile(diff, 95) < 5e-3


def test_raster_textured_matches_ray():
    """Textured parity: the raster path must modulate diffuse by the
    material texture (frag_shader.frag:86-91) with the same trilinear
    footprint-LOD sampler as the ray tracer — pixel-identical on
    unshadowed geometry."""
    import dataclasses

    base = procedural.plane(3.0, material=procedural.matte(
        (0.9, 0.9, 0.9), illum=1, specular=(0, 0, 0)))
    tex = np.zeros((8, 8, 3), np.float32)
    tex[::2, ::2] = (1.0, 0.2, 0.2)
    tex[1::2, 1::2] = (1.0, 0.2, 0.2)
    tex[tex.sum(-1) == 0] = (0.2, 0.2, 1.0)
    mats = [dict(base.materials[0], texture_id=0)]
    mesh = dataclasses.replace(base, materials=mats, textures=[tex])
    sd = procedural.SceneDef()
    sd.add_model(mesh)
    scene = build_scene(sd)
    cam = PinholeCamera(eye=(4.0, 5.0, 4.5), center=(0.0, 0.0, 0.0))
    st = RenderSettings.default(max_depth=1,
                                light_position=(2.0, 9.0, 1.0),
                                light_intensity=80.0)
    ray = np.asarray(render(scene, cam, RES, RES, st)["image"])
    ras = np.asarray(raster_render(scene, cam, RES, RES, st)["image"])

    ray_hit = np.abs(ray - 0.8).max(axis=-1) > 1e-5
    ras_hit = np.abs(ras - 1.0).max(axis=-1) > 1e-5
    both = ray_hit & ras_hit
    assert both.mean() > 0.1
    # the checker must be visible in the raster view (red- and
    # blue-dominant regions), not just the untextured 0.9-gray diffuse
    r, b = ras[..., 0][both], ras[..., 2][both]
    assert (r > b * 1.4).any() and (b > r * 1.4).any()
    diff = np.abs(ray - ras).max(axis=-1)[both]
    assert np.median(diff) < 1e-3
    assert np.percentile(diff, 95) < 5e-3


def test_raster_near_plane_clipping():
    """Interior camera: a big ground plane extends BEHIND the camera, so its
    triangles cross the near plane. The old path culled them (empty image);
    the clipper must keep the front parts and still match the ray tracer on
    unshadowed pixels (hardware rasterizers clip — fixed-function behavior
    behind the reference's vert_shader.vert)."""
    sd = procedural.SceneDef()
    sd.add_model(procedural.plane(50.0, material=procedural.matte(
        (0.6, 0.5, 0.4), illum=1, specular=(0, 0, 0))))
    scene = build_scene(sd)
    # camera low over the plane's middle, looking slightly down: the plane's
    # two 50x50 triangles both pierce the near plane
    cam = PinholeCamera(eye=(0.0, 1.5, 0.0), center=(8.0, 0.0, 0.0))
    st = RenderSettings.default(max_depth=1, light_type=1,
                                light_position=(0.0, 1.0, 0.0),
                                light_intensity=1.0)
    ray = np.asarray(render(scene, cam, RES, RES, st)["image"])
    ras = np.asarray(raster_render(scene, cam, RES, RES, st)["image"])

    ray_hit = np.abs(ray - 0.8).max(axis=-1) > 1e-5
    ras_hit = np.abs(ras - 1.0).max(axis=-1) > 1e-5
    # the clipped raster must actually draw the plane (the cull-only path
    # rendered nothing here)
    assert ras_hit.mean() > 0.3
    both = ray_hit & ras_hit
    assert both.mean() > 0.3
    diff = np.abs(ray - ras).max(axis=-1)[both]
    assert np.median(diff) < 1e-3
    assert np.percentile(diff, 95) < 5e-3


def test_raster_zbuffer_ordering():
    # nearer geometry must win the z-buffer
    sd = procedural.SceneDef()
    sd.add_model(procedural.plane(3.0, y=0.0, material=procedural.matte(
        (1.0, 0.0, 0.0), illum=0, specular=(0, 0, 0))))
    sd.add_model(procedural.plane(1.0, y=1.0, material=procedural.matte(
        (0.0, 1.0, 0.0), illum=0, specular=(0, 0, 0))))
    scene = build_scene(sd)
    cam = PinholeCamera(eye=(0.0, 6.0, 0.01), center=(0.0, 0.0, 0.0))
    st = RenderSettings.default(max_depth=1, light_type=1,
                                light_position=(0.0, 1.0, 0.0),
                                light_intensity=1.0)
    img = np.asarray(raster_render(scene, cam, 32, 32, st)["image"])
    c = img[16, 16]
    assert c[1] > c[0]  # green (upper plane) wins at the center
    corner = img[2, 2]
    assert corner[0] > corner[1]  # red plane visible at the edges
