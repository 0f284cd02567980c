"""Mipmapped texture sampling (reference: mip generation at upload,
hello_vulkan.cpp:339, and an always-mipmapped sampler :315-318).

The quality gate is the one VERDICT asks for: a minification scene where
level-0 bilinear visibly aliases and the mipped path matches a supersampled
ground truth much more closely.
"""

import numpy as np
import pytest

from toroidal_ray_tracing_tpu.cameras import PinholeCamera
from toroidal_ray_tracing_tpu.oracle import render_oracle
from toroidal_ray_tracing_tpu.render import render
from toroidal_ray_tracing_tpu.scene import RenderSettings, build_scene, procedural
from toroidal_ray_tracing_tpu.scene.build import build_texture_atlas, _mip_chain

F32 = np.float32


def checkerboard(n=64, cells=16):
    # dark/light grayscale checker via the library generator
    return procedural.checker_texture(n, cells, (0.15,) * 3, (1.0,) * 3)


def textured_floor_scene():
    tex = checkerboard()
    mesh = procedural.plane(40.0, material=procedural.matte(
        (1.0, 1.0, 1.0), illum=1, specular=(0, 0, 0), texture_id=0))
    # tile the checker 40x over the plane
    mesh.uvs = mesh.uvs * 40.0
    mesh.textures = [tex]
    sd = procedural.SceneDef()
    sd.add_model(mesh)
    return sd


def test_mip_chain_box_filter():
    img = np.arange(4 * 4 * 3, dtype=F32).reshape(4, 4, 3)
    chain = _mip_chain(img)
    assert [c.shape[:2] for c in chain] == [(4, 4), (2, 2), (1, 1)]
    expect = (img[0::2, 0::2] + img[1::2, 0::2]
              + img[0::2, 1::2] + img[1::2, 1::2]) / 4.0
    np.testing.assert_allclose(chain[1], expect, rtol=1e-6)
    np.testing.assert_allclose(chain[2][0, 0], img.mean(axis=(0, 1)),
                               rtol=1e-6)


def test_atlas_layout():
    atlas = build_texture_atlas([checkerboard(8), checkerboard(32)])
    assert int(atlas.n_levels[0]) == 4 and int(atlas.n_levels[1]) == 6
    # offsets are distinct per real level and clamp past the chain end
    o0 = np.asarray(atlas.offsets)[0]
    assert len(set(o0[:4].tolist())) == 4
    assert o0[4] == o0[3] and o0[5] == o0[3]
    sz = np.asarray(atlas.sizes)
    assert tuple(sz[1, 0]) == (32, 32) and tuple(sz[1, 5]) == (1, 1)


def test_quad_pack_matches_four_taps():
    """The single-gather data4 path is bit-for-bit the 4-tap path: random
    uvs/lods (incl. exact wrap edges) over a mixed-size multi-texture
    atlas, both mip levels of the trilinear blend exercised."""
    import jax.numpy as jnp
    import types

    from toroidal_ray_tracing_tpu.trace.shade import _sample_texture

    rng = np.random.default_rng(11)
    atlas = build_texture_atlas([
        rng.uniform(size=(16, 64, 3)).astype(F32),     # non-square
        checkerboard(32),
        rng.uniform(size=(4, 4, 3)).astype(F32),
    ])
    scene = types.SimpleNamespace(textures=atlas)
    n = 1024
    uv = rng.uniform(size=(2, n)).astype(F32)
    uv[:, :8] = np.array([[0.0, 1.0, 0.999999, 0.5, 0.0, 1.0, 0.25, 0.75],
                          [0.0, 1.0, 0.5, 0.999999, 1.0, 0.0, 0.75, 0.25]],
                         F32)
    lod = rng.uniform(0.0, 7.0, size=n).astype(F32)  # past chain ends too
    tid = rng.integers(0, 3, size=n).astype(np.int32)
    q = np.asarray(_sample_texture(scene, jnp.asarray(tid), jnp.asarray(uv),
                                   jnp.asarray(lod), quad=True))
    t = np.asarray(_sample_texture(scene, jnp.asarray(tid), jnp.asarray(uv),
                                   jnp.asarray(lod), quad=False))
    np.testing.assert_array_equal(q, t)
    # level-0 (lod=None) path too
    q0 = np.asarray(_sample_texture(scene, jnp.asarray(tid),
                                    jnp.asarray(uv), quad=True))
    t0 = np.asarray(_sample_texture(scene, jnp.asarray(tid),
                                    jnp.asarray(uv), quad=False))
    np.testing.assert_array_equal(q0, t0)


def _ground_truth(scene, cam, res, st):
    """Supersampled level-0 oracle: 4x resolution, box-downsampled."""
    hi = render_oracle(scene, cam, res * 4, res * 4,
                       st._replace(pixel_spread=F32(-1.0)))["image"]
    return hi.reshape(res, 4, res, 4, 3).mean(axis=(1, 3))


@pytest.mark.parametrize("backend", ["jnp", "pallas"])
def test_minification_antialiasing(backend):
    res = 48
    sd = textured_floor_scene()
    scene = build_scene(sd)
    cam = PinholeCamera(eye=(0.0, 2.0, 14.0), center=(0.0, 0.0, -10.0))
    st = RenderSettings.default(max_depth=1, light_type=1,
                                light_position=(0.0, 1.0, 0.0),
                                light_intensity=1.0)
    truth = _ground_truth(scene, cam, res, st)

    lvl0 = np.asarray(render(scene, cam, res, res,
                             st._replace(pixel_spread=F32(-1.0)),
                             backend=backend)["image"])
    mipped = np.asarray(render(scene, cam, res, res, st,
                               backend=backend)["image"])

    def err(img):
        return float(np.sqrt(((img - truth) ** 2).mean()))

    e0, em = err(lvl0), err(mipped)
    # level 0 aliases badly under 40x tiling; mips must at least halve the
    # error and land within a loose absolute tolerance of the ground truth
    assert em < 0.5 * e0, f"mips {em} not << level0 {e0}"
    # residual vs the supersampled truth is the usual isotropic-trilinear
    # blur on an anisotropically compressed pattern (~0.08 here vs 0.27)
    assert em < 0.12, f"mipped error {em}"


@pytest.mark.parametrize("backend", ["jnp", "pallas"])
def test_textured_scenario_matches_oracle(backend):
    """The config-7 ladder scene (textured mesh torus + mirror + tiled
    floor) vs the oracle, through both backends."""
    scene = build_scene(procedural.scene_textured_mesh())
    cam = PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0))
    st = RenderSettings.default(max_depth=3)
    o = render_oracle(scene, cam, 64, 64, st)["image"]
    d = np.asarray(render(scene, cam, 64, 64, st, backend=backend)["image"])
    rmse = float(np.sqrt(((d - o) ** 2).mean()))
    assert rmse < 1e-3, rmse


def test_quad_gather_kernel_bit_exact():
    """ops/tex_kernel.quad_gather_pallas must reproduce the XLA gather's
    words bit-exactly for scattered indices, and return zeros for invalid
    rays without letting them widen any span's block range (all-invalid
    spans walk zero blocks)."""
    import jax.numpy as jnp

    from toroidal_ray_tracing_tpu.ops import tex_kernel

    rng = np.random.default_rng(5)
    T = 3000  # not a multiple of the 1024-texel block (pad path)
    tab = rng.integers(0, 1 << 32, (T, 3), dtype=np.uint64).astype(np.uint32)
    n = 2500  # not a multiple of the 1024-ray tile (pad path)
    # block-coherent-ish indices with scattered outliers (real spans are
    # coherent; the kernel must still be exact when they are not)
    f0 = np.minimum(rng.integers(0, T, (n,)), T - 1).astype(np.int32)
    f1 = np.clip(f0 + rng.integers(-40, 40, (n,)), 0, T - 1).astype(np.int32)
    valid = rng.random(n) > 0.1
    valid[256:384] = False  # one whole 128-lane span invalid

    q0, q1 = tex_kernel.quad_gather_pallas(
        jnp.asarray(tab), jnp.asarray(f0), jnp.asarray(f1),
        jnp.asarray(valid))
    q0, q1 = np.asarray(q0), np.asarray(q1)
    np.testing.assert_array_equal(q0[:, valid], tab[f0[valid]].T)
    np.testing.assert_array_equal(q1[:, valid], tab[f1[valid]].T)
    # invalid rays are unspecified when their block is visited anyway
    # (callers mask them), but an ALL-invalid span walks zero blocks
    assert (q0[:, 256:384] == 0).all() and (q1[:, 256:384] == 0).all()


def test_sample_texture_kernel_matches_xla_path():
    """_sample_texture(backend='pallas') (Mosaic gather kernel) must equal
    the XLA quad-gather path bit-for-bit on real mip-chain indices."""
    import jax.numpy as jnp

    from toroidal_ray_tracing_tpu.trace import shade as sh

    scene = build_scene(textured_floor_scene())
    rng = np.random.default_rng(7)
    n = 4096
    uv = jnp.asarray(rng.random((2, n), np.float32) * 3.0)
    tid = jnp.zeros((n,), jnp.int32)
    lod = jnp.asarray(rng.random(n, np.float32) * 6.0)
    a = sh._sample_texture(scene, tid, uv, lod, backend="jnp")
    b = sh._sample_texture(scene, tid, uv, lod, backend="pallas",
                           valid=jnp.ones((n,), bool))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mipped_render_matches_oracle():
    """TPU path vs oracle with the SAME lod math: tight parity."""
    res = 32
    scene = build_scene(textured_floor_scene())
    cam = PinholeCamera(eye=(0.0, 2.0, 14.0), center=(0.0, 0.0, -10.0))
    st = RenderSettings.default(max_depth=1, light_type=1,
                                light_position=(0.0, 1.0, 0.0),
                                light_intensity=1.0)
    o = render_oracle(scene, cam, res, res, st)["image"]
    d = np.asarray(render(scene, cam, res, res, st)["image"])
    rmse = float(np.sqrt(((d - o) ** 2).mean()))
    assert rmse < 1e-3, rmse
