"""Build-time invariants of scene/build.py in isolation: cluster AABB
tightness, loose-split markers, atlas quantization round-trips, refit
idempotence. The parity/golden suites cover end-to-end correctness; these
pin the internals the kernels depend on (a loose cluster bound silently
costs dispatches, not wrong pixels, so only a direct assert catches it)."""

import numpy as np
import pytest


def _box_scene(centers, cluster_size=128):
    """SceneDef of axis-aligned unit cubes at the given centers."""
    from toroidal_ray_tracing_tpu.scene import procedural
    from toroidal_ray_tracing_tpu.scene.types import Instance, SceneDef

    cube = procedural.cube(1.0, materials=[procedural.matte()])
    insts = []
    for c in centers:
        xf = np.eye(4, dtype=np.float32)
        xf[:3, 3] = c
        insts.append(Instance(obj_index=0, transform=xf))
    return SceneDef(models=[cube], instances=insts)


def test_cluster_aabbs_tight_and_cover_all_valid():
    """Every valid triangle lies inside its cluster's AABB, and every
    cluster AABB is the exact hull of its valid rows (no FAR-sentinel
    inflation from padding — the culling bug class SAH padding invites)."""
    from toroidal_ray_tracing_tpu.scene.build import build_scene

    rng = np.random.default_rng(0)
    centers = rng.uniform(-20, 20, (40, 3)).astype(np.float32)
    scene = build_scene(_box_scene(centers))
    tris = scene.triangles
    cs = scene.cluster_size
    C = len(scene.cluster_lo)
    v0, e1, e2 = (np.asarray(a) for a in (tris.v0, tris.e1, tris.e2))
    lo = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    hi = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
    valid = np.asarray(tris.valid)
    assert valid.sum() == 40 * 12  # all cube faces survived the build
    for ci in range(C):
        rows = slice(ci * cs, (ci + 1) * cs)
        m = valid[rows]
        if not m.any():
            # empty cluster: far POINT box (inverted boxes pass slab tests)
            assert (scene.cluster_hi[ci] == scene.cluster_lo[ci]).all()
            assert (scene.cluster_lo[ci] >= 1e29).all()
            continue
        np.testing.assert_allclose(scene.cluster_lo[ci], lo[rows][m].min(0),
                                   rtol=1e-6)
        np.testing.assert_allclose(scene.cluster_hi[ci], hi[rows][m].max(0),
                                   rtol=1e-6)


def test_sah_clusters_beat_fixed_chunking_on_clustered_geometry():
    """The native binned-SAH clusterer must produce spatially tighter leaves
    than naive index-order chunking on geometry with two distant islands
    (the whole point of the builder)."""
    from toroidal_ray_tracing_tpu.io import native
    from toroidal_ray_tracing_tpu.scene.build import build_scene

    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(1)
    # two islands 200 apart, enough cubes for several 128-tri clusters
    centers = np.concatenate([
        rng.uniform(-3, 3, (20, 3)), rng.uniform(197, 203, (20, 3))])
    scene = build_scene(_box_scene(centers.astype(np.float32)))
    ext = np.asarray(scene.cluster_hi) - np.asarray(scene.cluster_lo)
    live = (ext >= 0).all(axis=1) & (ext.sum(axis=1) < 1e29)
    # no live cluster may straddle the 200-unit gap
    assert live.any()
    assert ext[live].max() < 100.0, ext[live].max()


def test_degenerate_triangles_dropped_and_marked():
    """Zero-area rows are dropped at build; remaining Woop rows of padding
    slots are guaranteed misses (W = 0, c_z = 1 => d'_z = 0)."""
    from toroidal_ray_tracing_tpu.scene.build import build_scene
    from toroidal_ray_tracing_tpu.scene.types import (Instance, SceneDef,
                                                      TriangleMesh)

    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [2, 2, 2]], np.float32)
    nrm = np.tile(np.float32([0, 0, 1]), (4, 1))
    idx = np.array([[0, 1, 2], [3, 3, 3], [0, 1, 1]], np.int32)  # 2 degenerate
    mesh = TriangleMesh(positions=pos, normals=nrm,
                        colors=np.ones((4, 3), np.float32), uvs=None,
                        indices=idx, mat_index=np.zeros(3, np.int32),
                        materials=[{}], textures=[])
    scene = build_scene(SceneDef(models=[mesh],
                                 instances=[Instance(0, np.eye(4))]))
    valid = np.asarray(scene.triangles.valid)
    assert valid.sum() == 1
    woop_o = np.asarray(scene.triangles.woop_o)   # (3, 4, T)
    pad = ~valid
    assert (woop_o[:, :3, pad] == 0).all()        # W = 0 rows
    assert (woop_o[2, 3, pad] == 1).all()         # c_z = 1


def test_atlas_quantization_round_trip_and_quad_pack():
    """8-bit sources survive the sRGB-u8 quantize/dequant round trip
    bit-exactly, and every data4q byte equals the wrap-addressed 2x2
    neighbourhood of its texel (the quad-gather correctness contract)."""
    from toroidal_ray_tracing_tpu.scene.build import build_texture_atlas
    from toroidal_ray_tracing_tpu.scene.types import tex_dequant

    rng = np.random.default_rng(2)
    src8 = rng.integers(0, 256, (4, 6, 3), np.uint8)
    linear = (src8.astype(np.float32) / 255.0) ** np.float32(2.2)
    atlas = build_texture_atlas([linear])
    h, w = 4, 6
    off = int(atlas.offsets[0, 0])
    words = np.asarray(atlas.data4q[off:off + h * w]).reshape(h, w, 3)
    # tap 0 round-trips the source exactly
    t00 = ((words >> np.uint32(0)) & np.uint32(0xFF)).astype(np.uint8)
    np.testing.assert_array_equal(t00, src8)
    # taps 1-3 are the wrapped +x / +y / +x+y neighbours
    for tap, (dy, dx) in ((1, (0, 1)), (2, (1, 0)), (3, (1, 1))):
        tb = ((words >> np.uint32(8 * tap)) & np.uint32(0xFF)).astype(np.uint8)
        np.testing.assert_array_equal(
            tb, np.roll(np.roll(src8, -dy, axis=0), -dx, axis=1))
    # dequant is the sampler's sRGB decode of the quantized byte
    np.testing.assert_allclose(
        np.asarray(tex_dequant(words[..., 0], 0)),
        (src8[..., 0] / 255.0) ** 2.2, rtol=1e-6)


def test_atlas_mip_chain_layout():
    """Mip offsets/sizes: halving chain down to 1x1, shorter chains clamp
    to their last level (offset duplication), n_levels is per texture."""
    from toroidal_ray_tracing_tpu.scene.build import build_texture_atlas

    big = np.zeros((8, 4, 3), np.float32)
    small = np.ones((2, 2, 3), np.float32)
    atlas = build_texture_atlas([big, small])
    assert atlas.offsets.shape[1] == 4          # log2(8) + 1
    assert list(atlas.n_levels) == [4, 2]
    np.testing.assert_array_equal(atlas.sizes[0], [[8, 4], [4, 2],
                                                   [2, 1], [1, 1]])
    # texture 1 has 2 real levels; levels 2-3 clamp to level 1's offset
    assert atlas.offsets[1, 2] == atlas.offsets[1, 1]
    assert atlas.offsets[1, 3] == atlas.offsets[1, 1]
    # offsets are disjoint ascending over real levels
    reals = [atlas.offsets[0, k] for k in range(4)] + [atlas.offsets[1, 0],
                                                       atlas.offsets[1, 1]]
    assert sorted(set(int(r) for r in reals)) == [int(r) for r in reals]


def test_refit_instance_idempotent_and_matches_rebuild():
    """refit old->new == build with new transform (Woop rows, cluster
    AABBs, torus tables); refitting back restores the original to fp
    tolerance (the updateSubjectPosition per-frame path)."""
    from toroidal_ray_tracing_tpu.scene import procedural
    from toroidal_ray_tracing_tpu.scene.build import build_scene, refit_instance
    from toroidal_ray_tracing_tpu.scene.types import Instance, SceneDef, Torus

    cube = procedural.cube(1.0, materials=[procedural.matte()])
    tor = Torus(major_radius=2.0, minor_radius=0.5,
                materials=[procedural.matte()])
    xf0 = np.eye(4, dtype=np.float32)
    xf1 = np.eye(4, dtype=np.float32)
    xf1[:3, 3] = (3.0, -1.0, 2.0)

    def sdef(x):
        return SceneDef(models=[cube, tor],
                        instances=[Instance(0, np.array(x)),
                                   Instance(1, np.array(x))])

    s0 = build_scene(sdef(xf0), use_native=False)
    s1_ref = build_scene(sdef(xf1), use_native=False)
    s1 = refit_instance(refit_instance(s0, 0, xf0, xf1), 1, xf0, xf1)
    np.testing.assert_allclose(s1.triangles.v0, s1_ref.triangles.v0,
                               atol=1e-5)
    np.testing.assert_allclose(s1.triangles.woop_o, s1_ref.triangles.woop_o,
                               atol=1e-4)
    np.testing.assert_allclose(s1.cluster_lo, s1_ref.cluster_lo, atol=1e-5)
    np.testing.assert_allclose(s1.cluster_hi, s1_ref.cluster_hi, atol=1e-5)
    np.testing.assert_allclose(s1.tori.world_to_obj, s1_ref.tori.world_to_obj,
                               atol=1e-5)
    np.testing.assert_allclose(s1.tori.center, s1_ref.tori.center, atol=1e-5)
    # round trip back to the original pose
    s0_back = refit_instance(refit_instance(s1, 0, xf1, xf0), 1, xf1, xf0)
    np.testing.assert_allclose(s0_back.triangles.v0, s0.triangles.v0,
                               atol=1e-5)
    np.testing.assert_allclose(s0_back.cluster_lo, s0.cluster_lo, atol=1e-5)
    np.testing.assert_allclose(s0_back.tori.center, s0.tori.center, atol=1e-5)


def test_small_scene_cluster_size_adapts():
    """A 2-triangle scene gets a narrow (multiple-of-8) cluster instead of
    a 128-wide pair tile of padding."""
    from toroidal_ray_tracing_tpu.scene import procedural
    from toroidal_ray_tracing_tpu.scene.build import build_scene
    from toroidal_ray_tracing_tpu.scene.types import Instance, SceneDef

    sd = SceneDef(models=[procedural.plane(4.0)],
                  instances=[Instance(0, np.eye(4))])
    scene = build_scene(sd)
    assert scene.cluster_size == 8
    assert np.asarray(scene.triangles.valid).sum() == 2


def test_torus_mesh_fast_matches_loop_tessellator():
    """torus_mesh_fast (the vectorized >1M-tri generator behind config 8's
    streamed-mesh scene) must emit exactly torus_mesh's vertices/indices."""
    from toroidal_ray_tracing_tpu.scene import procedural as p

    a = p.torus_mesh(1.3, 0.4, seg_major=12, seg_minor=7)
    b = p.torus_mesh_fast(1.3, 0.4, seg_major=12, seg_minor=7)
    np.testing.assert_allclose(a.positions, b.positions, atol=1e-6)
    np.testing.assert_allclose(a.normals, b.normals, atol=1e-6)
    np.testing.assert_allclose(a.uvs, b.uvs, atol=1e-6)
    np.testing.assert_array_equal(a.indices, b.indices)
    np.testing.assert_array_equal(a.mat_index, b.mat_index)


def test_scene_hires_mesh_small_renders():
    """A downsized config-8 scene builds and renders (the full-size mesh
    crosses TRI_STREAM_MIN and is exercised by the hardware ladder; the
    streamed kernel's parity is pinned by test_pallas)."""
    from toroidal_ray_tracing_tpu.cameras import PinholeCamera
    from toroidal_ray_tracing_tpu.render import render
    from toroidal_ray_tracing_tpu.scene import (RenderSettings, build_scene,
                                                procedural)

    scene = build_scene(procedural.scene_hires_mesh(seg=16))
    cam = PinholeCamera(eye=(6.0, 4.0, 6.0), center=(0.0, 0.6, 0.0))
    out = render(scene, cam, 24, 24, RenderSettings.default(max_depth=2),
                 backend="pallas")
    img = np.asarray(out["image"])
    assert np.isfinite(img).all() and img.std() > 0.01


def test_split_loose_clusters_edge_cases():
    """_split_loose_clusters fires whenever the loose total stays tiny (the
    hoist prepass is dense over loose x rays); with no dense cluster left
    the tail IS the whole table and the orchestrator skips the triangle
    kernel launch."""
    import numpy as np

    from toroidal_ray_tracing_tpu.scene.build import _split_loose_clusters

    cs = 16
    # one dense + one sparse cluster -> sparse rows move to a tail cluster
    slots = np.concatenate([np.arange(16),
                            [16, 17] + [-1] * 14]).astype(np.int64)
    out, n_loose = _split_loose_clusters(slots, cs)
    assert n_loose == 2
    assert list(out[:16]) == list(range(16))
    assert list(out[16:18]) == [16, 17] and (out[18:] == -1).all()

    # all clusters sparse -> everything compacts into one tail cluster
    # (plane-only scenes: no kernel launch at all)
    slots = np.array([0, 1] + [-1] * 14 + [2] + [-1] * 15, np.int64)
    out, n_loose = _split_loose_clusters(slots, cs)
    assert n_loose == 3
    assert list(out[:3]) == [0, 1, 2] and (out[3:] == -1).all()
    assert len(out) == cs

    # loose total above LOOSE_TOTAL_MAX -> untouched
    many = []
    for c in range(4):                      # 4 sparse clusters x 5 = 20 > 16
        many += [100 + 5 * c + i for i in range(5)] + [-1] * 11
    slots = np.concatenate([np.arange(16), np.array(many)]).astype(np.int64)
    out, n_loose = _split_loose_clusters(slots, cs)
    assert n_loose == 0 and (out == slots).all()

    # single sparse cluster -> all-loose (live-first compaction)
    slots = np.array([-1, 5, -1, 3] + [-1] * 12, np.int64)
    out, n_loose = _split_loose_clusters(slots, cs)
    assert n_loose == 2 and list(out[:2]) == [5, 3] and (out[2:] == -1).all()

    # single DENSE cluster -> untouched (nothing loose)
    slots = np.arange(16, dtype=np.int64)
    out, n_loose = _split_loose_clusters(slots, cs)
    assert n_loose == 0 and (out == slots).all()

    # empty clusters drop from the dense region entirely
    slots = np.concatenate([np.arange(16), np.full(16, -1),
                            [16, 17] + [-1] * 14]).astype(np.int64)
    out, n_loose = _split_loose_clusters(slots, cs)
    assert n_loose == 2 and len(out) == 2 * cs
    assert list(out[:16]) == list(range(16))
    assert list(out[16:18]) == [16, 17]
