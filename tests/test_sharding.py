"""Multi-device SPMD tests on the 8-virtual-CPU-device mesh (conftest)."""

import jax
import numpy as np
import pytest

from toroidal_ray_tracing_tpu.cameras import PinholeCamera
from toroidal_ray_tracing_tpu.parallel import make_mesh, render_sharded
from toroidal_ray_tracing_tpu.render import render
from toroidal_ray_tracing_tpu.scene import RenderSettings, build_scene, procedural

RES = 16

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 (virtual) devices")


@pytest.fixture(scope="module")
def setup():
    scene = build_scene(procedural.scene_cornellish())
    cam = PinholeCamera(eye=(6.0, 4.0, 6.0))
    st = RenderSettings.default(max_depth=2)
    ref = np.asarray(render(scene, cam, RES, RES, st)["image"])
    return scene, cam, st, ref


@needs_8
@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_mesh_shapes_match_single_device(setup, shape):
    scene, cam, st, ref = setup
    out = render_sharded(scene, cam, RES, RES, st, mesh=make_mesh(*shape))
    img = np.asarray(out["image"])
    rmse = float(np.sqrt(np.mean((img - ref) ** 2)))
    assert rmse < 1e-6, f"mesh {shape}: rmse {rmse}"


@needs_8
def test_torus_scene_prim_sharded(setup):
    """Tori shard over 'prims' too (config-4 style)."""
    sd = procedural.scene_instanced_torus_grid(n=16, analytic=True)
    scene = build_scene(sd)
    cam = PinholeCamera(eye=(8.0, 6.0, 8.0))
    st = RenderSettings.default(max_depth=2)
    ref = np.asarray(render(scene, cam, RES, RES, st)["image"])
    out = render_sharded(scene, cam, RES, RES, st, mesh=make_mesh(2, 4))
    rmse = float(np.sqrt(np.mean((np.asarray(out["image"]) - ref) ** 2)))
    assert rmse < 1e-6


@needs_8
def test_ray_count_independent_of_mesh(setup):
    scene, cam, st, _ = setup
    counts = set()
    for shape in [(8, 1), (1, 8)]:
        out = render_sharded(scene, cam, RES, RES, st, mesh=make_mesh(*shape))
        counts.add(float(out["rays_traced"]))
    assert len(counts) == 1


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    color, hitpos, nrays = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(color)).all()
    assert float(nrays) > 0


@needs_8
def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@needs_8
def test_prim_shards_carry_tight_cluster_bounds():
    """Each prims-axis shard must cull against its own finite cluster AABBs
    (not the old +/-3e38 no-cull fallback): the per-shard bounds handed to the
    kernel must match bounds recomputed from that shard's triangles, and a
    spread-out scene must actually prune most (ray, cluster) pairs."""
    from toroidal_ray_tracing_tpu.parallel.sharding import pad_scene_for_mesh

    n_prims = 4
    sd = procedural.scene_instanced_torus_grid(n=64, analytic=False)
    scene = pad_scene_for_mesh(build_scene(sd), n_prims)
    cs = scene.cluster_size
    T = scene.triangles.count
    C = np.asarray(scene.cluster_lo).shape[0]
    assert T % (cs * n_prims) == 0 and C % n_prims == 0

    v0 = np.asarray(scene.triangles.v0)
    e1 = np.asarray(scene.triangles.e1)
    e2 = np.asarray(scene.triangles.e2)
    valid = np.asarray(scene.triangles.valid)
    lo_all = np.asarray(scene.cluster_lo)
    hi_all = np.asarray(scene.cluster_hi)
    for s in range(n_prims):
        cl = slice(s * C // n_prims, (s + 1) * C // n_prims)
        lo, hi = lo_all[cl], hi_all[cl]
        assert (np.abs(lo) < 1e31).all() and (np.abs(hi) < 1e31).all()
        tr = slice(s * T // n_prims, (s + 1) * T // n_prims)
        tv, te1, te2, m = v0[tr], e1[tr], e2[tr], valid[tr]
        tlo = np.minimum(np.minimum(tv, tv + te1), tv + te2)
        thi = np.maximum(np.maximum(tv, tv + te1), tv + te2)
        ncl = lo.shape[0]
        m3 = m.reshape(ncl, cs)
        for ci in range(ncl):
            if m3[ci].any():
                assert np.allclose(
                    lo[ci], tlo.reshape(ncl, cs, 3)[ci][m3[ci]].min(0),
                    atol=1e-5)
                assert np.allclose(
                    hi[ci], thi.reshape(ncl, cs, 3)[ci][m3[ci]].max(0),
                    atol=1e-5)

    # cull-rate: rays from one side of the 8x8 grid should miss most of the
    # other shards' cluster boxes (mirror of the kernel's slab test)
    cam = PinholeCamera(eye=(20.0, 3.0, 0.0), center=(16.0, 0.0, 0.0))
    st = RenderSettings.default(max_depth=1)
    from toroidal_ray_tracing_tpu.cameras import generate_rays
    o, d = generate_rays(cam, 16, 16, st)
    o, d = np.asarray(o), np.asarray(d)
    inv = np.where(np.abs(d) > 1e-30, 1.0 / np.where(d == 0, 1.0, d),
                   np.where(d >= 0, 3e38, -3e38))
    t0 = (lo_all[:, None] - o[None]) * inv[None]          # (C, N, 3)
    t1 = (hi_all[:, None] - o[None]) * inv[None]
    tn = np.minimum(t0, t1).max(-1)
    tf = np.maximum(t0, t1).min(-1)
    hit_frac = ((tn <= tf) & (tf >= 1e-3)).mean()
    assert hit_frac < 0.5, f"culling ineffective: {hit_frac:.2f} of pairs pass"


@needs_8
@pytest.mark.parametrize("n_prims", [1, 2])
def test_hybrid_multihost_mesh(setup, n_prims):
    """multihost.make_hybrid_mesh builds a host-major ("rays", "prims") mesh
    (single-process here: a 1-host DCN axis over the same code path a pod
    would take) and renders identically through it."""
    from toroidal_ray_tracing_tpu.parallel import multihost

    multihost.init_distributed()  # no-op single process
    mesh = multihost.make_hybrid_mesh(n_prim_shards=n_prims)
    assert mesh.axis_names == ("rays", "prims")
    assert mesh.shape["rays"] * mesh.shape["prims"] == len(jax.devices())
    scene, cam, st, ref = setup
    out = render_sharded(scene, cam, RES, RES, st, mesh=mesh)
    rmse = float(np.sqrt(np.mean((np.asarray(out["image"]) - ref) ** 2)))
    assert rmse < 1e-6

    row0, rows = multihost.host_band(RES, RES)
    assert (row0, rows) == (0, RES)  # single host owns the whole frame


@needs_8
@pytest.mark.parametrize("shape", [(4, 2), (1, 8)])
def test_pallas_backend_sharded(setup, shape):
    """Fused-kernel path composes with primitive sharding (interpret mode)."""
    sd = procedural.scene_multi_torus(analytic=True)
    scene = build_scene(sd)
    cam = PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0))
    st = RenderSettings.default(max_depth=2)
    ref = np.asarray(render(scene, cam, RES, RES, st)["image"])
    out = render_sharded(scene, cam, RES, RES, st, mesh=make_mesh(*shape),
                         backend="pallas")
    rmse = float(np.sqrt(np.mean((np.asarray(out["image"]) - ref) ** 2)))
    assert rmse < 1e-6


@needs_8
@pytest.mark.parametrize("shape", [(4, 2), (1, 8)])
def test_all_loose_scene_prim_sharded(shape):
    """Torus+plane (all triangles in the loose tail on the full table):
    prims-axis shards must still intersect the plane — pad_scene_for_mesh /
    the shard-size guard disables the hoist on slices, so the tail clusters
    keep real AABBs and the kernel tests them."""
    sd = procedural.scene_torus_plane(analytic=True)
    scene = build_scene(sd)
    assert scene.loose_tris == 2
    cam = PinholeCamera(eye=(7.0, 4.0, 7.0), center=(0.0, 0.5, 0.0))
    st = RenderSettings.default(max_depth=2)
    ref = np.asarray(render(scene, cam, RES, RES, st)["image"])
    assert ref.std() > 0.01  # plane + shadow actually visible
    out = render_sharded(scene, cam, RES, RES, st, mesh=make_mesh(*shape))
    rmse = float(np.sqrt(np.mean((np.asarray(out["image"]) - ref) ** 2)))
    assert rmse < 1e-6, f"mesh {shape}: rmse {rmse}"


@needs_8
@pytest.mark.parametrize("shape", [(4, 2), (1, 8)])
def test_textured_scene_prim_sharded(shape):
    """Config-7 textured scene across prims shards: the texture atlas
    (data + quad-packed data4) is replicated while triangles shard, so
    per-shard texture_id indirection must survive pad_scene_for_mesh."""
    sd = procedural.scene_textured_mesh()
    scene = build_scene(sd)
    cam = PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0))
    st = RenderSettings.default(max_depth=2)
    ref = np.asarray(render(scene, cam, RES, RES, st)["image"])
    assert ref.std() > 0.01
    out = render_sharded(scene, cam, RES, RES, st, mesh=make_mesh(*shape))
    rmse = float(np.sqrt(np.mean((np.asarray(out["image"]) - ref) ** 2)))
    assert rmse < 1e-6, f"mesh {shape}: rmse {rmse}"
