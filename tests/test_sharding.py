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
