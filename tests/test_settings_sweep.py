"""The live-parameter sweep driver (the reference's ImGui tweak panel,
VKT/ray_tracing__before/main.cpp:279-290): one jit scans a stack of
RenderSettings variants — no recompiles, per-variant frames identical to
individual renders."""
import numpy as np

import toroidal_ray_tracing_tpu as trt
from toroidal_ray_tracing_tpu.experiments.settings_sweep import sweep, _apply
from toroidal_ray_tracing_tpu.scene import (RenderSettings, build_scene,
                                            procedural)

RES = 64


def test_sweep_matches_individual_renders():
    scene = build_scene(procedural.scene_torus_plane())
    cam = trt.PinholeCamera(eye=(7.0, 4.0, 7.0), center=(0.0, 0.5, 0.0))
    st = RenderSettings.default(max_depth=2)
    values = [20.0, 100.0, 250.0]
    out = sweep(scene, cam, RES, RES, st, "light_intensity", values)
    imgs = np.asarray(out["images"])
    assert imgs.shape == (3, RES, RES, 3)
    for i, v in enumerate(values):
        ref = trt.render(scene, cam, RES, RES,
                         _apply(st, "light_intensity", v))["image"]
        np.testing.assert_allclose(imgs[i], np.asarray(ref), atol=1e-6)
    # brighter light, brighter frame
    assert imgs[2].mean() > imgs[0].mean()


def test_sweep_params_cover_reference_panel():
    st = RenderSettings.default()
    assert float(_apply(st, "light_y", 3.0).light.position[1]) == 3.0
    assert int(_apply(st, "light_type", 1).light.type) == 1
    assert int(_apply(st, "max_depth", 4).max_depth) == 4
    assert float(_apply(st, "rho", 6.5).rho) == 6.5


def test_sweep_cli(tmp_path):
    from toroidal_ray_tracing_tpu.experiments.settings_sweep import main
    files = main(["--scene", "torus_plane", "--param", "light_type",
                  "--values", "0", "1", "--out", str(tmp_path),
                  "--width", "64", "--height", "64", "--max-depth", "1",
                  "--eye", "7", "4", "7", "--center", "0", "0.5", "0"])
    assert len(files) == 2
    import os
    assert all(os.path.exists(f) for f in files)
