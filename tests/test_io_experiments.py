"""Capture-IO, point-cloud reprojection and experiment-driver tests."""

import os

import numpy as np
import pytest

from toroidal_ray_tracing_tpu.cameras import PinholeCamera, ToroidalCamera
from toroidal_ray_tracing_tpu.io import dumps
from toroidal_ray_tracing_tpu.pointcloud import splat_points
from toroidal_ray_tracing_tpu.scene import RenderSettings, build_scene, procedural

F32 = np.float32


class TestDumps:
    def test_rho_tag_matches_cpp_to_string(self):
        assert dumps.rho_tag(4.0) == "4.000000"
        assert dumps.rho_tag(4.5) == "4.500000"

    def test_position_roundtrip_ssbo_order(self, tmp_path):
        """Positions dump in SSBO (x*H + y) order (raytrace.rgen:72)."""
        h, w = 4, 6
        img = np.arange(h * w * 3, dtype=F32).reshape(h, w, 3)
        path = dumps.write_rendered_position(str(tmp_path), 4.0, img)
        assert path.endswith("renderedPosition4.000000.txt")
        back = dumps.read_points(path)
        # row i of the file is pixel (x = i // H, y = i % H)
        for i in [0, 1, h, h * w - 1]:
            x, y = i // h, i % h
            np.testing.assert_allclose(back[i], img[y, x], rtol=1e-5)

    def test_color_roundtrip_row_order(self, tmp_path):
        h, w = 4, 6
        img = np.random.default_rng(0).random((h, w, 3)).astype(F32)
        path = dumps.write_color_image(str(tmp_path), 5.5, img)
        assert path.endswith("renderedColor5.500000.txt")
        back = dumps.read_points(path).reshape(h, w, 3)
        np.testing.assert_allclose(back, img, rtol=2e-5, atol=1e-6)

    def test_nan_sentinel(self, tmp_path):
        """`-nan` and junk lines parse to float lowest (loadPoints,
        before_second/hello_vulkan.cpp:542-549)."""
        p = tmp_path / "pts.txt"
        p.write_text("1 2 3\n-nan -nan -nan\nnot a number\n4 5 6\n")
        pts = dumps.read_points(str(p))
        assert pts.shape == (4, 3)
        np.testing.assert_allclose(pts[0], [1, 2, 3])
        assert (pts[1] == dumps.FLOAT_LOWEST).all()
        assert (pts[2] == dumps.FLOAT_LOWEST).all()

    def test_position_color_realign(self, tmp_path):
        h, w = 3, 5
        pos = np.random.default_rng(1).random((h, w, 3)).astype(F32)
        col = np.random.default_rng(2).random((h, w, 3)).astype(F32)
        dumps.write_rendered_position(str(tmp_path), 4.0, pos)
        dumps.write_color_image(str(tmp_path), 4.0, col)
        p, c = dumps.read_position_color(str(tmp_path), 4.0, w, h)
        # both come back in SSBO order and correspond pixel-for-pixel
        i = 2 * h + 1  # pixel (x=2, y=1)
        np.testing.assert_allclose(p[i], pos[1, 2], rtol=1e-5)
        np.testing.assert_allclose(c[i], col[1, 2], rtol=1e-5)

    def test_mismatch_raises(self, tmp_path):
        dumps.write_rendered_position(str(tmp_path), 4.0,
                                      np.zeros((2, 2, 3), F32))
        (tmp_path / "data" / "renderedColor4.000000.txt").write_text("1 2 3\n")
        with pytest.raises(ValueError):
            dumps.read_position_color(str(tmp_path), 4.0, 2, 2)


class TestSplat:
    def test_single_point_lands_at_projection(self):
        cam = PinholeCamera(eye=(0.0, 0.0, 5.0), center=(0.0, 0.0, 0.0))
        pos = np.array([[0.0, 0.0, 0.0]], F32)
        col = np.array([[1.0, 0.0, 0.0]], F32)
        img = np.asarray(splat_points(pos, col, cam, 32, 32,
                                      clear_color=(0, 0, 0)))
        ys, xs = np.nonzero(img[:, :, 0] > 0.5)
        assert len(ys) >= 1
        assert abs(ys.mean() - 15.5) < 2.0 and abs(xs.mean() - 15.5) < 2.0

    def test_depth_test_near_wins(self):
        cam = PinholeCamera(eye=(0.0, 0.0, 5.0), center=(0.0, 0.0, 0.0))
        pos = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, 0.0]], F32)  # first nearer
        col = np.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]], F32)
        img = np.asarray(splat_points(pos, col, cam, 16, 16,
                                      clear_color=(0, 0, 0)))
        cy = img[7:9, 7:9]
        assert cy[..., 1].max() > 0.5 and cy[..., 0].max() < 0.5

    def test_sentinel_points_dropped(self):
        cam = PinholeCamera(eye=(0.0, 0.0, 5.0))
        pos = np.full((3, 3), dumps.FLOAT_LOWEST, F32)
        col = np.ones((3, 3), F32)
        img = np.asarray(splat_points(pos, col, cam, 8, 8,
                                      clear_color=(0.2, 0.2, 0.2)))
        np.testing.assert_allclose(img, 0.2, atol=1e-6)

    def test_cover_stats_and_hole_filling(self):
        """return_cover exposes the sparsity metrics; fill_holes widens
        coverage WITHOUT touching base-pass pixels (the depth-aware
        hole-filling extension is a strict superset of the reference's
        2.5-px rasterization)."""
        cam = PinholeCamera(eye=(0.0, 0.0, 5.0), center=(0.0, 0.0, 0.0))
        rng = np.random.default_rng(0)
        pos = (rng.uniform(-1, 1, size=(40, 3)) * [1, 1, 0.1]).astype(F32)
        col = rng.uniform(0.2, 1.0, size=(40, 3)).astype(F32)
        img, cover, n = splat_points(pos, col, cam, 64, 64,
                                     clear_color=(0, 0, 0),
                                     return_cover=True)
        img, cover = np.asarray(img), np.asarray(cover)
        assert n == 40
        assert 0.0 < cover.mean() < 1.0
        # covered pixels are exactly the non-background ones here
        assert (img[~cover] == 0).all()
        f_img, f_cover, _ = splat_points(pos, col, cam, 64, 64,
                                         clear_color=(0, 0, 0),
                                         return_cover=True,
                                         fill_holes=9.0)
        f_img, f_cover = np.asarray(f_img), np.asarray(f_cover)
        assert f_cover.mean() > cover.mean()
        np.testing.assert_array_equal(f_img[cover], img[cover])


class TestExperiments:
    def test_rho_sweep_small(self, tmp_path):
        from toroidal_ray_tracing_tpu.experiments import rho_sweep

        sd = procedural.scene_torus_plane(analytic=True)
        cam = ToroidalCamera(eye=(0.0, 1.0, 0.0), center=(8.0, 0.0, 0.0))
        files = rho_sweep.run_sweep(
            sd, str(tmp_path), cam, width=16, height=16,
            settings=RenderSettings.default(max_depth=1), save_rays=True)
        rhos = rho_sweep.rho_values()
        assert rhos[0] == 4.0 and rhos[-1] == 10.0 and len(rhos) == 13
        assert len(files) == 2 * 13 + 2
        assert os.path.exists(tmp_path / "data" / "renderedPosition4.000000.txt")
        assert os.path.exists(tmp_path / "data" / "origins.txt")
        # origins dump must match the rho=4 ring radius
        orig = dumps.read_points(str(tmp_path / "data" / "origins.txt"))
        radial = np.sqrt(orig[:, 0] ** 2 + orig[:, 2] ** 2)
        np.testing.assert_allclose(radial, 4.0, rtol=1e-4)

    def test_gtruth_and_reproject_pipeline(self, tmp_path):
        """Full 3-app pipeline: capture -> gTruth -> reproject + compare."""
        from toroidal_ray_tracing_tpu.experiments import gtruth, reproject, rho_sweep

        sd = procedural.scene_torus_plane(analytic=True)
        cam_t = ToroidalCamera(eye=(0.0, 1.5, 0.0), center=(8.0, 0.0, 0.0))
        st = RenderSettings.default(max_depth=1)
        rho_sweep.run_sweep(sd, str(tmp_path), cam_t, 24, 24, st,
                            save_rays=False)
        cam_p = PinholeCamera(eye=(8.0, 4.0, 8.0), center=(0.0, 0.5, 0.0))
        gtruth.run_gtruth(sd, str(tmp_path), "test", cam_p, 24, 24, st,
                          save_png=False)
        img, files, stats = reproject.run_reproject(
            str(tmp_path), 4.0, "test", cam_p, 24, 24, 24, 24,
            save_png=False)
        assert img.shape == (24, 24, 3)
        assert os.path.exists(tmp_path / "data" / "testptCloudImage_10.txt")
        assert stats["rmse"] is not None  # gTruth found and compared
        # sparsity metrics present and coherent (VERDICT r4 item 6)
        assert 0.0 < stats["coverage"] <= 1.0
        assert stats["n_points"] > 0

    def test_reproject_all_rhos(self, tmp_path):
        """--all-rhos batch mode: one invocation sweeps every captured rho
        (app 2's 19-file batch list, before_second/hello_vulkan.cpp:499-527)."""
        from toroidal_ray_tracing_tpu.experiments import gtruth, reproject, rho_sweep

        sd = procedural.scene_torus_plane(analytic=True)
        cam_t = ToroidalCamera(eye=(0.0, 1.5, 0.0), center=(8.0, 0.0, 0.0))
        st = RenderSettings.default(max_depth=1)
        rho_sweep.run_sweep(sd, str(tmp_path), cam_t, 24, 24, st,
                            save_rays=False)
        assert reproject.capture_rhos(str(tmp_path)) == rho_sweep.rho_values()
        cam_p = PinholeCamera(eye=(8.0, 4.0, 8.0), center=(0.0, 0.5, 0.0))
        gtruth.run_gtruth(sd, str(tmp_path), "batch", cam_p, 24, 24, st,
                          save_png=False)
        results = reproject.run_reproject_all(
            str(tmp_path), "batch", cam_p, 24, 24, 24, 24, save_png=False)
        assert [r["rho"] for r in results] == rho_sweep.rho_values()
        for r in results:
            assert r["rmse"] is not None and np.isfinite(r["rmse"])
        # per-rho output files are distinct (no _10 clobbering)
        assert os.path.exists(tmp_path / "data" / "batchptCloudImage_4.txt")
        assert os.path.exists(tmp_path / "data" / "batchptCloudImage_10.txt")

    def test_rho_sweep_frames_per_step(self, tmp_path):
        """frames_per_step reproduces the reference's 60-frames-per-step
        capture cadence (main.cpp:337-341) — dumps identical to the
        1-frame-per-step sweep (the extra frames fed only the UI)."""
        from toroidal_ray_tracing_tpu.experiments import rho_sweep

        sd = procedural.scene_torus_plane(analytic=True)
        cam = ToroidalCamera(eye=(0.0, 1.0, 0.0), center=(8.0, 0.0, 0.0))
        st = RenderSettings.default(max_depth=1)
        a = tmp_path / "a"
        b = tmp_path / "b"
        rho_sweep.run_sweep(sd, str(a), cam, 16, 16, st, save_rays=False)
        rho_sweep.run_sweep(sd, str(b), cam, 16, 16, st, save_rays=False,
                            frames_per_step=3)
        pa = dumps.read_points(str(a / "data" / "renderedPosition4.000000.txt"))
        pb = dumps.read_points(str(b / "data" / "renderedPosition4.000000.txt"))
        np.testing.assert_array_equal(pa, pb)

    def test_obj_cli_pipeline(self, tmp_path):
        """The reference's flagship workflow on an OBJ scene, through the
        experiment CLIs themselves: --obj capture sweep -> --obj gTruth ->
        reproject + RMSE compare (main.cpp:200-212 scene-list analog)."""
        from PIL import Image

        from toroidal_ray_tracing_tpu.experiments import (gtruth, reproject,
                                                          rho_sweep)

        # small textured ground quad: red/blue checker so texture sampling
        # is visible in the dumps
        tex = np.zeros((8, 8, 3), np.uint8)
        tex[::2, ::2] = (255, 40, 40)
        tex[1::2, 1::2] = (255, 40, 40)
        tex[tex.sum(-1) == 0] = (40, 40, 255)
        Image.fromarray(tex).save(tmp_path / "checker.png")
        (tmp_path / "quad.mtl").write_text(
            "newmtl texd\nKd 0.9 0.9 0.9\nillum 1\nmap_Kd checker.png\n")
        (tmp_path / "quad.obj").write_text(
            "mtllib quad.mtl\n"
            "v -8 0 -8\nv 8 0 -8\nv 8 0 8\nv -8 0 8\n"
            "vn 0 1 0\n"
            "vt 0 0\nvt 4 0\nvt 4 4\nvt 0 4\n"
            "usemtl texd\nf 1/1/1 2/2/1 3/3/1 4/4/1\n")
        obj = str(tmp_path / "quad.obj")
        out = str(tmp_path / "run")

        rho_sweep.main(["--obj", obj, "--out", out,
                        "--width", "24", "--height", "24",
                        "--eye", "0", "2", "0", "--center", "10", "0", "0",
                        "--max-depth", "1"])
        assert os.path.exists(
            os.path.join(out, "data", "renderedPosition4.000000.txt"))

        gtruth.main(["--obj", obj, "--out", out, "--name", "objtest",
                     "--width", "24", "--height", "24",
                     "--eye", "6", "6", "6", "--center", "0", "0", "0",
                     "--max-depth", "2"])
        gt = dumps.read_points(
            os.path.join(out, "data", "objtestgTruth.txt")).reshape(24, 24, 3)
        # the checker must be visible in the ground truth: red-dominant and
        # blue-dominant pixels both present (texture modulate, rchit:79-84)
        assert ((gt[..., 0] > gt[..., 2] * 1.5) & (gt[..., 0] > 0.05)).any()
        assert ((gt[..., 2] > gt[..., 0] * 1.5) & (gt[..., 2] > 0.05)).any()

        cam_p = PinholeCamera(eye=(6.0, 6.0, 6.0), center=(0.0, 0.0, 0.0))
        img, files, stats = reproject.run_reproject(
            out, 4.0, "objtest", cam_p, 24, 24, 24, 24, save_png=False)
        rmse = stats["rmse"]
        assert rmse is not None and np.isfinite(rmse)
        # the splatted capture approximates the pinhole ground truth: the
        # clouds cover the same quad with the same shading model
        assert rmse < 0.35, rmse

    def test_obj_spec_parse(self):
        from toroidal_ray_tracing_tpu.experiments.scene_args import (
            parse_obj_spec)

        p, xf = parse_obj_spec("a/b.obj")
        assert p == "a/b.obj"
        np.testing.assert_allclose(xf, np.eye(4))
        p, xf = parse_obj_spec("m.obj@1,2,3")
        np.testing.assert_allclose(xf[:3, 3], [1, 2, 3])
        p, xf = parse_obj_spec("m.obj@1,2,3,2.0,90")
        np.testing.assert_allclose(xf[:3, 3], [1, 2, 3])
        # scale 2 and 90-degree y-rotation compose T @ R @ S
        v = xf @ np.array([1.0, 0.0, 0.0, 1.0])
        np.testing.assert_allclose(v[:3], [1, 2, 3 - 2.0], atol=1e-5)
        with pytest.raises(ValueError):
            parse_obj_spec("m.obj@1,2")

    def test_scenario_table(self):
        from toroidal_ray_tracing_tpu.experiments.configs import SCENARIOS

        # 1-5 are the BASELINE ladder; 6 (tessellated mesh), 7
        # (textured) and 8 (>1M-tri streamed mesh) are extensions
        assert sorted(SCENARIOS) == [1, 2, 3, 4, 5, 6, 7, 8]
        assert SCENARIOS[3].width == 1920 and SCENARIOS[3].max_depth == 3
        assert SCENARIOS[4].max_depth == 5
        assert SCENARIOS[5].width == 3840 and SCENARIOS[5].spp > 1
        assert SCENARIOS[6].name.startswith("config6_mesh")
        assert SCENARIOS[7].name.startswith("config7_textured")
        assert SCENARIOS[8].name.startswith("config8_streamed")

    def test_textured_scene_reachable_from_experiment_clis(self):
        """The textured workload is selectable wherever the reference's
        scene list is (--scene for rho_sweep/gtruth)."""
        from toroidal_ray_tracing_tpu.experiments.scene_args import PROCEDURAL

        assert "textured" in PROCEDURAL
        sd = PROCEDURAL["textured"]()
        assert any(getattr(m, "textures", None) for m in sd.models)

    def test_scenario_raster_mode(self, tmp_path):
        """--raster = the reference UI's 'use raster' checkbox: same
        scenario through the z-buffered raster pipeline, PNG out."""
        import dataclasses

        from toroidal_ray_tracing_tpu.experiments import configs

        sc = dataclasses.replace(configs.SCENARIOS[7], width=64, height=36)
        orig = configs.SCENARIOS[7]
        configs.SCENARIOS[7] = sc
        try:
            out, stats = configs.run_scenario(7, out_dir=str(tmp_path),
                                              raster=True)
        finally:
            configs.SCENARIOS[7] = orig
        assert stats["protocol"] == "raster"
        img = np.asarray(out["image"])
        assert img.shape == (36, 64, 3) and img.std() > 0.01
        assert (tmp_path / "config7_textured_raster.png").exists()


def test_read_points_reference_semantics(tmp_path):
    """Both read_points paths (native trt_read_xyz and the Python
    fallback) implement the reference's loadPoints parse exactly
    (before_second/hello_vulkan.cpp:532-560): < 3 tokens -> whole row
    lowest; per-token "-nan" -> lowest; std::stof prefix parsing keeps
    inf/+nan and trailing garbage ("3.0abc" -> 3.0); rows = lines even for
    over-long lines (no 512-byte truncation row splits)."""
    from toroidal_ray_tracing_tpu.io import dumps, native

    LOW = dumps.FLOAT_LOWEST
    p = tmp_path / "pts.txt"
    p.write_bytes(
        b"1.5 -2.25 3e2\n"
        b"-nan nan 1.0\n"                       # per-component: +nan kept
        b"0.1 0.2\n"                            # short row
        b"junk 1.0 2.0\n"                       # unparseable token
        b"\n"                                   # empty row
        b"7 8 9 extra tokens\n"
        b"1.0 2.0 3.0abc\n"                     # stof prefix parse
        b"inf -inf 4.5\n"                       # infinities kept
        b"1 2 3 " + b"x" * 600 + b"\n"          # >512-byte line, one row
        b"4.0 5.0 6.0")                         # no trailing newline
    expect = np.array([
        [1.5, -2.25, 300.0],
        [LOW, np.nan, 1.0],
        [LOW, LOW, LOW],
        [LOW, 1.0, 2.0],
        [LOW, LOW, LOW],
        [7.0, 8.0, 9.0],
        [1.0, 2.0, 3.0],
        [np.inf, -np.inf, 4.5],
        [1.0, 2.0, 3.0],
        [4.0, 5.0, 6.0]], np.float32)

    # exercise the Python fallback explicitly by hiding the native lib
    orig = native.available
    native.available = lambda: False
    try:
        got_py = dumps.read_points(str(p))
    finally:
        native.available = orig
    results = {"python": got_py}
    if native.available():
        results["native"] = dumps.read_points(str(p))
    for name, got in results.items():
        assert got.shape == expect.shape, (name, got.shape)
        np.testing.assert_array_equal(
            np.isnan(got), np.isnan(expect), err_msg=name)
        m = ~np.isnan(expect)
        np.testing.assert_array_equal(got[m], expect[m], err_msg=name)
