"""Per-frame subject-follow TLAS refit analog
(updateSubjectPosition, VKT/ray_tracing__before/hello_vulkan.cpp:963-986)."""

import numpy as np

from toroidal_ray_tracing_tpu.cameras import PinholeCamera, ToroidalCamera
from toroidal_ray_tracing_tpu.render import render
from toroidal_ray_tracing_tpu.scene import RenderSettings, build_scene, procedural
from toroidal_ray_tracing_tpu.scene.build import refit_instance
from toroidal_ray_tracing_tpu.scene.types import SceneDef

RES = 32


def _scene(subject_at):
    sd = SceneDef()
    xf = np.eye(4, dtype=np.float32)
    xf[:3, 3] = subject_at
    sd.add_model(procedural.cube(1.0, per_face_mats=True), transform=xf)
    sd.add_model(procedural.plane(8.0, y=-1.0))
    sd.models.append(procedural.Torus(1.5, 0.4, [procedural.matte((0.2, 0.4, 0.8))]))
    sd.add_instance(2, np.eye(4, dtype=np.float32))
    return sd


def test_refit_matches_fresh_build():
    x1 = np.array([0.0, 0.0, 0.0], np.float32)
    x2 = np.array([1.5, 0.5, -1.0], np.float32)
    cam = PinholeCamera(eye=(6.0, 4.0, 6.0))
    st = RenderSettings.default(max_depth=2)

    scene1 = build_scene(_scene(x1))
    xf1 = np.eye(4, dtype=np.float32); xf1[:3, 3] = x1
    xf2 = np.eye(4, dtype=np.float32); xf2[:3, 3] = x2
    refit = refit_instance(scene1, 0, xf1, xf2)
    fresh = build_scene(_scene(x2))

    a = np.asarray(render(refit, cam, RES, RES, st)["image"])
    b = np.asarray(render(fresh, cam, RES, RES, st)["image"])
    rmse = float(np.sqrt(((a - b) ** 2).mean()))
    assert rmse < 1e-5, rmse
    # and it actually moved: differs from the unrefit render
    c = np.asarray(render(scene1, cam, RES, RES, st)["image"])
    assert np.abs(a - c).max() > 0.01


def test_refit_rotation_and_torus_instance():
    """Rotation delta + a torus belonging to the refit instance."""
    sd = SceneDef()
    sd.add_model(procedural.cube(1.0))
    sd.models.append(procedural.Torus(1.2, 0.3, [procedural.matte((0.8, 0.3, 0.2))]))
    # torus instance shares instance slot 1
    sd.add_instance(1, np.eye(4, dtype=np.float32))
    cam = PinholeCamera(eye=(5.0, 3.0, 5.0))
    st = RenderSettings.default(max_depth=1)

    from toroidal_ray_tracing_tpu.utils import math3d
    xf1 = np.eye(4, dtype=np.float32)
    xf2 = (math3d.translation((0.5, 0.2, 0.0))
           @ math3d.rotation_y(0.7)).astype(np.float32)

    scene1 = build_scene(sd)
    refit = refit_instance(scene1, 1, xf1, xf2)

    sd2 = SceneDef()
    sd2.add_model(procedural.cube(1.0))
    sd2.models.append(procedural.Torus(1.2, 0.3, [procedural.matte((0.8, 0.3, 0.2))]))
    sd2.add_instance(1, xf2)
    fresh = build_scene(sd2)

    a = np.asarray(render(refit, cam, RES, RES, st)["image"])
    b = np.asarray(render(fresh, cam, RES, RES, st)["image"])
    rmse = float(np.sqrt(((a - b) ** 2).mean()))
    assert rmse < 1e-4, rmse


def test_animated_sweep_subject_follows_eye(tmp_path):
    """Animated camera + pinned subject across the rho sweep."""
    from toroidal_ray_tracing_tpu.experiments import rho_sweep

    sd = _scene(np.zeros(3, np.float32))

    def camera_path(step):
        return ToroidalCamera(eye=(0.2 * step, 0.0, 0.1 * step),
                              center=(10.0, 0.0, 0.0))

    files = rho_sweep.run_sweep(sd, str(tmp_path), width=16, height=16,
                                settings=RenderSettings.default(max_depth=1),
                                subject_follow=True, save_rays=False,
                                camera_path=camera_path)
    assert len(files) == 2 * len(rho_sweep.rho_values())
    # the subject (cube around the eye) occludes in every frame: the first
    # and last dumps must differ (the subject moved with the camera)
    import toroidal_ray_tracing_tpu.io.dumps as dumps
    pos_files = [f for f in files if "renderedPosition" in f]
    p0 = dumps.read_points(pos_files[0])
    p1 = dumps.read_points(pos_files[-1])
    assert not np.allclose(p0, p1)
