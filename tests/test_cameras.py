"""Camera ray-generation unit tests (spec: raytrace.rgen of both apps)."""

import numpy as np
import pytest

from toroidal_ray_tracing_tpu.cameras import PinholeCamera, ToroidalCamera
from toroidal_ray_tracing_tpu.scene import RenderSettings


def settings(rho=4.0):
    return RenderSettings.default(rho=rho)


class TestToroidal:
    def test_dirs_unit_length(self):
        cam = ToroidalCamera(eye=(1.0, 2.0, 3.0), center=(5.0, 2.0, -1.0))
        o, d = cam.generate_rays(16, 16, settings(), xp=np)
        np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-6)

    def test_origins_on_rho_circle(self):
        """Origins lie on the horizontal circle of radius rho around the eye
        (rgen:56)."""
        eye = np.array([2.0, -1.0, 0.5], np.float32)
        cam = ToroidalCamera(eye=tuple(eye), center=(8.0, -1.0, 0.5))
        o, _ = cam.generate_rays(8, 8, settings(rho=6.0), xp=np)
        radial = np.sqrt((o[:, 0] - eye[0]) ** 2 + (o[:, 2] - eye[2]) ** 2)
        np.testing.assert_allclose(radial, 6.0, rtol=1e-5)
        np.testing.assert_allclose(o[:, 1], eye[1], atol=1e-6)

    def test_omega_aligns_first_ray_with_sight(self):
        """Pixel (0,0)'s azimuth must equal the camera sight azimuth in x-z
        (the whole point of the omega offset, rgen:34-43)."""
        for center in [(5.0, 0.0, 3.0), (-4.0, 0.0, 2.0), (1.0, 0.0, -7.0)]:
            cam = ToroidalCamera(eye=(0.0, 0.0, 0.0), center=center)
            o, d = cam.generate_rays(32, 32, settings(), xp=np)
            # ray 0 is pixel (x=0, y=0): alfa = beta = 0
            sight = np.array(center, np.float32)
            sight_az = np.arctan2(sight[2], sight[0])
            ray_az = np.arctan2(d[0, 2], d[0, 0])
            assert abs(np.degrees(sight_az - ray_az)) % 360.0 < 1e-3

    def test_theta_zero_when_level(self):
        """theta is only applied when eye.y != center.y (rgen:45)."""
        cam = ToroidalCamera(eye=(0.0, 1.0, 0.0), center=(10.0, 1.0, 0.0))
        omega, theta = cam.offsets(4.0)
        assert theta == 0.0

    def test_theta_nonzero_when_tilted(self):
        cam = ToroidalCamera(eye=(0.0, 2.0, 0.0), center=(10.0, 0.0, 0.0))
        omega, theta = cam.offsets(4.0)
        assert theta != 0.0
        # looking downward => temp.y < 0 => theta flipped to 360 - acos
        assert theta > 180.0

    def test_angular_coverage(self):
        """alfa spans [0, 360) in W steps; beta likewise in H (rgen:25-28)."""
        cam = ToroidalCamera(eye=(0.0, 0.0, 0.0), center=(1.0, 0.0, 0.0))
        W = H = 8
        o, d = cam.generate_rays(W, H, settings(), xp=np)
        omega, theta = cam.offsets(4.0)
        # pixel (x, y=0): dir azimuth == alfa + omega
        for x in range(W):
            i = 0 * W + x  # row-major
            az = np.degrees(np.arctan2(d[i, 2], d[i, 0])) % 360.0
            expect = (360.0 / W * x + omega) % 360.0
            assert abs(az - expect) < 1e-2 or abs(az - expect - 360) < 1e-2


class TestPinhole:
    def test_center_ray_points_at_lookat(self):
        cam = PinholeCamera(eye=(10.0, 0.0, 0.0), center=(0.0, 0.0, 0.0))
        W = H = 64
        o, d = cam.generate_rays(W, H, settings(), xp=np)
        i = (H // 2) * W + W // 2
        want = np.array([-1.0, 0.0, 0.0])
        # half-pixel offset from exact center
        assert np.dot(d[i], want) > 0.999
        np.testing.assert_allclose(o[i], [10.0, 0.0, 0.0], atol=1e-6)

    def test_image_orientation(self):
        """Top image row (y=0) must look *up* (Vulkan y-down NDC with the
        perspectiveVK y-flip)."""
        cam = PinholeCamera(eye=(10.0, 0.0, 0.0), center=(0.0, 0.0, 0.0),
                            up=(0.0, 1.0, 0.0))
        o, d = cam.generate_rays(8, 8, settings(), xp=np)
        assert d[0, 1] > 0.0        # first row: +y (up)
        assert d[-1, 1] < 0.0       # last row: down

    def test_fov(self):
        cam = PinholeCamera(eye=(0.0, 0.0, 5.0), center=(0.0, 0.0, 0.0),
                            fov_deg=90.0)
        W = H = 101
        o, d = cam.generate_rays(W, H, settings(), xp=np)
        left = d[(H // 2) * W + 0]
        right = d[(H // 2) * W + W - 1]
        ang = np.degrees(np.arccos(np.dot(left, right)))
        assert 85.0 < ang <= 90.5
