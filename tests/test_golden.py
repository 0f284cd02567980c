"""Golden-image regression tests.

Small renders hashed against checked-in golden arrays (stored as npz). The
oracle-parity tests catch semantic drift vs the reference; these catch
*unintended change of any kind* — including accepted-quirk behavior — across
refactors. Regenerate with `python tests/test_golden.py regen` after an
intentional change and review the diff visually first.
"""

import os
import sys

import numpy as np
import pytest

from toroidal_ray_tracing_tpu.cameras import PinholeCamera, ToroidalCamera
from toroidal_ray_tracing_tpu.render import render
from toroidal_ray_tracing_tpu.scene import RenderSettings, build_scene, procedural

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
RES = 32

CASES = {
    "multi_torus_pinhole": (
        lambda: procedural.scene_multi_torus(True),
        PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0)),
        RenderSettings.default(max_depth=3),
    ),
    "cornellish_toroidal": (
        lambda: procedural.scene_cornellish(),
        ToroidalCamera(eye=(0.0, 1.0, 0.0), center=(8.0, 0.0, 0.0)),
        RenderSettings.default(max_depth=2, rho=5.0),
    ),
    "torus_plane_shadow": (
        lambda: procedural.scene_torus_plane(True),
        PinholeCamera(eye=(7.0, 4.0, 7.0), center=(0.0, 0.5, 0.0)),
        RenderSettings.default(max_depth=1, light_position=(6.0, 10.0, 2.0)),
    ),
    "textured_mesh": (
        procedural.scene_textured_mesh,
        PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0)),
        RenderSettings.default(max_depth=3),
    ),
}


def _render_case(name):
    sd, cam, st = CASES[name]
    out = render(build_scene(sd()), cam, RES, RES, st)
    return np.asarray(out["image"])


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    path = os.path.join(GOLDEN, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden missing: regenerate with "
                    f"`python {__file__} regen`")
    want = np.load(path)["image"]
    got = _render_case(name)
    # bitwise-identical is too strict across XLA versions; tight tolerance
    err = np.abs(got - want).max()
    assert err < 5e-4, f"{name}: max pixel diff {err}"


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "regen":
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs(GOLDEN, exist_ok=True)
    for name in CASES:
        np.savez_compressed(os.path.join(GOLDEN, f"{name}.npz"),
                            image=_render_case(name))
        print("wrote", name)
