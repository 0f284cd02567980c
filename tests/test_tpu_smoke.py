"""Real-TPU Mosaic smoke/parity tests for the Pallas kernels.

The main suite runs on the CPU backend (conftest), where the Pallas kernels
execute in interpret mode — Mosaic *lowering* regressions are invisible
there. These tests run the compiled kernels when a real TPU backend is
active and are skipped otherwise. Run them with:

    TRT_TEST_PLATFORM=axon python -m pytest tests/test_tpu_smoke.py -q

(first run pays the remote Mosaic compile, ~2-6 min).

Tolerances: the triangle kernel matches the jnp path to fp32 exactness; the
torus quartic may flip a handful of tangency/silhouette pixels where fp32
evaluation order differs, so torus parity is gated on the pixel-error
distribution, not raw RMSE (cf. .claude/skills/verify known-good probes).
"""

import jax
import numpy as np
import pytest

needs_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="needs a real TPU backend (TRT_TEST_PLATFORM=axon)")

RES = 96


@pytest.fixture(scope="module")
def renderers():
    import toroidal_ray_tracing_tpu as trt
    from toroidal_ray_tracing_tpu.scene import build_scene, procedural

    cam = trt.PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0))
    st = trt.RenderSettings.default(max_depth=3)

    def pair(scene_def):
        scene = build_scene(scene_def)
        a = np.asarray(trt.render(scene, cam, RES, RES, st,
                                  backend="jnp")["image"])
        b = np.asarray(trt.render(scene, cam, RES, RES, st,
                                  backend="pallas")["image"])
        return a, b

    return pair, procedural


@needs_tpu
def test_tri_kernel_mosaic_parity(renderers):
    pair, procedural = renderers
    a, b = pair(procedural.scene_cornellish())
    err = np.abs(a - b).max(axis=-1)
    assert err.max() < 1e-4, f"triangle kernel diverged: max err {err.max()}"


@needs_tpu
def test_torus_kernel_mosaic_parity(renderers):
    pair, procedural = renderers
    a, b = pair(procedural.scene_multi_torus(analytic=True))
    err = np.abs(a - b).max(axis=-1)
    n_bad = int((err > 1e-3).sum())
    assert n_bad <= max(8, err.size // 1000), (
        f"{n_bad} pixels diverged (expected only isolated tangency flips)")
    bulk = np.sort((a - b).reshape(-1, 3).max(axis=-1) ** 2)
    rmse_bulk = float(np.sqrt(bulk[:-16].mean()))
    assert rmse_bulk < 1e-5, f"bulk rmse {rmse_bulk}"


@needs_tpu
def test_gated_tri_kernel_mosaic_parity(renderers):
    """Big-mesh path: the tessellated multi-torus scene (23k tris with the
    default cluster size) crosses TRI_GATE_MIN, so this exercises the
    Mosaic lowering of the exact visit-list + span-bit triangle kernel."""
    pair, procedural = renderers
    a, b = pair(procedural.scene_multi_torus(analytic=False))
    err = np.abs(a - b).max(axis=-1)
    n_bad = int((err > 1e-3).sum())
    assert n_bad <= max(8, err.size // 1000), (
        f"{n_bad} pixels diverged (expected only isolated edge flips)")
