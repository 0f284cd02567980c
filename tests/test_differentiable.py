"""Differentiable-rendering tests: inverse rendering through the wavefront.

The fixed-depth scan renderer (`trace_rays_fixed`) is a pure differentiable
function of the scene pytree — gradients flow through the quartic torus
intersection, shading, and shadows. These tests fit scene parameters to a
target image with plain gradient descent (a capability the reference's
hardware pipeline cannot express)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toroidal_ray_tracing_tpu.cameras import PinholeCamera
from toroidal_ray_tracing_tpu.scene import RenderSettings, build_scene, procedural, to_device
from toroidal_ray_tracing_tpu.trace.wavefront import trace_rays, trace_rays_fixed

F32 = np.float32
RES = 24


@pytest.fixture(scope="module")
def setup():
    scene = to_device(build_scene(procedural.scene_single_torus(analytic=True)))
    cam = PinholeCamera(eye=(6.0, 3.0, 6.0))
    st = RenderSettings.default(max_depth=1)
    o, d = cam.generate_rays(RES, RES, st, xp=np)
    return scene, st, jnp.asarray(o), jnp.asarray(d)


def test_fixed_matches_while(setup):
    scene, st, o, d = setup
    hv_w, hp_w, _ = jax.jit(trace_rays)(scene, st, o, d)
    hv_f, hp_f = jax.jit(lambda s, t, o_, d_: trace_rays_fixed(s, t, o_, d_, 1)
                         )(scene, st, o, d)
    np.testing.assert_allclose(np.asarray(hv_w), np.asarray(hv_f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hp_w), np.asarray(hp_f), atol=1e-6)


def test_gradient_wrt_material_color(setup):
    """d(loss)/d(diffuse) is nonzero and points the right way."""
    scene, st, o, d = setup

    def render_with_diffuse(diffuse):
        mats = scene.materials._replace(
            diffuse=jnp.broadcast_to(diffuse, scene.materials.diffuse.shape))
        s = dataclasses.replace(scene, materials=mats)
        hv, _ = trace_rays_fixed(s, st, o, d, 1)
        return hv

    target = render_with_diffuse(jnp.asarray([0.2, 0.7, 0.3], F32))

    def loss(diffuse):
        return jnp.mean((render_with_diffuse(diffuse) - target) ** 2)

    g = jax.grad(loss)(jnp.asarray([0.8, 0.1, 0.1], F32))
    assert np.isfinite(np.asarray(g)).all()
    assert float(g[0]) > 0 and float(g[1]) < 0  # too red, not green enough


def test_inverse_fit_light(setup):
    """Recover light intensity and height from a target image by gradient
    descent through the full shading pipeline (hard-visibility silhouettes
    carry no gradient, so the fit targets the smooth photometric terms)."""
    scene, st, o, d = setup

    def render_with_light(params):
        intensity, ly = params
        light = st.light._replace(
            position=jnp.asarray([10.0, 1.0, 8.0], F32) * jnp.asarray(
                [1.0, ly, 1.0], F32),
            intensity=intensity)
        s2 = st._replace(light=light)
        hv, _ = trace_rays_fixed(scene, s2, o, d, 1)
        return hv

    true_params = jnp.asarray([120.0, 12.0], F32)
    target = render_with_light(true_params)

    import optax

    def loss(theta):  # log-parametrization keeps scales comparable
        return jnp.mean((render_with_light(jnp.exp(theta)) - target) ** 2)

    theta = jnp.log(jnp.asarray([60.0, 6.0], F32))
    opt = optax.adam(5e-2)
    state = opt.init(theta)
    vg = jax.jit(jax.value_and_grad(loss))
    l0 = float(loss(theta))
    for _ in range(150):
        l, g = vg(theta)
        upd, state = opt.update(g, state)
        theta = optax.apply_updates(theta, upd)
    l1 = float(loss(theta))
    fit = np.exp(np.asarray(theta))
    assert np.isfinite(l1)
    assert l1 < 0.02 * l0, (l0, l1)
    assert abs(fit[0] - 120.0) < 12.0, fit


def test_radius_gradient_is_finite(setup):
    """Gradients through the quartic intersection exist and are finite
    (geometry fitting needs edge-aware losses — out of scope — but the
    chain rule through Ferrari + Newton must not NaN)."""
    scene, st, o, d = setup

    def loss(r):
        tori = scene.tori._replace(
            minor_radius=jnp.full_like(jnp.asarray(scene.tori.minor_radius), r))
        s = dataclasses.replace(scene, tori=tori)
        hv, _ = trace_rays_fixed(s, st, o, d, 1)
        return jnp.mean(hv)

    g = jax.grad(loss)(jnp.asarray(0.55, F32))
    assert np.isfinite(float(g)) and float(g) != 0.0


def test_pallas_backend_gradients(setup):
    """backend="pallas" primal runs the Mosaic kernels; the backward pass
    recomputes through the jnp path (intersect.closest_hit_diff). Values and
    gradients must match the all-jnp formulation."""
    scene, st, o, d = setup

    def loss(minor, backend):
        tori = scene.tori._replace(
            minor_radius=jnp.broadcast_to(minor, scene.tori.minor_radius.shape))
        s = dataclasses.replace(scene, tori=tori)
        hv, _ = trace_rays_fixed(s, st, o, d, 1, backend=backend)
        return jnp.mean(hv)

    for m in (0.5, 0.65):
        lj, gj = jax.value_and_grad(loss)(jnp.asarray(m, F32), "jnp")
        lp, gp = jax.value_and_grad(loss)(jnp.asarray(m, F32), "pallas")
        np.testing.assert_allclose(float(lp), float(lj), rtol=1e-5)
        assert float(gj) != 0.0
        np.testing.assert_allclose(float(gp), float(gj), rtol=1e-3)
