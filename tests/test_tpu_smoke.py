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


@needs_tpu
def test_gated_torus_kernel_mosaic_parity(renderers):
    """Gated torus path (K > 64: exact chunk visit lists + span bits +
    span_gate-free quartic dispatch) on the instanced grid — config 4's
    kernel lowering, including the any-hit occlusion kernel behind its
    shadow rays."""
    import toroidal_ray_tracing_tpu as trt
    from toroidal_ray_tracing_tpu.scene import build_scene, procedural

    scene = build_scene(procedural.scene_instanced_torus_grid(n=256))
    cam = trt.PinholeCamera(eye=(14.0, 9.0, 14.0), center=(0.0, 0.0, 0.0))
    st = trt.RenderSettings.default(max_depth=2)
    a = np.asarray(trt.render(scene, cam, RES, RES, st,
                              backend="jnp")["image"])
    b = np.asarray(trt.render(scene, cam, RES, RES, st,
                              backend="pallas")["image"])
    err = np.abs(a - b).max(axis=-1)
    n_bad = int((err > 1e-3).sum())
    assert n_bad <= max(8, err.size // 1000), (
        f"{n_bad} pixels diverged (expected only isolated tangency flips)")


@needs_tpu
def test_occlusion_kernels_mosaic_parity():
    """Any-hit (occlusion) Mosaic lowering, checked directly: the shadow
    query's boolean mask must match the jnp reference on both primitive
    kinds (torus grid chunks + mesh clusters)."""
    import jax.numpy as jnp
    import toroidal_ray_tracing_tpu as trt
    from toroidal_ray_tracing_tpu.cameras import generate_rays
    from toroidal_ray_tracing_tpu.scene import build_scene, procedural
    from toroidal_ray_tracing_tpu.trace.intersect import any_hit

    st = trt.RenderSettings.default(max_depth=1)
    cam = trt.PinholeCamera(eye=(10.0, 7.0, 10.0), center=(0.0, 0.0, 0.0))
    o_h, d_h = generate_rays(cam, 64, 32, st, xp=np)
    o, d = jnp.asarray(o_h.T), jnp.asarray(d_h.T)
    tmax = jnp.full((o.shape[1],), np.float32(50.0))
    for sd in (procedural.scene_instanced_torus_grid(n=256),
               procedural.scene_multi_torus(analytic=False)):
        scene = build_scene(sd)
        a = np.asarray(any_hit(scene, o, d, tmax, backend="jnp"))
        b = np.asarray(any_hit(scene, o, d, tmax, backend="pallas"))
        assert (a == b).mean() > 0.999, f"occlusion diverged: {(a != b).sum()}"


@needs_tpu
def test_streamed_tri_kernel_mosaic_parity():
    """HBM-streamed superblock kernel (double-buffered DMA, >TRI_STREAM_MIN
    meshes) vs the resident gated kernel on real hardware."""
    import jax.numpy as jnp
    from toroidal_ray_tracing_tpu.cameras import generate_rays
    from toroidal_ray_tracing_tpu.ops import trace_kernel as tk
    from toroidal_ray_tracing_tpu.scene import build_scene, procedural
    from toroidal_ray_tracing_tpu.scene.types import SceneDef
    from toroidal_ray_tracing_tpu.trace import intersect as isect
    import toroidal_ray_tracing_tpu as trt

    sdef = SceneDef()
    sdef.add_model(procedural.torus_mesh(2.0, 0.6, seg_major=64,
                                         seg_minor=32))
    scene = build_scene(sdef)
    geom = isect.geom_from_scene(scene)
    cam = trt.PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0))
    st = trt.RenderSettings.default(max_depth=1)
    o_h, d_h = generate_rays(cam, 64, 32, st, xp=np)
    o, d = jnp.asarray(o_h.T), jnp.asarray(d_h.T)
    tmax = jnp.full((o.shape[1],), np.float32(1e4))
    ref = tk.tri_closest_hit_pallas(
        o, d, tmax, geom.woop_o, geom.woop_d, geom.cluster_lo,
        geom.cluster_hi, scene.cluster_size)
    out = tk.tri_closest_hit_stream(
        o, d, tmax, geom.woop_o, geom.woop_d, geom.cluster_lo,
        geom.cluster_hi, scene.cluster_size)
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(out[0]),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(out[1]))


@needs_tpu
def test_streamed_grouped_kernel_mosaic_parity(monkeypatch):
    """Grouped streamed kernel (G ray tiles per grid step, per-group
    superblock unions, word-skip span-bit walk) vs the per-tile streamed
    kernel on real hardware. Default-off (TRT_STREAM_GROUP measured
    perf-neutral on config 8, PERF.md round 5) but must stay correct."""
    import jax.numpy as jnp
    from toroidal_ray_tracing_tpu.cameras import generate_rays
    from toroidal_ray_tracing_tpu.ops import tri_stream
    from toroidal_ray_tracing_tpu.scene import build_scene, procedural
    from toroidal_ray_tracing_tpu.scene.types import SceneDef
    from toroidal_ray_tracing_tpu.trace import intersect as isect
    import toroidal_ray_tracing_tpu as trt

    sdef = SceneDef()
    sdef.add_model(procedural.torus_mesh(2.0, 0.6, seg_major=64,
                                         seg_minor=32))
    scene = build_scene(sdef)
    geom = isect.geom_from_scene(scene)
    cam = trt.PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0))
    st = trt.RenderSettings.default(max_depth=1)
    o_h, d_h = generate_rays(cam, 64, 40, st, xp=np)  # fresh shape
    o, d = jnp.asarray(o_h.T), jnp.asarray(d_h.T)
    n = o.shape[1] // 1024 * 1024
    o, d = o[:, :n], d[:, :n]
    tmax = jnp.full((n,), np.float32(1e4))
    from toroidal_ray_tracing_tpu.ops import trace_kernel as tk

    # reference = the RESIDENT kernel (a different jitted entry point —
    # calling the stream entry twice at one shape with the group flag
    # flipped would silently reuse the first trace's cache)
    ref = tk.tri_closest_hit_pallas(
        o, d, tmax, geom.woop_o, geom.woop_d, geom.cluster_lo,
        geom.cluster_hi, scene.cluster_size)
    monkeypatch.setattr(tri_stream, "STREAM_GROUP", 16)
    out = tri_stream.tri_closest_hit_stream(
        o, d, tmax, geom.woop_o, geom.woop_d, geom.cluster_lo,
        geom.cluster_hi, scene.cluster_size)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(out[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(out[1]))


@needs_tpu
def test_small_torus_kernel_mosaic_parity():
    """Folded small-K torus kernel (rays on sublanes AND lanes,
    torus_closest_hit_small) vs the chunk-layout kernel on real hardware —
    closest, occlusion, and attrs-emission modes. This is the Mosaic
    compile gate for flipping TORUS_SMALL_ENABLE on."""
    import jax.numpy as jnp
    import toroidal_ray_tracing_tpu as trt
    from toroidal_ray_tracing_tpu.cameras import generate_rays
    from toroidal_ray_tracing_tpu.ops import trace_kernel as tk
    from toroidal_ray_tracing_tpu.scene import build_scene, procedural
    from toroidal_ray_tracing_tpu.trace import intersect as isect

    sd = procedural.scene_multi_torus(analytic=True)
    scene = build_scene(sd)
    geom = isect.geom_from_scene(scene)
    assert geom.tor_major.shape[0] <= tk.TORUS_SMALL_MAX_K
    cam = trt.PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0))
    st = trt.RenderSettings.default(max_depth=1)
    o_h, d_h = generate_rays(cam, 256, 128, st, xp=np)
    o, d = jnp.asarray(o_h.T), jnp.asarray(d_h.T)
    tmax = jnp.full((o.shape[1],), np.float32(1e4))
    mat = jnp.asarray(
        np.arange(geom.tor_major.shape[0] * 12,
                  dtype=np.float32).reshape(-1, 12))

    ref = tk.torus_closest_hit_pallas(
        o, d, tmax, geom.tor_w2o, geom.tor_major, geom.tor_minor,
        geom.tor_center, geom.tor_bound, mat_table=mat)
    out = tk.torus_closest_hit_small(
        o, d, tmax, geom.tor_w2o, geom.tor_major, geom.tor_minor,
        mat_table=mat)
    tr = np.minimum(np.asarray(ref[0]), 1e4)
    ts = np.minimum(np.asarray(out[0]), 1e4)
    agree = np.isclose(tr, ts, rtol=1e-4, atol=1e-3)
    assert (~agree).sum() <= max(4, tr.size // 2000), (~agree).sum()
    hit = agree & (ts < 1e4)
    np.testing.assert_array_equal(np.asarray(out[1])[hit],
                                  np.asarray(ref[1])[hit])
    np.testing.assert_allclose(np.asarray(out[2])[:, hit],
                               np.asarray(ref[2])[:, hit],
                               rtol=1e-3, atol=1e-3)

    r_oc = tk.torus_closest_hit_pallas(
        o, d, tmax, geom.tor_w2o, geom.tor_major, geom.tor_minor,
        geom.tor_center, geom.tor_bound, occlusion=True)
    o_oc = tk.torus_closest_hit_small(
        o, d, tmax, geom.tor_w2o, geom.tor_major, geom.tor_minor,
        occlusion=True)
    ra = np.asarray(r_oc[0]) < 1e30
    oa = np.asarray(o_oc[0]) < 1e30
    assert (ra == oa).mean() > 0.999, (ra != oa).sum()


@needs_tpu
def test_compaction_buckets_mosaic_parity():
    """Live-ray span compaction (wavefront COMPACT_FACTOR buckets) on real
    hardware: a 384x384 3-bounce render crosses the compaction threshold,
    so bounce 3 runs in the n/8 prefix bucket; result must match jnp."""
    import toroidal_ray_tracing_tpu as trt
    from toroidal_ray_tracing_tpu.scene import build_scene, procedural

    scene = build_scene(procedural.scene_multi_torus(analytic=True))
    cam = trt.PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0))
    st = trt.RenderSettings.default(max_depth=3)
    a = np.asarray(trt.render(scene, cam, 384, 384, st,
                              backend="jnp")["image"])
    b = np.asarray(trt.render(scene, cam, 384, 384, st,
                              backend="pallas")["image"])
    err = np.abs(a - b).max(axis=-1)
    n_bad = int((err > 1e-3).sum())
    assert n_bad <= max(8, err.size // 1000), (
        f"{n_bad} pixels diverged (expected only isolated tangency flips)")


@needs_tpu
def test_textured_scene_mosaic_parity(renderers):
    """Config-7 textured workload on hardware: the quad-packed (N, 12)
    atlas gather (shade.TEX_QUAD_GATHER) through the full pallas frame —
    trilinear sampling is XLA, not Mosaic, but its gather layout only
    exists on the real backend."""
    pair, procedural = renderers
    a, b = pair(procedural.scene_textured_mesh())
    err = np.abs(a - b).max(axis=-1)
    n_bad = int((err > 1e-3).sum())
    assert n_bad <= max(8, err.size // 1000), (
        f"{n_bad} pixels diverged (expected only isolated edge flips)")
