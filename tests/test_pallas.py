"""Pallas fast-path tests (interpret mode on the CPU backend — the same
kernel code compiles with Mosaic on a real TPU; the TPU-specific lowering
constraints are exercised by the driver's bench runs)."""

import numpy as np
import pytest

from toroidal_ray_tracing_tpu.cameras import PinholeCamera
from toroidal_ray_tracing_tpu.geom import torus as torus_geom
from toroidal_ray_tracing_tpu.render import render
from toroidal_ray_tracing_tpu.scene import RenderSettings, build_scene, procedural

RES = 24


def rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


@pytest.mark.parametrize("name,sd,depth", [
    ("multi_torus", lambda: procedural.scene_multi_torus(True), 2),
    ("cornellish", lambda: procedural.scene_cornellish, 2),
    ("torus_plane", lambda: procedural.scene_torus_plane(True), 1),
    ("instanced", lambda: procedural.scene_instanced_torus_grid(n=32), 2),
    # 128 tori crosses the K > 64 threshold: exercises the exact
    # visit-list + span-bit torus path (ops/trace_kernel._chunk_visit_lists)
    ("instanced_gated", lambda: procedural.scene_instanced_torus_grid(n=128), 2),
])
def test_pallas_matches_jnp(name, sd, depth):
    sdef = sd() if name != "cornellish" else procedural.scene_cornellish()
    scene = build_scene(sdef)
    cam = PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0))
    st = RenderSettings.default(max_depth=depth)
    ref = render(scene, cam, RES, RES, st)["image"]
    pal = render(scene, cam, RES, RES, st, backend="pallas")["image"]
    assert rmse(ref, pal) < 1e-5, f"{name}: {rmse(ref, pal)}"


def test_kernel_cubic_matches_trig():
    """The Mosaic-compatible resolvent solver (poly acos + Newton) tracks the
    exact trig solver across scales."""
    rng = np.random.default_rng(3)
    o = rng.normal(size=(20000, 3)) * 4.0
    target = rng.normal(size=(20000, 3))
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o32, d32 = o.astype(np.float32), d.astype(np.float32)
    b3, b2, b1, b0, ts = torus_geom.torus_coefficients(
        np, o32, d32, np.float32(2.0), np.float32(0.6))
    lo, hi = np.float32(1e-3) - ts, np.float32(1e4) - ts
    t_trig = torus_geom.quartic_min_positive(np, b3, b2, b1, b0, lo, hi,
                                             cubic="trig")
    t_kern = torus_geom.quartic_min_positive(np, b3, b2, b1, b0, lo, hi,
                                             cubic="newton")
    h1, h2 = t_trig < 1e30, t_kern < 1e30
    assert (h1 == h2).mean() > 0.9995
    both = h1 & h2
    err = np.abs(t_trig - t_kern)[both]
    assert np.percentile(err, 99.9) < 1e-4


def test_kernel_quartic_vs_f64():
    """quartic_min_positive in f32 vs the f64 ground truth."""
    rng = np.random.default_rng(7)
    o = rng.normal(size=(20000, 3)) * 4.0
    target = rng.normal(size=(20000, 3))
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t64, h64 = torus_geom.torus_intersect(np, o, d, 2.0, 0.6, 1e-3, 1e4)
    b3, b2, b1, b0, ts = torus_geom.torus_coefficients(
        np, o.astype(np.float32), d.astype(np.float32),
        np.float32(2.0), np.float32(0.6))
    t32 = torus_geom.quartic_min_positive(
        np, b3, b2, b1, b0, np.float32(1e-3) - ts, np.float32(1e4) - ts,
        cubic="newton") + ts
    h32 = t32 < 1e29
    assert (h64 == h32).mean() > 0.9995
    both = h64 & h32
    assert np.percentile(np.abs(t64 - t32)[both], 99.9) < 1e-4


def test_sah_vs_morton_clustering():
    """Scene builds with SAH (native) and Morton clustering render the same
    image."""
    from toroidal_ray_tracing_tpu.io import native

    if not native.available():
        pytest.skip("native lib not built")
    sd = procedural.scene_cornellish()
    cam = PinholeCamera(eye=(6.0, 4.0, 6.0))
    st = RenderSettings.default(max_depth=2)
    a = render(build_scene(sd, use_native=True), cam, RES, RES, st)["image"]
    b = render(build_scene(sd, use_native=False), cam, RES, RES, st)["image"]
    assert rmse(a, b) < 1e-6


def test_gated_tri_visit_lists_match_ungated(monkeypatch):
    """The big-mesh path (exact XLA cluster visit lists + span bits,
    TRI_GATE_MIN) must produce the same hits as the small-scene in-kernel
    path: force the gate on for a small mesh and compare the raw kernel
    outputs (called directly — the renderer's jit would cache the trace
    made before the monkeypatch)."""
    import jax.numpy as jnp

    from toroidal_ray_tracing_tpu.ops import tri_kernel as tk
    from toroidal_ray_tracing_tpu.trace import intersect as isect

    scene = build_scene(procedural.scene_cornellish())
    geom = isect.geom_from_scene(scene)
    assert scene.triangles.count > 1024  # multi-cluster mesh
    cam = PinholeCamera(eye=(0.0, 1.0, 3.5), center=(0.0, 1.0, 0.0))
    st = RenderSettings.default(max_depth=2)
    o, d = cam.generate_rays(64, 32, st, xp=np)
    o = jnp.asarray(o.T)
    d = jnp.asarray(d.T)
    tmax = jnp.full((o.shape[1],), np.float32(1e4))

    def run():
        out = tk.tri_closest_hit_pallas(
            o, d, tmax, geom.woop_o, geom.woop_d, geom.cluster_lo,
            geom.cluster_hi, scene.cluster_size)
        tk.tri_closest_hit_pallas.clear_cache()
        return [np.asarray(x) for x in out]

    ref = run()
    monkeypatch.setattr(tk, "TRI_GATE_MIN", 0)
    gated = run()
    for a, b in zip(ref, gated):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("sub,tile", [(256, 1024), (512, 1024),
                                      (512, 2048), (1024, 2048)])
def test_gated_tri_span_widths_match(monkeypatch, sub, tile):
    """TRI_SUB / TRI_RAY_TILE_GATED (the gated Woop span/tile widths) are
    perf-tunable via TRT_TRI_SUB / TRT_TRI_TILE; every combination must
    produce the default path's exact hits (guards the span-bit packing in
    _chunk_visit_lists at each ratio and the launcher's clamping)."""
    import jax.numpy as jnp

    from toroidal_ray_tracing_tpu.ops import tri_kernel as tk
    from toroidal_ray_tracing_tpu.trace import intersect as isect

    scene = build_scene(procedural.scene_cornellish())
    geom = isect.geom_from_scene(scene)
    cam = PinholeCamera(eye=(0.0, 1.0, 3.5), center=(0.0, 1.0, 0.0))
    st = RenderSettings.default(max_depth=2)
    o, d = cam.generate_rays(64, 32, st, xp=np)
    o = jnp.asarray(o.T)
    d = jnp.asarray(d.T)
    tmax = jnp.full((o.shape[1],), np.float32(1e4))

    def run():
        outs = []
        for occl in (False, True):
            out = tk.tri_closest_hit_pallas(
                o, d, tmax, geom.woop_o, geom.woop_d, geom.cluster_lo,
                geom.cluster_hi, scene.cluster_size, occlusion=occl)
            outs.append([np.asarray(x) for x in out])
        tk.tri_closest_hit_pallas.clear_cache()
        return outs

    monkeypatch.setattr(tk, "TRI_GATE_MIN", 256)  # force gating on
    ref = run()
    monkeypatch.setattr(tk, "TRI_SUB", sub)
    monkeypatch.setattr(tk, "TRI_RAY_TILE_GATED", tile)
    wide = run()
    # closest-hit: t and winner are exact. Any-hit: only the hit MASK is
    # contractual — the t value depends on how many extra clusters a span's
    # unoccluded mates keep alive, which varies with span width.
    np.testing.assert_array_equal(ref[0][0], wide[0][0])
    hit = ref[0][0] < 1e30
    np.testing.assert_array_equal(ref[0][1][hit], wide[0][1][hit])
    np.testing.assert_array_equal(ref[1][0] < 1e30, wide[1][0] < 1e30)


def test_hier_visit_lists_match_dense():
    """_chunk_visit_lists_hier (interval L1 + exact top-k L2) must equal
    the dense exact gate bit-for-bit when no span overflows maxv, and be
    a SUPERSET otherwise — including NaN-direction and dead (tmax=0)
    rays, which must not poison any span's interval."""
    import jax.numpy as jnp

    from toroidal_ray_tracing_tpu.ops.kernel_common import (
        _chunk_visit_lists, _chunk_visit_lists_hier)

    rng = np.random.default_rng(9)
    C = 96
    centers = rng.uniform(-12, 12, (C, 3)).astype(np.float32)
    half = rng.uniform(0.2, 1.2, (C, 3)).astype(np.float32)
    clo = jnp.asarray(centers - half)
    chi = jnp.asarray(centers + half)
    rank = jnp.asarray(rng.permutation(C).astype(np.int32))

    n = 8192
    o = rng.normal(size=(3, n)).astype(np.float32) * 10.0
    d = rng.normal(size=(3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    tmax = np.full((n,), 1e4, np.float32)
    tmax[::11] = 0.0                       # dead rays
    d[:, 7::29] = np.nan                   # eye==center raygen rows
    o_j, d_j, tm = jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax)

    dense = _chunk_visit_lists(o_j, d_j, tm, clo, chi, rank, 1024, 128)
    hier = _chunk_visit_lists_hier(o_j, d_j, tm, clo, chi, rank, 1024, 128,
                                   maxv=C)    # maxv = C: no overflow
    for a, b in zip(dense, hier):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # small maxv: overflow spans fall back to L1 — result must be a
    # SUPERSET of the dense bits per (tile, chunk)
    hier8 = _chunk_visit_lists_hier(o_j, d_j, tm, clo, chi, rank, 1024,
                                    128, maxv=8)

    def dense_bits(ids, bits, cnt):
        nt = ids.shape[0]
        out = np.zeros((nt, C), np.int32)
        for t in range(nt):
            for e in range(int(cnt[t, 0])):
                out[t, int(ids[t, e])] = int(bits[t, e])
        return out

    db = dense_bits(*[np.asarray(x) for x in dense])
    hb = dense_bits(*[np.asarray(x) for x in hier8])
    assert ((db & ~hb) == 0).all(), "hier dropped an exact candidate"


def test_tri_occl_nogate_matches(monkeypatch):
    """TRI_OCCL_NOGATE (gated any-hit dispatches skip the in-kernel slab +
    reduce) must leave the occlusion MASK exactly unchanged — the slab is
    a work-pruning device only."""
    import jax.numpy as jnp

    from toroidal_ray_tracing_tpu.ops import tri_kernel as tk
    from toroidal_ray_tracing_tpu.trace import intersect as isect

    scene = build_scene(procedural.scene_cornellish())
    geom = isect.geom_from_scene(scene)
    cam = PinholeCamera(eye=(0.0, 1.0, 3.5), center=(0.0, 1.0, 0.0))
    st = RenderSettings.default(max_depth=2)
    o, d = cam.generate_rays(64, 32, st, xp=np)
    o = jnp.asarray(o.T)
    d = jnp.asarray(d.T)
    tmax = jnp.full((o.shape[1],), np.float32(1e4))
    tmax = tmax.at[::5].set(0.0)   # dead rays must stay misses

    def run():
        out = tk.tri_closest_hit_pallas(
            o, d, tmax, geom.woop_o, geom.woop_d, geom.cluster_lo,
            geom.cluster_hi, scene.cluster_size, occlusion=True)
        tk.tri_closest_hit_pallas.clear_cache()
        return np.asarray(out[0]) < 1e30

    monkeypatch.setattr(tk, "TRI_GATE_MIN", 256)  # force gating on
    ref = run()
    monkeypatch.setattr(tk, "TRI_OCCL_NOGATE", True)
    nogate = run()
    assert not nogate[np.asarray(tmax) == 0.0].any()
    np.testing.assert_array_equal(ref, nogate)


def test_unaligned_cluster_size_rounds_up():
    """build_scene(cluster_size=64) on a multi-cluster mesh must round the
    width to a 128-multiple (the kernel lane-slices tables by dynamic
    cluster id, which Mosaic only allows at 128-aligned offsets) — and the
    render must still match the default build."""
    sd = procedural.scene_cornellish()
    scene64 = build_scene(sd, cluster_size=64)
    assert scene64.cluster_size % 128 == 0
    cam = PinholeCamera(eye=(0.0, 1.0, 3.5), center=(0.0, 1.0, 0.0))
    st = RenderSettings.default(max_depth=2)
    a = render(build_scene(sd), cam, RES, RES, st, backend="pallas")["image"]
    b = render(scene64, cam, RES, RES, st, backend="pallas")["image"]
    assert rmse(a, b) < 1e-5


def test_streamed_tri_kernel_matches_resident():
    """The HBM-streamed superblock kernel (tri_closest_hit_stream — the
    >TRI_STREAM_MIN huge-mesh path, double-buffered DMA) must reproduce the
    resident kernel's hits exactly, with and without attr emission."""
    import jax.numpy as jnp

    from toroidal_ray_tracing_tpu.ops import trace_kernel as tk
    from toroidal_ray_tracing_tpu.trace import intersect as isect

    scene = build_scene(procedural.scene_multi_torus(False))  # 23k-tri mesh
    geom = isect.geom_from_scene(scene)
    cam = PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0))
    st = RenderSettings.default(max_depth=2)
    o, d = cam.generate_rays(64, 32, st, xp=np)
    o = jnp.asarray(o.T)
    d = jnp.asarray(d.T)
    tmax = jnp.full((o.shape[1],), np.float32(1e4))
    tables = tk._tri_attr_tables(scene, geom)

    for attr in (None, tables):
        ref = tk.tri_closest_hit_pallas(
            o, d, tmax, geom.woop_o, geom.woop_d, geom.cluster_lo,
            geom.cluster_hi, scene.cluster_size, attr_tables=attr)
        out = tk.tri_closest_hit_stream(
            o, d, tmax, geom.woop_o, geom.woop_d, geom.cluster_lo,
            geom.cluster_hi, scene.cluster_size, attr_tables=attr)
        # t and idx are exact; u/v are epilogue-skipped under attrs
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(out[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(out[1]))
        if attr is not None:
            np.testing.assert_allclose(np.asarray(ref[4]),
                                       np.asarray(out[4]), rtol=1e-6)
        else:
            np.testing.assert_array_equal(np.asarray(ref[2]),
                                          np.asarray(out[2]))
            np.testing.assert_array_equal(np.asarray(ref[3]),
                                          np.asarray(out[3]))


def test_streamed_occlusion_matches_resident():
    from toroidal_ray_tracing_tpu.ops import trace_kernel as tk
    from toroidal_ray_tracing_tpu.trace import intersect as isect
    import jax.numpy as jnp

    scene = build_scene(procedural.scene_multi_torus(False))
    geom = isect.geom_from_scene(scene)
    cam = PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0))
    st = RenderSettings.default(max_depth=2)
    o, d = cam.generate_rays(64, 32, st, xp=np)
    o = jnp.asarray(o.T)
    d = jnp.asarray(d.T)
    tmax = jnp.full((o.shape[1],), np.float32(1e4))
    ref = tk.tri_closest_hit_pallas(
        o, d, tmax, geom.woop_o, geom.woop_d, geom.cluster_lo,
        geom.cluster_hi, scene.cluster_size, occlusion=True)
    out = tk.tri_closest_hit_stream(
        o, d, tmax, geom.woop_o, geom.woop_d, geom.cluster_lo,
        geom.cluster_hi, scene.cluster_size, occlusion=True)
    # any-hit: only hit existence is defined
    np.testing.assert_array_equal(np.asarray(ref[0]) < 1e30,
                                  np.asarray(out[0]) < 1e30)


def test_deferred_attrs_match_in_kernel_epilogue(monkeypatch):
    """TRT_DEFER_ATTRS=1 (default: winner attrs via one post-walk row
    gather) must be BIT-IDENTICAL to the in-kernel pick-matmul epilogue —
    same f32 products and sum order, only the execution site differs."""
    import jax.numpy as jnp

    from toroidal_ray_tracing_tpu.ops import trace_kernel as tk
    from toroidal_ray_tracing_tpu.trace import intersect as isect

    scene = build_scene(procedural.scene_multi_torus(False))
    geom = isect.geom_from_scene(scene)
    cam = PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0))
    st = RenderSettings.default(max_depth=2)
    # fresh shape (96x32) so flipping the module flag can't hit jit caches
    o, d = cam.generate_rays(96, 32, st, xp=np)
    o = jnp.asarray(o.T)
    d = jnp.asarray(d.T)
    tmax = jnp.full((o.shape[1],), np.float32(1e4))

    import jax as _jax

    monkeypatch.setattr(tk, "DEFER_ATTRS", True)
    a = tk.closest_hit_pallas(scene, geom, o, d, tmax, want_attrs=True)
    monkeypatch.setattr(tk, "DEFER_ATTRS", False)
    b = tk.closest_hit_pallas(scene, geom, o, d, tmax, want_attrs=True)
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    np.testing.assert_array_equal(np.asarray(a.prim), np.asarray(b.prim))
    for fa, fb in zip(_jax.tree_util.tree_leaves(a.attrs),
                      _jax.tree_util.tree_leaves(b.attrs)):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


def test_streamed_grouped_matches_resident(monkeypatch):
    """The grouped streamed kernel (default-off: perf-neutral on config 8
    but kept for DMA-bound workloads) must reproduce the resident kernel
    exactly. Fresh ray shape (64x48) — the stream entry point is jitted
    and the group flag is a module global, so a shape reused from another
    test would silently hit the per-tile cache."""
    import jax.numpy as jnp

    from toroidal_ray_tracing_tpu.ops import tri_stream
    from toroidal_ray_tracing_tpu.ops import trace_kernel as tk
    from toroidal_ray_tracing_tpu.trace import intersect as isect

    scene = build_scene(procedural.scene_multi_torus(False))
    geom = isect.geom_from_scene(scene)
    cam = PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0))
    st = RenderSettings.default(max_depth=2)
    o, d = cam.generate_rays(64, 48, st, xp=np)
    o = jnp.asarray(o.T)
    d = jnp.asarray(d.T)
    tmax = jnp.full((o.shape[1],), np.float32(1e4))
    tables = tk._tri_attr_tables(scene, geom)
    monkeypatch.setattr(tri_stream, "STREAM_GROUP", 16)
    for attr, occl in ((None, False), (tables, False), (None, True)):
        ref = tk.tri_closest_hit_pallas(
            o, d, tmax, geom.woop_o, geom.woop_d, geom.cluster_lo,
            geom.cluster_hi, scene.cluster_size, attr_tables=attr,
            occlusion=occl)
        out = tri_stream.tri_closest_hit_stream(
            o, d, tmax, geom.woop_o, geom.woop_d, geom.cluster_lo,
            geom.cluster_hi, scene.cluster_size, attr_tables=attr,
            occlusion=occl)
        if occl:
            np.testing.assert_array_equal(np.asarray(ref[0]) < 1e30,
                                          np.asarray(out[0]) < 1e30)
        else:
            np.testing.assert_array_equal(np.asarray(ref[0]),
                                          np.asarray(out[0]))
            np.testing.assert_array_equal(np.asarray(ref[1]),
                                          np.asarray(out[1]))
        if attr is not None:
            np.testing.assert_allclose(np.asarray(ref[4]),
                                       np.asarray(out[4]), rtol=1e-6)


def test_streamed_grouped_overflow_falls_back(monkeypatch):
    """When a group's superblock union exceeds the SMEM row cap
    (STREAM_VCAP), the lax.cond fallback must run the per-tile kernel —
    same results, never dropped work."""
    import jax.numpy as jnp

    from toroidal_ray_tracing_tpu.ops import tri_stream
    from toroidal_ray_tracing_tpu.ops import trace_kernel as tk
    from toroidal_ray_tracing_tpu.trace import intersect as isect

    scene = build_scene(procedural.scene_multi_torus(False))
    geom = isect.geom_from_scene(scene)
    cam = PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0))
    st = RenderSettings.default(max_depth=2)
    # a fresh tile-aligned ray-count (128x32) so the monkeypatched cap
    # isn't masked by the jit cache of earlier same-shape calls
    o, d = cam.generate_rays(128, 32, st, xp=np)
    o = jnp.asarray(o.T)
    d = jnp.asarray(d.T)
    tmax = jnp.full((o.shape[1],), np.float32(1e4))
    monkeypatch.setattr(tri_stream, "STREAM_VCAP", 1)
    ref = tk.tri_closest_hit_pallas(
        o, d, tmax, geom.woop_o, geom.woop_d, geom.cluster_lo,
        geom.cluster_hi, scene.cluster_size)
    out = tri_stream.tri_closest_hit_stream(
        o, d, tmax, geom.woop_o, geom.woop_d, geom.cluster_lo,
        geom.cluster_hi, scene.cluster_size)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(out[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(out[1]))


def test_loose_triangle_hoist_matches_jnp():
    """Loose tail rows (scene.loose_tris — e.g. the 2-triangle ground plane
    of the mesh ladder scene, build._split_loose_clusters) are brute-forced
    in a dense XLA prepass and their clusters never dispatch; results must
    be identical to the jnp all-pairs path in closest, occlusion, and attrs
    modes."""
    import jax.numpy as jnp

    from toroidal_ray_tracing_tpu.trace import intersect as isect

    scene = build_scene(procedural.scene_multi_torus(False))
    assert scene.loose_tris == 2  # the ground plane
    cam = PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0))
    st = RenderSettings.default(max_depth=2)
    o, d = cam.generate_rays(64, 32, st, xp=np)
    o = jnp.asarray(o.T)
    d = jnp.asarray(d.T)

    hj = isect.closest_hit(scene, o, d, backend="jnp")
    hp = isect.closest_hit(scene, o, d, backend="pallas")
    np.testing.assert_allclose(np.minimum(np.asarray(hp.t), 1e4),
                               np.minimum(np.asarray(hj.t), 1e4),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(hp.kind), np.asarray(hj.kind))
    np.testing.assert_array_equal(np.asarray(hp.prim), np.asarray(hj.prim))

    occ = isect.closest_hit(scene, o, d, backend="pallas", occlusion=True)
    np.testing.assert_array_equal(np.asarray(occ.kind) >= 0,
                                  np.asarray(hj.kind) >= 0)

    # attrs: plane winners carry the plane's (0, 1, 0) normal and its
    # mirror material's diffuse
    ha = isect.closest_hit(scene, o, d, backend="pallas", want_attrs=True)
    base = scene.triangles.woop_o.shape[2] - scene.cluster_size
    on_plane = (np.asarray(ha.kind) == 0) & (np.asarray(ha.prim) >= base)
    assert on_plane.sum() > 100
    nrm = np.asarray(ha.attrs.nrm)[:, on_plane]
    np.testing.assert_allclose(nrm[0], 0.0, atol=1e-5)
    np.testing.assert_allclose(nrm[1], 1.0, atol=1e-5)
    diff = np.asarray(ha.attrs.diffuse)[:, on_plane]
    np.testing.assert_allclose(
        diff, np.broadcast_to(np.array([[0.25], [0.25], [0.28]], np.float32),
                              diff.shape), atol=1e-5)


def test_small_torus_kernel_matches_chunk_kernel():
    """K <= 8 scenes dispatch the rays-on-sublanes kernel
    (torus_closest_hit_small); it must agree with the jnp torus
    intersection (same quartic math, folded layout) in closest, occlusion,
    and attrs modes."""
    import jax.numpy as jnp

    from toroidal_ray_tracing_tpu.ops import trace_kernel as tk
    from toroidal_ray_tracing_tpu.scene import procedural as proc
    from toroidal_ray_tracing_tpu.scene.types import SceneDef, Torus
    from toroidal_ray_tracing_tpu.trace import intersect as isect
    from toroidal_ray_tracing_tpu.utils import math3d

    sd = SceneDef()  # the multi-torus scene's tori, without the plane
    sd.add_model(Torus(1.6, 0.5, [proc.mirror()]),
                 math3d.translation((0.0, 0.8, 0.0)))
    sd.add_model(Torus(1.2, 0.4, [proc.matte((0.9, 0.25, 0.2))]),
                 math3d.compose(math3d.translation((-3.5, 0.6, 1.5)),
                                math3d.rotation_x(90.0)))
    sd.add_model(Torus(1.0, 0.35, [proc.matte((0.2, 0.4, 0.9))]),
                 math3d.compose(math3d.translation((3.2, 0.5, -1.0)),
                                math3d.rotation_z(90.0)))
    sd.add_model(Torus(0.8, 0.3, [proc.mirror((0.7, 0.8, 0.9))]),
                 math3d.translation((1.5, 0.4, 3.0)))
    scene = build_scene(sd)
    geom = isect.geom_from_scene(scene)
    assert geom.tor_major.shape[0] <= tk.TORUS_SMALL_MAX_K
    cam = PinholeCamera(eye=(8.0, 5.0, 8.0), center=(0.0, 0.5, 0.0))
    st = RenderSettings.default(max_depth=1)
    o, d = cam.generate_rays(64, 32, st, xp=np)
    o = jnp.asarray(o.T)
    d = jnp.asarray(d.T)
    tmax = jnp.full((o.shape[1],), np.float32(1e4))
    hj = isect._closest_hit_jnp(scene, geom, o, d, tmax)
    tj = np.minimum(np.asarray(hj.t), 1e4)

    for occl in (False, True):
        small = tk.torus_closest_hit_small(
            o, d, tmax, geom.tor_w2o, geom.tor_major, geom.tor_minor,
            occlusion=occl)
        ts = np.minimum(np.asarray(small[0]), 1e4)
        if occl:
            np.testing.assert_array_equal(ts < 1e4, tj < 1e4)
        else:
            np.testing.assert_allclose(ts, tj, rtol=1e-4, atol=1e-3)
            hit = ts < 1e4
            np.testing.assert_array_equal(
                np.asarray(small[1])[hit], np.asarray(hj.prim)[hit])

    # attrs: winner normals finite/nonzero, material rows = the winner's
    mat = jnp.asarray(
        np.arange(4 * 12, dtype=np.float32).reshape(4, 12))
    sm = tk.torus_closest_hit_small(
        o, d, tmax, geom.tor_w2o, geom.tor_major, geom.tor_minor,
        mat_table=mat)
    hit = np.asarray(sm[0]) < 1e30
    attr = np.asarray(sm[2])
    nrm = attr[0:3, hit]
    assert np.isfinite(nrm).all() and (np.abs(nrm).sum(axis=0) > 1e-6).all()
    widx = np.asarray(sm[1])[hit]
    np.testing.assert_allclose(attr[3, hit], widx * 12.0)


def test_all_loose_scene_skips_tri_kernel():
    """Plane-only triangle sets (the torus+plane ladder configs) compact
    entirely into the loose tail: closest_hit_pallas must not launch a
    triangle kernel at all, and the full render (attrs path) plus the
    occlusion query must still match the jnp backend exactly."""
    import jax.numpy as jnp

    import toroidal_ray_tracing_tpu as trt
    from toroidal_ray_tracing_tpu.ops import trace_kernel as tk
    from toroidal_ray_tracing_tpu.scene import build_scene, procedural
    from toroidal_ray_tracing_tpu.trace.intersect import any_hit

    scene = build_scene(procedural.scene_torus_plane(analytic=True))
    assert scene.loose_tris == 2
    n_cl = scene.cluster_lo.shape[0]
    assert n_cl * scene.cluster_size == scene.triangles.woop_o.shape[2]
    assert (scene.loose_tris + scene.cluster_size - 1) \
        // scene.cluster_size == n_cl

    calls = []
    orig = tk.tri_closest_hit_pallas

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    tk.tri_closest_hit_pallas = spy
    try:
        cam = trt.PinholeCamera(eye=(7.0, 4.0, 7.0), center=(0.0, 0.3, 0.0))
        st = trt.RenderSettings.default(max_depth=3)
        a = np.asarray(trt.render(scene, cam, 96, 96, st,
                                  backend="jnp")["image"])
        b = np.asarray(trt.render(scene, cam, 96, 96, st,
                                  backend="pallas")["image"])
    finally:
        tk.tri_closest_hit_pallas = orig
    assert not calls, "triangle kernel launched for an all-loose scene"
    err = np.abs(a - b).max(axis=-1)
    assert int((err > 1e-3).sum()) <= 2, (err > 1e-3).sum()

    from toroidal_ray_tracing_tpu.cameras import generate_rays
    o_h, d_h = generate_rays(cam, 64, 32, st, xp=np)
    o, d = jnp.asarray(o_h.T), jnp.asarray(d_h.T)
    tmax = jnp.full((o.shape[1],), np.float32(50.0))
    aj = np.asarray(any_hit(scene, o, d, tmax, backend="jnp"))
    ap = np.asarray(any_hit(scene, o, d, tmax, backend="pallas"))
    np.testing.assert_array_equal(aj, ap)


def test_mini_mesh_scene_full_render_gated(monkeypatch):
    """Miniature config-6: a tessellated mesh torus (forced through the
    GATED triangle path) over a loose-hoisted mirror ground plane, full
    render with shadows + reflection vs the jnp backend — the mesh-scene
    composition (gated kernel + hoist + torus-free) previously only ran on
    real hardware."""
    import jax.numpy as jnp  # noqa: F401

    from toroidal_ray_tracing_tpu.ops import tri_kernel as tk
    from toroidal_ray_tracing_tpu.scene import procedural as proc
    from toroidal_ray_tracing_tpu.scene.types import SceneDef
    from toroidal_ray_tracing_tpu.utils import math3d

    # patch the DEFINING module (ops.tri_kernel; trace_kernel re-exports)
    monkeypatch.setattr(tk, "TRI_GATE_MIN", 256)
    sd = SceneDef()
    sd.add_model(proc.torus_mesh(1.4, 0.5, seg_major=24, seg_minor=12,
                                 material=proc.matte((0.8, 0.45, 0.15))),
                 math3d.translation((0.0, 0.55, 0.0)))
    sd.add_model(proc.plane(10.0, material=proc.mirror((0.6, 0.6, 0.6),
                                                       (0.25, 0.25, 0.28))))
    scene = build_scene(sd)
    assert scene.loose_tris >= 2                 # the fat plane rows hoist
    assert scene.triangles.count > 256           # mesh crosses the gate
    assert scene.cluster_lo.shape[0] >= 3        # multi-cluster walk

    cam = PinholeCamera(eye=(5.0, 3.0, 5.0), center=(0.0, 0.4, 0.0))
    st = RenderSettings.default(max_depth=3)
    a = np.asarray(render(scene, cam, 96, 96, st, backend="jnp")["image"])
    b = np.asarray(render(scene, cam, 96, 96, st, backend="pallas")["image"])
    err = np.abs(a - b).max(axis=-1)
    n_bad = int((err > 1e-3).sum())
    assert n_bad <= 4, f"{n_bad} pixels diverged"


def test_wavefront_pad_enables_compaction_buckets():
    """1080p (2,073,600 rays) is divisible by NO compaction bucket stride
    (f*2048) — before the wavefront self-pad, every >=1080p config silently
    ran all bounces dense. Guard the pad math, and check that a padded
    render (96x96 = 9216 -> 16384 lanes, all three buckets live) matches
    the jnp backend bit-for-bit on the ray COUNTER too (pad lanes must
    never count as traced rays)."""
    import jax.numpy as jnp

    from toroidal_ray_tracing_tpu.cameras import generate_rays
    from toroidal_ray_tracing_tpu.trace import wavefront as wf

    align = wf._compact_align()
    assert all((align // (f * 2048)) * (f * 2048) == align
               for f in wf.COMPACT_FACTORS)
    n_1080p = 1920 * 1080
    assert any(n_1080p % (f * 2048) for f in wf.COMPACT_FACTORS), \
        "sanity: 1080p needs the pad for at least one bucket"
    assert (n_1080p + (-n_1080p) % align) % align == 0

    import jax

    scene = jax.device_put(build_scene(procedural.scene_torus_plane(
        analytic=True)))
    cam = PinholeCamera(eye=(7.0, 4.0, 7.0), center=(0.0, 0.3, 0.0))
    st = RenderSettings.default(max_depth=3)
    o_h, d_h = generate_rays(cam, 96, 96, st, xp=np)
    o, d = jnp.asarray(o_h), jnp.asarray(d_h)
    assert (-o.shape[0]) % align <= o.shape[0], "pad path must engage"

    from toroidal_ray_tracing_tpu.trace.wavefront import trace_rays
    hv_j, hp_j, nr_j = trace_rays(scene, st, o, d, backend="jnp")
    hv_p, hp_p, nr_p = trace_rays(scene, st, o, d, backend="pallas")
    assert hv_p.shape == hv_j.shape and hp_p.shape == hp_j.shape
    assert float(nr_p) == float(nr_j), (float(nr_p), float(nr_j))
    err = np.abs(np.asarray(hv_j) - np.asarray(hv_p)).max(axis=-1)
    assert int((err > 1e-3).sum()) <= 2


def test_small_torus_kernel_edge_cases():
    """Folded small-K kernel: odd K, dead rays (tmax=0), NaN directions
    (toroidal eye==center raygen), and an exactly-one-tile batch must all
    match the chunk-layout jnp reference (dead/NaN rays stay misses)."""
    import jax.numpy as jnp

    from toroidal_ray_tracing_tpu.ops import trace_kernel as tk
    from toroidal_ray_tracing_tpu.scene import procedural as proc
    from toroidal_ray_tracing_tpu.scene.types import SceneDef, Torus
    from toroidal_ray_tracing_tpu.trace import intersect as isect
    from toroidal_ray_tracing_tpu.utils import math3d

    sd = SceneDef()
    for i, (R, r) in enumerate([(1.8, 0.5), (1.2, 0.4), (0.9, 0.3),
                                (0.7, 0.25), (1.1, 0.33)]):   # K = 5 (odd)
        sd.add_model(Torus(R, r, [proc.matte((0.5, 0.5, 0.5))]),
                     math3d.translation((2.5 * (i - 2), 0.6, 1.3 * (i % 3))))
    scene = build_scene(sd)
    geom = isect.geom_from_scene(scene)
    assert geom.tor_major.shape[0] == 5

    n = tk.TORUS_SMALL_TILE                      # exactly one grid step
    rng = np.random.default_rng(11)
    o = np.asarray(rng.normal(size=(3, n)) * 6.0, np.float32)
    d = rng.normal(size=(3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    tmax = np.full((n,), 1e4, np.float32)
    tmax[::7] = 0.0                              # dead rays (bounce cull)
    d[:, 5::13] = np.nan                         # eye==center raygen rows
    o_j, d_j, tm_j = jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax)

    hj = isect._closest_hit_jnp(scene, geom, o_j, d_j, tm_j)
    tj = np.minimum(np.asarray(hj.t), 1e4)
    small = tk.torus_closest_hit_small(
        o_j, d_j, tm_j, geom.tor_w2o, geom.tor_major, geom.tor_minor)
    ts = np.minimum(np.asarray(small[0]), 1e4)
    dead = (tmax == 0.0) | np.isnan(d[0])
    assert (ts[dead] >= 1e4).all(), "dead/NaN rays must miss"
    agree = np.isclose(ts, tj, rtol=1e-4, atol=1e-3)
    assert (~agree).sum() <= max(4, n // 2000), (~agree).sum()

    occ = tk.torus_closest_hit_small(
        o_j, d_j, tm_j, geom.tor_w2o, geom.tor_major, geom.tor_minor,
        occlusion=True)
    oa = np.asarray(occ[0]) < 1e30
    ja = tj < 1e4
    assert (oa[~agree].size + (oa == ja)[agree].sum()) >= n - max(4, n // 2000)
    assert not oa[dead].any()


@pytest.mark.parametrize("sub", [128, 256, 512, 1024])
def test_gated_torus_span_widths_match_jnp(monkeypatch, sub):
    """TORUS_SUB (the gated quartic span width) is perf-tunable via
    TRT_TORUS_SUB; every width must produce identical hits. Guards the
    512-default chosen from the hardware sweep (PERF.md config-4 section)
    and the bit/span packing math in _chunk_visit_lists at each ratio."""
    import jax.numpy as jnp

    from toroidal_ray_tracing_tpu.ops import torus_kernel as tk
    from toroidal_ray_tracing_tpu.scene.types import SceneDef, Torus
    from toroidal_ray_tracing_tpu.trace import intersect as isect
    from toroidal_ray_tracing_tpu.utils import math3d

    # patch the DEFINING module (ops.torus_kernel — trace_kernel only
    # re-exports) and drop the jit cache: the launcher reads TORUS_SUB at
    # trace time, so a cached executable would silently reuse the previous
    # width and the parametrization would test nothing
    monkeypatch.setattr(tk, "TORUS_SUB", sub)
    monkeypatch.setattr(tk, "TORUS_SMALL_ENABLE", False)
    tk.torus_closest_hit_pallas.clear_cache()

    # 128 tori (> the K=64 gating threshold), no plane so the jnp
    # reference is tori-only like the kernel call
    s = SceneDef()
    rng = np.random.default_rng(3)
    base = s.add_model(Torus(0.35, 0.12, [procedural.matte((0.8, 0.5, 0.2))]),
                       math3d.translation((0.0, 0.15, 0.0)))
    for i in range(12):
        for j in range(12):
            if 1 + i * 12 + j >= 128:
                break
            s.add_instance(base, math3d.compose(
                math3d.translation(((i - 6) * 1.2, 0.15, (j - 6) * 1.2)),
                math3d.rotation_y(float(rng.uniform(0, 360)))))
    scene = build_scene(s)
    geom = isect.geom_from_scene(scene)
    assert geom.tor_major.shape[0] == 128

    cam = PinholeCamera(eye=(12.0, 9.0, 12.0), center=(0.0, 0.0, 0.0))
    st = RenderSettings.default(max_depth=1)
    o, d = cam.generate_rays(64, 32, st, xp=np)
    o = jnp.asarray(o.T)
    d = jnp.asarray(d.T)
    tmax = jnp.full((o.shape[1],), np.float32(1e4))
    hj = isect._closest_hit_jnp(scene, geom, o, d, tmax)
    tj = np.minimum(np.asarray(hj.t), 1e4)

    for occl in (False, True):
        out = tk.torus_closest_hit_pallas(
            o, d, tmax, geom.tor_w2o, geom.tor_major, geom.tor_minor,
            geom.tor_center, geom.tor_bound, occlusion=occl)
        tp = np.minimum(np.asarray(out[0]), 1e4)
        if occl:
            np.testing.assert_array_equal(tp < 1e4, tj < 1e4)
        else:
            np.testing.assert_allclose(tp, tj, rtol=1e-4, atol=1e-3)
            hit = tp < 1e4
            np.testing.assert_array_equal(
                np.asarray(out[1])[hit], np.asarray(hj.prim)[hit])
