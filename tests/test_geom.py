"""Intersection-primitive unit tests: triangles (MT vs Woop) and the torus
quartic solver."""

import numpy as np
import pytest

from toroidal_ray_tracing_tpu.geom import torus as torus_geom
from toroidal_ray_tracing_tpu.geom.bvh import build_bvh
from toroidal_ray_tracing_tpu.geom.triangle import (
    intersect_woop,
    moller_trumbore,
    ray_aabb,
)
from toroidal_ray_tracing_tpu.scene.build import _woop_matrices

F32 = np.float32


def make_woop(v0, e1, e2):
    W, c, _ = _woop_matrices(v0, e1, e2)
    woop_o = np.concatenate([W, c[:, :, None]], axis=2).transpose(1, 2, 0)
    woop_d = W.transpose(1, 2, 0)
    return woop_o.astype(F32), woop_d.astype(F32)


class TestTriangle:
    def test_known_hit(self):
        v0 = np.array([[0.0, 0.0, 5.0]], F32)
        e1 = np.array([[2.0, 0.0, 0.0]], F32)
        e2 = np.array([[0.0, 2.0, 0.0]], F32)
        o = np.array([[0.5, 0.5, 0.0]], F32)
        d = np.array([[0.0, 0.0, 1.0]], F32)
        t, u, v, hit = moller_trumbore(np, o, d, v0, e1, e2, 0.001, 1e4)
        assert hit[0, 0]
        np.testing.assert_allclose(t[0, 0], 5.0, rtol=1e-6)
        np.testing.assert_allclose([u[0, 0], v[0, 0]], [0.25, 0.25], rtol=1e-5)

    def test_miss_outside(self):
        v0 = np.array([[0.0, 0.0, 5.0]], F32)
        e1 = np.array([[1.0, 0.0, 0.0]], F32)
        e2 = np.array([[0.0, 1.0, 0.0]], F32)
        o = np.array([[2.0, 2.0, 0.0]], F32)
        d = np.array([[0.0, 0.0, 1.0]], F32)
        _, _, _, hit = moller_trumbore(np, o, d, v0, e1, e2, 0.001, 1e4)
        assert not hit[0, 0]

    def test_woop_matches_mt_random(self):
        rng = np.random.default_rng(3)
        T, N = 128, 256
        v0 = rng.normal(size=(T, 3)).astype(F32) * 2
        e1 = rng.normal(size=(T, 3)).astype(F32)
        e2 = rng.normal(size=(T, 3)).astype(F32)
        o = rng.normal(size=(N, 3)).astype(F32) * 4
        d = rng.normal(size=(N, 3)).astype(F32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        woop_o, woop_d = make_woop(v0, e1, e2)
        t1, u1, v1, h1 = moller_trumbore(np, o, d, v0, e1, e2, 0.001, 1e4)
        t2, u2, v2, h2 = intersect_woop(np, o, d, woop_o, woop_d, 0.001, 1e4)
        agree = h1 == h2
        assert agree.mean() > 0.999  # fp32 edge ties allowed
        both = h1 & h2
        np.testing.assert_allclose(t1[both], t2[both], rtol=1e-3, atol=1e-4)

    def test_degenerate_triangle_never_hits(self):
        v0 = np.array([[0.0, 0.0, 5.0]], F32)
        e1 = np.array([[1.0, 0.0, 0.0]], F32)
        e2 = np.array([[2.0, 0.0, 0.0]], F32)  # collinear => zero area
        woop_o, woop_d = make_woop(v0, e1, e2)
        o = np.zeros((4, 3), F32)
        d = np.tile(np.array([[0.0, 0.0, 1.0]], F32), (4, 1))
        _, _, _, hit = intersect_woop(np, o, d, woop_o, woop_d, 0.001, 1e4)
        assert not hit.any()

    def test_tmax_respected(self):
        v0 = np.array([[0.0, 0.0, 5.0]], F32)
        e1 = np.array([[2.0, 0.0, 0.0]], F32)
        e2 = np.array([[0.0, 2.0, 0.0]], F32)
        woop_o, woop_d = make_woop(v0, e1, e2)
        o = np.array([[0.5, 0.5, 0.0]], F32)
        d = np.array([[0.0, 0.0, 1.0]], F32)
        _, _, _, hit = intersect_woop(np, o, d, woop_o, woop_d, 0.001, 4.0)
        assert not hit.any()


class TestTorus:
    def test_axis_ray_through_hole_misses(self):
        o = np.array([[0.0, -5.0, 0.0]])
        d = np.array([[0.0, 1.0, 0.0]])
        t, hit = torus_geom.torus_intersect(np, o, d, 2.0, 0.5, 1e-3, 1e4)
        assert not hit[0]

    def test_equatorial_ray_hits(self):
        o = np.array([[-10.0, 0.0, 0.0]])
        d = np.array([[1.0, 0.0, 0.0]])
        t, hit = torus_geom.torus_intersect(np, o, d, 2.0, 0.5, 1e-3, 1e4)
        assert hit[0]
        np.testing.assert_allclose(t[0], 10.0 - 2.5, rtol=1e-6)

    def test_vs_numpy_polyroots(self):
        """Ferrari+Newton roots match numpy.roots on random rays."""
        rng = np.random.default_rng(7)
        R, r = 2.0, 0.6
        n_checked = 0
        for _ in range(200):
            o = rng.normal(size=3) * 4.0
            target = rng.normal(size=3)  # aim near the torus
            d = target - o
            d /= np.linalg.norm(d)
            b3, b2, b1, b0, tshift = torus_geom.torus_coefficients(
                np, o[None], d[None], R, r)
            roots = np.roots([1.0, b3[0], b2[0], b1[0], b0[0]])
            real = np.sort([
                float(z.real) + tshift[0] for z in roots
                if abs(z.imag) < 1e-9 and z.real + tshift[0] > 1e-3])
            t, hit = torus_geom.torus_intersect(np, o[None], d[None], R, r,
                                                1e-3, 1e4)
            if len(real):
                assert hit[0]
                np.testing.assert_allclose(t[0], real[0], rtol=1e-5, atol=1e-6)
                n_checked += 1
            else:
                assert not hit[0]
        assert n_checked > 20  # the sample must actually contain hits

    def test_float32_accuracy(self):
        """fp32 Ferrari+Newton vs fp64: hit fraction and t error."""
        rng = np.random.default_rng(11)
        n = 4096
        o = (rng.normal(size=(n, 3)) * 4.0)
        d = rng.normal(size=(n, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        t64, h64 = torus_geom.torus_intersect(np, o, d, 2.0, 0.6, 1e-3, 1e4)
        t32, h32 = torus_geom.torus_intersect(
            np, o.astype(F32), d.astype(F32), F32(2.0), F32(0.6),
            F32(1e-3), F32(1e4))
        agree = h64 == h32
        assert agree.mean() > 0.995
        both = h64 & h32
        err = np.abs(t64[both] - t32[both])
        assert np.median(err) < 1e-5
        assert np.percentile(err, 99) < 1e-2  # near-tangent rays are hard

    def test_normal_is_unit_and_outward(self):
        p = np.array([[2.6, 0.0, 0.0], [2.0, 0.6, 0.0]])
        n = torus_geom.torus_normal(np, p, 2.0)
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-6)
        np.testing.assert_allclose(n[0], [1.0, 0.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(n[1], [0.0, 1.0, 0.0], atol=1e-6)

    def test_implicit_residual_at_hits(self):
        """Hit points satisfy the torus implicit equation."""
        rng = np.random.default_rng(5)
        o = rng.normal(size=(512, 3)) * 5.0
        d = rng.normal(size=(512, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        R, r = 2.0, 0.6
        t, hit = torus_geom.torus_intersect(np, o, d, R, r, 1e-3, 1e4)
        p = o[hit] + t[hit, None] * d[hit]
        S = (p ** 2).sum(1) + R * R - r * r
        res = S * S - 4 * R * R * (p[:, 0] ** 2 + p[:, 2] ** 2)
        assert np.abs(res).max() < 1e-6


class TestAABB:
    def test_slab(self):
        o = np.array([[0.0, 0.0, -5.0], [3.0, 0.0, -5.0]], F32)
        d = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], F32)
        inv = np.where(d != 0, 1.0 / np.where(d == 0, 1, d), np.inf).astype(F32)
        lo = np.array([[-1.0, -1.0, -1.0]], F32)
        hi = np.array([[1.0, 1.0, 1.0]], F32)
        hit = ray_aabb(np, o, inv, lo, hi, 0.0, 1e4)
        assert hit[0, 0] and not hit[1, 0]


class TestBVH:
    def test_bounds_contain_prims(self):
        rng = np.random.default_rng(2)
        lo = rng.normal(size=(100, 3)).astype(F32)
        hi = lo + rng.random((100, 3)).astype(F32)
        bvh = build_bvh(lo, hi)
        assert sorted(bvh.order.tolist()) == list(range(100))
        # root bounds contain everything
        np.testing.assert_array_compare(np.less_equal, bvh.lo[0] - 1e-6, lo.min(0))
        np.testing.assert_array_compare(np.greater_equal, bvh.hi[0] + 1e-6, hi.max(0))
