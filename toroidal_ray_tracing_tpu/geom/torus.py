"""Analytic torus intersection: vectorized quartic root finding.

The reference has no procedural primitive (triangle BLAS only, SURVEY.md §0);
this implements the BASELINE.json extension: per-ray torus intersection via
Ferrari resolvent-cubic factorization with Newton polish, fully vectorized on
the VPU (no data-dependent control flow — everything is masked selects, so it
jits and runs inside Pallas kernels unchanged).

Torus: axis +y, centered at origin, major radius R, minor radius r:
    (x^2+y^2+z^2 + R^2 - r^2)^2 = 4 R^2 (x^2 + z^2)

Substituting p = o + t d gives a quartic in t. For conditioning the origin is
first translated to the ray's closest approach to the torus center.

Backend-generic: `xp` is numpy (oracle, float64) or jax.numpy (device,
float32 + polish).
"""

from __future__ import annotations

import numpy as np

F32 = np.float32
BIG = 3.0e38


def _cbrt(xp, x):
    """Signed cube root. Mosaic has no cbrt primitive, so the jnp path uses
    exp(log|x|/3) (relative error ~1 ulp; the quartic Newton polish absorbs
    it)."""
    if xp is np:
        return np.cbrt(x)
    ax = xp.abs(x)
    r = xp.exp(xp.log(xp.maximum(ax, 1e-38)) / 3.0)
    return xp.where(ax < 1e-38, 0.0, xp.sign(x) * r)


def _acos_approx(xp, x):
    """Abramowitz & Stegun 4.4.45 polynomial acos (|err| <= 6.7e-5 rad),
    extended to [-1, 0) via acos(-x) = pi - acos(x). Mosaic has no acos
    primitive; the cubic Newton polish downstream absorbs the residual."""
    ax = xp.minimum(xp.abs(x), 1.0 - 1e-7)  # keep the sqrt grad finite
    r = xp.sqrt(xp.maximum(1.0 - ax, 1e-12)) * (
        1.5707288 + ax * (-0.2121144 + ax * (0.0742610 + ax * (-0.0187293))))
    return xp.where(x < 0, np.pi - r, r)


def _largest_cubic_root_kernel(xp, A, B, C, polish_iters: int = 3):
    """Largest real root of m^3 + A m^2 + B m + C, Mosaic-compatible.

    Same trigonometric/Cardano split as `_largest_cubic_root`, but acos and
    cbrt are built from supported primitives (polynomial approx, exp/log),
    followed by guarded Newton polish on the cubic. Accurate across scales —
    a pure scaled-Newton variant mis-converged when the resolvent root was
    orders of magnitude below the Lagrange bound.
    """
    P = B - A * A / 3.0
    Q = 2.0 * A * A * A / 27.0 - A * B / 3.0 + C
    half_q = Q / 2.0
    third_p = P / 3.0
    D = half_q * half_q + third_p * third_p * third_p

    sqrtD = xp.sqrt(xp.maximum(D, 1e-30))
    w_single = _cbrt(xp, -half_q + sqrtD) + _cbrt(xp, -half_q - sqrtD)

    three_real = D <= 0.0
    hq_safe = xp.where(three_real, half_q, 0.0)
    tp_safe = xp.where(three_real, third_p, -1.0)
    s = xp.sqrt(xp.maximum(-tp_safe, 1e-30))
    cos_phi = xp.clip(-hq_safe / xp.maximum(s * s * s, 1e-30),
                      -1.0 + 1e-6, 1.0 - 1e-6)
    w_triple = 2.0 * s * xp.cos(_acos_approx(xp, cos_phi) / 3.0)

    m = xp.where(D > 0.0, w_single, w_triple) - A / 3.0

    def newton(m):
        f = ((m + A) * m + B) * m + C
        df = (3.0 * m + 2.0 * A) * m + B
        return m - f / xp.where(xp.abs(df) > 1e-30, df, 1e-30)

    if xp is np:
        for _ in range(polish_iters):
            m = newton(m)
    else:
        import jax  # noqa: PLC0415

        m = jax.lax.fori_loop(0, polish_iters, lambda _, m: newton(m), m)
    return m


def _largest_cubic_root(xp, A, B, C):
    """Largest real root of m^3 + A m^2 + B m + C = 0 (vectorized).

    Used on the Ferrari resolvent, whose constant term is -q^2/8 <= 0, so the
    largest real root is >= 0.
    """
    # depressed cubic: m = w - A/3 ; w^3 + P w + Q = 0
    P = B - A * A / 3.0
    Q = 2.0 * A * A * A / 27.0 - A * B / 3.0 + C
    half_q = Q / 2.0
    third_p = P / 3.0
    D = half_q * half_q + third_p * third_p * third_p

    # D > 0: single real root (Cardano)
    sqrtD = xp.sqrt(xp.maximum(D, 1e-30))
    w_single = _cbrt(xp, -half_q + sqrtD) + _cbrt(xp, -half_q - sqrtD)

    # D <= 0: three real roots; largest = 2 sqrt(-P/3) cos(phi/3).
    # Grad hygiene: (a) sanitize the dead branch's inputs BEFORE dividing —
    # an inf forward residual makes the division VJP emit 0 * inf = NaN even
    # under a zero cotangent; (b) clip strictly inside (-1, 1) because
    # d acos/dx is infinite at the endpoints. The quartic Newton polish
    # absorbs the tiny forward perturbations.
    three_real = D <= 0.0
    hq_safe = xp.where(three_real, half_q, 0.0)
    tp_safe = xp.where(three_real, third_p, -1.0)
    s = xp.sqrt(xp.maximum(-tp_safe, 1e-30))
    cos_phi = xp.clip(-hq_safe / xp.maximum(s * s * s, 1e-30),
                      -1.0 + 1e-6, 1.0 - 1e-6)
    w_triple = 2.0 * s * xp.cos(xp.arccos(cos_phi) / 3.0)

    w = xp.where(D > 0.0, w_single, w_triple)
    return w - A / 3.0


def quartic_roots(xp, b3, b2, b1, b0, newton_iters: int = 3):
    """All real roots of the monic quartic t^4 + b3 t^3 + b2 t^2 + b1 t + b0.

    Returns (roots, valid): both (..., 4); invalid slots hold BIG.
    Ferrari: depress, solve resolvent cubic for m, split into two quadratics,
    then polish every root with `newton_iters` Newton steps on the original
    quartic (recovers fp32 accuracy near tangency).
    """
    shift = b3 / 4.0
    p = b2 - 3.0 / 8.0 * b3 * b3
    q = b1 - b3 * b2 / 2.0 + b3 * b3 * b3 / 8.0
    r = (b0 - b3 * b1 / 4.0 + b3 * b3 * b2 / 16.0
         - 3.0 / 256.0 * b3 * b3 * b3 * b3)

    # resolvent: m^3 + p m^2 + (p^2/4 - r) m - q^2/8 = 0, largest root m >= 0
    m = _largest_cubic_root(xp, p, p * p / 4.0 - r, -q * q / 8.0)
    m = xp.maximum(m, 0.0)

    two_m = 2.0 * m
    sq2m = xp.sqrt(xp.maximum(two_m, 1e-30))
    biquad = sq2m < 1e-10  # q ~ 0: biquadratic fallback

    # Ferrari quadratics: y^2 -/+ sq2m*y + (p/2 + m +/- q/(2 sq2m)) = 0
    q_term = q / xp.maximum(2.0 * sq2m, 1e-30)
    B_a, C_a = -sq2m, p / 2.0 + m + q_term
    B_b, C_b = sq2m, p / 2.0 + m - q_term

    # biquadratic: y^2 = z, z^2 + p z + r = 0
    disc_bi = p * p / 4.0 - r
    sq_bi = xp.sqrt(xp.maximum(disc_bi, 1e-30))
    z_a, z_b = -p / 2.0 + sq_bi, -p / 2.0 - sq_bi

    def quad_roots(B, C):
        disc = B * B - 4.0 * C
        ok = disc >= 0.0
        sq = xp.sqrt(xp.maximum(disc, 1e-30))
        return (-B + sq) / 2.0, (-B - sq) / 2.0, ok

    ra1, ra2, ok_a = quad_roots(B_a, C_a)
    rb1, rb2, ok_b = quad_roots(B_b, C_b)

    # biquadratic roots
    bi_ok_a = biquad & (disc_bi >= 0.0) & (z_a >= 0.0)
    bi_ok_b = biquad & (disc_bi >= 0.0) & (z_b >= 0.0)
    sz_a = xp.sqrt(xp.maximum(z_a, 1e-30))
    sz_b = xp.sqrt(xp.maximum(z_b, 1e-30))

    y1 = xp.where(biquad, sz_a, ra1)
    y2 = xp.where(biquad, -sz_a, ra2)
    y3 = xp.where(biquad, sz_b, rb1)
    y4 = xp.where(biquad, -sz_b, rb2)
    v1 = xp.where(biquad, bi_ok_a, ok_a)
    v2 = xp.where(biquad, bi_ok_a, ok_a)
    v3 = xp.where(biquad, bi_ok_b, ok_b)
    v4 = xp.where(biquad, bi_ok_b, ok_b)

    roots = xp.stack([y1, y2, y3, y4], axis=-1) - shift[..., None]
    valid = xp.stack([v1, v2, v3, v4], axis=-1)

    # Newton polish on the original quartic
    b3e, b2e = b3[..., None], b2[..., None]
    b1e, b0e = b1[..., None], b0[..., None]
    t = roots
    for _ in range(newton_iters):
        f = (((t + b3e) * t + b2e) * t + b1e) * t + b0e
        df = ((4.0 * t + 3.0 * b3e) * t + 2.0 * b2e) * t + b1e
        step = f / xp.where(xp.abs(df) > 1e-20, df, 1e-20)
        t = xp.where(valid, t - step, t)

    t = xp.where(valid, t, BIG)
    return t, valid


def torus_coefficients(xp, o, d, R, r):
    """Monic quartic coefficients for |o + t d| on the torus surface.

    o, d: (..., 3); R, r broadcastable to (...). d need not be normalized
    (affine-instancing trick: object-space t equals world-space t when d is
    transformed unnormalized — same convention the reference inherits from
    `gl_ObjectToWorldEXT`, raytrace.rchit:50).
    Returns (b3, b2, b1, b0, tshift).
    """
    m = xp.sum(d * d, axis=-1)
    m = xp.maximum(m, 1e-30)
    tshift = -xp.sum(o * d, axis=-1) / m
    oc = o + tshift[..., None] * d

    od = xp.sum(oc * d, axis=-1)           # ~0 after the shift
    oo = xp.sum(oc * oc, axis=-1)
    R2, r2 = R * R, r * r
    k = oo + R2 - r2

    dxz2 = d[..., 0] * d[..., 0] + d[..., 2] * d[..., 2]
    oxz_dxz = oc[..., 0] * d[..., 0] + oc[..., 2] * d[..., 2]
    oxz2 = oc[..., 0] * oc[..., 0] + oc[..., 2] * oc[..., 2]

    c4 = m * m
    c3 = 4.0 * m * od
    c2 = 2.0 * m * k + 4.0 * od * od - 4.0 * R2 * dxz2
    c1 = 4.0 * od * k - 8.0 * R2 * oxz_dxz
    c0 = k * k - 4.0 * R2 * oxz2

    inv = 1.0 / c4
    return c3 * inv, c2 * inv, c1 * inv, c0 * inv, tshift


def quartic_min_positive(xp, b3, b2, b1, b0, lo, hi, newton_iters: int = 3,
                         extra_valid=None, cubic: str = "trig"):
    """Smallest real root of the monic quartic inside [lo, hi].

    Same Ferrari + Newton math as `quartic_roots`, but the four candidates
    are tracked as separate arrays (no stacked trailing axis) so the whole
    computation stays 2D — required for the Pallas TPU kernel. Returns BIG
    where no valid root exists. `extra_valid` optionally masks lanes
    (e.g. padding tori with r < 0). cubic="newton" selects the
    transcendental-free resolvent solver (required inside Mosaic kernels).
    """
    shift = b3 / 4.0
    p = b2 - 3.0 / 8.0 * b3 * b3
    q = b1 - b3 * b2 / 2.0 + b3 * b3 * b3 / 8.0
    r0 = (b0 - b3 * b1 / 4.0 + b3 * b3 * b2 / 16.0
          - 3.0 / 256.0 * b3 * b3 * b3 * b3)

    cubic_root = (_largest_cubic_root_kernel if cubic == "newton"
                  else _largest_cubic_root)
    m = cubic_root(xp, p, p * p / 4.0 - r0, -q * q / 8.0)
    m = xp.maximum(m, 0.0)
    two_m = 2.0 * m
    sq2m = xp.sqrt(xp.maximum(two_m, 1e-30))
    biquad = sq2m < 1e-10
    q_term = q / xp.maximum(2.0 * sq2m, 1e-30)

    B_a, C_a = -sq2m, p / 2.0 + m + q_term
    B_b, C_b = sq2m, p / 2.0 + m - q_term

    disc_bi = p * p / 4.0 - r0
    sq_bi = xp.sqrt(xp.maximum(disc_bi, 1e-30))
    z_a, z_b = -p / 2.0 + sq_bi, -p / 2.0 - sq_bi
    bi_ok_a = biquad & (disc_bi >= 0.0) & (z_a >= 0.0)
    bi_ok_b = biquad & (disc_bi >= 0.0) & (z_b >= 0.0)
    sz_a = xp.sqrt(xp.maximum(z_a, 1e-30))
    sz_b = xp.sqrt(xp.maximum(z_b, 1e-30))

    def quad_roots(B, C):
        disc = B * B - 4.0 * C
        ok = disc >= 0.0
        sq = xp.sqrt(xp.maximum(disc, 1e-30))
        return (-B + sq) / 2.0, (-B - sq) / 2.0, ok

    ra1, ra2, ok_a = quad_roots(B_a, C_a)
    rb1, rb2, ok_b = quad_roots(B_b, C_b)

    # bool-valued where() lowers to an unsupported i8->i1 truncation in
    # Mosaic; use pure logical ops for the validity masks instead
    ok_first = (biquad & bi_ok_a) | (~biquad & ok_a)
    ok_second = (biquad & bi_ok_b) | (~biquad & ok_b)
    cands = (
        (xp.where(biquad, sz_a, ra1), ok_first),
        (xp.where(biquad, -sz_a, ra2), ok_first),
        (xp.where(biquad, sz_b, rb1), ok_second),
        (xp.where(biquad, -sz_b, rb2), ok_second),
    )

    def polish(t, ok):
        def newton(t):
            f = (((t + b3) * t + b2) * t + b1) * t + b0
            df = ((4.0 * t + 3.0 * b3) * t + 2.0 * b2) * t + b1
            step = f / xp.where(xp.abs(df) > 1e-20, df, 1e-20)
            step = xp.clip(step, -1e3, 1e3)  # safeguard: keeps grads finite
            return xp.where(ok, t - step, t)

        if xp is np:
            for _ in range(newton_iters):
                t = newton(t)
        else:
            import jax  # noqa: PLC0415

            t = jax.lax.fori_loop(0, newton_iters, lambda _, t: newton(t), t)
        return t

    best = None
    for y, ok in cands:
        t = polish(y - shift, ok)
        good = ok & (t >= lo) & (t <= hi)
        # residual check: discriminant misclassification (coarse exp/log/
        # acos primitives in Mosaic) can promote a complex pair to a "real"
        # candidate; a true root after polish has |f| ~ eps * scale
        at = xp.abs(t)
        f = (((t + b3) * t + b2) * t + b1) * t + b0
        scale = (((at + xp.abs(b3)) * at + xp.abs(b2)) * at
                 + xp.abs(b1)) * at + xp.abs(b0)
        good = good & (xp.abs(f) <= 1e-3 * scale + 1e-30)
        if extra_valid is not None:
            good = good & extra_valid
        t = xp.where(good, t, BIG)
        best = t if best is None else xp.minimum(best, t)
    return best


def torus_intersect(xp, o, d, R, r, tmin, tmax, newton_iters: int = 3):
    """Nearest torus hit along each ray.

    Returns (t, hit): t has BIG where no hit; shapes broadcast from
    o/d (..., 3) and R/r (...).
    """
    b3, b2, b1, b0, tshift = torus_coefficients(xp, o, d, R, r)
    tmax_e = xp.asarray(tmax)
    lo = tmin - tshift
    hi = tmax_e - tshift
    # invalid / padding tori carry r < 0 and never hit (scene/build.py)
    valid = xp.broadcast_to(xp.asarray(r) > 0.0, b3.shape)
    t = quartic_min_positive(xp, b3, b2, b1, b0, lo, hi, newton_iters,
                             extra_valid=valid)
    t = xp.where(t < BIG, t + tshift, t)
    return t, t < tmax_e


def torus_normal(xp, p, R):
    """Outward surface normal at point p on the torus (axis +y): the vector
    from the core circle to p: n = normalize(p - R * normalize((x, 0, z)))."""
    xz = xp.sqrt(xp.maximum(p[..., 0] ** 2 + p[..., 2] ** 2, 1e-30))
    scale = R / xz
    core = xp.stack(
        [p[..., 0] * scale, xp.zeros_like(p[..., 1]), p[..., 2] * scale],
        axis=-1,
    )
    n = p - core
    ln = xp.sqrt(xp.maximum(xp.sum(n * n, axis=-1, keepdims=True), 1e-30))
    return n / ln
