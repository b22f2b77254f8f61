"""Quadrature + spline helpers (ref: include/mitsuba/core/quad.h,
spline.h — Gauss-Legendre/Lobatto nodes and Catmull-Rom splines, used by
the reference for rough-transmittance tables and quadrature tests)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def gauss_legendre(n: int):
    """Nodes/weights on [-1, 1]."""
    x, w = np.polynomial.legendre.leggauss(n)
    return jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32)


def gauss_lobatto(n: int):
    """Gauss-Lobatto nodes/weights on [-1, 1] (endpoints included)."""
    assert n >= 2
    # interior nodes are roots of P'_{n-1}
    leg = np.polynomial.legendre.Legendre.basis(n - 1)
    xi = leg.deriv().roots()
    x = np.concatenate([[-1.0], np.sort(xi), [1.0]])
    pn = leg(x)
    w = 2.0 / (n * (n - 1) * pn**2)
    return jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32)


def integrate(f, a: float, b: float, n: int = 64):
    """∫_a^b f via Gauss-Legendre."""
    x, w = gauss_legendre(n)
    xm = 0.5 * (a + b) + 0.5 * (b - a) * x
    return 0.5 * (b - a) * jnp.sum(w * f(xm))


def catmull_rom(x, xs, ys):
    """1-D Catmull-Rom spline interpolation of samples (xs uniform)."""
    n = ys.shape[0]
    dx = xs[1] - xs[0]
    t = (x - xs[0]) / dx
    i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 2)
    f = t - i
    im1 = jnp.maximum(i - 1, 0)
    ip2 = jnp.minimum(i + 2, n - 1)
    p0, p1, p2, p3 = ys[im1], ys[i], ys[i + 1], ys[ip2]
    m1 = 0.5 * (p2 - p0)
    m2 = 0.5 * (p3 - p1)
    f2 = f * f
    f3 = f2 * f
    return ((2 * f3 - 3 * f2 + 1) * p1 + (f3 - 2 * f2 + f) * m1
            + (-2 * f3 + 3 * f2) * p2 + (f3 - f2) * m2)


def brent(f, a, b, n_iters: int = 64):
    """Brent-Dekker root finding on [a, b] (ref: the reference's
    util/brent-style solver, include/mitsuba/core/brent.h).  JIT-friendly:
    a fixed-iteration lax.fori_loop with branchless inverse-quadratic /
    secant / bisection selection; f must be vectorizable over its input.

    Returns the root estimate (same shape as a/b).  Assumes f(a), f(b)
    bracket a sign change; converged lanes simply stop moving.
    """
    import jax

    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    fa, fb = f(a), f(b)
    # ensure |f(b)| <= |f(a)|: b is the best guess
    swap = jnp.abs(fa) < jnp.abs(fb)
    a, b = jnp.where(swap, b, a), jnp.where(swap, a, b)
    fa, fb = jnp.where(swap, fb, fa), jnp.where(swap, fa, fb)

    def body(i, carry):
        a, b, c, fa, fb, fc, mflag = carry
        # candidate: inverse quadratic interpolation or secant
        use_iqi = (fa != fc) & (fb != fc)
        s_iqi = (
            a * fb * fc / jnp.where(use_iqi, (fa - fb) * (fa - fc), 1.0)
            + b * fa * fc / jnp.where(use_iqi, (fb - fa) * (fb - fc), 1.0)
            + c * fa * fb / jnp.where(use_iqi, (fc - fa) * (fc - fb), 1.0)
        )
        denom = jnp.where(fb != fa, fb - fa, 1.0)
        s_sec = b - fb * (b - a) / denom
        s = jnp.where(use_iqi, s_iqi, s_sec)
        # fall back to bisection when s leaves [(3a+b)/4, b] or converges
        # too slowly
        lo = (3.0 * a + b) / 4.0
        bad = ((s - lo) * (s - b) >= 0) | mflag
        s = jnp.where(bad, 0.5 * (a + b), s)
        fs = f(s)
        c, fc = b, fb
        # keep the bracket: replace the endpoint with matching sign
        same = (fa * fs) > 0
        a2 = jnp.where(same, s, a)
        fa2 = jnp.where(same, fs, fa)
        b2 = jnp.where(same, b, s)
        fb2 = jnp.where(same, fb, fs)
        # b stays the best guess
        swap = jnp.abs(fa2) < jnp.abs(fb2)
        a3 = jnp.where(swap, b2, a2)
        b3 = jnp.where(swap, a2, b2)
        fa3 = jnp.where(swap, fb2, fa2)
        fb3 = jnp.where(swap, fa2, fb2)
        return a3, b3, c, fa3, fb3, fc, bad

    c, fc = a, fa
    mflag = jnp.zeros_like(jnp.asarray(fa), bool)
    out = jax.lax.fori_loop(0, n_iters, body,
                            (a, b, c, fa, fb, fc, mflag))
    return out[1]
