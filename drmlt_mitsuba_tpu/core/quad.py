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
