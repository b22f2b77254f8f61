"""Small math helpers shared across the renderer.

Equivalent surface of the reference's `include/mitsuba/core/math.h` utilities
actually used on the DRMLT critical path (safe_* guards, MIS heuristics,
fused select helpers).  Everything is elementwise and jit/vmap-safe.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-6
RAY_EPS = 1e-4  # min-t offset to avoid self-intersection
INV_PI = 1.0 / jnp.pi
INV_TWO_PI = 0.5 / jnp.pi


def sqr(x):
    return x * x


def safe_sqrt(x):
    """sqrt clamped to 0 for negative inputs, with a SAFE gradient: the
    naive sqrt(max(x, 0)) back-propagates 0 * inf = NaN at x <= 0 (sqrt'
    blows up at exactly 0 before the max's zero mask multiplies in),
    poisoning e.g. d(image)/d(scene) through every sphere-missing ray."""
    return jnp.where(x > 0.0, jnp.sqrt(jnp.maximum(x, 1e-30)), 0.0)


def safe_acos(x):
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


def safe_div(a, b, default=0.0):
    """a/b where b may be 0; returns `default` there (grad-safe)."""
    ok = jnp.abs(b) > 0
    denom = jnp.where(ok, b, 1.0)
    return jnp.where(ok, a / denom, default)


def lerp(a, b, t):
    return a + (b - a) * t


def mis_balance(pdf_a, pdf_b):
    """Balance heuristic weight for strategy a vs b (ref: path.cpp miWeight)."""
    return safe_div(pdf_a, pdf_a + pdf_b)


def mis_power(pdf_a, pdf_b, beta: float = 2.0):
    """Power heuristic (beta=2), used by the reference `path` integrator."""
    a = pdf_a**beta
    b = pdf_b**beta
    return safe_div(a, a + b)


def dot(a, b, axis=-1, keepdims=False):
    return jnp.sum(a * b, axis=axis, keepdims=keepdims)


def norm(v, axis=-1, keepdims=False):
    return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=axis, keepdims=keepdims), 1e-30))


def normalize(v, axis=-1):
    return v / norm(v, axis=axis, keepdims=True)


def cross(a, b):
    return jnp.cross(a, b)


def reflect(wi, n):
    """Mirror `wi` about `n`; both pointing away from the surface."""
    return 2.0 * dot(wi, n, keepdims=True) * n - wi


def refract_local(wi_z, eta):
    """Snell cos(theta_t) for local-frame cos(theta_i)=wi_z and relative IOR.

    Returns (cos_theta_t, total_internal_reflection_mask).  eta is
    ior_inside/ior_outside when entering (wi_z > 0).
    """
    scale = jnp.where(wi_z > 0, 1.0 / eta, eta)
    cos2 = 1.0 - (1.0 - wi_z * wi_z) * (scale * scale)
    tir = cos2 <= 0.0
    cos_t = safe_sqrt(cos2)
    # transmitted ray is on the opposite side of the normal
    cos_t = jnp.where(wi_z > 0, -cos_t, cos_t)
    return cos_t, tir


def fresnel_dielectric(cos_i, eta):
    """Unpolarized Fresnel reflectance for a dielectric, relative IOR `eta`
    (inside/outside).  cos_i is signed w.r.t. the geometric normal.

    Mirrors the behavior of the reference `fresnelDielectricExt`
    (src/libcore/util.cpp) without the polarization split shortcuts.
    """
    outside = cos_i > 0
    rcp_eta = 1.0 / eta
    eta_it = jnp.where(outside, eta, rcp_eta)
    cos_i_abs = jnp.abs(cos_i)
    sin2_t = (1.0 - cos_i_abs * cos_i_abs) / (eta_it * eta_it)
    tir = sin2_t >= 1.0
    cos_t = safe_sqrt(1.0 - sin2_t)
    r_s = safe_div(cos_i_abs - eta_it * cos_t, cos_i_abs + eta_it * cos_t)
    r_p = safe_div(eta_it * cos_i_abs - cos_t, eta_it * cos_i_abs + cos_t)
    f = 0.5 * (r_s * r_s + r_p * r_p)
    return jnp.where(tir, 1.0, f), cos_t, tir


def fresnel_conductor(cos_i, eta, k):
    """Unpolarized Fresnel reflectance for a conductor with complex IOR
    eta + i·k (per channel).  cos_i >= 0, shape (...); eta/k may carry a
    trailing channel axis (..., C).  (ref: fresnelConductorExact)."""
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    if eta.ndim > cos_i.ndim:
        cos_i = cos_i[..., None]
    cos2 = cos_i * cos_i
    sin2 = 1.0 - cos2
    e2 = eta * eta
    k2 = k * k
    t0 = e2 - k2 - sin2
    a2b2 = safe_sqrt(t0 * t0 + 4.0 * e2 * k2)
    t1 = a2b2 + cos2
    a = safe_sqrt(0.5 * (a2b2 + t0))
    t2 = 2.0 * a * cos_i
    rs = safe_div(t1 - t2, t1 + t2)
    t3 = cos2 * a2b2 + sin2 * sin2
    t4 = t2 * sin2
    rp = rs * safe_div(t3 - t4, t3 + t4)
    return 0.5 * (rp + rs)
