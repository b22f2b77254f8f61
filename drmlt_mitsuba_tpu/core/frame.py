"""Orthonormal shading frames (ref: include/mitsuba/core/frame.h).

A frame is represented implicitly by its normal; tangents are built with the
branchless Duff et al. 2017 construction (jit-friendly: no data-dependent
branches).  All functions broadcast over leading batch axes; vectors are
(..., 3).
"""
from __future__ import annotations

import jax.numpy as jnp


def coordinate_system(n):
    """Return (s, t) tangent/bitangent for normal n (Duff et al. 2017)."""
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    s = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]],
        axis=-1,
    )
    t = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return s, t


def to_local(n, v):
    """World vector v into the local frame of normal n (z = n)."""
    s, t = coordinate_system(n)
    return jnp.stack(
        [
            jnp.sum(v * s, axis=-1),
            jnp.sum(v * t, axis=-1),
            jnp.sum(v * n, axis=-1),
        ],
        axis=-1,
    )


def to_world(n, v):
    """Local vector v (z = n) back to world space."""
    s, t = coordinate_system(n)
    return (
        v[..., 0:1] * s + v[..., 1:2] * t + v[..., 2:3] * n
    )


def cos_theta(v):
    return v[..., 2]


def same_hemisphere(a, b):
    return a[..., 2] * b[..., 2] > 0
