"""Reconstruction filters (ref: src/rfilters/ — box/tent/gaussian/mitchell/
catmullrom/lanczos).

Each filter is a pure 1-D function f(x) with a radius; the film splats a
separable footprint of static size ceil(2*radius) pixels.  The box filter is
required by the acceptance-map mode (drmlt_proc.cpp:76-79).
"""
from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

FILTER_BOX = "box"
FILTER_TENT = "tent"
FILTER_GAUSSIAN = "gaussian"
FILTER_MITCHELL = "mitchell"
FILTER_CATMULLROM = "catmullrom"
FILTER_LANCZOS = "lanczos"


@dataclasses.dataclass(frozen=True)
class Filter:
    name: str
    radius: float          # support half-width in pixels
    footprint: int         # static pixels per axis touched by one splat

    def eval1d(self, x):
        """Filter value at signed pixel offset x (vectorized)."""
        ax = jnp.abs(x)
        if self.name == FILTER_BOX:
            return jnp.where(ax <= self.radius, 1.0, 0.0)
        if self.name == FILTER_TENT:
            return jnp.maximum(0.0, 1.0 - ax / self.radius)
        if self.name == FILTER_GAUSSIAN:
            # truncated gaussian, sigma = radius/4 (ref gaussian.cpp: stddev
            # 0.5 at the default radius 2)
            sigma = self.radius / 4.0
            alpha = -1.0 / (2.0 * sigma * sigma)
            tail = math.exp(alpha * self.radius * self.radius)
            return jnp.maximum(0.0, jnp.exp(alpha * ax * ax) - tail)
        if self.name in (FILTER_MITCHELL, FILTER_CATMULLROM):
            if self.name == FILTER_MITCHELL:
                B = C = 1.0 / 3.0
            else:
                B, C = 0.0, 0.5
            x2 = ax * ax
            x3 = x2 * ax
            inner = (
                (12 - 9 * B - 6 * C) * x3 + (-18 + 12 * B + 6 * C) * x2 + (6 - 2 * B)
            ) * (1.0 / 6.0)
            outer = (
                (-B - 6 * C) * x3 + (6 * B + 30 * C) * x2 + (-12 * B - 48 * C) * ax
                + (8 * B + 24 * C)
            ) * (1.0 / 6.0)
            return jnp.where(ax < 1.0, inner, jnp.where(ax < 2.0, outer, 0.0))
        if self.name == FILTER_LANCZOS:
            t = 3.0  # taps
            px = jnp.pi * ax
            sinc = jnp.where(ax > 1e-6, jnp.sin(px) / jnp.maximum(px, 1e-9), 1.0)
            wind = jnp.where(
                ax > 1e-6, jnp.sin(px / t) / jnp.maximum(px / t, 1e-9), 1.0
            )
            return jnp.where(ax < t, sinc * wind, 0.0)
        raise ValueError(self.name)


_DEFAULTS = {
    FILTER_BOX: 0.5,
    FILTER_TENT: 1.0,
    FILTER_GAUSSIAN: 2.0,
    FILTER_MITCHELL: 2.0,
    FILTER_CATMULLROM: 2.0,
    FILTER_LANCZOS: 3.0,
}


def make_filter(name: str, radius: float | None = None) -> Filter:
    if name not in _DEFAULTS:
        raise ValueError(f"unknown reconstruction filter '{name}'")
    r = _DEFAULTS[name] if radius is None else float(radius)
    return Filter(name=name, radius=r, footprint=max(1, math.ceil(2.0 * r)))
