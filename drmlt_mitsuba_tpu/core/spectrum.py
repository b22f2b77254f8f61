"""RGB spectrum helpers.

The reference renders in RGB mode by default (`Spectrum`, SPECTRUM_SAMPLES=3,
src/libcore/spectrum.cpp); the luminance weights below are its ITU-R Rec.709
coefficients (`Spectrum::getLuminance`).  MCMC target density = luminance.
"""
from __future__ import annotations

import jax.numpy as jnp

LUMINANCE_WEIGHTS = jnp.array([0.212671, 0.715160, 0.072169], dtype=jnp.float32)


def luminance(rgb):
    """Relative luminance of an RGB spectrum; last axis is the channel."""
    return jnp.sum(rgb * LUMINANCE_WEIGHTS, axis=-1)


def is_valid(rgb):
    """True where the spectrum is finite and non-negative (ref: isValid)."""
    return jnp.all(jnp.isfinite(rgb) & (rgb >= 0), axis=-1)


def to_srgb(rgb):
    """Linear -> sRGB transfer (ref: Bitmap EPNG/LDR develop path)."""
    rgb = jnp.clip(rgb, 0.0, 1.0)
    lo = rgb * 12.92
    hi = 1.055 * jnp.power(jnp.maximum(rgb, 1e-8), 1.0 / 2.4) - 0.055
    return jnp.where(rgb <= 0.0031308, lo, hi)
