"""Markov transition kernels (ref: src/integrators/drmlt/tools/transition.h).

Four 1-D kernel families — Gaussian, Kelemen ("hole"), Identity (Dirac) and
Wrapped-Cauchy (circular) — as pure functions of uniforms, with pdfs and
log-pdfs.  The reference instantiates per-thread kernel objects; here a
kernel is a (kind, param) pair broadcast over every PSS dimension of every
chain, so proposal generation for the whole chain batch is one fused
elementwise map.

Default constants match drmlt_sampler.h:201-206:
  s1 = 1/1024, s2 = 1/64, sigma = 1/64, rho = e^-0.25,
  orbital Kelemen scale 1.9, second-stage scale 0.1.
"""
from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

S1_DEFAULT = 1.0 / 1024.0
S2_DEFAULT = 1.0 / 64.0
SIGMA_DEFAULT = 1.0 / 64.0
RHO_DEFAULT = math.exp(-0.25)
KELEMEN_SCALE_ORBITAL = 1.9
SCALE_SECOND_DEFAULT = 0.1

_SQRT1_2PI = 0.3989422804014327


@dataclasses.dataclass(frozen=True)
class Gaussian:
    """Zero-mean Gaussian step."""
    sigma: float

    def sample(self, u2):
        """u2 (..., 2) uniforms -> one Gaussian offset (Box-Muller)."""
        r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - u2[..., 0], 1e-38)))
        return r * jnp.cos(2.0 * jnp.pi * u2[..., 1]) * self.sigma

    def pdf(self, du):
        inv = 1.0 / self.sigma
        return _SQRT1_2PI * inv * jnp.exp(-0.5 * (du * inv) ** 2)

    def log_pdf(self, du):
        r = du / self.sigma
        return -0.5 * (r * r + math.log(2.0 * math.pi) + 2.0 * math.log(self.sigma))


@dataclasses.dataclass(frozen=True)
class Kelemen:
    """Kelemen 'hole' kernel: |du| log-uniform on [s1, s2], random sign."""
    s1: float = S1_DEFAULT
    s2: float = S2_DEFAULT

    @property
    def log_ratio(self):
        return -math.log(self.s2 / self.s1)

    def sample(self, u2):
        u = u2[..., 0]
        sign = jnp.where(u < 0.5, 1.0, -1.0)
        x = jnp.where(u < 0.5, 2.0 * u, 2.0 * (u - 0.5))
        dv = self.s2 * jnp.exp((1.0 - x) * self.log_ratio)
        return sign * dv

    def pdf(self, du):
        d = jnp.abs(du)
        ok = (d >= self.s1) & (d <= self.s2)
        p = 1.0 / (2.0 * jnp.maximum(d, 1e-20) * (-self.log_ratio))
        return jnp.where(ok, p, 0.0)

    def log_pdf(self, du):
        return jnp.log(jnp.maximum(self.pdf(du), 1e-38))


@dataclasses.dataclass(frozen=True)
class Identity:
    """Dirac kernel — freeze the dimension (MMLT strategy dims,
    fixEmitterPath)."""

    def sample(self, u2):
        return jnp.zeros(u2.shape[:-1], u2.dtype)

    def pdf(self, du):
        return jnp.ones_like(du)

    def log_pdf(self, du):
        return jnp.zeros_like(du)


@dataclasses.dataclass(frozen=True)
class WrappedCauchy:
    """Circular wrapped-Cauchy angle kernel (DRMLT 2020 Sec 4.3, Eq. 10)."""
    rho: float = RHO_DEFAULT

    @property
    def dispersion(self):
        return 2.0 * self.rho / (1.0 + self.rho * self.rho)

    def sample(self, u2):
        u = u2[..., 0]
        sign = jnp.where(u < 0.5, 1.0, -1.0)
        x = jnp.where(u < 0.5, 2.0 * u, 2.0 * (u - 0.5))
        v = jnp.cos(2.0 * jnp.pi * x)
        disp = self.dispersion
        angle = (v + disp) / (1.0 + disp * v)
        return sign * jnp.arccos(jnp.clip(angle, -1.0, 1.0))

    def pdf(self, du):
        r2 = self.rho * self.rho
        return (
            0.5 / jnp.pi * (1.0 - r2) / (1.0 + r2 - 2.0 * self.rho * jnp.cos(du))
        )

    def log_pdf(self, du):
        return jnp.log(jnp.maximum(self.pdf(du), 1e-38))
