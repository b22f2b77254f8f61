"""Participating media: homogeneous medium + Henyey-Greenstein phase.

Capability match for src/medium/homogeneous.cpp and src/phase/hg.cpp (the
sensible volumetric subset per SURVEY §2.6): chromatic sigma_t with
single-channel distance sampling (pick channel uniformly, MIS over channels
via the mean-pdf), scattering albedo, HG directional sampling with perfect
importance (weight 1).

The medium is global (camera/exterior); per-shape interior media are a
round-2 extension.
"""
from __future__ import annotations

import flax.struct as struct
import jax.numpy as jnp

from drmlt_mitsuba_tpu.core.math import safe_div


@struct.dataclass
class HomogeneousMedium:
    sigma_t: jnp.ndarray   # (3,) extinction
    albedo: jnp.ndarray    # (3,) single-scattering albedo sigma_s/sigma_t
    g: jnp.ndarray         # scalar HG asymmetry


def make_medium(sigma_t, albedo, g=0.0) -> HomogeneousMedium:
    return HomogeneousMedium(
        sigma_t=jnp.asarray(sigma_t, jnp.float32).reshape(3),
        albedo=jnp.asarray(albedo, jnp.float32).reshape(3),
        g=jnp.float32(g),
    )


def transmittance(med: HomogeneousMedium, dist):
    """exp(-sigma_t * d) per channel; dist (...,) -> (..., 3)."""
    return jnp.exp(-med.sigma_t * dist[..., None])


def sample_distance(med: HomogeneousMedium, u_channel, u_dist, t_surface):
    """Sample a scattering distance along the ray (ref:
    HomogeneousMedium::sampleDistance).

    Returns dict with:
      scattered: (R,) bool — medium event before the surface
      t:         (R,) sampled distance (= t_surface when not scattered)
      weight:    (R, 3) throughput factor (includes sigma_s on scatter),
                 i.e. tr*sigma_s/pdf_scatter or tr/pdf_escape.
    """
    c = jnp.minimum((u_channel * 3).astype(jnp.int32), 2)
    sig_c = med.sigma_t[c]
    t_m = -jnp.log(jnp.maximum(1.0 - u_dist, 1e-38)) / jnp.maximum(sig_c, 1e-20)
    scattered = t_m < t_surface
    t = jnp.where(scattered, t_m, t_surface)
    tr = jnp.exp(-med.sigma_t * t[..., None])       # (R, 3)
    # channel-averaged pdfs (one-sample MIS over the 3 channels)
    pdf_scatter = jnp.mean(med.sigma_t * tr, axis=-1)
    pdf_escape = jnp.mean(tr, axis=-1)
    sigma_s = med.sigma_t * med.albedo
    w_scatter = tr * sigma_s / jnp.maximum(pdf_scatter, 1e-30)[..., None]
    w_escape = tr / jnp.maximum(pdf_escape, 1e-30)[..., None]
    weight = jnp.where(scattered[..., None], w_scatter, w_escape)
    return dict(scattered=scattered, t=t, weight=weight)


def hg_phase(g, cos_theta):
    """HG phase function value (normalized over the sphere)."""
    g2 = g * g
    denom = 1.0 + g2 - 2.0 * g * cos_theta
    return (1.0 - g2) / (4.0 * jnp.pi * jnp.maximum(denom, 1e-8) ** 1.5)


def sample_hg(g, wi, u2):
    """Sample a direction from HG around -wi (forward scattering for g>0).

    wi points toward the previous vertex; returns unit wo (continuation
    direction).  Perfect importance sampling: weight is 1, pdf equals the
    phase value.
    """
    from drmlt_mitsuba_tpu.core import frame

    u = u2[..., 0]
    g_safe = jnp.where(jnp.abs(g) < 1e-4, 1e-4, g)
    sq = (1.0 - g * g) / (1.0 - g + 2.0 * g * u)
    cos_iso = 1.0 - 2.0 * u
    cos_hg = (1.0 + g * g - sq * sq) / (2.0 * g_safe)
    cos_t = jnp.where(jnp.abs(g) < 1e-4, cos_iso, jnp.clip(cos_hg, -1.0, 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * u2[..., 1]
    fwd = -wi   # propagate forward
    local = jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1
    )
    wo = frame.to_world(fwd, local)
    pdf = hg_phase(g, cos_t)
    return wo, pdf
