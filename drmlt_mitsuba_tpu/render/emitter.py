"""Emitter sampling and evaluation (ref: Scene::sampleEmitterDirect /
pdfEmitterDirect, src/librender/scene.cpp; src/emitters/area.cpp, point.cpp,
constant.cpp).

Direct sampling consumes 3 uniforms: emitter pick + 2D surface sample —
matching the reference's per-bounce direct-illumination budget.  Area
emitters are triangle rows with a power-proportional pmf; point lights and a
constant environment complete the round-1 set.
"""
from __future__ import annotations

import flax.struct as struct
import jax.numpy as jnp

from drmlt_mitsuba_tpu.core.math import normalize, safe_div
from drmlt_mitsuba_tpu.core.warp import square_to_uniform_triangle
from drmlt_mitsuba_tpu.scene.types import Scene


@struct.dataclass
class DirectSample:
    """A sampled connection toward an emitter from a reference point."""
    d: jnp.ndarray          # (R, 3) unit direction ref -> emitter
    dist: jnp.ndarray       # (R,)
    radiance: jnp.ndarray   # (R, 3) emitted radiance toward ref
    pdf: jnp.ndarray        # (R,) solid-angle pdf at ref (0 = invalid)
    delta: jnp.ndarray      # (R,) bool: position-delta emitter (point light)
    n: jnp.ndarray          # (R, 3) emitter surface normal


def sample_emitter_direct(scene: Scene, p_ref, u3) -> DirectSample:
    """Sample a direct connection; u3 = (pick, u, v) in (R, 3)."""
    em = scene.emitters
    tris = scene.tris
    # pick an area-emitter row by cdf inversion
    row = jnp.searchsorted(em.cdf, u3[..., 0], side="right")
    row = jnp.clip(row, 0, em.cdf.shape[0] - 1).astype(jnp.int32)
    ti = em.tri_idx[row]
    b = square_to_uniform_triangle(u3[..., 1:3])
    p_l = tris.v0[ti] + b[..., 0:1] * tris.e1[ti] + b[..., 1:2] * tris.e2[ti]
    n_l = normalize(jnp.cross(tris.e1[ti], tris.e2[ti]))

    to_l = p_l - p_ref
    dist2 = jnp.sum(to_l * to_l, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
    d = to_l / dist[..., None]
    cos_l = -jnp.sum(d * n_l, axis=-1)
    # area emitters are one-sided (emit along +normal)
    visible = cos_l > 1e-7
    # pdf_area -> solid angle: pmf * dist^2 / (cos_l * area)
    pdf = safe_div(em.pmf[row] * dist2, cos_l * em.area[row])
    pdf = jnp.where(visible, pdf, 0.0)
    radiance = jnp.where(visible[..., None], em.radiance[row], 0.0)
    return DirectSample(
        d=d, dist=dist, radiance=radiance, pdf=pdf,
        delta=jnp.zeros(pdf.shape, bool), n=n_l,
    )


def pdf_emitter_direct(scene: Scene, p_ref, hit_emitter_id, hit_p, hit_n):
    """Solid-angle pdf of having sampled the surface point `hit_p` on
    area-emitter row `hit_emitter_id` via sample_emitter_direct (the MIS
    counterpart used when a BSDF-sampled ray lands on an emitter)."""
    em = scene.emitters
    row = jnp.clip(hit_emitter_id, 0, em.pmf.shape[0] - 1)
    to_l = hit_p - p_ref
    dist2 = jnp.sum(to_l * to_l, axis=-1)
    d = to_l / jnp.sqrt(jnp.maximum(dist2, 1e-20))[..., None]
    cos_l = -jnp.sum(d * hit_n, axis=-1)
    pdf = safe_div(em.pmf[row] * dist2, cos_l * em.area[row])
    return jnp.where((hit_emitter_id >= 0) & (cos_l > 0), pdf, 0.0)


def eval_emitter(scene: Scene, hit_emitter_id, wi_world, hit_ng):
    """Radiance emitted toward direction -wi_world by the emitter a ray hit.
    Area emitters are one-sided: emit only on the +normal side."""
    em = scene.emitters
    row = jnp.clip(hit_emitter_id, 0, em.radiance.shape[0] - 1)
    front = jnp.sum(wi_world * hit_ng, axis=-1) > 0  # wi_world points away from surface
    ok = (hit_emitter_id >= 0) & front
    return jnp.where(ok[..., None], em.radiance[row], 0.0)


def eval_env(scene: Scene, d_world):
    """Environment radiance for escaped rays (constant emitter)."""
    return jnp.broadcast_to(scene.emitters.env_radiance, d_world.shape)
