"""Emitter sampling and evaluation (ref: Scene::sampleEmitterDirect /
pdfEmitterDirect, src/librender/scene.cpp; src/emitters/{area,point,spot,
directional,constant}.cpp).

Direct sampling consumes 3 uniforms: emitter pick + 2D surface sample.
Delta rows (point/spot/directional) return delta=True — their pick pdf is
discrete, the NEE MIS weight is 1, and BSDF sampling never hits them.
"""
from __future__ import annotations

import flax.struct as struct
import jax.numpy as jnp

from drmlt_mitsuba_tpu.core.math import normalize, safe_div
from drmlt_mitsuba_tpu.core.warp import square_to_uniform_triangle
from drmlt_mitsuba_tpu.scene.types import (
    EMITTER_AREA, EMITTER_DIRECTIONAL, EMITTER_POINT, EMITTER_SPOT, Scene,
)

_DIR_DIST = 1.0e7   # pseudo-distance for directional shadow rays


@struct.dataclass
class DirectSample:
    """A sampled connection toward an emitter from a reference point."""
    d: jnp.ndarray          # (R, 3) unit direction ref -> emitter
    dist: jnp.ndarray       # (R,)
    radiance: jnp.ndarray   # (R, 3) incident radiance factor: the NEE
    #                          contribution is f * radiance * w / pdf
    pdf: jnp.ndarray        # (R,) solid-angle (area rows) or discrete pdf
    delta: jnp.ndarray      # (R,) bool: delta emitter (MIS weight 1)
    n: jnp.ndarray          # (R, 3) emitter surface normal (area rows)


def sample_emitter_direct(scene: Scene, p_ref, u3) -> DirectSample:
    """Sample a direct connection; u3 = (pick, u, v) in (R, 3)."""
    em = scene.emitters
    tris = scene.tris
    row = jnp.searchsorted(em.cdf, u3[..., 0], side="right")
    row = jnp.clip(row, 0, em.cdf.shape[0] - 1).astype(jnp.int32)
    kind = em.kind[row]
    pmf = em.pmf[row]

    # ---- area rows --------------------------------------------------------
    ti = em.tri_idx[row]
    b = square_to_uniform_triangle(u3[..., 1:3])
    p_l = tris.v0[ti] + b[..., 0:1] * tris.e1[ti] + b[..., 1:2] * tris.e2[ti]
    n_l = normalize(jnp.cross(tris.e1[ti], tris.e2[ti]))
    to_l = p_l - p_ref
    dist2_a = jnp.sum(to_l * to_l, axis=-1)
    dist_a = jnp.sqrt(jnp.maximum(dist2_a, 1e-20))
    d_a = to_l / dist_a[..., None]
    cos_l = -jnp.sum(d_a * n_l, axis=-1)
    vis_a = cos_l > 1e-7
    pdf_a = safe_div(pmf * dist2_a, cos_l * em.area[row])
    rad_a = em.radiance[row]

    # ---- point / spot rows ------------------------------------------------
    to_p = em.pos[row] - p_ref
    dist2_p = jnp.sum(to_p * to_p, axis=-1)
    dist_p = jnp.sqrt(jnp.maximum(dist2_p, 1e-20))
    d_p = to_p / dist_p[..., None]
    rad_p = em.radiance[row] / jnp.maximum(dist2_p, 1e-20)[..., None]
    # spot falloff: smooth quadratic ramp inside the cone (ref spot.cpp
    # falloff simplified to hard cutoff + cosine ramp)
    axis = em.aux[row, :3]
    cos_cut = em.aux[row, 3]
    cos_spot = -jnp.sum(d_p * axis, axis=-1)
    spot_f = jnp.where(cos_spot >= cos_cut, 1.0, 0.0)
    rad_spot = rad_p * spot_f[..., None]

    # ---- directional rows -------------------------------------------------
    d_dir = -em.pos[row]   # pos stores the direction TOWARD the scene
    rad_dir = em.radiance[row]

    is_area = kind == EMITTER_AREA
    is_point = kind == EMITTER_POINT
    is_spot = kind == EMITTER_SPOT
    is_dir = kind == EMITTER_DIRECTIONAL

    d = jnp.where(is_area[..., None], d_a,
                  jnp.where(is_dir[..., None], d_dir, d_p))
    dist = jnp.where(is_area, dist_a,
                     jnp.where(is_dir, _DIR_DIST, dist_p))
    radiance = jnp.where(
        is_area[..., None], jnp.where(vis_a[..., None], rad_a, 0.0),
        jnp.where(is_point[..., None], rad_p,
                  jnp.where(is_spot[..., None], rad_spot, rad_dir)),
    )
    pdf = jnp.where(is_area, jnp.where(vis_a, pdf_a, 0.0), pmf)
    delta = ~is_area
    return DirectSample(d=d, dist=dist, radiance=radiance, pdf=pdf,
                        delta=delta, n=n_l)


def pdf_emitter_direct(scene: Scene, p_ref, hit_emitter_id, hit_p, hit_n):
    """Solid-angle pdf of sample_emitter_direct for the surface point a
    BSDF-sampled ray hit (area rows only — delta rows are unreachable)."""
    em = scene.emitters
    row = jnp.clip(hit_emitter_id, 0, em.pmf.shape[0] - 1)
    to_l = hit_p - p_ref
    dist2 = jnp.sum(to_l * to_l, axis=-1)
    d = to_l / jnp.sqrt(jnp.maximum(dist2, 1e-20))[..., None]
    cos_l = -jnp.sum(d * hit_n, axis=-1)
    pdf = safe_div(em.pmf[row] * dist2, cos_l * em.area[row])
    ok = (hit_emitter_id >= 0) & (cos_l > 0) & (em.kind[row] == EMITTER_AREA)
    return jnp.where(ok, pdf, 0.0)


def eval_emitter(scene: Scene, hit_emitter_id, wi_world, hit_ng):
    """Radiance emitted toward -wi_world by the area emitter a ray hit."""
    em = scene.emitters
    row = jnp.clip(hit_emitter_id, 0, em.radiance.shape[0] - 1)
    front = jnp.sum(wi_world * hit_ng, axis=-1) > 0
    ok = (hit_emitter_id >= 0) & front & (em.kind[row] == EMITTER_AREA)
    return jnp.where(ok[..., None], em.radiance[row], 0.0)


def eval_env(scene: Scene, d_world):
    """Environment radiance for escaped rays (constant emitter)."""
    return jnp.broadcast_to(scene.emitters.env_radiance, d_world.shape)
