"""Branchless BSDF evaluation/sampling over the material table.

The reference dispatches virtually to 23 BSDF plugins (src/bsdfs/); here a
surface interaction carries a `kind` enum and all supported lobes are
evaluated and blended with masks — the idiomatic SPMD replacement for
per-lane virtual dispatch (no divergence, everything stays on the VPU).

Conventions (local shading frame, z = shading normal):
  * wi points toward the viewer/camera, wo toward the light/next bounce.
  * eval() returns f(wi,wo) * |cos_theta_o|  (like BSDF::eval with
    ESolidAngle measure in the reference).
  * sample() consumes exactly 3 uniforms (component pick + 2D) and returns
    (wo, weight = f*cos/pdf, pdf, sampled_delta).  For delta lobes pdf is a
    discrete probability and eval()/pdf() return 0 — standard MIS handling.

Smooth-transmission radiance scaling uses the (1/eta)^2 factor for radiance
transport (ref: dielectric.cpp).
"""
from __future__ import annotations

import flax.struct as struct
import jax.numpy as jnp

from drmlt_mitsuba_tpu.core.math import (
    INV_PI, fresnel_conductor, fresnel_dielectric, reflect, safe_div,
    safe_sqrt,
)
from drmlt_mitsuba_tpu.core.warp import (
    square_to_cosine_hemisphere, square_to_cosine_hemisphere_pdf,
)
from drmlt_mitsuba_tpu.render.microfacet import (
    ggx_g2, ggx_ndf, ggx_sample_vndf, ggx_vndf_pdf,
)
from drmlt_mitsuba_tpu.scene.types import (
    BSDF_CONDUCTOR, BSDF_DIELECTRIC, BSDF_DIFFUSE, BSDF_MIRROR, BSDF_NULL,
    BSDF_PLASTIC, BSDF_ROUGH_CONDUCTOR, BSDF_ROUGH_PLASTIC,
    BSDF_THIN_DIELECTRIC, MaterialTable,
)


@struct.dataclass
class BsdfSample:
    wo: jnp.ndarray        # (R, 3) sampled direction, local frame
    weight: jnp.ndarray    # (R, 3) f * cos / pdf (includes discrete probs)
    pdf: jnp.ndarray       # (R,) solid-angle pdf (0 for delta lobes)
    delta: jnp.ndarray     # (R,) bool: sampled a Dirac lobe
    eta: jnp.ndarray       # (R,) relative IOR of the sampled transition (1 = none)


def _mat(table: MaterialTable, mat_id):
    """Gather per-lane material parameters."""
    return (
        table.kind[mat_id],
        table.albedo[mat_id],
        table.eta[mat_id],
        table.k[mat_id],
        jnp.maximum(table.roughness[mat_id], 1e-3),
        table.spec_refl[mat_id],
        table.spec_trans[mat_id],
    )


def _plastic_specular_prob(f_i):
    """Probability of picking the specular lobe in plastic sampling."""
    return jnp.clip(f_i, 0.05, 0.95)


def eval_bsdf(table: MaterialTable, mat_id, albedo_tex, wi, wo):
    """f(wi, wo) * |cos wo| and the sampling pdf, for non-delta lobes.

    albedo_tex: (R, 3) textured albedo (already looked up; equals
    table.albedo[mat_id] when untextured).
    Returns (value (R,3), pdf (R,)).
    """
    kind, _, eta, k, alpha, spec_refl, _ = _mat(table, mat_id)
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    same_side = (cos_i * cos_o) > 0
    upper = cos_i > 0

    abs_cos_o = jnp.abs(cos_o)

    # --- diffuse lobe (DIFFUSE, and the base of PLASTIC) ------------------
    diff_val = albedo_tex * (INV_PI * abs_cos_o)[..., None]
    diff_pdf = square_to_cosine_hemisphere_pdf(
        jnp.stack([wo[..., 0], wo[..., 1], jnp.abs(cos_o)], -1)
    )
    diff_ok = same_side

    # --- rough conductor (GGX + height-correlated Smith) ------------------
    h = wo + wi
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    h = h * jnp.sign(h[..., 2:3])  # upper hemisphere convention
    wi_u = wi * jnp.sign(cos_i)[..., None]
    wo_u = wo * jnp.sign(cos_i)[..., None]
    d = ggx_ndf(h, alpha)
    g = ggx_g2(wi_u, wo_u, alpha)
    f_cond = fresnel_conductor(
        jnp.abs(jnp.sum(wi * h, axis=-1)), eta, k
    )
    rc_val = (
        spec_refl * f_cond
        * (safe_div(d * g, 4.0 * jnp.abs(cos_i)))[..., None]
    )
    m_pdf = ggx_vndf_pdf(wi_u, h, alpha)
    rc_pdf = m_pdf / jnp.maximum(4.0 * jnp.abs(jnp.sum(wo * h, axis=-1)), 1e-12)
    rc_ok = same_side

    # --- plastic: specular coat is delta -> only diffuse contributes ------
    eta_d = eta[..., 0]
    f_i, _, _ = fresnel_dielectric(jnp.abs(cos_i), eta_d)
    f_o, _, _ = fresnel_dielectric(jnp.abs(cos_o), eta_d)
    # nonlinear=false internal-scattering approximation (ref plastic.cpp)
    pl_val = albedo_tex * ((1.0 - f_i) * (1.0 - f_o) * INV_PI * abs_cos_o)[..., None]
    spec_prob = _plastic_specular_prob(f_i)
    pl_pdf = (1.0 - spec_prob) * diff_pdf
    pl_ok = same_side & upper

    zero3 = jnp.zeros_like(diff_val)
    zero = jnp.zeros_like(diff_pdf)

    def pick(vals, default):
        out = default
        for kk, v in vals:
            out = jnp.where((kind == kk)[..., None] if v.ndim == out.ndim and out.ndim == 2 else (kind == kk), v, out)
        return out

    value = zero3
    pdf = zero
    value = jnp.where((kind == BSDF_DIFFUSE)[..., None], jnp.where(diff_ok[..., None], diff_val, 0.0), value)
    pdf = jnp.where(kind == BSDF_DIFFUSE, jnp.where(diff_ok, diff_pdf, 0.0), pdf)
    for kk in (BSDF_ROUGH_CONDUCTOR,):
        value = jnp.where((kind == kk)[..., None], jnp.where(rc_ok[..., None], rc_val, 0.0), value)
        pdf = jnp.where(kind == kk, jnp.where(rc_ok, rc_pdf, 0.0), pdf)
    for kk in (BSDF_PLASTIC, BSDF_ROUGH_PLASTIC):
        value = jnp.where((kind == kk)[..., None], jnp.where(pl_ok[..., None], pl_val, 0.0), value)
        pdf = jnp.where(kind == kk, jnp.where(pl_ok, pl_pdf, 0.0), pdf)
    # delta kinds (CONDUCTOR/DIELECTRIC/MIRROR/THIN/NULL): value = pdf = 0
    return value, pdf


def pdf_bsdf(table: MaterialTable, mat_id, albedo_tex, wi, wo):
    _, pdf = eval_bsdf(table, mat_id, albedo_tex, wi, wo)
    return pdf


def sample_bsdf(table: MaterialTable, mat_id, albedo_tex, wi, u3) -> BsdfSample:
    """Sample wo from the BSDF; u3 = (component, u, v) uniforms (R, 3)."""
    kind, _, eta, k, alpha, spec_refl, spec_trans = _mat(table, mat_id)
    cos_i = wi[..., 2]
    sign_i = jnp.sign(jnp.where(cos_i == 0, 1.0, cos_i))
    wi_u = wi * sign_i[..., None]  # upper hemisphere copy
    u2 = u3[..., 1:3]
    uc = u3[..., 0]
    ones = jnp.ones_like(cos_i)

    # --- diffuse: cosine hemisphere --------------------------------------
    wo_diff = square_to_cosine_hemisphere(u2) * sign_i[..., None]
    w_diff = albedo_tex  # f*cos/pdf = albedo
    pdf_diff = square_to_cosine_hemisphere_pdf(
        wo_diff * sign_i[..., None]
    )

    # --- smooth conductor / mirror: delta reflection ---------------------
    wo_spec = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], -1)
    f_cond = fresnel_conductor(jnp.abs(cos_i), eta, k)
    w_cond = spec_refl * f_cond
    w_mirr = spec_refl

    # --- smooth dielectric: Fresnel-weighted reflect/refract -------------
    eta_d = eta[..., 0]
    f_d, cos_t, _tir = fresnel_dielectric(cos_i, eta_d)
    pick_refl = uc < f_d
    # refraction direction in local frame (flat interface)
    eta_ti = jnp.where(cos_i > 0, 1.0 / eta_d, eta_d)  # eta_i/eta_t
    wo_refr = jnp.stack(
        [-wi[..., 0] * eta_ti, -wi[..., 1] * eta_ti, cos_t], -1
    )
    wo_diel = jnp.where(pick_refl[..., None], wo_spec, wo_refr)
    # radiance transport: (1/eta)^2 scale on transmission
    factor = jnp.where(cos_i > 0, 1.0 / eta_d, eta_d)
    w_diel = jnp.where(
        pick_refl[..., None], spec_refl, spec_trans * (factor * factor)[..., None]
    )
    eta_diel = jnp.where(pick_refl, 1.0, jnp.where(cos_i > 0, eta_d, 1.0 / eta_d))
    pdf_diel_disc = jnp.where(pick_refl, f_d, 1.0 - f_d)

    # --- thin dielectric: reflect or pass straight through ----------------
    # effective reflectance R' = R + TRT + ... = R*(1+T) with T=1-R
    f_thin = jnp.where(f_d < 1.0, f_d * 2.0 / (1.0 + f_d), 1.0)
    pick_refl_thin = uc < f_thin
    wo_thin = jnp.where(pick_refl_thin[..., None], wo_spec, -wi)
    w_thin = jnp.where(pick_refl_thin[..., None], spec_refl, spec_trans)
    pdf_thin_disc = jnp.where(pick_refl_thin, f_thin, 1.0 - f_thin)

    # --- rough conductor: VNDF sample ------------------------------------
    m = ggx_sample_vndf(wi_u, alpha, u2)
    wo_rc_u = reflect(wi_u, m)
    wo_rc = wo_rc_u * sign_i[..., None]
    m_pdf = ggx_vndf_pdf(wi_u, m, alpha)
    pdf_rc = m_pdf / jnp.maximum(4.0 * jnp.abs(jnp.sum(wo_rc_u * m, -1)), 1e-12)
    g2 = ggx_g2(wi_u, wo_rc_u, alpha)
    g1 = 1.0 / (1.0 + _ggx_lambda_safe(wi_u, alpha))
    f_rc = fresnel_conductor(jnp.abs(jnp.sum(wi_u * m, -1)), eta, k)
    # VNDF weight simplifies to F * G2/G1
    w_rc = spec_refl * f_rc * safe_div(g2, g1)[..., None]
    rc_valid = wo_rc_u[..., 2] > 0
    w_rc = jnp.where(rc_valid[..., None], w_rc, 0.0)
    pdf_rc = jnp.where(rc_valid, pdf_rc, 0.0)

    # --- plastic: pick specular (delta) vs diffuse by Fresnel -------------
    f_i, _, _ = fresnel_dielectric(jnp.abs(cos_i), eta_d)
    spec_prob = _plastic_specular_prob(f_i)
    pick_spec = uc < spec_prob
    wo_pl = jnp.where(pick_spec[..., None], wo_spec, wo_diff)
    f_o, _, _ = fresnel_dielectric(jnp.abs(wo_pl[..., 2]), eta_d)
    w_pl_spec = spec_refl * safe_div(f_i, spec_prob)[..., None]
    w_pl_diff = albedo_tex * safe_div((1.0 - f_i) * (1.0 - f_o), 1.0 - spec_prob)[..., None]
    w_pl = jnp.where(pick_spec[..., None], w_pl_spec, w_pl_diff)
    pdf_pl = jnp.where(pick_spec, 0.0, (1.0 - spec_prob) * pdf_diff)
    delta_pl = pick_spec

    # --- null: pass through ----------------------------------------------
    wo_null = -wi
    w_null = jnp.ones_like(albedo_tex)

    # ---- select by kind ---------------------------------------------------
    wo = wo_diff
    weight = w_diff
    pdf = pdf_diff
    delta = jnp.zeros_like(pick_refl)
    eta_out = ones

    def setk(kk, wo_k, w_k, pdf_k, delta_k, eta_k=None):
        nonlocal wo, weight, pdf, delta, eta_out
        mk = kind == kk
        wo = jnp.where(mk[..., None], wo_k, wo)
        weight = jnp.where(mk[..., None], w_k, weight)
        pdf = jnp.where(mk, pdf_k, pdf)
        delta = jnp.where(mk, delta_k, delta)
        if eta_k is not None:
            eta_out = jnp.where(mk, eta_k, eta_out)

    true_ = jnp.ones_like(pick_refl)
    false_ = jnp.zeros_like(pick_refl)
    setk(BSDF_CONDUCTOR, wo_spec, w_cond, jnp.zeros_like(pdf_diff), true_)
    setk(BSDF_MIRROR, wo_spec, w_mirr, jnp.zeros_like(pdf_diff), true_)
    setk(BSDF_DIELECTRIC, wo_diel, w_diel, pdf_diel_disc * 0.0, true_, eta_diel)
    setk(BSDF_THIN_DIELECTRIC, wo_thin, w_thin, pdf_thin_disc * 0.0, true_)
    setk(BSDF_ROUGH_CONDUCTOR, wo_rc, w_rc, pdf_rc, false_)
    setk(BSDF_PLASTIC, wo_pl, w_pl, pdf_pl, delta_pl)
    setk(BSDF_ROUGH_PLASTIC, wo_pl, w_pl, pdf_pl, delta_pl)
    setk(BSDF_NULL, wo_null, w_null, jnp.zeros_like(pdf_diff), true_)

    # zero weight if the input direction is degenerate
    bad = jnp.abs(cos_i) < 1e-7
    weight = jnp.where(bad[..., None], 0.0, weight)
    return BsdfSample(wo=wo, weight=weight, pdf=pdf, delta=delta, eta=eta_out)


def _ggx_lambda_safe(w, alpha):
    from drmlt_mitsuba_tpu.render.microfacet import ggx_lambda
    return ggx_lambda(w, alpha)


def is_delta_kind(table: MaterialTable, mat_id):
    """True for materials whose every lobe is Dirac (no NEE contribution)."""
    kind = table.kind[mat_id]
    out = jnp.zeros(kind.shape, bool)
    for kk in (BSDF_CONDUCTOR, BSDF_DIELECTRIC, BSDF_MIRROR,
               BSDF_THIN_DIELECTRIC, BSDF_NULL):
        out = out | (kind == kk)
    return out
