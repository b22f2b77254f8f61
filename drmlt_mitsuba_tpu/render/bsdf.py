"""Branchless BSDF evaluation/sampling over the material table.

The reference dispatches virtually to 23 BSDF plugins (src/bsdfs/); here a
surface interaction carries a `kind` enum and the lobes PRESENT IN THE SCENE
(MaterialTable.kinds_present, a static field) are evaluated and blended with
masks — the idiomatic SPMD replacement for per-lane virtual dispatch.  A
diffuse-only scene compiles to just the cosine-hemisphere code.

Conventions (local shading frame, z = shading normal):
  * wi points toward the viewer/camera, wo toward the light/next bounce.
  * eval() returns f(wi,wo) * |cos_theta_o| and the sampling pdf
    (solid angle), zero for Dirac lobes.
  * sample() consumes exactly 3 uniforms (component pick + 2D) and returns
    (wo, weight = f*cos/pdf, pdf, sampled_delta, eta).

Smooth-transmission radiance scaling uses the (1/eta)^2 factor for radiance
transport (ref: dielectric.cpp).
"""
from __future__ import annotations

import flax.struct as struct
import jax.numpy as jnp

from drmlt_mitsuba_tpu.core.math import (
    INV_PI, fresnel_conductor, fresnel_dielectric, reflect, safe_div,
)
from drmlt_mitsuba_tpu.core.warp import (
    square_to_cosine_hemisphere, square_to_cosine_hemisphere_pdf,
)
from drmlt_mitsuba_tpu.render.microfacet import (
    ggx_g1, ggx_g2, ggx_ndf, ggx_sample_vndf, ggx_vndf_pdf,
)
from drmlt_mitsuba_tpu.scene.types import (
    BSDF_CONDUCTOR, BSDF_DIELECTRIC, BSDF_DIFFUSE, BSDF_MIRROR, BSDF_NULL,
    BSDF_PHONG, BSDF_PLASTIC, BSDF_ROUGH_CONDUCTOR, BSDF_ROUGH_DIELECTRIC,
    BSDF_ROUGH_DIFFUSE, BSDF_ROUGH_PLASTIC, BSDF_THIN_DIELECTRIC,
    BSDF_WARD, MaterialTable,
)

ALL_KINDS = (
    BSDF_DIFFUSE, BSDF_CONDUCTOR, BSDF_DIELECTRIC, BSDF_ROUGH_CONDUCTOR,
    BSDF_PLASTIC, BSDF_ROUGH_PLASTIC, BSDF_THIN_DIELECTRIC,
    BSDF_ROUGH_DIELECTRIC, BSDF_MIRROR, BSDF_NULL, BSDF_PHONG, BSDF_WARD,
    BSDF_ROUGH_DIFFUSE,
)

DELTA_KINDS = (BSDF_CONDUCTOR, BSDF_DIELECTRIC, BSDF_MIRROR, BSDF_NULL,
               BSDF_THIN_DIELECTRIC)

# kinds grouped by which shared lobe machinery they need
_DIFFUSE_LIKE = (BSDF_DIFFUSE, BSDF_ROUGH_DIFFUSE)
_GGX_LIKE = (BSDF_ROUGH_CONDUCTOR, BSDF_ROUGH_DIELECTRIC, BSDF_PHONG,
             BSDF_WARD)
_PLASTIC_LIKE = (BSDF_PLASTIC, BSDF_ROUGH_PLASTIC)
_DIELECTRIC_LIKE = (BSDF_DIELECTRIC, BSDF_THIN_DIELECTRIC)


@struct.dataclass
class BsdfSample:
    wo: jnp.ndarray        # (R, 3) sampled direction, local frame
    weight: jnp.ndarray    # (R, 3) f * cos / pdf (includes discrete probs)
    pdf: jnp.ndarray       # (R,) solid-angle pdf (0 for delta lobes)
    delta: jnp.ndarray     # (R,) bool: sampled a Dirac lobe
    eta: jnp.ndarray       # (R,) relative IOR of the sampled transition


def _present(table: MaterialTable, *kinds) -> bool:
    if not table.kinds_present:
        return True
    return any(k in table.kinds_present for k in kinds)


def _mat(table: MaterialTable, mat_id):
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
    return jnp.clip(f_i, 0.05, 0.95)


def eval_bsdf(table: MaterialTable, mat_id, albedo_tex, wi, wo):
    """(f * |cos wo|, pdf) for non-delta lobes; (0, 0) for Dirac kinds."""
    kind, _, eta, k, alpha, spec_refl, _ = _mat(table, mat_id)
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    same_side = (cos_i * cos_o) > 0
    upper = cos_i > 0
    abs_cos_o = jnp.abs(cos_o)

    value = jnp.zeros(wi.shape[:-1] + (3,))
    pdf = jnp.zeros(wi.shape[:-1])

    diff_pdf = None
    if _present(table, *_DIFFUSE_LIKE, *_PLASTIC_LIKE):
        diff_val = albedo_tex * (INV_PI * abs_cos_o)[..., None]
        diff_pdf = square_to_cosine_hemisphere_pdf(
            jnp.stack([wo[..., 0], wo[..., 1], abs_cos_o], -1)
        )

    if _present(table, *_DIFFUSE_LIKE):
        for kk in _DIFFUSE_LIKE:
            m = (kind == kk) & same_side
            value = jnp.where(m[..., None], diff_val, value)
            pdf = jnp.where(m, diff_pdf, pdf)

    if _present(table, *_GGX_LIKE):
        h = wo + wi
        h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
        h = h * jnp.sign(h[..., 2:3])
        wi_u = wi * jnp.sign(cos_i)[..., None]
        wo_u = wo * jnp.sign(cos_i)[..., None]
        d = ggx_ndf(h, alpha)
        g = ggx_g2(wi_u, wo_u, alpha)
        f_cond = fresnel_conductor(jnp.abs(jnp.sum(wi * h, axis=-1)), eta, k)
        rc_val = (
            spec_refl * f_cond * safe_div(d * g, 4.0 * jnp.abs(cos_i))[..., None]
        )
        m_pdf = ggx_vndf_pdf(wi_u, h, alpha)
        rc_pdf = m_pdf / jnp.maximum(
            4.0 * jnp.abs(jnp.sum(wo * h, axis=-1)), 1e-12
        )
        for kk in _GGX_LIKE:
            m = (kind == kk) & same_side
            value = jnp.where(m[..., None], rc_val, value)
            pdf = jnp.where(m, rc_pdf, pdf)

    if _present(table, *_PLASTIC_LIKE):
        eta_d = eta[..., 0]
        f_i, _, _ = fresnel_dielectric(jnp.abs(cos_i), eta_d)
        f_o, _, _ = fresnel_dielectric(jnp.abs(cos_o), eta_d)
        pl_val = albedo_tex * (
            (1.0 - f_i) * (1.0 - f_o) * INV_PI * abs_cos_o
        )[..., None]
        spec_prob = _plastic_specular_prob(f_i)
        pl_pdf = (1.0 - spec_prob) * diff_pdf
        for kk in _PLASTIC_LIKE:
            m = (kind == kk) & same_side & upper
            value = jnp.where(m[..., None], pl_val, value)
            pdf = jnp.where(m, pl_pdf, pdf)

    return value, pdf


def pdf_bsdf(table: MaterialTable, mat_id, albedo_tex, wi, wo):
    _, pdf = eval_bsdf(table, mat_id, albedo_tex, wi, wo)
    return pdf


def sample_bsdf(table: MaterialTable, mat_id, albedo_tex, wi, u3) -> BsdfSample:
    """Sample wo from the BSDF; u3 = (component, u, v) uniforms (R, 3)."""
    kind, _, eta, k, alpha, spec_refl, spec_trans = _mat(table, mat_id)
    cos_i = wi[..., 2]
    sign_i = jnp.sign(jnp.where(cos_i == 0, 1.0, cos_i))
    wi_u = wi * sign_i[..., None]
    u2 = u3[..., 1:3]
    uc = u3[..., 0]
    ones = jnp.ones_like(cos_i)
    R3 = wi.shape[:-1] + (3,)

    wo = jnp.zeros(R3)
    weight = jnp.zeros(R3)
    pdf = jnp.zeros_like(cos_i)
    delta = jnp.zeros_like(cos_i, dtype=bool)
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

    true_ = jnp.ones_like(delta)
    false_ = jnp.zeros_like(delta)

    need_spec_dir = _present(
        table, BSDF_CONDUCTOR, BSDF_MIRROR, *_DIELECTRIC_LIKE, *_PLASTIC_LIKE
    )
    if need_spec_dir:
        wo_spec = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], -1)

    if _present(table, *_DIFFUSE_LIKE, *_PLASTIC_LIKE):
        wo_diff = square_to_cosine_hemisphere(u2) * sign_i[..., None]
        pdf_diff = square_to_cosine_hemisphere_pdf(wo_diff * sign_i[..., None])

    if _present(table, *_DIFFUSE_LIKE):
        for kk in _DIFFUSE_LIKE:
            setk(kk, wo_diff, albedo_tex, pdf_diff, false_)

    if _present(table, BSDF_CONDUCTOR):
        f_cond = fresnel_conductor(jnp.abs(cos_i), eta, k)
        setk(BSDF_CONDUCTOR, wo_spec, spec_refl * f_cond,
             jnp.zeros_like(pdf), true_)
    if _present(table, BSDF_MIRROR):
        setk(BSDF_MIRROR, wo_spec, spec_refl, jnp.zeros_like(pdf), true_)

    if _present(table, *_DIELECTRIC_LIKE):
        eta_d = eta[..., 0]
        f_d, cos_t, _tir = fresnel_dielectric(cos_i, eta_d)
        if _present(table, BSDF_DIELECTRIC):
            pick_refl = uc < f_d
            eta_ti = jnp.where(cos_i > 0, 1.0 / eta_d, eta_d)
            wo_refr = jnp.stack(
                [-wi[..., 0] * eta_ti, -wi[..., 1] * eta_ti, cos_t], -1
            )
            wo_diel = jnp.where(pick_refl[..., None], wo_spec, wo_refr)
            factor = jnp.where(cos_i > 0, 1.0 / eta_d, eta_d)
            w_diel = jnp.where(
                pick_refl[..., None], spec_refl,
                spec_trans * (factor * factor)[..., None],
            )
            eta_diel = jnp.where(
                pick_refl, 1.0, jnp.where(cos_i > 0, eta_d, 1.0 / eta_d)
            )
            setk(BSDF_DIELECTRIC, wo_diel, w_diel, jnp.zeros_like(pdf),
                 true_, eta_diel)
        if _present(table, BSDF_THIN_DIELECTRIC):
            f_thin = jnp.where(f_d < 1.0, f_d * 2.0 / (1.0 + f_d), 1.0)
            pick_rt = uc < f_thin
            wo_thin = jnp.where(pick_rt[..., None], wo_spec, -wi)
            w_thin = jnp.where(pick_rt[..., None], spec_refl, spec_trans)
            setk(BSDF_THIN_DIELECTRIC, wo_thin, w_thin,
                 jnp.zeros_like(pdf), true_)

    if _present(table, *_GGX_LIKE):
        m = ggx_sample_vndf(wi_u, alpha, u2)
        wo_rc_u = reflect(wi_u, m)
        wo_rc = wo_rc_u * sign_i[..., None]
        m_pdf = ggx_vndf_pdf(wi_u, m, alpha)
        pdf_rc = m_pdf / jnp.maximum(
            4.0 * jnp.abs(jnp.sum(wo_rc_u * m, -1)), 1e-12
        )
        g2 = ggx_g2(wi_u, wo_rc_u, alpha)
        g1 = ggx_g1(wi_u, alpha)
        f_rc = fresnel_conductor(jnp.abs(jnp.sum(wi_u * m, -1)), eta, k)
        w_rc = spec_refl * f_rc * safe_div(g2, g1)[..., None]
        rc_valid = wo_rc_u[..., 2] > 0
        w_rc = jnp.where(rc_valid[..., None], w_rc, 0.0)
        pdf_rc = jnp.where(rc_valid, pdf_rc, 0.0)
        for kk in _GGX_LIKE:
            setk(kk, wo_rc, w_rc, pdf_rc, false_)

    if _present(table, *_PLASTIC_LIKE):
        eta_d = eta[..., 0]
        f_i, _, _ = fresnel_dielectric(jnp.abs(cos_i), eta_d)
        spec_prob = _plastic_specular_prob(f_i)
        pick_spec = uc < spec_prob
        wo_pl = jnp.where(pick_spec[..., None], wo_spec, wo_diff)
        f_o, _, _ = fresnel_dielectric(jnp.abs(wo_pl[..., 2]), eta_d)
        w_pl_spec = spec_refl * safe_div(f_i, spec_prob)[..., None]
        w_pl_diff = albedo_tex * safe_div(
            (1.0 - f_i) * (1.0 - f_o), 1.0 - spec_prob
        )[..., None]
        w_pl = jnp.where(pick_spec[..., None], w_pl_spec, w_pl_diff)
        pdf_pl = jnp.where(pick_spec, 0.0, (1.0 - spec_prob) * pdf_diff)
        for kk in _PLASTIC_LIKE:
            setk(kk, wo_pl, w_pl, pdf_pl, pick_spec)

    if _present(table, BSDF_NULL):
        setk(BSDF_NULL, -wi, jnp.ones(R3), jnp.zeros_like(pdf), true_)

    bad = jnp.abs(cos_i) < 1e-7
    weight = jnp.where(bad[..., None], 0.0, weight)
    return BsdfSample(wo=wo, weight=weight, pdf=pdf, delta=delta, eta=eta_out)


def is_delta_kind(table: MaterialTable, mat_id):
    """True for materials whose every lobe is Dirac (no NEE contribution)."""
    kind = table.kind[mat_id]
    out = jnp.zeros(kind.shape, bool)
    for kk in DELTA_KINDS:
        if _present(table, kk):
            out = out | (kind == kk)
    return out
