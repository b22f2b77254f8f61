"""Veach path-space MLT: mutations over explicit vertex paths.

Reference: src/libbidir/mut_bidir.cpp (bidirectional mutation),
mut_lens.cpp (lens perturbation), mut_caustic.cpp (caustic perturbation),
driven by src/integrators/mlt/mlt_proc.cpp:90-260.  This module is the
TPU-native reformulation: a path is a fixed-slot SoA tensor over chains
(vertex 0 = pinhole camera, vertex k[c] = emitter-surface point), and
each mutation is one masked SIMD step over the whole chain batch.

Structural deviations from the reference (all semantics-preserving for
the stationary distribution):
  * Mutator selection cycles deterministically per step (bidir, lens,
    bidir, caustic) instead of per-path suitability sampling — a
    composition of MH kernels, each in detailed balance.  Lanes whose
    structure fails a mutator's preconditions reject (identity move).
  * Supernodes are implicit: the camera vertex is the fixed pinhole
    position; "deleting the emitter sample vertex" is an anchor at
    m = k+1 whose light-side walk begins with a fresh emitter-position
    sample.  Connections AT the supernode (s = 0 there) are excluded
    from the proposal support — and, consistently, from pmf and Q — so
    detailed balance is unaffected.
  * The multi-chain and manifold perturbations stay descoped (PARITY
    §2.3 carries the measured manifold evidence); the lens + caustic +
    bidirectional trio is the classic Veach set (mlt_proc.cpp:96-107).

Acceptance math:
  * bidirectional: a = Q(y->x)/Q(x->y),
    Q(x->y) = pmf(record) * sum_s 1/lum(weight_s(y)), where weight_s is
    the product of per-vertex sampling weights (f cos / pdf; Dirac pairs
    cancel to the delta component weight) over the replacement region
    generated with s light-side steps, times the connection contribution
    (the cached-weight form of mut_bidir.cpp:221-268).  Retained factors
    are common to x, y and all s, so they cancel and are omitted.
  * lens/caustic: the screen/cone perturbation density is symmetric, so
    a = lum(W(y))/lum(W(x)) with W = retrace-chain sampling weights x the
    re-connection contribution (mut_lens.cpp:177-205).

Scene subset (mlt_eligible): triangles with FLAT shading (ns == ng; the
shading-normal transport-asymmetry corrections are not implemented),
area emitters, pinhole perspective, any surface BSDF including delta
kinds, no media.
"""
from __future__ import annotations

import dataclasses
import math

import flax.struct as struct
import jax
import jax.numpy as jnp
import numpy as np

from drmlt_mitsuba_tpu.core import frame
from drmlt_mitsuba_tpu.core.math import luminance, safe_div
from drmlt_mitsuba_tpu.integrators.bidir import sensor_importance
from drmlt_mitsuba_tpu.ops.intersect import intersect, occluded
from drmlt_mitsuba_tpu.render.bsdf import (
    eval_bsdf, is_delta_kind, sample_bsdf,
)
from drmlt_mitsuba_tpu.scene.types import CAMERA_PERSPECTIVE, EMITTER_AREA, Scene

RAY_EPS = 1e-4


# ---------------------------------------------------------------- state
@struct.dataclass
class PathState:
    """C paths with V = kmax+1 vertex slots.  Slot 0 = camera pinhole;
    slot k[c] = emitter point; slots > k[c] inactive."""
    pos: jnp.ndarray   # (C, V, 3)
    ng: jnp.ndarray    # (C, V, 3)  (flat shading: ns == ng)
    mat: jnp.ndarray   # (C, V) int32, -1 at endpoints
    em: jnp.ndarray    # (C,) emitter row of the light vertex
    k: jnp.ndarray     # (C,) edge count in [2, kmax]


@dataclasses.dataclass(frozen=True)
class MLTConfig:
    max_depth: int = 5             # kmax (edges camera..light)
    kmin: int = 2
    n_chains: int = 8192
    n_bootstrap: int = 65536
    lens_r1: float = 0.1           # min screen jump (fraction of 0.05-area)
    lens_frac: float = 0.05        # coveredArea (mlt_proc.cpp:88)
    caustic_t1: float = 0.0001     # cone perturbation angles (radians);
    caustic_t2: float = 0.1        # mirrors theta = atan(r / filmDist)


def mlt_eligible(scene: Scene) -> bool:
    try:
        if scene.medium is not None or getattr(scene, "media", None):
            return False
        if scene.camera.kind != CAMERA_PERSPECTIVE:
            return False
        if float(np.asarray(scene.camera.aperture_radius)) > 0:
            return False
        em = scene.emitters
        if em.env_image is not None:
            return False
        if float(np.abs(np.asarray(em.env_radiance)).sum()) > 0:
            return False
        if not bool(np.all(np.asarray(em.kind) == EMITTER_AREA)):
            return False
        if bool(np.any(np.asarray(scene.spheres.valid))):
            return False
        # flat shading required (ns == ng)
        tris = scene.tris
        ng = np.cross(np.asarray(tris.e1), np.asarray(tris.e2))
        ng /= np.maximum(np.linalg.norm(ng, axis=-1, keepdims=True), 1e-20)
        for n in (tris.n0, tris.n1, tris.n2):
            if np.abs(np.abs((np.asarray(n) * ng).sum(-1)) - 1).max() > 1e-3:
                return False
        return True
    except Exception:
        return False


# ------------------------------------------------------------- helpers
def _dirto(a, b):
    d = b - a
    dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1), 1e-20))
    return d / dist[..., None], dist


def _gslot(arr, idx):
    """arr (C, V, ...) -> per-chain slot idx (C,)."""
    V = arr.shape[1]
    oh = jax.nn.one_hot(jnp.clip(idx, 0, V - 1), V, dtype=arr.dtype)
    if arr.ndim == 3:
        return jnp.einsum("cv,cvd->cd", oh, arr)
    return jnp.sum(oh * arr.astype(oh.dtype), axis=1).astype(arr.dtype)


def _vw(scene, mat_id, ng, wi, wo):
    """Post-hoc sampling weight at a surface vertex: f(wi,wo)|cos wo|/pdf
    for smooth kinds; the deterministic component weight for delta kinds
    when wo matches it (the reference's cached vertex weight)."""
    wi_l = frame.to_local(ng, wi)
    wo_l = frame.to_local(ng, wo)
    albedo = scene.materials.albedo[jnp.clip(mat_id, 0, None)]
    fcos, pdf = eval_bsdf(scene.materials, mat_id, albedo, wi_l, wo_l)
    w_smooth = fcos * safe_div(1.0, pdf)[..., None]

    same_side = (wi_l[..., 2] * wo_l[..., 2]) > 0
    uc = jnp.where(same_side, 0.0, 0.999)
    u3 = jnp.stack([uc, jnp.full_like(uc, 0.5), jnp.full_like(uc, 0.5)], -1)
    bs = sample_bsdf(scene.materials, mat_id, albedo, wi_l, u3)
    match = jnp.sum(bs.wo * wo_l, -1) > 1.0 - 1e-5
    w_delta = jnp.where(match[..., None], bs.weight, 0.0)

    delta = is_delta_kind(scene.materials, mat_id)
    ok = mat_id >= 0
    return jnp.where((delta & ok)[..., None], w_delta,
                     jnp.where(ok[..., None], w_smooth, 0.0))


def _f_raw(scene, mat_id, ng, wi, wo):
    """Raw BSDF value x |cos wo| (0 for delta kinds)."""
    wi_l = frame.to_local(ng, wi)
    wo_l = frame.to_local(ng, wo)
    albedo = scene.materials.albedo[jnp.clip(mat_id, 0, None)]
    fcos, _ = eval_bsdf(scene.materials, mat_id, albedo, wi_l, wo_l)
    return jnp.where((mat_id >= 0)[..., None], fcos, 0.0)


def _emit_Le(scene, row):
    em = scene.emitters
    r = jnp.clip(row, 0, em.radiance.shape[0] - 1)
    return jnp.where((row >= 0)[:, None], em.radiance[r], 0.0)


def _emit_pos_pdf(scene, row):
    em = scene.emitters
    r = jnp.clip(row, 0, em.area.shape[0] - 1)
    return jnp.where(row >= 0,
                     safe_div(em.pmf[r], em.area[r]), 0.0)


def _is_delta_v(scene, ps, i):
    """Vertex slot i is a delta-BSDF surface vertex."""
    return is_delta_kind(scene.materials, ps.mat[:, i]) & (ps.mat[:, i] >= 0)


# ------------------------------------------------------------ evaluation
def eval_path(scene: Scene, ps: PathState, kmax: int):
    """Area-measure contribution (value, lum, pixel_uv, inside).

    Delta vertices contribute their component weight with the adjoining
    Dirac pdf canceled — the same convention the mutation weights use, so
    every ratio the chain consumes is measure-consistent."""
    C, V = ps.mat.shape
    d01, dist01 = _dirto(ps.pos[:, 0], ps.pos[:, 1])
    imp, pix, inside = sensor_importance(scene.camera, d01)
    cos_c = jnp.abs(jnp.sum(d01 * ps.ng[:, 0], -1))
    cos_1 = jnp.abs(jnp.sum(d01 * ps.ng[:, 1], -1))
    val = (imp * cos_c * safe_div(cos_1, dist01 * dist01))[:, None] \
        * jnp.ones((C, 3))

    for i in range(1, kmax):
        nxt = min(i + 1, V - 1)
        inrange = i < ps.k
        wi, _ = _dirto(ps.pos[:, i], ps.pos[:, i - 1])
        wo, dist = _dirto(ps.pos[:, i], ps.pos[:, nxt])
        delta = _is_delta_v(scene, ps, i)
        # smooth: f|cos| at this vertex + far cosine / d^2
        f_s = _f_raw(scene, ps.mat[:, i], ps.ng[:, i], wi, wo)
        # delta: component weight, Dirac cancels this edge's d^2/cos pair
        w_d = _vw(scene, ps.mat[:, i], ps.ng[:, i], wi, wo)
        cos_far = jnp.abs(jnp.sum(wo * ps.ng[:, nxt], -1))
        g = safe_div(cos_far, dist * dist)
        fac = jnp.where(delta[:, None], w_d, f_s * g[:, None])
        val = jnp.where(inrange[:, None], val * fac, val)

    lpos = _gslot(ps.pos, ps.k)
    lng = _gslot(ps.ng, ps.k)
    prev = _gslot(ps.pos, ps.k - 1)
    w_out, _ = _dirto(lpos, prev)
    front = jnp.sum(w_out * lng, -1) > 0
    val = val * _emit_Le(scene, ps.em) * jnp.where(front, 1.0, 0.0)[:, None]
    ok = inside & front & (ps.k >= 2)
    val = jnp.where(ok[:, None], val, 0.0)
    return val, luminance(val), pix, ok


# -------------------------------------------------- two-tailed geometric
def _two_tailed_cdf_sample(u, center, lo, hi, support):
    """Sample the base-2 two-tailed geometric on [lo, hi] centered at
    `center` (TwoTailedGeoDistr(2) of mut_bidir.cpp).  support: static
    int array of candidate values.  Returns (value, pmf_fn) where
    pmf_fn(v) gives the normalized pmf of any v."""
    sup = jnp.asarray(support, jnp.float32)[None, :]         # (1, S)
    w = 2.0 ** (-jnp.abs(sup - center[:, None]))
    w = jnp.where((sup >= lo[:, None]) & (sup <= hi[:, None]), w, 0.0)
    tot = jnp.sum(w, -1)
    cdf = jnp.cumsum(w, -1)
    pick = u[:, None] * tot[:, None]
    idx = jnp.sum((cdf < pick).astype(jnp.int32), -1)
    idx = jnp.clip(idx, 0, len(support) - 1)
    value = jnp.asarray(support)[idx]

    def pmf(v):
        wv = 2.0 ** (-jnp.abs(v.astype(jnp.float32) - center))
        ok = (v >= lo) & (v <= hi) & (tot > 0)
        return jnp.where(ok, safe_div(wv, tot), 0.0)

    return value, pmf, tot > 0


# ---------------------------------------------------------------- walks
def _bsdf_dir_sample(scene, key, mat_id, ng, wi):
    u3 = jax.random.uniform(key, wi.shape[:-1] + (3,))
    wi_l = frame.to_local(ng, wi)
    albedo = scene.materials.albedo[jnp.clip(mat_id, 0, None)]
    bs = sample_bsdf(scene.materials, mat_id, albedo, wi_l, u3)
    wo = frame.to_world(ng, bs.wo)
    ok = (mat_id >= 0) & ((bs.pdf > 0) | bs.delta) \
        & (luminance(bs.weight) > 0)
    return wo, bs.weight, ok


def _extend_walk(scene, key, p0, ng0, mat0, wi0, first_kind, em_dir_ng,
                 n_steps, max_steps, cam_pix_key=None):
    """Masked walk of up to max_steps vertices from an anchor.

    first_kind: 0 = BSDF step from the anchor surface vertex;
                1 = camera-direction step (fresh pixel sample);
                2 = emitter-position step (fresh light sample);
                3 = emission-direction step (cosine lobe around em_dir_ng).
    Returns dict with (C, max_steps) vertex arrays + per-step sampling
    weights (the f cos/pdf products that enter weight_s) + validity.
    """
    C = p0.shape[0]
    out = dict(
        pos=jnp.zeros((C, max_steps, 3)), ng=jnp.zeros((C, max_steps, 3)),
        mat=jnp.full((C, max_steps), -1, jnp.int32),
        em=jnp.full((C, max_steps), -1, jnp.int32),
        w=jnp.zeros((C, max_steps, 3)), valid=jnp.zeros((C, max_steps),
                                                        bool),
    )
    p, ng, mat, wi = p0, ng0, mat0, wi0
    active = n_steps > 0
    emitters = scene.emitters

    for j in range(max_steps):
        kj = jax.random.fold_in(key, j)
        if j == 0:
            # endpoint-aware first step
            k1, k2 = jax.random.split(kj)
            # (a) fresh emitter position (first_kind == 2)
            u3 = jax.random.uniform(k1, (C, 3))
            row = jnp.clip(
                jnp.searchsorted(emitters.cdf, u3[:, 0]), 0,
                emitters.cdf.shape[0] - 1).astype(jnp.int32)
            ti = jnp.clip(emitters.tri_idx[row], 0,
                          scene.tris.v0.shape[0] - 1)
            tw = jnp.sqrt(jnp.maximum(1.0 - u3[:, 1], 0.0))
            b0 = 1.0 - tw
            b1 = tw * u3[:, 2]
            e_pos = (scene.tris.v0[ti] + b0[:, None] * scene.tris.e1[ti]
                     + b1[:, None] * scene.tris.e2[ti])
            e_ng = jnp.cross(scene.tris.e1[ti], scene.tris.e2[ti])
            e_ng = e_ng / jnp.maximum(
                jnp.linalg.norm(e_ng, axis=-1, keepdims=True), 1e-20)
            w_pos = _emit_Le(scene, row) * safe_div(
                1.0, _emit_pos_pdf(scene, row))[:, None]
            if first_kind == 2:
                step_valid = active & (luminance(w_pos) > 0)
                out = _store(out, j, e_pos, e_ng, -1, row, w_pos,
                             step_valid)
                p, ng, mat = e_pos, e_ng, jnp.full((C,), -1, jnp.int32)
                wi = e_ng   # placeholder; next step is an emission lobe
                active = step_valid & (n_steps > j + 1)
                continue

        ks, kd = jax.random.split(jax.random.fold_in(kj, 17))
        if j == 0 and first_kind == 1:
            # camera direction through a fresh film point
            from drmlt_mitsuba_tpu.render.sensor import sample_ray
            uvpix = jax.random.uniform(ks, (C, 2))
            o_c, d = sample_ray(scene.camera, uvpix)[:2]
            w_step = jnp.ones((C, 3))
            d_ok = jnp.ones((C,), bool)
        elif j == 0 and first_kind == 3:
            # cosine emission lobe around the emitter normal
            from drmlt_mitsuba_tpu.core.warp import (
                square_to_cosine_hemisphere,
            )
            u2 = jax.random.uniform(ks, (C, 2))
            d_l = square_to_cosine_hemisphere(u2)
            d = frame.to_world(em_dir_ng, d_l)
            w_step = jnp.full((C, 3), math.pi)
            d_ok = jnp.ones((C,), bool)
        else:
            d, w_step, d_ok = _bsdf_dir_sample(scene, ks, mat, ng, wi)

        o = p + d * RAY_EPS * 10.0
        hit = intersect(scene, o, d)
        step_valid = active & d_ok & hit.valid
        out = _store(out, j, hit.p, hit.ng, hit.mat_id, hit.emitter_id,
                     w_step, step_valid)
        wi_new, _ = _dirto(hit.p, p)
        p = jnp.where(step_valid[:, None], hit.p, p)
        ng = jnp.where(step_valid[:, None], hit.ng, ng)
        mat = jnp.where(step_valid, hit.mat_id, mat)
        wi = jnp.where(step_valid[:, None], wi_new, wi)
        active = step_valid & (n_steps > j + 1)

    return out


def _store(out, j, pos, ng, mat, em, w, valid):
    out = dict(out)
    out["pos"] = out["pos"].at[:, j].set(pos)
    out["ng"] = out["ng"].at[:, j].set(ng)
    out["mat"] = out["mat"].at[:, j].set(
        jnp.asarray(mat, jnp.int32) if not jnp.isscalar(mat) else mat)
    out["em"] = out["em"].at[:, j].set(jnp.asarray(em, jnp.int32))
    out["w"] = out["w"].at[:, j].set(w)
    out["valid"] = out["valid"].at[:, j].set(valid)
    return out
