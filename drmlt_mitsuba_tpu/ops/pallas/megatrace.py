"""Pallas per-path megakernel: the whole unidirectional trace in ONE kernel.

Round-1 profiling (CLAUDE.md) showed the wavefront tracer is entirely
memory-bound: one DRMLT step touches 6.1 GB of HBM, almost all of it
fusion-boundary traffic of ~100 (chains, 3) intermediates per bounce
(the lax.scan carry plus the Pallas-intersect kernel boundary).  This
kernel keeps ALL per-path state in VMEM for the full trace: the only HBM
traffic is reading the PSS vectors u (R, n_dims) once and writing the
(R, 3) radiance once — everything else (intersection sweeps, BSDF
eval/sample, NEE, MIS, RR) happens on VMEM tiles.

Semantics mirror integrators/path.py:trace_paths EXACTLY (same PSS layout
consumption per integrators/layout.py, same sampling warps, same MIS
power heuristic, same RR) so the two are interchangeable in the MCMC
stack; tests/test_megatrace.py asserts agreement.  Reference analog:
this kernel replaces the per-bounce wavefront of SURVEY §2.8.6, i.e. the
inner loop of MIPathTracer (path.cpp Li) run 65k lanes at a time.

Supported scene subset (mega_eligible): triangle geometry, area emitters
only (no env/delta emitters), no participating media, constant albedos
(no textures), pinhole perspective camera, BSDF kinds diffuse / conductor
/ mirror / dielectric / roughconductor / null.  Everything else falls
back to trace_paths; the dispatcher never changes results, only speed.

Layout: rays ride (8, L) f32 VPU tiles (8 sublanes x L lanes); a grid
block is 8*L rays.  Scene tables stream from SMEM scalars exactly like
ops/pallas/intersect_kernel.py v2 (the proven fast path), so every VPU op
is a dense tile with free scalar broadcasts.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drmlt_mitsuba_tpu.integrators.layout import (
    BOUNCE_DIMS, OFF_BSDF_CMP, OFF_BSDF_U, OFF_LIGHT_PICK, OFF_LIGHT_U,
    OFF_RR, SENSOR_DIMS,
)
from drmlt_mitsuba_tpu.scene.types import (
    BSDF_CONDUCTOR, BSDF_DIELECTRIC, BSDF_DIFFUSE, BSDF_MIRROR, BSDF_NULL,
    BSDF_ROUGH_CONDUCTOR, BSDF_ROUGH_DIFFUSE, CAMERA_PERSPECTIVE,
    EMITTER_AREA, Scene,
)

RAY_EPS = 1e-4
_INF = 3.0e38
_PI = math.pi

SUPPORTED_KINDS = (BSDF_DIFFUSE, BSDF_CONDUCTOR, BSDF_DIELECTRIC,
                   BSDF_ROUGH_CONDUCTOR, BSDF_MIRROR, BSDF_NULL,
                   BSDF_ROUGH_DIFFUSE)
_DELTA_KINDS = (BSDF_CONDUCTOR, BSDF_DIELECTRIC, BSDF_MIRROR, BSDF_NULL)

# SMEM table column layouts (packed host-side)
_TRI_COLS = 20   # v0 e1 e2 n0 n1 n2 mat_id erow
_MAT_COLS = 18   # kind albedo eta k rough spec_refl spec_trans
_EM_COLS = 20    # rad area pmf cdf v0 e1 e2 ng
_CAM_COLS = 24   # R00..R22 t0..t2 thx thy aperture focus env_rgb pad
_SPH_COLS = 8    # center radius mat_id emitter_id valid pad
_TRI_EXT_COLS = 28  # _TRI_COLS attrs + uv0 uv1 uv2 + pad (VMEM fetch table)
_TEX_COLS = 4    # rgb + pad (flattened texture atlas rows)


# ---------------------------------------------------------------- SoA math
def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _cross(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


def _normalize(x, y, z):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
    return x * inv, y * inv, z * inv


def _lum(r, g, b):
    return 0.212671 * r + 0.715160 * g + 0.072169 * b


def _atan(x):
    """Branchless f32 arctangent (Mosaic lowers neither atan nor atan2 —
    caught on-chip 2026-08-20).  Cephes atanf scheme: reduce |x| to
    [0, tan(pi/8)] via atan(x) = pi/4 + atan((x-1)/(x+1)) on the middle
    band and pi/2 - atan(1/x) above, then a 4-term odd minimax
    polynomial; max error ~1e-7 rad (verified vs numpy in
    tests/test_megatrace.py)."""
    sign = jnp.where(x < 0, -1.0, 1.0)
    a = jnp.abs(x)
    t3 = a > 2.414213562373095          # tan(3 pi / 8)
    t1 = (a > 0.4142135623730950) & ~t3  # tan(pi / 8)
    safe_a = jnp.maximum(a, 1e-30)
    xr = jnp.where(t3, -1.0 / safe_a,
                   jnp.where(t1, (a - 1.0) / (a + 1.0), a))
    base = jnp.where(t3, 0.5 * _PI, jnp.where(t1, 0.25 * _PI, 0.0))
    z = xr * xr
    poly = ((((8.05374449538e-2 * z - 1.38776856032e-1) * z
              + 1.99777106478e-1) * z - 3.33329491539e-1) * z * xr + xr)
    return sign * (base + poly)


def _atan2(y, x):
    """Branchless f32 atan2 built on _atan (quadrant fixup)."""
    safe_x = jnp.where(jnp.abs(x) > 0, x, 1.0)
    base = _atan(y / safe_x)
    # x < 0: shift by +/- pi toward y's sign; x == 0: +/- pi/2
    ysign = jnp.where(y < 0, -1.0, 1.0)
    out = jnp.where(x < 0, base + ysign * _PI, base)
    out = jnp.where(jnp.abs(x) > 0, out, ysign * 0.5 * _PI)
    return out


def _acos(x):
    """arccos via atan2: acos(x) = atan2(sqrt(1-x^2), x) on [-1, 1]."""
    return _atan2(jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0)), x)


def _mis_power(a, b):
    a2 = a * a
    b2 = b * b
    s = a2 + b2
    return jnp.where(s > 0, a2 / jnp.where(s > 0, s, 1.0), 0.0)


def _onb(nx, ny, nz):
    """Duff et al. branchless ONB (mirrors core/frame.py)."""
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    sx, sy, sz = 1.0 + sign * nx * nx * a, sign * b, -sign * nx
    tx, ty, tz = b, sign + ny * ny * a, -ny
    return (sx, sy, sz), (tx, ty, tz)


def _to_local(n, v):
    (sx, sy, sz), (tx, ty, tz) = _onb(*n)
    nx, ny, nz = n
    vx, vy, vz = v
    return (_dot(vx, vy, vz, sx, sy, sz),
            _dot(vx, vy, vz, tx, ty, tz),
            _dot(vx, vy, vz, nx, ny, nz))


def _to_world(n, v):
    (sx, sy, sz), (tx, ty, tz) = _onb(*n)
    nx, ny, nz = n
    lx, ly, lz = v
    return (lx * sx + ly * tx + lz * nx,
            lx * sy + ly * ty + lz * ny,
            lx * sz + ly * tz + lz * nz)


def _concentric_disk(u1, u2):
    """Shirley-Chiu mapping (mirrors core/warp.py)."""
    x = 2.0 * u1 - 1.0
    y = 2.0 * u2 - 1.0
    zero = (x == 0) & (y == 0)
    use_x = jnp.abs(x) > jnp.abs(y)
    r = jnp.where(use_x, x, y)
    ratio = jnp.where(
        use_x,
        jnp.where(x != 0, y / jnp.where(x != 0, x, 1.0), 0.0),
        jnp.where(y != 0, x / jnp.where(y != 0, y, 1.0), 0.0),
    )
    phi = jnp.where(use_x, (_PI / 4.0) * ratio,
                    (_PI / 2.0) - (_PI / 4.0) * ratio)
    r = jnp.where(zero, 0.0, r)
    return r * jnp.cos(phi), r * jnp.sin(phi)


def _cosine_hemisphere(u1, u2):
    px, py = _concentric_disk(u1, u2)
    z = jnp.sqrt(jnp.maximum(1.0 - px * px - py * py, 0.0))
    return px, py, z


def _fresnel_diel(cos_i, eta):
    """Mirrors core/math.py fresnel_dielectric: returns (F, |cos_t|, tir)."""
    outside = cos_i > 0
    eta_it = jnp.where(outside, eta, 1.0 / eta)
    ci = jnp.abs(cos_i)
    sin2_t = (1.0 - ci * ci) / (eta_it * eta_it)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    den_s = ci + eta_it * cos_t
    r_s = jnp.where(den_s > 0, (ci - eta_it * cos_t)
                    / jnp.where(den_s > 0, den_s, 1.0), 0.0)
    den_p = eta_it * ci + cos_t
    r_p = jnp.where(den_p > 0, (eta_it * ci - cos_t)
                    / jnp.where(den_p > 0, den_p, 1.0), 0.0)
    f = 0.5 * (r_s * r_s + r_p * r_p)
    return jnp.where(tir, 1.0, f), cos_t, tir


def _fresnel_cond1(ci, e, kk):
    """Per-channel conductor Fresnel (mirrors fresnel_conductor)."""
    ci = jnp.clip(ci, 0.0, 1.0)
    c2 = ci * ci
    s2 = 1.0 - c2
    e2 = e * e
    k2 = kk * kk
    t0 = e2 - k2 - s2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * e2 * k2, 0.0))
    t1 = a2b2 + c2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * a * ci
    rs = jnp.where(t1 + t2 > 0, (t1 - t2) / jnp.maximum(t1 + t2, 1e-30), 0.0)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    rp = rs * jnp.where(t3 + t4 > 0, (t3 - t4) / jnp.maximum(t3 + t4, 1e-30),
                        0.0)
    return 0.5 * (rp + rs)


def _ggx_lambda(cz, alpha):
    cz = jnp.abs(cz)
    s2 = jnp.maximum(1.0 - cz * cz, 0.0)
    a2 = alpha * alpha
    return 0.5 * (jnp.sqrt(jnp.maximum(
        1.0 + a2 * s2 / jnp.maximum(cz * cz, 1e-12), 0.0)) - 1.0)


def _ggx_g1(cz, alpha):
    return 1.0 / (1.0 + _ggx_lambda(cz, alpha))


def _ggx_g2(ci, co, alpha):
    return 1.0 / (1.0 + _ggx_lambda(ci, alpha) + _ggx_lambda(co, alpha))


def _ggx_ndf(mz, alpha):
    a2 = alpha * alpha
    c2 = mz * mz
    den = c2 * (a2 - 1.0) + 1.0
    d = a2 / jnp.maximum(_PI * den * den, 1e-12)
    return jnp.where(mz > 0, d, 0.0)


def _ggx_sample_vndf(wix, wiy, wiz, alpha, u1, u2):
    """Heitz 2018 VNDF sampling (mirrors render/microfacet.py)."""
    vx, vy, vz = alpha * wix, alpha * wiy, wiz
    inv = jax.lax.rsqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-24))
    vx, vy, vz = vx * inv, vy * inv, vz * inv
    lensq = vx * vx + vy * vy
    invl = jax.lax.rsqrt(jnp.maximum(lensq, 1e-20))
    big = lensq > 1e-18
    t1x = jnp.where(big, -vy * invl, 1.0)
    t1y = jnp.where(big, vx * invl, 0.0)
    t1z = jnp.zeros_like(vx)
    t2x, t2y, t2z = _cross(vx, vy, vz, t1x, t1y, t1z)
    r = jnp.sqrt(jnp.maximum(u1, 0.0))
    phi = 2.0 * _PI * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vz)
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nx = p1 * t1x + p2 * t2x + p3 * vx
    ny = p1 * t1y + p2 * t2y + p3 * vy
    nz = p1 * t1z + p2 * t2z + p3 * vz
    mx, my, mz = alpha * nx, alpha * ny, jnp.maximum(nz, 1e-6)
    return _normalize(mx, my, mz)


def _ggx_vndf_pdf(wix, wiy, wiz, mx, my, mz, alpha):
    g1 = _ggx_g1(wiz, alpha)
    d = _ggx_ndf(mz, alpha)
    dot_im = jnp.maximum(_dot(wix, wiy, wiz, mx, my, mz), 0.0)
    return g1 * dot_im * d / jnp.maximum(jnp.abs(wiz), 1e-12)


# ---------------------------------------------------------------- packing
def pack_mega_tables(scene: Scene):
    """Host-side SMEM tables (numpy -> jnp) for the megakernel."""
    tris = scene.tris
    v0 = np.asarray(tris.v0, np.float32)
    e1 = np.asarray(tris.e1, np.float32)
    e2 = np.asarray(tris.e2, np.float32)
    n0 = np.asarray(tris.n0, np.float32)
    n1 = np.asarray(tris.n1, np.float32)
    n2 = np.asarray(tris.n2, np.float32)
    valid = np.asarray(tris.valid, bool)
    T = v0.shape[0]
    tri = np.zeros((T, _TRI_COLS), np.float32)
    tri[:, 0:3] = v0
    tri[:, 3:6] = e1
    tri[:, 6:9] = e2
    tri[:, 9:12] = n0
    tri[:, 12:15] = n1
    tri[:, 15:18] = n2
    tri[:, 18] = np.asarray(tris.mat_id, np.float32)
    tri[:, 19] = np.asarray(tris.emitter_id, np.float32)
    # degenerate edges for invalid rows -> det 0 -> never hit
    tri[~valid, 3:9] = 0.0

    mats = scene.materials
    M = np.asarray(mats.kind).shape[0]
    mat = np.zeros((M, _MAT_COLS), np.float32)
    mat[:, 0] = np.asarray(mats.kind, np.float32)
    mat[:, 1:4] = np.asarray(mats.albedo, np.float32)
    mat[:, 4:7] = np.asarray(mats.eta, np.float32)
    mat[:, 7:10] = np.asarray(mats.k, np.float32)
    mat[:, 10] = np.maximum(np.asarray(mats.roughness, np.float32), 1e-3)
    mat[:, 11:14] = np.asarray(mats.spec_refl, np.float32)
    mat[:, 14:17] = np.asarray(mats.spec_trans, np.float32)
    mat[:, 17] = np.asarray(mats.tex_id, np.float32)

    em = scene.emitters
    E = np.asarray(em.kind).shape[0]
    emt = np.zeros((E, _EM_COLS), np.float32)
    emt[:, 0:3] = np.asarray(em.radiance, np.float32)
    emt[:, 3] = np.asarray(em.area, np.float32)
    emt[:, 4] = np.asarray(em.pmf, np.float32)
    emt[:, 5] = np.asarray(em.cdf, np.float32)
    ti = np.clip(np.asarray(em.tri_idx), 0, T - 1)
    emt[:, 6:9] = v0[ti]
    emt[:, 9:12] = e1[ti]
    emt[:, 12:15] = e2[ti]
    ng = np.cross(e1[ti], e2[ti])
    ng /= np.maximum(np.linalg.norm(ng, axis=-1, keepdims=True), 1e-20)
    emt[:, 15:18] = ng
    emt[:, 18] = np.asarray(em.kind, np.float32)

    cam = np.zeros((1, _CAM_COLS), np.float32)
    c2w = np.asarray(scene.camera.to_world, np.float32)
    cam[0, 0:9] = c2w[:3, :3].reshape(9)
    cam[0, 9:12] = c2w[:3, 3]
    cam[0, 12] = float(np.asarray(scene.camera.tan_half_fov_x))
    cam[0, 13] = float(np.asarray(scene.camera.tan_half_fov_y))
    cam[0, 14] = float(np.asarray(scene.camera.aperture_radius))
    cam[0, 15] = float(np.asarray(scene.camera.focus_distance))
    cam[0, 16:19] = np.asarray(scene.emitters.env_radiance, np.float32)

    sp = scene.spheres
    sv = np.asarray(sp.valid, bool)
    S = max(1, sv.shape[0])
    sph = np.zeros((S, _SPH_COLS), np.float32)
    if sv.shape[0]:
        sph[:sv.shape[0], 0:3] = np.asarray(sp.center, np.float32)
        sph[:sv.shape[0], 3] = np.asarray(sp.radius, np.float32)
        sph[:sv.shape[0], 4] = np.asarray(sp.mat_id, np.float32)
        sph[:sv.shape[0], 5] = np.asarray(sp.emitter_id, np.float32)
        sph[:sv.shape[0], 6] = sv.astype(np.float32)

    # VMEM fetch table: the 20 sweep attrs + interpolatable uvs, padded
    # to a 512-row multiple for the chunked big-scene sweeps (padding has
    # zero edges -> det 0 -> never hits)
    Tp = -(-T // 512) * 512
    tri_ext = np.zeros((Tp, _TRI_EXT_COLS), np.float32)
    tri_ext[:T, :_TRI_COLS] = tri
    tri_ext[:T, 20:22] = np.asarray(tris.uv0, np.float32)
    tri_ext[:T, 22:24] = np.asarray(tris.uv1, np.float32)
    tri_ext[:T, 24:26] = np.asarray(tris.uv2, np.float32)

    # flattened texture atlas (N, H, W, 3) -> (N*H*W, 4)
    if scene.textures is not None:
        td = np.asarray(scene.textures.data, np.float32)
        tex = np.zeros((td.shape[0] * td.shape[1] * td.shape[2],
                        _TEX_COLS), np.float32)
        tex[:, 0:3] = td.reshape(-1, 3)
    else:
        tex = np.zeros((1, _TEX_COLS), np.float32)

    # image environment: flattened (He*We, 4) [rgb pmf] + cdf tables
    if em.env_image is not None:
        ei = np.asarray(em.env_image, np.float32)
        he, we = ei.shape[:2]
        env_tab = np.zeros((he * we, _TEX_COLS), np.float32)
        env_tab[:, 0:3] = ei.reshape(-1, 3)
        env_tab[:, 3] = np.asarray(em.env_pmf, np.float32).reshape(-1)
        env_col = np.asarray(em.env_col_cdf, np.float32)
        env_row = np.asarray(em.env_row_cdf, np.float32)[:, None]
    else:
        env_tab = np.zeros((1, _TEX_COLS), np.float32)
        env_col = np.zeros((1, 1), np.float32)
        env_row = np.zeros((1, 1), np.float32)
    return (jnp.asarray(tri), jnp.asarray(mat), jnp.asarray(emt),
            jnp.asarray(cam), jnp.asarray(sph), jnp.asarray(tri_ext),
            jnp.asarray(tex), jnp.asarray(env_tab), jnp.asarray(env_col),
            jnp.asarray(env_row))


def pack_mega_tables_jnp(scene: Scene):
    """Traceable twin of pack_mega_tables: identical packing built with
    jnp ops on the LIVE scene leaves so the tables (and the kernel fed by
    them) can sit inside a jit/grad trace.  Shapes and the emitter->tri
    indirection come from the concrete pytree structure; values may be
    tracers (e.g. albedo/radiance under jax.grad)."""
    tris = scene.tris
    T = tris.v0.shape[0]
    valid = jnp.asarray(tris.valid, bool)[:, None]
    zero3 = jnp.zeros_like(jnp.asarray(tris.e1, jnp.float32))
    tri = jnp.concatenate([
        jnp.asarray(tris.v0, jnp.float32),
        jnp.where(valid, jnp.asarray(tris.e1, jnp.float32), zero3),
        jnp.where(valid, jnp.asarray(tris.e2, jnp.float32), zero3),
        jnp.asarray(tris.n0, jnp.float32),
        jnp.asarray(tris.n1, jnp.float32),
        jnp.asarray(tris.n2, jnp.float32),
        jnp.asarray(tris.mat_id, jnp.float32)[:, None],
        jnp.asarray(tris.emitter_id, jnp.float32)[:, None],
    ], axis=1)

    mats = scene.materials
    mat = jnp.concatenate([
        jnp.asarray(mats.kind, jnp.float32)[:, None],
        jnp.asarray(mats.albedo, jnp.float32),
        jnp.asarray(mats.eta, jnp.float32),
        jnp.asarray(mats.k, jnp.float32),
        jnp.maximum(jnp.asarray(mats.roughness, jnp.float32),
                    1e-3)[:, None],
        jnp.asarray(mats.spec_refl, jnp.float32),
        jnp.asarray(mats.spec_trans, jnp.float32),
        jnp.asarray(mats.tex_id, jnp.float32)[:, None],
    ], axis=1)

    em = scene.emitters
    ti = jnp.clip(jnp.asarray(em.tri_idx), 0, T - 1)
    v0e = jnp.asarray(tris.v0, jnp.float32)[ti]
    e1e = jnp.asarray(tris.e1, jnp.float32)[ti]
    e2e = jnp.asarray(tris.e2, jnp.float32)[ti]
    ng = jnp.cross(e1e, e2e)
    ng = ng / jnp.maximum(
        jnp.linalg.norm(ng, axis=-1, keepdims=True), 1e-20)
    emt = jnp.concatenate([
        jnp.asarray(em.radiance, jnp.float32),
        jnp.asarray(em.area, jnp.float32)[:, None],
        jnp.asarray(em.pmf, jnp.float32)[:, None],
        jnp.asarray(em.cdf, jnp.float32)[:, None],
        v0e, e1e, e2e, ng,
        jnp.asarray(em.kind, jnp.float32)[:, None],
        jnp.zeros((ti.shape[0], _EM_COLS - 19), jnp.float32),
    ], axis=1)

    c2w = jnp.asarray(scene.camera.to_world, jnp.float32)
    cam = jnp.concatenate([
        c2w[:3, :3].reshape(9), c2w[:3, 3],
        jnp.asarray(scene.camera.tan_half_fov_x, jnp.float32).reshape(1),
        jnp.asarray(scene.camera.tan_half_fov_y, jnp.float32).reshape(1),
        jnp.asarray(scene.camera.aperture_radius, jnp.float32).reshape(1),
        jnp.asarray(scene.camera.focus_distance, jnp.float32).reshape(1),
        jnp.asarray(scene.emitters.env_radiance, jnp.float32).reshape(3),
        jnp.zeros((_CAM_COLS - 19,), jnp.float32),
    ]).reshape(1, _CAM_COLS)
    sp = scene.spheres
    sv = jnp.asarray(sp.valid, bool)
    S = max(1, sv.shape[0])
    if sv.shape[0]:
        sph = jnp.concatenate([
            jnp.asarray(sp.center, jnp.float32),
            jnp.asarray(sp.radius, jnp.float32)[:, None],
            jnp.asarray(sp.mat_id, jnp.float32)[:, None],
            jnp.asarray(sp.emitter_id, jnp.float32)[:, None],
            sv.astype(jnp.float32)[:, None],
            jnp.zeros((sv.shape[0], _SPH_COLS - 7), jnp.float32),
        ], axis=1)
    else:
        sph = jnp.zeros((S, _SPH_COLS), jnp.float32)

    tri_ext = jnp.concatenate([
        tri,
        jnp.asarray(tris.uv0, jnp.float32),
        jnp.asarray(tris.uv1, jnp.float32),
        jnp.asarray(tris.uv2, jnp.float32),
        jnp.zeros((T, _TRI_EXT_COLS - _TRI_COLS - 6), jnp.float32),
    ], axis=1)
    Tp = -(-T // 512) * 512
    tri_ext = jnp.concatenate([
        tri_ext,
        jnp.zeros((Tp - T, _TRI_EXT_COLS), jnp.float32)], axis=0)
    if scene.textures is not None:
        td = jnp.asarray(scene.textures.data, jnp.float32)
        flat = td.reshape(-1, 3)
        tex = jnp.concatenate(
            [flat, jnp.zeros((flat.shape[0], _TEX_COLS - 3),
                             jnp.float32)], axis=1)
    else:
        tex = jnp.zeros((1, _TEX_COLS), jnp.float32)

    if em.env_image is not None:
        ei = jnp.asarray(em.env_image, jnp.float32)
        env_tab = jnp.concatenate([
            ei.reshape(-1, 3),
            jnp.asarray(em.env_pmf, jnp.float32).reshape(-1, 1),
        ], axis=1)
        env_col = jnp.asarray(em.env_col_cdf, jnp.float32)
        env_row = jnp.asarray(em.env_row_cdf, jnp.float32)[:, None]
    else:
        env_tab = jnp.zeros((1, _TEX_COLS), jnp.float32)
        env_col = jnp.zeros((1, 1), jnp.float32)
        env_row = jnp.zeros((1, 1), jnp.float32)
    return tri, mat, emt, cam, sph, tri_ext, tex, env_tab, env_col, env_row


def mega_eligible(scene: Scene, cfg) -> bool:
    """Static host-side check that the megakernel covers this scene."""
    try:
        if getattr(cfg, "motion", False) or scene.motion is not None:
            return False   # moving geometry needs the per-ray-time sweep
        if getattr(scene, "subsurface", None):
            return False   # dipole queries live on the wavefront path
        if scene.medium is not None:
            return False
        if scene.camera.kind != CAMERA_PERSPECTIVE:
            return False
        if getattr(scene.camera, "rdist", False):
            return False   # Newton-inverted radial distortion: wavefront
        # aperture > 0 is fine iff the config samples the lens dims
        if (float(np.asarray(scene.camera.aperture_radius)) > 0
                and not getattr(cfg, "thinlens", False)):
            return False
        if scene.textures is not None:
            td = np.asarray(scene.textures.data)
            # in-kernel bilinear atlas fetch (round 4): small atlases
            # only — the one-hot build costs n_texels x lanes VPU ops
            if td.shape[0] * td.shape[1] * td.shape[2] > 16384:
                return False
            mtm = scene.materials
            if getattr(mtm, "has_normalmap", False):
                return False   # normal pages still wavefront-only
        if getattr(scene, "vcolors", None) is not None:
            return False   # per-vertex colors need the wavefront albedo
        if getattr(scene, "irawan", None) is not None:
            return False   # woven cloth needs the uv-aware wavefront
        em = scene.emitters
        if em.env_image is not None:
            # in-kernel image env (round 4): escape bilinear + CDF NEE
            # tables via one-hot fetches — small lat-long maps only
            ei = np.asarray(em.env_image)
            if ei.shape[0] * ei.shape[1] > 8192 or ei.shape[0] > 64:
                return False
            kinds_ok = np.isin(np.asarray(em.kind), (EMITTER_AREA, 4))
            if not bool(np.all(kinds_ok)):
                return False
        # constant env_radiance IS supported (escape add, no NEE row)
        elif not bool(np.all(np.asarray(em.kind) == EMITTER_AREA)):
            return False
        sv = np.asarray(scene.spheres.valid)
        if bool(np.any(sv)):
            # analytic spheres are in-kernel (round 4); sphere EMITTERS
            # and very large sphere counts stay on the wavefront
            if bool(np.any(sv & (np.asarray(scene.spheres.emitter_id)
                                 >= 0))):
                return False
            if sv.shape[0] > 64:    # SMEM table budget
                return False
        mt = scene.materials
        if mt.has_mask or mt.has_mixture or mt.has_coating:
            return False   # modifier wrappers live only in render/bsdf.py
        if getattr(scene, "media", None) is not None:
            return False   # per-shape interior media need the wavefront
        kinds = set(int(k) for k in np.unique(np.asarray(mt.kind)))
        if not kinds.issubset(set(SUPPORTED_KINDS)):
            return False
        T = np.asarray(scene.tris.v0).shape[0]
        if T > 131072:    # clustered-traversal ceiling tested on chip at
            return False  # 130k tris (round 5); SMEM brute path <= 8192
        return True
    except Exception:
        return False


# ---------------------------------------------------------------- sweeps
def closest_sweep_idx(tri_ref, n_tris, shape, ox, oy, oz, dx, dy, dz):
    """Closest-hit sweep carrying ONLY (best_t, best_idx).

    The round-3 sweep carried all 20 winner attributes through the
    triangle loop — 21 selects per (ray, triangle) on top of ~25
    intersection ops.  Carrying the index alone cuts the loop to ~27
    ops/triangle; the winner's attributes are fetched afterwards with one
    one-hot MXU matmul (fetch_tri_attrs)."""
    f32 = jnp.float32

    def body(t, carry):
        best_t, best_id = carry
        v0x, v0y, v0z = tri_ref[t, 0], tri_ref[t, 1], tri_ref[t, 2]
        e1x, e1y, e1z = tri_ref[t, 3], tri_ref[t, 4], tri_ref[t, 5]
        e2x, e2y, e2z = tri_ref[t, 6], tri_ref[t, 7], tri_ref[t, 8]
        px, py, pz = _cross(dx, dy, dz, e2x, e2y, e2z)
        det = e1x * px + e1y * py + e1z * pz
        ok = jnp.abs(det) > 1e-12
        inv = 1.0 / jnp.where(ok, det, 1.0)
        tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
        b1 = (tx * px + ty * py + tz * pz) * inv
        qx, qy, qz = _cross(tx, ty, tz, e1x, e1y, e1z)
        b2 = (dx * qx + dy * qy + dz * qz) * inv
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv
        hit = (ok & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
               & (tt > RAY_EPS) & (tt < best_t))
        best_t = jnp.where(hit, tt, best_t)
        best_id = jnp.where(hit, t, best_id)
        return best_t, best_id

    return jax.lax.fori_loop(
        0, n_tris, body,
        (jnp.full(shape, _INF, f32), jnp.full(shape, -1, jnp.int32)))


def _flat(t, shape):
    """(8, L) -> (1, K) lane flatten (the Mosaic-proven reshape)."""
    return t.reshape(1, shape[0] * shape[1])


def _unflat(row, shape):
    """(1, K) -> (8, L): lane slices at L-multiples + sublane concat
    (a direct reshape does not lower; see fetch_rows)."""
    L = shape[1]
    return jnp.concatenate(
        [row[0:1, s * L:(s + 1) * L] for s in range(shape[0])], axis=0)


def closest_sweep_chunked(tri_vmem_ref, n_tris, shape,
                          ox, oy, oz, dx, dy, dz, chunk=128):
    """Closest-hit sweep for scenes past the SMEM scalar-table budget:
    triangle data streams from the VMEM fetch table in (chunk, 1) column
    slices broadcast against flattened (1, K) ray rows — O(T) work like
    the brute sweep, but bounded only by VMEM (~65k tris), not SMEM.

    ONE fori_loop with (chunk, K) temporaries: the earlier per-sublane
    variant allocated 8 independent loop bodies and blew the 16MB scoped
    VMEM budget at 57k tris (27MB, caught on-chip 2026-08-20).

    Returns (best_t, best_id) as (8, L) tiles."""
    f32 = jnp.float32
    K = shape[0] * shape[1]
    n_chunks = -(-n_tris // chunk)
    BIG = jnp.float32(3.0e37)
    oxf, oyf, ozf = _flat(ox, shape), _flat(oy, shape), _flat(oz, shape)
    dxf, dyf, dzf = _flat(dx, shape), _flat(dy, shape), _flat(dz, shape)

    def body(c, carry):
        best_t, best_id = carry
        rows = tri_vmem_ref[pl.dslice(c * chunk, chunk), :]
        v0x, v0y, v0z = rows[:, 0:1], rows[:, 1:2], rows[:, 2:3]
        e1x, e1y, e1z = rows[:, 3:4], rows[:, 4:5], rows[:, 5:6]
        e2x, e2y, e2z = rows[:, 6:7], rows[:, 7:8], rows[:, 8:9]
        px = dyf * e2z - dzf * e2y            # (chunk, K)
        py = dzf * e2x - dxf * e2z
        pz = dxf * e2y - dyf * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok = jnp.abs(det) > 1e-12
        inv = 1.0 / jnp.where(ok, det, 1.0)
        tx, ty, tz = oxf - v0x, oyf - v0y, ozf - v0z
        b1 = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        b2 = (dxf * qx + dyf * qy + dzf * qz) * inv
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv
        hit = (ok & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
               & (tt > RAY_EPS))
        # padding rows past n_tris have zero edges -> det 0 -> miss
        t_m = jnp.where(hit, tt, BIG)
        m = jnp.min(t_m, axis=0, keepdims=True)          # (1, K)
        iota = (jax.lax.broadcasted_iota(jnp.int32, (chunk, K), 0)
                + c * chunk)
        idx = jnp.min(jnp.where(t_m == m, iota, jnp.int32(2 ** 30)),
                      axis=0, keepdims=True)
        better = m < best_t
        best_t = jnp.where(better, m, best_t)
        best_id = jnp.where(better, idx, best_id)
        return best_t, best_id

    bt, bi = jax.lax.fori_loop(
        0, n_chunks, body,
        (jnp.full((1, K), _INF, f32), jnp.full((1, K), -1, jnp.int32)))
    return _unflat(bt, shape), _unflat(bi, shape)


def shadow_sweep_chunked(tri_vmem_ref, n_tris, shape,
                         ox, oy, oz, dx, dy, dz, tmax, chunk=128):
    """Any-hit version of closest_sweep_chunked."""
    K = shape[0] * shape[1]
    n_chunks = -(-n_tris // chunk)
    oxf, oyf, ozf = _flat(ox, shape), _flat(oy, shape), _flat(oz, shape)
    dxf, dyf, dzf = _flat(dx, shape), _flat(dy, shape), _flat(dz, shape)
    tmf = _flat(tmax, shape)

    def body(c, blocked):
        rows = tri_vmem_ref[pl.dslice(c * chunk, chunk), :]
        v0x, v0y, v0z = rows[:, 0:1], rows[:, 1:2], rows[:, 2:3]
        e1x, e1y, e1z = rows[:, 3:4], rows[:, 4:5], rows[:, 5:6]
        e2x, e2y, e2z = rows[:, 6:7], rows[:, 7:8], rows[:, 8:9]
        px = dyf * e2z - dzf * e2y
        py = dzf * e2x - dxf * e2z
        pz = dxf * e2y - dyf * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok = jnp.abs(det) > 1e-12
        inv = 1.0 / jnp.where(ok, det, 1.0)
        tx, ty, tz = oxf - v0x, oyf - v0y, ozf - v0z
        b1 = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        b2 = (dxf * qx + dyf * qy + dzf * qz) * inv
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv
        hit = (ok & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
               & (tt > RAY_EPS) & (tt < tmf))
        any_hit = jnp.max(jnp.where(hit, 1.0, 0.0), axis=0, keepdims=True)
        return jnp.maximum(blocked, any_hit)

    blocked = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((1, K), jnp.float32))
    return _unflat(blocked, shape) > 0.5


def fetch_rows(table_ref, n_rows, shape, row_id, passes=3, chunk=None,
               col_slice=None):
    """Per-lane row select from a VMEM table via one-hot MXU matmuls:
    table(R, COLS)^T @ onehot(R, K).  Returns one (8, L) tile per column.

    row_id == -1 (miss) produces an all-zero one-hot column, so every
    column reads 0 — callers mask accordingly.

    passes: telescoped bf16 splits of the f32 table.  3 passes (hi +
    (x-hi) + (x-hi-mid)) capture 3x8 = 24 mantissa bits; each residual
    subtraction is exact in f32, so the sum reconstructs the selected
    value bit-for-bit.  2 passes give ~16 bits (plenty for [0,1] colors);
    1 pass is plain bf16."""
    K = shape[0] * shape[1]
    ids = row_id.reshape(1, K)
    dn = (((0,), (0,)), ((), ()))
    lo, hi = col_slice if col_slice is not None else (0, table_ref.shape[1])
    if chunk is not None:
        # big tables: stream (chunk, COLS) slices so the bf16 splits and
        # one-hots never materialize at full table size
        n_cols = hi - lo
        n_chunks = -(-n_rows // chunk)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (chunk, K), 0)

        def body(c, out):
            rows = table_ref[pl.dslice(c * chunk, chunk), lo:hi]
            oh = (iota_c == (ids - c * chunk)).astype(jnp.bfloat16)
            rem = rows
            for _ in range(passes):
                part = rem.astype(jnp.bfloat16)
                rem = rem - part.astype(jnp.float32)
                out += jax.lax.dot_general(
                    part, oh, dn, preferred_element_type=jnp.float32)
            return out

        out = jax.lax.fori_loop(
            0, n_chunks, body, jnp.zeros((n_cols, K), jnp.float32))
        tab = table_ref
    else:
        iota = jax.lax.broadcasted_iota(jnp.int32, (n_rows, K), 0)
        onehot = (iota == ids).astype(jnp.bfloat16)
        tab = table_ref[...] if hasattr(table_ref, "shape") else table_ref
        tab = tab[:, lo:hi]
        out = None
        rem = tab
        for _ in range(passes):
            part = rem.astype(jnp.bfloat16)
            rem = rem - part.astype(jnp.float32)
            d = jax.lax.dot_general(part, onehot, dn,
                                    preferred_element_type=jnp.float32)
            out = d if out is None else out + d
    # un-flatten (COLS, K) rows back to (8, L) tiles.  A direct
    # reshape(K) -> (8, L) does NOT lower in Mosaic (tpu.reshape
    # vector<Kxf32> -> vector<8xLxf32>, caught on-chip 2026-08-20); lane
    # slices at L-multiples + a sublane concat do.
    L = shape[1]
    res = []
    for c in range(hi - lo):
        rows = [out[c:c + 1, s * L:(s + 1) * L] for s in range(shape[0])]
        res.append(jnp.concatenate(rows, axis=0))
    return tuple(res)


def fetch_tri_attrs(tri_vmem_ref, n_tris, shape, best_id, chunk=None):
    """Winner-attribute fetch (see fetch_rows; exact 3-pass select)."""
    return fetch_rows(tri_vmem_ref, tri_vmem_ref.shape[0], shape, best_id,
                      passes=3, chunk=chunk)


def fetch_tri_attrs_split(tri_vmem_ref, shape, best_id, with_uv):
    """Winner-attribute fetch with per-column-group precision (the
    clustered sweep's post-traversal fetch): geometry cols 0-8 stay
    exact (3 passes — they feed the barycentric + hit-distance
    recompute), shading normals / mat / erow (cols 9-19) take 2 passes
    (~16 mantissa bits — normals are unit-scale; the integer ids are
    < 2^16 and exact under 2 planes), and uv (20-25) rides 2 passes
    only for textured scenes.  Cuts the fetch from 84 to 49 (55 w/ uv)
    column-passes."""
    Tp = tri_vmem_ref.shape[0]
    geo = fetch_rows(tri_vmem_ref, Tp, shape, best_id, passes=3,
                     chunk=128, col_slice=(0, 9))
    rest = fetch_rows(tri_vmem_ref, Tp, shape, best_id, passes=2,
                      chunk=128, col_slice=(9, 20))
    uv = (fetch_rows(tri_vmem_ref, Tp, shape, best_id, passes=2,
                     chunk=128, col_slice=(20, 26)) if with_uv else ())
    return geo + rest + uv


def tex_albedo_tile(tex_ref, tex_shape, shape, tid, tu, tv):
    """Bilinear bitmap-albedo fetch at (tu, tv) from the flattened atlas
    (mirrors path._albedo; 4 one-hot corner fetches, 2-pass bf16).
    Returns (r, g, b) tiles — callers mask with tid >= 0."""
    n_pages, th, tw = tex_shape
    zero = jnp.zeros(shape, jnp.float32)
    x = jnp.clip(jnp.mod(tu, 1.0), 0.0, 1.0) * (tw - 1)
    y = jnp.clip(jnp.mod(tv, 1.0), 0.0, 1.0) * (th - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = jnp.minimum(x0 + 1.0, tw - 1.0)
    y1 = jnp.minimum(y0 + 1.0, th - 1.0)
    fx = x - x0
    fy = y - y0
    page = jnp.clip(tid, 0.0, n_pages - 1.0) * float(th * tw)
    tex_r = tex_g = tex_b = zero
    for yc, xc, wgt in ((y0, x0, (1 - fx) * (1 - fy)),
                        (y0, x1, fx * (1 - fy)),
                        (y1, x0, (1 - fx) * fy),
                        (y1, x1, fx * fy)):
        idx = (page + yc * tw + xc).astype(jnp.int32)
        cr, cg, cb, _p = fetch_rows(
            tex_ref, n_pages * th * tw, shape, idx, passes=2)
        tex_r += wgt * cr
        tex_g += wgt * cg
        tex_b += wgt * cb
    return tex_r, tex_g, tex_b


# ---------------------------------------------------------------- kernel
def path_trace_tile(tri_ref, mat_ref, em_ref, cam_ref, udim, shape, *,
                    n_tris, n_mats, n_ems, max_depth, min_depth, rr_depth,
                    use_nee, kinds, thinlens=False, env_const=False,
                    tri_vmem_ref=None, sph_ref=None, n_sphs=0,
                    tex_ref=None, tex_shape=None, env_tab_ref=None,
                    env_col_ref=None, env_row_ref=None, env_shape=None,
                    env_row_pick=0.0, emit_grad=False, big_scene=False,
                    clu_aabb_ref=None, clu_tri_ref=None, clu_tpc=0,
                    clu_passes=2, albedo_grad=False):
    """The whole unidirectional path trace on one (8, L) lane tile.

    udim(j) -> (8, L) tile of PSS dim j (integrators/layout.py order).
    Returns (Lx, Ly, Lz) radiance tiles.  Reusable from other kernels
    (the path-technique DRMLT megakernel embeds it in its chain loop the
    same way megadrmlt embeds mmlt_trace_tile).

    tri_vmem_ref: optional VMEM copy of the triangle table — enables the
    idx-carry sweep + one-hot MXU attribute fetch (~1.6x on the sweep);
    None falls back to the attribute-carry sweep."""
    f32 = jnp.float32
    zero = jnp.zeros(shape, f32)
    one = jnp.ones(shape, f32)

    # ---- camera ray (perspective; mirrors sensor.py sample_ray) ----------
    ux = udim(0)
    uy = udim(1)
    x = (2.0 * ux - 1.0) * cam_ref[0, 12]
    y = (1.0 - 2.0 * uy) * cam_ref[0, 13]
    dcx, dcy, dcz = x, y, one
    ocx = ocy = ocz = zero
    if thinlens:
        # thin lens: origin on the aperture disk, direction through the
        # focus-plane point (sensor.py thinlens branch, u[2:4] uniforms)
        lx, ly = _concentric_disk(udim(2), udim(3))
        lx = lx * cam_ref[0, 14]
        ly = ly * cam_ref[0, 14]
        f_d = cam_ref[0, 15]
        dcx = x * f_d - lx
        dcy = y * f_d - ly
        dcz = jnp.broadcast_to(f_d, shape)
        ocx, ocy = lx, ly
    dx = cam_ref[0, 0] * dcx + cam_ref[0, 1] * dcy + cam_ref[0, 2] * dcz
    dy = cam_ref[0, 3] * dcx + cam_ref[0, 4] * dcy + cam_ref[0, 5] * dcz
    dz = cam_ref[0, 6] * dcx + cam_ref[0, 7] * dcy + cam_ref[0, 8] * dcz
    dx, dy, dz = _normalize(dx, dy, dz)
    ox = cam_ref[0, 0] * ocx + cam_ref[0, 1] * ocy + cam_ref[0, 9]
    oy = cam_ref[0, 3] * ocx + cam_ref[0, 4] * ocy + cam_ref[0, 10]
    oz = cam_ref[0, 6] * ocx + cam_ref[0, 7] * ocy + cam_ref[0, 11]
    if not thinlens:
        ox = jnp.broadcast_to(cam_ref[0, 9], shape)
        oy = jnp.broadcast_to(cam_ref[0, 10], shape)
        oz = jnp.broadcast_to(cam_ref[0, 11], shape)

    tpx = tpy = tpz = one
    Lx = Ly = Lz = zero
    # per-lane emitter-radiance Jacobian rows: T[e][c] accumulates the
    # throughput-weight of every contribution that is LINEAR in
    # emitters.radiance[e, c] — value[c] = sum_e T[e][c] * rad[e, c] plus
    # radiance-independent terms, so d value[c]/d rad[e, c] = T[e][c]
    # exactly (the in-kernel fast adjoint, round 4)
    if emit_grad:
        Tacc = [[zero, zero, zero] for _ in range(n_ems)]
    # per-lane albedo Jacobian rows: contributions are polynomials in each
    # material's albedo (diffuse-like bounces multiply the throughput by
    # al channel-diagonally), so d value[c]/d al_m[c] =
    # sum_contribs contrib[c] * power_m(contrib) / al_m[c] — exact for
    # al > 0; RR survival probabilities are DETACHED (treated as sampling
    # pdfs), matching the detached-sampling convention of differentiable
    # rendering (and path.py runs rr_depth=100 for gradient work).
    if albedo_grad:
        Aacc = [[zero, zero, zero] for _ in range(n_mats)]
        n_alb = [zero for _ in range(n_mats)]

        def alb_accum(mask, cx_, cy_, cz_, extra_mask=None):
            for m_i in range(n_mats):
                pw = n_alb[m_i]
                if extra_mask is not None:
                    pw = pw + jnp.where(extra_mask & (mat_id == m_i),
                                        1.0, 0.0)
                for c_i, cc in enumerate((cx_, cy_, cz_)):
                    al_v = mat_ref[m_i, 1 + c_i]
                    g = jnp.where(al_v > 1e-12, pw / jnp.maximum(
                        al_v, 1e-12), 0.0)
                    Aacc[m_i][c_i] += jnp.where(mask, cc * g, 0.0)
    active = jnp.ones(shape, bool)
    prev_pdf = zero
    prev_delta = jnp.ones(shape, bool)
    eta_scale = one

    # ---------------------------------------------------------- sweeps
    def closest_sweep(ox, oy, oz, dx, dy, dz):
        """Fused closest-hit + winner-attribute selection.

        carry: best_t + 20 attribute tiles (v0 e1 e2 n0 n1 n2 mat erow).
        """
        if clu_aabb_ref is not None:
            # clustered front-to-back traversal (the kd-tree analog);
            # triangle table is cluster_reorder'ed so ids line up
            from drmlt_mitsuba_tpu.ops.pallas.cluster_sweep import (
                closest_sweep_clustered,
            )
            best_t, best_id = closest_sweep_clustered(
                clu_aabb_ref, clu_tri_ref, clu_aabb_ref.shape[0],
                clu_tpc, clu_passes, shape, ox, oy, oz, dx, dy, dz)
            av = fetch_tri_attrs_split(tri_vmem_ref, shape, best_id,
                                       with_uv=tex_shape is not None)
            av = (av[:19] + (jnp.where(best_id >= 0, av[19], -1.0),)
                  + av[20:])
            # traversal ran on bf16 planes; recompute the winner's hit
            # distance in exact f32 from the 3-pass attribute fetch
            pxr, pyr, pzr = _cross(dx, dy, dz, av[6], av[7], av[8])
            detr = av[3] * pxr + av[4] * pyr + av[5] * pzr
            okr = jnp.abs(detr) > 1e-12
            invr = 1.0 / jnp.where(okr, detr, 1.0)
            txr, tyr, tzr = ox - av[0], oy - av[1], oz - av[2]
            qxr, qyr, qzr = _cross(txr, tyr, tzr, av[3], av[4], av[5])
            ttr = (av[6] * qxr + av[7] * qyr + av[8] * qzr) * invr
            best_t = jnp.where((best_id >= 0) & okr & (ttr > 0),
                               ttr, best_t)
            return best_t, av
        if big_scene:
            # past the SMEM table budget: chunked VMEM sweep + fetch
            best_t, best_id = closest_sweep_chunked(
                tri_vmem_ref, n_tris, shape, ox, oy, oz, dx, dy, dz)
            av = fetch_tri_attrs(tri_vmem_ref, n_tris, shape, best_id,
                                 chunk=128)
            av = (av[:19] + (jnp.where(best_id >= 0, av[19], -1.0),)
                  + av[20:])
            return best_t, av
        if tri_vmem_ref is not None and (n_tris > 512
                                         or tex_shape is not None):
            # idx-carry + one-hot fetch wins once the 21-select carry
            # outweighs the fetch matmul over the 512-padded table; tiny
            # scenes keep the attr-carry loop (measured 5-17% regression
            # at 32-54 tris, on-chip 2026-08-20).  Textured scenes need
            # the fetch regardless (uv columns live only in tri_ext).
            best_t, best_id = closest_sweep_idx(
                tri_ref, n_tris, shape, ox, oy, oz, dx, dy, dz)
            av = fetch_tri_attrs(tri_vmem_ref, n_tris, shape, best_id)
            # miss value contract: erow (col 19) must be -1, not 0
            av = (av[:19] + (jnp.where(best_id >= 0, av[19], -1.0),)
                  + av[20:])
            return best_t, av

        def body(t, carry):
            (best_t, av) = carry
            v0x = tri_ref[t, 0]
            v0y = tri_ref[t, 1]
            v0z = tri_ref[t, 2]
            e1x = tri_ref[t, 3]
            e1y = tri_ref[t, 4]
            e1z = tri_ref[t, 5]
            e2x = tri_ref[t, 6]
            e2y = tri_ref[t, 7]
            e2z = tri_ref[t, 8]
            px, py, pz = _cross(dx, dy, dz, e2x, e2y, e2z)
            det = e1x * px + e1y * py + e1z * pz
            ok = jnp.abs(det) > 1e-12
            inv = 1.0 / jnp.where(ok, det, 1.0)
            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            b1 = (tx * px + ty * py + tz * pz) * inv
            qx, qy, qz = _cross(tx, ty, tz, e1x, e1y, e1z)
            b2 = (dx * qx + dy * qy + dz * qz) * inv
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv
            hit = (ok & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
                   & (tt > RAY_EPS) & (tt < best_t))
            best_t = jnp.where(hit, tt, best_t)
            new_av = []
            for c in range(_TRI_COLS):
                new_av.append(jnp.where(hit, tri_ref[t, c], av[c]))
            return (best_t, tuple(new_av))

        init_av = tuple(zero for _ in range(_TRI_COLS))
        init_av = init_av[:19] + (jnp.full(shape, -1.0, f32),)
        best_t, av = jax.lax.fori_loop(
            0, n_tris, body, (jnp.full(shape, _INF, f32), init_av))
        return best_t, av

    def shadow_sweep(ox, oy, oz, dx, dy, dz, tmax):
        if clu_aabb_ref is not None:
            from drmlt_mitsuba_tpu.ops.pallas.cluster_sweep import (
                shadow_sweep_clustered,
            )
            return shadow_sweep_clustered(
                clu_aabb_ref, clu_tri_ref, clu_aabb_ref.shape[0],
                clu_tpc, clu_passes, shape, ox, oy, oz, dx, dy, dz, tmax)
        if big_scene:
            return shadow_sweep_chunked(tri_vmem_ref, n_tris, shape,
                                        ox, oy, oz, dx, dy, dz, tmax)
        return _shadow_sweep_smem(ox, oy, oz, dx, dy, dz, tmax)

    def _shadow_sweep_smem(ox, oy, oz, dx, dy, dz, tmax):
        # NOTE: the any-hit flag is carried as f32 0/1, not bool — Mosaic
        # (2026-08 jaxlib) miscompiles i1 fori_loop carries into mismatched
        # packed-vector ranks (vector<8x128x32xi1> vs vector<8x128xi1>).
        def body(t, blocked):
            v0x = tri_ref[t, 0]
            v0y = tri_ref[t, 1]
            v0z = tri_ref[t, 2]
            e1x = tri_ref[t, 3]
            e1y = tri_ref[t, 4]
            e1z = tri_ref[t, 5]
            e2x = tri_ref[t, 6]
            e2y = tri_ref[t, 7]
            e2z = tri_ref[t, 8]
            px, py, pz = _cross(dx, dy, dz, e2x, e2y, e2z)
            det = e1x * px + e1y * py + e1z * pz
            ok = jnp.abs(det) > 1e-12
            inv = 1.0 / jnp.where(ok, det, 1.0)
            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            b1 = (tx * px + ty * py + tz * pz) * inv
            qx, qy, qz = _cross(tx, ty, tz, e1x, e1y, e1z)
            b2 = (dx * qx + dy * qy + dz * qz) * inv
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv
            hit = (ok & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
                   & (tt > RAY_EPS) & (tt < tmax))
            return jnp.where(hit, 1.0, blocked)

        blocked = jax.lax.fori_loop(
            0, n_tris, body, jnp.zeros(shape, jnp.float32))
        return blocked > 0.5

    def sphere_closest(ox, oy, oz, dx, dy, dz, best_t):
        """Analytic sphere sweep (mirrors ops/intersect._sphere_hits);
        carries (t, center, radius, mat, erow) of the winner."""
        bt = best_t
        scx = scy = scz = srr = zero
        smat = jnp.full(shape, -1.0, f32)
        sem = jnp.full(shape, -1.0, f32)
        hit_any = jnp.zeros(shape, bool)
        for si in range(n_sphs):
            cx, cy, cz = sph_ref[si, 0], sph_ref[si, 1], sph_ref[si, 2]
            r = sph_ref[si, 3]
            ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
            bq = ocx * dx + ocy * dy + ocz * dz
            cq = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            disc = bq * bq - cq
            ok = (disc >= 0.0) & (sph_ref[si, 6] > 0.5)
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t0 = -bq - sq
            t1 = -bq + sq
            t = jnp.where(t0 > RAY_EPS, t0, t1)
            hit = ok & (t > RAY_EPS) & (t < bt)
            bt = jnp.where(hit, t, bt)
            scx = jnp.where(hit, cx, scx)
            scy = jnp.where(hit, cy, scy)
            scz = jnp.where(hit, cz, scz)
            srr = jnp.where(hit, r, srr)
            smat = jnp.where(hit, sph_ref[si, 4], smat)
            sem = jnp.where(hit, sph_ref[si, 5], sem)
            hit_any = hit_any | hit
        return bt, hit_any, scx, scy, scz, srr, smat, sem

    def sphere_blocked(ox, oy, oz, dx, dy, dz, tmax):
        blocked = jnp.zeros(shape, bool)
        for si in range(n_sphs):
            cx, cy, cz = sph_ref[si, 0], sph_ref[si, 1], sph_ref[si, 2]
            r = sph_ref[si, 3]
            ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
            bq = ocx * dx + ocy * dy + ocz * dz
            cq = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            disc = bq * bq - cq
            ok = (disc >= 0.0) & (sph_ref[si, 6] > 0.5)
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t0 = -bq - sq
            t1 = -bq + sq
            t = jnp.where(t0 > RAY_EPS, t0, t1)
            blocked = blocked | (ok & (t > RAY_EPS) & (t < tmax))
        return blocked

    def env_dir_uv(dx, dy, dz):
        """Lat-long uv of a world direction (emitter.env_dir_to_uv)."""
        theta = _acos(jnp.clip(dy, -1.0, 1.0))
        phi = _atan2(dx, -dz)
        return (phi / _PI + 1.0) * 0.5, theta / _PI

    def env_bilinear(u, v):
        """Bilinear env radiance at lat-long (u, v) (emitter.env_lookup)
        via 4 one-hot corner fetches (2-pass bf16 split)."""
        He, We = env_shape
        x = jnp.clip(u, 0.0, 1.0 - 1e-6) * We - 0.5
        y = jnp.clip(v, 0.0, 1.0 - 1e-6) * He - 0.5
        x0 = jnp.clip(jnp.floor(x), 0.0, We - 1.0)
        y0 = jnp.clip(jnp.floor(y), 0.0, He - 1.0)
        x1 = jnp.mod(x0 + 1.0, float(We))
        y1 = jnp.minimum(y0 + 1.0, He - 1.0)
        fx = jnp.clip(x - x0, 0.0, 1.0)
        fy = jnp.clip(y - y0, 0.0, 1.0)
        er = eg = eb = zero
        for yc, xc, wgt in ((y0, x0, (1 - fx) * (1 - fy)),
                            (y0, x1, fx * (1 - fy)),
                            (y1, x0, (1 - fx) * fy),
                            (y1, x1, fx * fy)):
            idx = (yc * We + xc).astype(jnp.int32)
            cr, cg, cb, _p = fetch_rows(env_tab_ref, He * We, shape, idx,
                                        passes=2)
            er += wgt * cr
            eg += wgt * cg
            eb += wgt * cb
        return er, eg, eb

    def env_pdf_sa(u, v, dy):
        """Solid-angle env NEE pdf for a direction (emitter.env_pdf_dir),
        WITHOUT the row-pick factor."""
        He, We = env_shape
        xn = jnp.clip(jnp.floor(u * We), 0.0, We - 1.0)
        yn = jnp.clip(jnp.floor(v * He), 0.0, He - 1.0)
        idx = (yn * We + xn).astype(jnp.int32)
        _r, _g, _b, pmf = fetch_rows(env_tab_ref, He * We, shape, idx,
                                     passes=2)
        theta = _acos(jnp.clip(dy, -1.0, 1.0))
        sin_t = jnp.maximum(jnp.sin(theta), 1e-6)
        return pmf * (He * We) / (2.0 * _PI * _PI * sin_t)

    # ---------------------------------------------------------- bounces
    for depth in range(1, max_depth + 1):
        base = SENSOR_DIMS + (depth - 1) * BOUNCE_DIMS

        best_t, av = closest_sweep(ox, oy, oz, dx, dy, dz)
        use_sph = jnp.zeros(shape, bool)
        if n_sphs:
            (best_t, use_sph, scx, scy, scz, srr, smat,
             sem) = sphere_closest(ox, oy, oz, dx, dy, dz, best_t)
        hit_valid = best_t < _INF
        t_hit = jnp.where(hit_valid, best_t, _INF)
        v0x, v0y, v0z = av[0], av[1], av[2]
        e1x, e1y, e1z = av[3], av[4], av[5]
        e2x, e2y, e2z = av[6], av[7], av[8]
        mat_id = av[18]
        erow = jnp.where(hit_valid, av[19], -1.0)
        if n_sphs:
            mat_id = jnp.where(use_sph, smat, mat_id)
            erow = jnp.where(use_sph, sem, erow)

        # hit point + barycentrics (Cramer recompute like _tri_best_pallas)
        hpx = ox + t_hit * dx
        hpy = oy + t_hit * dy
        hpz = oz + t_hit * dz
        px, py, pz = _cross(dx, dy, dz, e2x, e2y, e2z)
        det = e1x * px + e1y * py + e1z * pz
        inv = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        b1 = jnp.clip((tx * px + ty * py + tz * pz) * inv, 0.0, 1.0)
        qx, qy, qz = _cross(tx, ty, tz, e1x, e1y, e1z)
        b2 = jnp.clip((dx * qx + dy * qy + dz * qz) * inv, 0.0, 1.0)
        w0 = 1.0 - b1 - b2
        ngx, ngy, ngz = _normalize(*_cross(e1x, e1y, e1z, e2x, e2y, e2z))
        nsx = w0 * av[9] + b1 * av[12] + b2 * av[15]
        nsy = w0 * av[10] + b1 * av[13] + b2 * av[16]
        nsz = w0 * av[11] + b1 * av[14] + b2 * av[17]
        nsx, nsy, nsz = _normalize(nsx, nsy, nsz)
        if n_sphs:
            # analytic sphere normal (exact: ns == ng)
            inv_r = 1.0 / jnp.maximum(srr, 1e-20)
            sngx = (hpx - scx) * inv_r
            sngy = (hpy - scy) * inv_r
            sngz = (hpz - scz) * inv_r
            ngx = jnp.where(use_sph, sngx, ngx)
            ngy = jnp.where(use_sph, sngy, ngy)
            ngz = jnp.where(use_sph, sngz, ngz)
            nsx = jnp.where(use_sph, sngx, nsx)
            nsy = jnp.where(use_sph, sngy, nsy)
            nsz = jnp.where(use_sph, sngz, nsz)

        # ---- material row select (loop over M) ---------------------------
        kind = zero
        alx = aly = alz = zero
        etx = ety = etz = zero
        kx = ky = kz = zero
        rough = jnp.full(shape, 1e-3, f32)
        srx = sry = srz = zero
        stx = sty = stz = zero
        tid = jnp.full(shape, -1.0, f32)
        for m in range(n_mats):
            sel = mat_id == m
            if tex_shape is not None:
                tid = jnp.where(sel, mat_ref[m, 17], tid)
            kind = jnp.where(sel, mat_ref[m, 0], kind)
            alx = jnp.where(sel, mat_ref[m, 1], alx)
            aly = jnp.where(sel, mat_ref[m, 2], aly)
            alz = jnp.where(sel, mat_ref[m, 3], alz)
            etx = jnp.where(sel, mat_ref[m, 4], etx)
            ety = jnp.where(sel, mat_ref[m, 5], ety)
            etz = jnp.where(sel, mat_ref[m, 6], etz)
            kx = jnp.where(sel, mat_ref[m, 7], kx)
            ky = jnp.where(sel, mat_ref[m, 8], ky)
            kz = jnp.where(sel, mat_ref[m, 9], kz)
            rough = jnp.where(sel, mat_ref[m, 10], rough)
            srx = jnp.where(sel, mat_ref[m, 11], srx)
            sry = jnp.where(sel, mat_ref[m, 12], sry)
            srz = jnp.where(sel, mat_ref[m, 13], srz)
            stx = jnp.where(sel, mat_ref[m, 14], stx)
            sty = jnp.where(sel, mat_ref[m, 15], sty)
            stz = jnp.where(sel, mat_ref[m, 16], stz)

        # ---- bitmap albedo (bilinear atlas fetch; mirrors path._albedo) --
        if tex_shape is not None:
            tu = w0 * av[20] + b1 * av[22] + b2 * av[24]
            tv = w0 * av[21] + b1 * av[23] + b2 * av[25]
            if n_sphs:
                # lat-long sphere parametrization (ops/intersect uv_sph)
                stu = _acos(jnp.clip(sngz, -1.0, 1.0)) / _PI
                stv = _atan2(sngy, sngx) / (2.0 * _PI) + 0.5
                tu = jnp.where(use_sph, stu, tu)
                tv = jnp.where(use_sph, stv, tv)
            tex_r, tex_g, tex_b = tex_albedo_tile(
                tex_ref, tex_shape, shape, tid, tu, tv)
            has_t = tid >= 0
            alx = jnp.where(has_t, tex_r, alx)
            aly = jnp.where(has_t, tex_g, aly)
            alz = jnp.where(has_t, tex_b, alz)

        # ---- emitted radiance + MIS (mirrors path.py) --------------------
        e_radx = e_rady = e_radz = zero
        e_area = one
        e_pmf = zero
        for e in range(n_ems):
            sel = erow == e
            e_radx = jnp.where(sel, em_ref[e, 0], e_radx)
            e_rady = jnp.where(sel, em_ref[e, 1], e_rady)
            e_radz = jnp.where(sel, em_ref[e, 2], e_radz)
            e_area = jnp.where(sel, em_ref[e, 3], e_area)
            e_pmf = jnp.where(sel, em_ref[e, 4], e_pmf)
        front = -(dx * ngx + dy * ngy + dz * ngz) > 0
        has_emitter = erow >= 0
        cos_l = -(dx * ngx + dy * ngy + dz * ngz)
        nee_pdf_hit = jnp.where(
            has_emitter & (cos_l > 0),
            e_pmf * t_hit * t_hit
            / jnp.maximum(cos_l * e_area, 1e-30), 0.0)
        if use_nee:
            w_bsdf = jnp.where(prev_delta, 1.0,
                               _mis_power(prev_pdf, nee_pdf_hit))
        else:
            w_bsdf = one
        depth_ok = depth >= min_depth
        hit_emitter = (active & hit_valid & has_emitter & front
                       & depth_ok)
        Lx = Lx + jnp.where(hit_emitter, tpx * e_radx * w_bsdf, 0.0)
        Ly = Ly + jnp.where(hit_emitter, tpy * e_rady * w_bsdf, 0.0)
        Lz = Lz + jnp.where(hit_emitter, tpz * e_radz * w_bsdf, 0.0)
        if emit_grad:
            for e in range(n_ems):
                m_e = hit_emitter & (erow == e)
                Tacc[e][0] += jnp.where(m_e, tpx * w_bsdf, 0.0)
                Tacc[e][1] += jnp.where(m_e, tpy * w_bsdf, 0.0)
                Tacc[e][2] += jnp.where(m_e, tpz * w_bsdf, 0.0)
        if albedo_grad:
            alb_accum(hit_emitter, tpx * e_radx * w_bsdf,
                      tpy * e_rady * w_bsdf, tpz * e_radz * w_bsdf)

        if env_shape is not None:
            # image environment on escape, MIS'd against env NEE
            # (mirrors trace_paths escape block + emitter.env_pdf_dir)
            escaped = active & (~hit_valid) & depth_ok
            eu, ev = env_dir_uv(dx, dy, dz)
            er, eg, eb = env_bilinear(eu, ev)
            if use_nee:
                e_pdf = env_pdf_sa(eu, ev, dy) * env_row_pick
                w_env = jnp.where(prev_delta, 1.0,
                                  _mis_power(prev_pdf, e_pdf))
            else:
                w_env = one
            Lx = Lx + jnp.where(escaped, tpx * er * w_env, 0.0)
            Ly = Ly + jnp.where(escaped, tpy * eg * w_env, 0.0)
            Lz = Lz + jnp.where(escaped, tpz * eb * w_env, 0.0)
            if albedo_grad:
                alb_accum(escaped, tpx * er * w_env, tpy * eg * w_env,
                          tpz * eb * w_env)
        elif env_const:
            # constant environment on escape (no NEE row exists for a
            # constant env, so no MIS weight — mirrors trace_paths)
            escaped = active & (~hit_valid) & depth_ok
            Lx = Lx + jnp.where(escaped, tpx * cam_ref[0, 16], 0.0)
            Ly = Ly + jnp.where(escaped, tpy * cam_ref[0, 17], 0.0)
            Lz = Lz + jnp.where(escaped, tpz * cam_ref[0, 18], 0.0)
            if albedo_grad:
                alb_accum(escaped, tpx * cam_ref[0, 16],
                          tpy * cam_ref[0, 17], tpz * cam_ref[0, 18])

        active = active & hit_valid

        # ---- local frame -------------------------------------------------
        wiwx, wiwy, wiwz = -dx, -dy, -dz
        wix, wiy, wiz = _to_local((nsx, nsy, nsz), (wiwx, wiwy, wiwz))
        cos_i = wiz
        sign_i = jnp.where(cos_i == 0, 1.0, jnp.sign(cos_i))

        is_delta_m = jnp.zeros(shape, bool)
        for kk in _DELTA_KINDS:
            if kk in kinds:
                is_delta_m = is_delta_m | (kind == kk)

        # ---- NEE (immediate shadow sweep; no pipelining needed) ----------
        if use_nee and n_ems > 0:
            u_pick = udim(base + OFF_LIGHT_PICK)
            u_l1 = udim(base + OFF_LIGHT_U)
            u_l2 = udim(base + OFF_LIGHT_U + 1)
            # cdf inversion == searchsorted(cdf, u, side="right")
            row = zero
            for e in range(n_ems):
                row = row + jnp.where(u_pick >= em_ref[e, 5], 1.0, 0.0)
            row = jnp.minimum(row, float(n_ems - 1))
            l_radx = l_rady = l_radz = zero
            l_area = one
            l_pmf = zero
            lv0x = lv0y = lv0z = zero
            le1x = le1y = le1z = zero
            le2x = le2y = le2z = zero
            lngx = lngy = lngz = zero
            for e in range(n_ems):
                sel = row == e
                l_radx = jnp.where(sel, em_ref[e, 0], l_radx)
                l_rady = jnp.where(sel, em_ref[e, 1], l_rady)
                l_radz = jnp.where(sel, em_ref[e, 2], l_radz)
                l_area = jnp.where(sel, em_ref[e, 3], l_area)
                l_pmf = jnp.where(sel, em_ref[e, 4], l_pmf)
                lv0x = jnp.where(sel, em_ref[e, 6], lv0x)
                lv0y = jnp.where(sel, em_ref[e, 7], lv0y)
                lv0z = jnp.where(sel, em_ref[e, 8], lv0z)
                le1x = jnp.where(sel, em_ref[e, 9], le1x)
                le1y = jnp.where(sel, em_ref[e, 10], le1y)
                le1z = jnp.where(sel, em_ref[e, 11], le1z)
                le2x = jnp.where(sel, em_ref[e, 12], le2x)
                le2y = jnp.where(sel, em_ref[e, 13], le2y)
                le2z = jnp.where(sel, em_ref[e, 14], le2z)
                lngx = jnp.where(sel, em_ref[e, 15], lngx)
                lngy = jnp.where(sel, em_ref[e, 16], lngy)
                lngz = jnp.where(sel, em_ref[e, 17], lngz)
            if env_shape is not None:
                l_kind = zero
                for e in range(n_ems):
                    l_kind = jnp.where(row == e, em_ref[e, 18], l_kind)
                is_env_l = l_kind == 4.0            # EMITTER_ENV
            # uniform triangle (sqrt warp, mirrors core/warp.py)
            tw = jnp.sqrt(jnp.maximum(1.0 - u_l1, 0.0))
            lb0 = 1.0 - tw
            lb1 = tw * u_l2
            plx = lv0x + lb0 * le1x + lb1 * le2x
            ply = lv0y + lb0 * le1y + lb1 * le2y
            plz = lv0z + lb0 * le1z + lb1 * le2z
            tolx = plx - hpx
            toly = ply - hpy
            tolz = plz - hpz
            dist2 = tolx * tolx + toly * toly + tolz * tolz
            dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
            ldx = tolx / dist
            ldy = toly / dist
            ldz = tolz / dist
            lcos = -(ldx * lngx + ldy * lngy + ldz * lngz)
            ds_pdf = jnp.where(
                lcos * l_area > 0,
                l_pmf * dist2 / jnp.maximum(lcos * l_area, 1e-30), 0.0)
            ds_pdf = jnp.where(lcos > 1e-7, ds_pdf, 0.0)
            if env_shape is not None:
                # ---- env row: importance-sample the lat-long image via
                # the marginal row cdf + per-row col cdf (mirrors
                # emitter.sample_emitter_direct env branch incl. the
                # cdf-residual within-pixel jitter)
                He, We = env_shape
                y_e = zero
                for r in range(He):
                    y_e = y_e + jnp.where(u_l1 >= env_row_ref[r, 0],
                                          1.0, 0.0)
                y_e = jnp.minimum(y_e, He - 1.0)
                colrow = fetch_rows(env_col_ref, He, shape,
                                    y_e.astype(jnp.int32), passes=3)
                x_e = zero
                for w in range(We):
                    x_e = x_e + jnp.where(u_l2 >= colrow[w], 1.0, 0.0)
                x_e = jnp.minimum(x_e, We - 1.0)
                row_lo = zero
                row_hi = one
                for r in range(He):
                    selr = y_e == r
                    row_lo = jnp.where(
                        selr, env_row_ref[r - 1, 0] if r > 0 else 0.0,
                        row_lo)
                    row_hi = jnp.where(selr, env_row_ref[r, 0], row_hi)
                ju = jnp.clip((u_l1 - row_lo)
                              / jnp.maximum(row_hi - row_lo, 1e-12),
                              0.0, 1.0 - 1e-6)
                col_lo = zero
                col_hi = one
                for w in range(We):
                    selw = x_e == w
                    col_lo = jnp.where(
                        selw, colrow[w - 1] if w > 0 else zero, col_lo)
                    col_hi = jnp.where(selw, colrow[w], col_hi)
                jv = jnp.clip((u_l2 - col_lo)
                              / jnp.maximum(col_hi - col_lo, 1e-12),
                              0.0, 1.0 - 1e-6)
                ue = (x_e + jv) / We
                ve = (y_e + ju) / He
                th_e = ve * _PI
                st_e = jnp.sin(th_e)
                ph_e = (ue * 2.0 - 1.0) * _PI
                edx = st_e * jnp.sin(ph_e)
                edy = jnp.cos(th_e)
                edz = -st_e * jnp.cos(ph_e)
                idx_e = (y_e * We + x_e).astype(jnp.int32)
                _r0, _g0, _b0, pmf_e = fetch_rows(
                    env_tab_ref, He * We, shape, idx_e, passes=2)
                pdf_e = pmf_e * (He * We) / (
                    2.0 * _PI * _PI * jnp.maximum(st_e, 1e-6))
                er_l, eg_l, eb_l = env_bilinear(ue, ve)
                # merge into the area-row lane state
                ldx = jnp.where(is_env_l, edx, ldx)
                ldy = jnp.where(is_env_l, edy, ldy)
                ldz = jnp.where(is_env_l, edz, ldz)
                dist = jnp.where(is_env_l, 1.0e7, dist)   # _DIR_DIST
                ds_pdf = jnp.where(is_env_l, l_pmf * pdf_e, ds_pdf)
                l_radx = jnp.where(is_env_l, er_l, l_radx)
                l_rady = jnp.where(is_env_l, eg_l, l_rady)
                l_radz = jnp.where(is_env_l, eb_l, l_radz)
            # f_val / f_pdf for the sampled direction (non-delta kinds)
            wox, woy, woz = _to_local((nsx, nsy, nsz), (ldx, ldy, ldz))
            f_vx, f_vy, f_vz, f_pdf = _eval_kinds(
                kinds, kind, cos_i, wix, wiy, wiz, wox, woy, woz,
                alx, aly, alz, etx, ety, etz, kx, ky, kz, rough,
                srx, sry, srz, shape)
            nee_ok = (active & ~is_delta_m & (ds_pdf > 0)
                      & (_lum(f_vx, f_vy, f_vz) > 0))
            if not (depth + 1 <= max_depth and depth + 1 >= min_depth):
                nee_ok = jnp.zeros(shape, bool)
            eps_sh = RAY_EPS * jnp.maximum(1.0, t_hit)
            shx = hpx + ldx * eps_sh
            shy = hpy + ldy * eps_sh
            shz = hpz + ldz * eps_sh
            sh_tmax = jnp.where(nee_ok, dist * (1.0 - 1e-3) - RAY_EPS, 0.0)
            blocked = shadow_sweep(shx, shy, shz, ldx, ldy, ldz, sh_tmax)
            if n_sphs:
                blocked = blocked | sphere_blocked(shx, shy, shz,
                                                   ldx, ldy, ldz, sh_tmax)
            w_nee = _mis_power(ds_pdf, f_pdf)
            inv_pdf = jnp.where(ds_pdf > 0, w_nee
                                / jnp.maximum(ds_pdf, 1e-20), 0.0)
            add = nee_ok & ~blocked
            Lx = Lx + jnp.where(add, tpx * f_vx * l_radx * inv_pdf, 0.0)
            Ly = Ly + jnp.where(add, tpy * f_vy * l_rady * inv_pdf, 0.0)
            Lz = Lz + jnp.where(add, tpz * f_vz * l_radz * inv_pdf, 0.0)
            if emit_grad:
                for e in range(n_ems):
                    m_e = add & (row == e)
                    Tacc[e][0] += jnp.where(m_e, tpx * f_vx * inv_pdf, 0.0)
                    Tacc[e][1] += jnp.where(m_e, tpy * f_vy * inv_pdf, 0.0)
                    Tacc[e][2] += jnp.where(m_e, tpz * f_vz * inv_pdf, 0.0)
            if albedo_grad:
                # the NEE eval at this vertex adds ONE albedo factor for
                # diffuse-like kinds (f_v ∝ al)
                dlike = ((kind == BSDF_DIFFUSE)
                         | (kind == BSDF_ROUGH_DIFFUSE))
                alb_accum(add, tpx * f_vx * l_radx * inv_pdf,
                          tpy * f_vy * l_rady * inv_pdf,
                          tpz * f_vz * l_radz * inv_pdf,
                          extra_mask=dlike)

        # ---- BSDF sampling (mirrors sample_bsdf for supported kinds) -----
        uc = udim(base + OFF_BSDF_CMP)
        ub1 = udim(base + OFF_BSDF_U)
        ub2 = udim(base + OFF_BSDF_U + 1)
        (swx, swy, swz, bwx, bwy, bwz, bs_pdf, bs_delta,
         bs_eta) = _sample_kinds(
            kinds, kind, cos_i, sign_i, wix, wiy, wiz, uc, ub1, ub2,
            alx, aly, alz, etx, ety, etz, kx, ky, kz, rough,
            srx, sry, srz, stx, sty, stz, shape)
        wowx, wowy, wowz = _to_world((nsx, nsy, nsz), (swx, swy, swz))
        if albedo_grad:
            # this bounce multiplies tp by al (diffuse-like sample
            # weights are ∝ albedo): bump the per-material power count
            dlike_s = (((kind == BSDF_DIFFUSE)
                        | (kind == BSDF_ROUGH_DIFFUSE)) & active)
            for m_i in range(n_mats):
                n_alb[m_i] = n_alb[m_i] + jnp.where(
                    dlike_s & (mat_id == m_i), 1.0, 0.0)
        tpx = tpx * bwx
        tpy = tpy * bwy
        tpz = tpz * bwz
        eta_scale = eta_scale * bs_eta
        alive = active & (_lum(tpx, tpy, tpz) > 0)
        if depth + 1 > max_depth:
            alive = jnp.zeros(shape, bool)

        # ---- RR (mirrors path.py) ----------------------------------------
        if depth >= rr_depth:
            u_rr = udim(base + OFF_RR)
            q = jnp.minimum(
                jnp.maximum(jnp.maximum(tpx, tpy), tpz)
                * eta_scale * eta_scale, 0.95)
            survive = u_rr < q
            inv_q = 1.0 / jnp.maximum(q, 1e-8)
            tpx = jnp.where(survive, tpx * inv_q, tpx)
            tpy = jnp.where(survive, tpy * inv_q, tpy)
            tpz = jnp.where(survive, tpz * inv_q, tpz)
            alive = alive & survive

        eps_n = RAY_EPS * jnp.maximum(1.0, t_hit)
        ox = jnp.where(active, hpx + wowx * eps_n, ox)
        oy = jnp.where(active, hpy + wowy * eps_n, oy)
        oz = jnp.where(active, hpz + wowz * eps_n, oz)
        dx = jnp.where(active, wowx, dx)
        dy = jnp.where(active, wowy, dy)
        dz = jnp.where(active, wowz, dz)
        tpx = jnp.where(alive, tpx, 0.0)
        tpy = jnp.where(alive, tpy, 0.0)
        tpz = jnp.where(alive, tpz, 0.0)
        prev_pdf = bs_pdf
        prev_delta = bs_delta
        active = alive

    if emit_grad:
        return Lx, Ly, Lz, Tacc
    if albedo_grad:
        return Lx, Ly, Lz, Aacc
    return Lx, Ly, Lz


def _mega_kernel(tri_ref, mat_ref, em_ref, cam_ref, u_ref, tri_vmem_ref,
                 sph_ref, tex_ref, env_tab_ref, env_col_ref, env_row_ref,
                 *refs,
                 n_tris, n_mats, n_ems, n_sphs, max_depth, min_depth,
                 rr_depth, use_nee, kinds, thinlens=False, env_const=False,
                 tex_shape=None, env_shape=None, env_row_pick=0.0,
                 big_scene=False, clu_tpc=0, clu_passes=2):
    if clu_tpc:
        clu_aabb_ref, clu_tri_ref, out_ref = refs
    else:
        clu_aabb_ref = clu_tri_ref = None
        (out_ref,) = refs
    Lx, Ly, Lz = path_trace_tile(
        tri_ref, mat_ref, em_ref, cam_ref, lambda j: u_ref[j],
        u_ref.shape[1:], n_tris=n_tris, n_mats=n_mats, n_ems=n_ems,
        max_depth=max_depth, min_depth=min_depth, rr_depth=rr_depth,
        use_nee=use_nee, kinds=kinds, thinlens=thinlens,
        env_const=env_const, tri_vmem_ref=tri_vmem_ref,
        sph_ref=sph_ref, n_sphs=n_sphs, tex_ref=tex_ref,
        tex_shape=tex_shape, env_tab_ref=env_tab_ref,
        env_col_ref=env_col_ref, env_row_ref=env_row_ref,
        env_shape=env_shape, env_row_pick=env_row_pick,
        big_scene=big_scene, clu_aabb_ref=clu_aabb_ref,
        clu_tri_ref=clu_tri_ref, clu_tpc=clu_tpc, clu_passes=clu_passes)
    out_ref[0] = Lx
    out_ref[1] = Ly
    out_ref[2] = Lz


def _oren_nayar_term(wix, wiy, wiz, wox, woy, woz, sigma):
    """Qualitative Oren-Nayar factor (mirrors render/bsdf.py eval; ref:
    roughdiffuse.cpp "fast" mode).  roughness column doubles as sigma."""
    s2 = sigma * sigma
    a_on = 1.0 - 0.5 * s2 / (s2 + 0.33)
    b_on = 0.45 * s2 / (s2 + 0.09)
    ci = jnp.abs(wiz)
    co = jnp.abs(woz)
    sin_i = jnp.sqrt(jnp.maximum(1.0 - ci * ci, 0.0))
    sin_o = jnp.sqrt(jnp.maximum(1.0 - co * co, 0.0))
    denom = jnp.maximum(sin_i * sin_o, 1e-7)
    cos_dphi = jnp.clip((wix * wox + wiy * woy) / denom, -1.0, 1.0)
    sin_alpha = jnp.maximum(sin_i, sin_o)
    tan_beta = jnp.minimum(sin_i / jnp.maximum(ci, 1e-7),
                           sin_o / jnp.maximum(co, 1e-7))
    return a_on + b_on * jnp.maximum(cos_dphi, 0.0) * sin_alpha * tan_beta


def _eval_kinds(kinds, kind, cos_i, wix, wiy, wiz, wox, woy, woz,
                alx, aly, alz, etx, ety, etz, kx, ky, kz, rough,
                srx, sry, srz, shape):
    """(f * |cos_o|, pdf) for the non-delta supported kinds (NEE side)."""
    f32 = jnp.float32
    zero = jnp.zeros(shape, f32)
    cos_o = woz
    same_side = (cos_i * cos_o) > 0
    abs_co = jnp.abs(cos_o)
    f_vx = f_vy = f_vz = zero
    f_pdf = zero
    if BSDF_DIFFUSE in kinds:
        d_pdf = jnp.maximum(abs_co, 0.0) / _PI
        m = (kind == BSDF_DIFFUSE) & same_side
        scale = abs_co / _PI
        f_vx = jnp.where(m, alx * scale, f_vx)
        f_vy = jnp.where(m, aly * scale, f_vy)
        f_vz = jnp.where(m, alz * scale, f_vz)
        f_pdf = jnp.where(m, d_pdf, f_pdf)
    if BSDF_ROUGH_DIFFUSE in kinds:
        on = _oren_nayar_term(wix, wiy, wiz, wox, woy, woz, rough)
        d_pdf = jnp.maximum(abs_co, 0.0) / _PI
        m = (kind == BSDF_ROUGH_DIFFUSE) & same_side
        scale = abs_co / _PI * on
        f_vx = jnp.where(m, alx * scale, f_vx)
        f_vy = jnp.where(m, aly * scale, f_vy)
        f_vz = jnp.where(m, alz * scale, f_vz)
        f_pdf = jnp.where(m, d_pdf, f_pdf)
    if BSDF_ROUGH_CONDUCTOR in kinds:
        hx = wox + wix
        hy = woy + wiy
        hz = woz + wiz
        hx, hy, hz = _normalize(hx, hy, hz)
        hs = jnp.where(hz == 0, 1.0, jnp.sign(hz))
        hx, hy, hz = hx * hs, hy * hs, hz * hs
        si = jnp.where(cos_i == 0, 1.0, jnp.sign(cos_i))
        wiz_u = wiz * si
        woz_u = woz * si
        d = _ggx_ndf(hz, rough)
        g = _ggx_g2(wiz_u, woz_u, rough)
        fc_ci = jnp.abs(_dot(wix, wiy, wiz, hx, hy, hz))
        fx = _fresnel_cond1(fc_ci, etx, kx)
        fy = _fresnel_cond1(fc_ci, ety, ky)
        fz = _fresnel_cond1(fc_ci, etz, kz)
        denom = 4.0 * jnp.abs(cos_i)
        base = jnp.where(denom > 0, d * g / jnp.maximum(denom, 1e-30), 0.0)
        m_pdf = _ggx_vndf_pdf(wix * si, wiy * si, wiz_u, hx, hy, hz, rough)
        rc_pdf = m_pdf / jnp.maximum(
            4.0 * jnp.abs(_dot(wox, woy, woz, hx, hy, hz)), 1e-12)
        m = (kind == BSDF_ROUGH_CONDUCTOR) & same_side
        f_vx = jnp.where(m, srx * fx * base, f_vx)
        f_vy = jnp.where(m, sry * fy * base, f_vy)
        f_vz = jnp.where(m, srz * fz * base, f_vz)
        f_pdf = jnp.where(m, rc_pdf, f_pdf)
    return f_vx, f_vy, f_vz, f_pdf


def _sample_kinds(kinds, kind, cos_i, sign_i, wix, wiy, wiz, uc, ub1, ub2,
                  alx, aly, alz, etx, ety, etz, kx, ky, kz, rough,
                  srx, sry, srz, stx, sty, stz, shape):
    """Mirror of render/bsdf.py sample_bsdf for the supported kinds."""
    f32 = jnp.float32
    zero = jnp.zeros(shape, f32)
    one = jnp.ones(shape, f32)
    swx = swy = swz = zero
    bwx = bwy = bwz = zero
    bs_pdf = zero
    bs_delta = jnp.zeros(shape, bool)
    bs_eta = one

    spec_x, spec_y, spec_z = -wix, -wiy, wiz

    if BSDF_DIFFUSE in kinds:
        cx, cy, cz = _cosine_hemisphere(ub1, ub2)
        dwx, dwy, dwz = cx * sign_i, cy * sign_i, cz * sign_i
        d_pdf = jnp.maximum(dwz * sign_i, 0.0) / _PI
        m = kind == BSDF_DIFFUSE
        swx = jnp.where(m, dwx, swx)
        swy = jnp.where(m, dwy, swy)
        swz = jnp.where(m, dwz, swz)
        bwx = jnp.where(m, alx, bwx)
        bwy = jnp.where(m, aly, bwy)
        bwz = jnp.where(m, alz, bwz)
        bs_pdf = jnp.where(m, d_pdf, bs_pdf)

    if BSDF_ROUGH_DIFFUSE in kinds:
        # cosine-hemisphere sampled; weight = f*cos/pdf = albedo * ON-term
        cx, cy, cz = _cosine_hemisphere(ub1, ub2)
        dwx, dwy, dwz = cx * sign_i, cy * sign_i, cz * sign_i
        d_pdf = jnp.maximum(dwz * sign_i, 0.0) / _PI
        on = _oren_nayar_term(wix, wiy, wiz, dwx, dwy, dwz, rough)
        m = kind == BSDF_ROUGH_DIFFUSE
        swx = jnp.where(m, dwx, swx)
        swy = jnp.where(m, dwy, swy)
        swz = jnp.where(m, dwz, swz)
        bwx = jnp.where(m, alx * on, bwx)
        bwy = jnp.where(m, aly * on, bwy)
        bwz = jnp.where(m, alz * on, bwz)
        bs_pdf = jnp.where(m, d_pdf, bs_pdf)

    if BSDF_CONDUCTOR in kinds:
        fx = _fresnel_cond1(jnp.abs(cos_i), etx, kx)
        fy = _fresnel_cond1(jnp.abs(cos_i), ety, ky)
        fz = _fresnel_cond1(jnp.abs(cos_i), etz, kz)
        m = kind == BSDF_CONDUCTOR
        swx = jnp.where(m, spec_x, swx)
        swy = jnp.where(m, spec_y, swy)
        swz = jnp.where(m, spec_z, swz)
        bwx = jnp.where(m, srx * fx, bwx)
        bwy = jnp.where(m, sry * fy, bwy)
        bwz = jnp.where(m, srz * fz, bwz)
        bs_pdf = jnp.where(m, 0.0, bs_pdf)
        bs_delta = bs_delta | m

    if BSDF_MIRROR in kinds:
        m = kind == BSDF_MIRROR
        swx = jnp.where(m, spec_x, swx)
        swy = jnp.where(m, spec_y, swy)
        swz = jnp.where(m, spec_z, swz)
        bwx = jnp.where(m, srx, bwx)
        bwy = jnp.where(m, sry, bwy)
        bwz = jnp.where(m, srz, bwz)
        bs_pdf = jnp.where(m, 0.0, bs_pdf)
        bs_delta = bs_delta | m

    if BSDF_DIELECTRIC in kinds:
        eta_d = etx
        f_d, cos_t, _ = _fresnel_diel(cos_i, eta_d)
        pick_refl = uc < f_d
        eta_ti = jnp.where(cos_i > 0, 1.0 / eta_d, eta_d)
        cos_t_signed = jnp.where(cos_i > 0, -cos_t, cos_t)
        refr_x = -wix * eta_ti
        refr_y = -wiy * eta_ti
        refr_z = cos_t_signed
        dwx = jnp.where(pick_refl, spec_x, refr_x)
        dwy = jnp.where(pick_refl, spec_y, refr_y)
        dwz = jnp.where(pick_refl, spec_z, refr_z)
        factor = eta_ti
        wdx = jnp.where(pick_refl, srx, stx * factor * factor)
        wdy = jnp.where(pick_refl, sry, sty * factor * factor)
        wdz = jnp.where(pick_refl, srz, stz * factor * factor)
        eta_diel = jnp.where(
            pick_refl, 1.0, jnp.where(cos_i > 0, eta_d, 1.0 / eta_d))
        m = kind == BSDF_DIELECTRIC
        swx = jnp.where(m, dwx, swx)
        swy = jnp.where(m, dwy, swy)
        swz = jnp.where(m, dwz, swz)
        bwx = jnp.where(m, wdx, bwx)
        bwy = jnp.where(m, wdy, bwy)
        bwz = jnp.where(m, wdz, bwz)
        bs_pdf = jnp.where(m, 0.0, bs_pdf)
        bs_delta = bs_delta | m
        bs_eta = jnp.where(m, eta_diel, bs_eta)

    if BSDF_ROUGH_CONDUCTOR in kinds:
        wix_u, wiy_u, wiz_u = wix * sign_i, wiy * sign_i, wiz * sign_i
        mx, my, mz = _ggx_sample_vndf(wix_u, wiy_u, wiz_u, rough, ub1, ub2)
        im = _dot(wix_u, wiy_u, wiz_u, mx, my, mz)
        rx = 2.0 * im * mx - wix_u
        ry = 2.0 * im * my - wiy_u
        rz = 2.0 * im * mz - wiz_u
        m_pdf = _ggx_vndf_pdf(wix_u, wiy_u, wiz_u, mx, my, mz, rough)
        pdf_rc = m_pdf / jnp.maximum(
            4.0 * jnp.abs(_dot(rx, ry, rz, mx, my, mz)), 1e-12)
        g2 = _ggx_g2(wiz_u, rz, rough)
        g1 = _ggx_g1(wiz_u, rough)
        gw = jnp.where(g1 > 0, g2 / jnp.maximum(g1, 1e-20), 0.0)
        fc_ci = jnp.abs(im)
        fx = _fresnel_cond1(fc_ci, etx, kx) * gw
        fy = _fresnel_cond1(fc_ci, ety, ky) * gw
        fz = _fresnel_cond1(fc_ci, etz, kz) * gw
        rc_valid = rz > 0
        m = kind == BSDF_ROUGH_CONDUCTOR
        swx = jnp.where(m, rx * sign_i, swx)
        swy = jnp.where(m, ry * sign_i, swy)
        swz = jnp.where(m, rz * sign_i, swz)
        bwx = jnp.where(m & rc_valid, srx * fx, jnp.where(m, 0.0, bwx))
        bwy = jnp.where(m & rc_valid, sry * fy, jnp.where(m, 0.0, bwy))
        bwz = jnp.where(m & rc_valid, srz * fz, jnp.where(m, 0.0, bwz))
        bs_pdf = jnp.where(m & rc_valid, pdf_rc, jnp.where(m, 0.0, bs_pdf))

    if BSDF_NULL in kinds:
        m = kind == BSDF_NULL
        swx = jnp.where(m, -wix, swx)
        swy = jnp.where(m, -wiy, swy)
        swz = jnp.where(m, -wiz, swz)
        bwx = jnp.where(m, 1.0, bwx)
        bwy = jnp.where(m, 1.0, bwy)
        bwz = jnp.where(m, 1.0, bwz)
        bs_pdf = jnp.where(m, 0.0, bs_pdf)
        bs_delta = bs_delta | m

    return swx, swy, swz, bwx, bwy, bwz, bs_pdf, bs_delta, bs_eta


# ---------------------------------------------------------------- wrapper
def _mega_kernel_rad(tri_ref, mat_ref, em_ref, cam_ref, u_ref,
                     tri_vmem_ref, sph_ref, tex_ref, env_tab_ref,
                     env_col_ref, env_row_ref, out_ref, *,
                     n_tris, n_mats, n_ems, n_sphs, max_depth, min_depth,
                     rr_depth, use_nee, kinds, thinlens=False,
                     env_const=False, tex_shape=None, env_shape=None,
                     env_row_pick=0.0, big_scene=False):
    """Forward + per-lane emitter-radiance Jacobian rows (emit_grad)."""
    Lx, Ly, Lz, Tacc = path_trace_tile(
        tri_ref, mat_ref, em_ref, cam_ref, lambda j: u_ref[j],
        u_ref.shape[1:], n_tris=n_tris, n_mats=n_mats, n_ems=n_ems,
        max_depth=max_depth, min_depth=min_depth, rr_depth=rr_depth,
        use_nee=use_nee, kinds=kinds, thinlens=thinlens,
        env_const=env_const, tri_vmem_ref=tri_vmem_ref,
        sph_ref=sph_ref, n_sphs=n_sphs, tex_ref=tex_ref,
        tex_shape=tex_shape, env_tab_ref=env_tab_ref,
        env_col_ref=env_col_ref, env_row_ref=env_row_ref,
        env_shape=env_shape, env_row_pick=env_row_pick, emit_grad=True,
        big_scene=big_scene)
    out_ref[0] = Lx
    out_ref[1] = Ly
    out_ref[2] = Lz
    for e in range(n_ems):
        for c in range(3):
            out_ref[3 + e * 3 + c] = Tacc[e][c]


def make_mega_trace_rad(scene0: Scene, cfg, interpret: bool = False):
    """trace(radiance, u) -> Splats with an EXACT kernel-speed VJP with
    respect to emitters.radiance — the inverse-emission fast path.

    Every radiance occurrence in the estimator is LINEAR (emitter-hit and
    NEE terms; the sampling pmf/cdf are separate EmitterTable leaves, the
    same independence jax.grad of trace_paths sees), so the kernel
    accumulates the coefficient rows T[e][c] per lane during the FORWARD
    and the backward is one einsum — no wavefront replay.  Ref north
    star: BASELINE.md ("parameter gradients ... backward pass")."""
    from drmlt_mitsuba_tpu.integrators.path import Splats

    n_tris = np.asarray(scene0.tris.v0).shape[0]
    n_mats = np.asarray(scene0.materials.kind).shape[0]
    n_ems = np.asarray(scene0.emitters.kind).shape[0]
    n_sphs = (np.asarray(scene0.spheres.valid).shape[0]
              if bool(np.any(np.asarray(scene0.spheres.valid))) else 0)
    tex_shape0 = (tuple(np.asarray(scene0.textures.data).shape[:3])
                  if scene0.textures is not None else None)
    if scene0.emitters.env_image is not None:
        env_shape0 = tuple(np.asarray(scene0.emitters.env_image).shape[:2])
        env_row_pick0 = float(np.sum(np.where(
            np.asarray(scene0.emitters.kind) == 4,
            np.asarray(scene0.emitters.pmf), 0.0)))
    else:
        env_shape0, env_row_pick0 = None, 0.0
    kinds = tuple(sorted(set(
        int(k) for k in np.unique(np.asarray(scene0.materials.kind)))))
    n_dims = cfg.n_dims
    lum_w = jnp.asarray([0.212671, 0.715160, 0.072169])

    big_scene = n_tris > 8192
    kernel = functools.partial(
        _mega_kernel_rad, n_tris=n_tris, n_mats=n_mats, n_ems=n_ems,
        n_sphs=n_sphs, tex_shape=tex_shape0, env_shape=env_shape0,
        env_row_pick=env_row_pick0, big_scene=big_scene,
        max_depth=cfg.max_depth, min_depth=cfg.min_depth,
        rr_depth=cfg.rr_depth, use_nee=cfg.use_nee, kinds=kinds,
        thinlens=getattr(cfg, "thinlens", False),
        env_const=bool(float(np.abs(np.asarray(
            scene0.emitters.env_radiance)).sum()) > 0),
    )
    NO = 3 + n_ems * 3

    def _fwd_impl(radiance, u):
        scene = scene0.replace(
            emitters=scene0.emitters.replace(radiance=radiance))
        (tri, mat, emt, cam, sph, tri_ext, tex,
         env_tab, env_col, env_row) = pack_mega_tables_jnp(scene)
        if big_scene:
            tri = tri[:1]            # chunked sweeps read tri_ext only
        R = u.shape[0]
        R8 = R // 8
        L = min(R8, 512)
        while R8 % L:
            L //= 2
        uT = u[:, :n_dims].T.reshape(n_dims, 8, R8)
        out = pl.pallas_call(
            kernel,
            grid=(R8 // L,),
            in_specs=[
                pl.BlockSpec(tuple(tri.shape), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((n_mats, _MAT_COLS), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((n_ems, _EM_COLS), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, _CAM_COLS), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((n_dims, 8, L), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tuple(tri_ext.shape), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((sph.shape[0], _SPH_COLS), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tex.shape[0], _TEX_COLS), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((env_tab.shape[0], _TEX_COLS),
                             lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(tuple(env_col.shape), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tuple(env_row.shape), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((NO, 8, L), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NO, 8, R8), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(tri, mat, emt, cam, uT, tri_ext, sph, tex, env_tab, env_col,
          env_row)
        value = out[0:3].reshape(3, R).T
        T = out[3:].reshape(n_ems, 3, R).transpose(2, 0, 1)   # (R, E, 3)
        lum = (value * lum_w).sum(-1)
        return Splats(pos=u[:, None, 0:2], value=value[:, None, :],
                      lum=lum), T

    @jax.custom_vjp
    def trace(radiance, u):
        return _fwd_impl(radiance, u)[0]

    def trace_fwd(radiance, u):
        sp, T = _fwd_impl(radiance, u)
        return sp, (T, u.shape)

    def trace_bwd(res, ct):
        T, u_shape = res
        # value[r, c] = sum_e T[r, e, c] * rad[e, c] + const;
        # lum folds through the luminance weights
        ctv = ct.value[:, 0, :] + ct.lum[:, None] * lum_w[None, :]
        g = jnp.einsum("rc,rec->ec", ctv, T)
        return g, jnp.zeros(u_shape, jnp.float32)

    trace.defvjp(trace_fwd, trace_bwd)
    return trace


def _mega_kernel_alb(tri_ref, mat_ref, em_ref, cam_ref, u_ref,
                     tri_vmem_ref, sph_ref, tex_ref, env_tab_ref,
                     env_col_ref, env_row_ref, out_ref, *,
                     n_tris, n_mats, n_ems, n_sphs, max_depth, min_depth,
                     rr_depth, use_nee, kinds, thinlens=False,
                     env_const=False, tex_shape=None, env_shape=None,
                     env_row_pick=0.0, big_scene=False):
    """Forward + per-lane material-albedo Jacobian rows (albedo_grad)."""
    Lx, Ly, Lz, Aacc = path_trace_tile(
        tri_ref, mat_ref, em_ref, cam_ref, lambda j: u_ref[j],
        u_ref.shape[1:], n_tris=n_tris, n_mats=n_mats, n_ems=n_ems,
        max_depth=max_depth, min_depth=min_depth, rr_depth=rr_depth,
        use_nee=use_nee, kinds=kinds, thinlens=thinlens,
        env_const=env_const, tri_vmem_ref=tri_vmem_ref,
        sph_ref=sph_ref, n_sphs=n_sphs, tex_ref=tex_ref,
        tex_shape=tex_shape, env_tab_ref=env_tab_ref,
        env_col_ref=env_col_ref, env_row_ref=env_row_ref,
        env_shape=env_shape, env_row_pick=env_row_pick, albedo_grad=True,
        big_scene=big_scene)
    out_ref[0] = Lx
    out_ref[1] = Ly
    out_ref[2] = Lz
    for m in range(n_mats):
        for c in range(3):
            out_ref[3 + m * 3 + c] = Aacc[m][c]


def make_mega_trace_alb(scene0: Scene, cfg, interpret: bool = False):
    """trace(albedo, u) -> Splats with an in-kernel VJP with respect to
    materials.albedo — the generic-parameter extension of
    make_mega_trace_rad (VERDICT r4 item 6).

    Contributions are POLYNOMIALS in each material's albedo (every
    diffuse-like bounce multiplies the throughput channel-diagonally by
    al), so d value[c]/d al_m[c] = sum_contribs contrib[c] *
    power_m(contrib) / al_m[c], accumulated per lane during the FORWARD
    pass; the backward is one einsum — no wavefront replay.  Exact for
    al > 1e-12 (a black material's one-bounce derivative is lost — start
    optimizations above zero) and with RR survival DETACHED (sampling
    pdf convention); use rr_depth >= max_depth for gradient-exactness
    against jax.grad of the wavefront.  Constant albedos only (textured
    scenes carry the atlas, not materials.albedo)."""
    from drmlt_mitsuba_tpu.integrators.path import Splats

    assert scene0.textures is None, "albedo adjoint = constant albedos"
    n_tris = np.asarray(scene0.tris.v0).shape[0]
    n_mats = np.asarray(scene0.materials.kind).shape[0]
    n_ems = np.asarray(scene0.emitters.kind).shape[0]
    n_sphs = (np.asarray(scene0.spheres.valid).shape[0]
              if bool(np.any(np.asarray(scene0.spheres.valid))) else 0)
    if scene0.emitters.env_image is not None:
        env_shape0 = tuple(np.asarray(scene0.emitters.env_image).shape[:2])
        env_row_pick0 = float(np.sum(np.where(
            np.asarray(scene0.emitters.kind) == 4,
            np.asarray(scene0.emitters.pmf), 0.0)))
    else:
        env_shape0, env_row_pick0 = None, 0.0
    kinds = tuple(sorted(set(
        int(k) for k in np.unique(np.asarray(scene0.materials.kind)))))
    n_dims = cfg.n_dims
    lum_w = jnp.asarray([0.212671, 0.715160, 0.072169])

    big_scene = n_tris > 8192
    kernel = functools.partial(
        _mega_kernel_alb, n_tris=n_tris, n_mats=n_mats, n_ems=n_ems,
        n_sphs=n_sphs, tex_shape=None, env_shape=env_shape0,
        env_row_pick=env_row_pick0, big_scene=big_scene,
        max_depth=cfg.max_depth, min_depth=cfg.min_depth,
        rr_depth=cfg.rr_depth, use_nee=cfg.use_nee, kinds=kinds,
        thinlens=getattr(cfg, "thinlens", False),
        env_const=bool(float(np.abs(np.asarray(
            scene0.emitters.env_radiance)).sum()) > 0),
    )
    NO = 3 + n_mats * 3

    def _fwd_impl(albedo, u):
        scene = scene0.replace(
            materials=scene0.materials.replace(albedo=albedo))
        (tri, mat, emt, cam, sph, tri_ext, tex,
         env_tab, env_col, env_row) = pack_mega_tables_jnp(scene)
        if big_scene:
            tri = tri[:1]            # chunked sweeps read tri_ext only
        R = u.shape[0]
        R8 = R // 8
        L = min(R8, 512)
        while R8 % L:
            L //= 2
        uT = u[:, :n_dims].T.reshape(n_dims, 8, R8)
        out = pl.pallas_call(
            kernel,
            grid=(R8 // L,),
            in_specs=[
                pl.BlockSpec(tuple(tri.shape), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((n_mats, _MAT_COLS), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((n_ems, _EM_COLS), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, _CAM_COLS), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((n_dims, 8, L), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tuple(tri_ext.shape), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((sph.shape[0], _SPH_COLS), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tex.shape[0], _TEX_COLS), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((env_tab.shape[0], _TEX_COLS),
                             lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(tuple(env_col.shape), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tuple(env_row.shape), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((NO, 8, L), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NO, 8, R8), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(tri, mat, emt, cam, uT, tri_ext, sph, tex, env_tab, env_col,
          env_row)
        value = out[0:3].reshape(3, R).T
        A = out[3:].reshape(n_mats, 3, R).transpose(2, 0, 1)   # (R, M, 3)
        lum = (value * lum_w).sum(-1)
        return Splats(pos=u[:, None, 0:2], value=value[:, None, :],
                      lum=lum), A

    @jax.custom_vjp
    def trace(albedo, u):
        return _fwd_impl(albedo, u)[0]

    def trace_fwd(albedo, u):
        sp, A = _fwd_impl(albedo, u)
        return sp, (A, u.shape)

    def trace_bwd(res, ct):
        A, u_shape = res
        ctv = ct.value[:, 0, :] + ct.lum[:, None] * lum_w[None, :]
        g = jnp.einsum("rc,rmc->mc", ctv, A)
        return g, jnp.zeros(u_shape, jnp.float32)

    trace.defvjp(trace_fwd, trace_bwd)
    return trace


def pick_tpc(T: int) -> int:
    """Cluster size for the clustered sweep: the one-hot fetch cost is
    invariant to tpc (10*T*K MACs/iteration), so tpc trades per-iteration
    VPU test cost against the while-loop trip count.  Measured (19.6k
    tris, on chip): the trip count is geometry-bound (~6-8 clusters per
    tile regardless of tpc), so the smaller test term wins — 128."""
    return 64 if T <= 8192 else 128


def make_mega_trace(scene: Scene, cfg, interpret: bool = False,
                    force_big: bool = False, force_clusters: bool = False,
                    cluster_min: int = 4096):
    """Build trace(u) -> Splats running the whole path trace in one Pallas
    kernel.  Caller must have checked mega_eligible(scene, cfg).
    force_big: take the chunked big-scene sweep path regardless of
    triangle count (tests exercise it on small scenes).
    force_clusters: take the clustered-BVH traversal regardless of size
    (default: scenes above `cluster_min` triangles)."""
    from drmlt_mitsuba_tpu.integrators.path import Splats

    T0 = int(np.asarray(scene.tris.v0).shape[0])
    use_clusters = force_clusters or T0 > cluster_min
    clu_tpc = 0
    clu_aabb = jnp.zeros((8, 8), jnp.float32)
    clu_tri = jnp.zeros((8, 128), jnp.bfloat16)
    if use_clusters:
        from drmlt_mitsuba_tpu.ops.pallas.cluster_sweep import (
            cluster_reorder, pack_cluster_tables,
        )
        clu_tpc = pick_tpc(T0)
        scene, aabbs, starts, _C = cluster_reorder(scene, clu_tpc)
        clu_aabb, clu_tri = pack_cluster_tables(scene, aabbs, starts,
                                                clu_tpc)
        force_big = True      # tri table rides VMEM only (ids realigned)

    (tri, mat, emt, cam, sph, tri_ext, tex,
     env_tab, env_col, env_row) = pack_mega_tables(scene)
    n_tris = tri.shape[0]
    n_mats = mat.shape[0]
    n_ems = emt.shape[0]
    n_sphs = (sph.shape[0]
              if bool(np.any(np.asarray(scene.spheres.valid))) else 0)
    tex_shape = (tuple(np.asarray(scene.textures.data).shape[:3])
                 if scene.textures is not None else None)
    if scene.emitters.env_image is not None:
        env_shape = tuple(np.asarray(scene.emitters.env_image).shape[:2])
        env_row_pick = float(np.sum(np.where(
            np.asarray(scene.emitters.kind) == 4,
            np.asarray(scene.emitters.pmf), 0.0)))
    else:
        env_shape, env_row_pick = None, 0.0
    kinds = tuple(sorted(set(
        int(k) for k in np.unique(np.asarray(scene.materials.kind)))))
    n_dims = cfg.n_dims

    big_scene = force_big or n_tris > 8192   # SMEM scalar-table budget
    if big_scene:
        tri = tri[:1]                # chunked sweeps read tri_ext only
    kernel = functools.partial(
        _mega_kernel, n_tris=n_tris, n_mats=n_mats, n_ems=n_ems,
        n_sphs=n_sphs, tex_shape=tex_shape, env_shape=env_shape,
        env_row_pick=env_row_pick, big_scene=big_scene,
        max_depth=cfg.max_depth, min_depth=cfg.min_depth,
        rr_depth=cfg.rr_depth, use_nee=cfg.use_nee, kinds=kinds,
        thinlens=getattr(cfg, "thinlens", False),
        env_const=bool(
            float(np.abs(np.asarray(scene.emitters.env_radiance)).sum())
            > 0),
        clu_tpc=clu_tpc,
    )

    @jax.jit
    def trace(u):
        R = u.shape[0]
        R8 = R // 8
        # big scenes: the 16MB scoped-VMEM budget holds the (Tp, 28)
        # table (6.1MB at 57k tris) + chunk temporaries — smaller lane
        # blocks keep the sweep/fetch tiles inside it (measured OOM at
        # L=256/57k: 27.4M > 16M)
        L = min(R8, 128 if big_scene else 512)
        while R8 % L:
            L //= 2
        if clu_tpc:
            # ray-coherence sort: the clustered while_loop runs to the
            # MAX clusters-visited over each (8, L) lane tile, so
            # grouping lanes by film position (dims 0/1) pulls the tile
            # max toward the per-lane median.  A kernel tile covers flat
            # slots {s*R8 + i*L + j}, so sorted ranks are laid out
            # tile-contiguously via the static slot map below.  Pure
            # per-lane permutation — results are gathered back, so
            # trace stays lane-pure.
            key = (jnp.floor(u[:, 1] * 64.0).astype(jnp.int32) * 64
                   + jnp.floor(u[:, 0] * 64.0).astype(jnp.int32))
            perm = jnp.argsort(key)
            r_flat = np.arange(R)
            sub, pos = r_flat // R8, r_flat % R8
            g = (pos // L) * (8 * L) + sub * L + pos % L   # slot -> rank
            total = perm[jnp.asarray(g)]
            inv = jnp.argsort(total)
            u_sorted = u[total]
        else:
            inv = None
            u_sorted = u
        uT = u_sorted[:, :n_dims].T.reshape(n_dims, 8, R8)
        in_specs = [
            pl.BlockSpec(tuple(tri.shape), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_mats, _MAT_COLS), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_ems, _EM_COLS), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _CAM_COLS), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_dims, 8, L), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tuple(tri_ext.shape), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sph.shape[0], _SPH_COLS), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tex.shape[0], _TEX_COLS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((env_tab.shape[0], _TEX_COLS),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tuple(env_col.shape), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tuple(env_row.shape), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        operands = [tri, mat, emt, cam, uT, tri_ext, sph, tex, env_tab,
                    env_col, env_row]
        if clu_tpc:
            in_specs += [
                pl.BlockSpec(tuple(clu_aabb.shape), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tuple(clu_tri.shape), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
            operands += [clu_aabb, clu_tri]
        out = pl.pallas_call(
            kernel,
            grid=(R8 // L,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((3, 8, L), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, 8, R8), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(*operands)
        value = out.reshape(3, R).T
        if inv is not None:
            value = value[inv]          # undo the coherence layout
        lum = (value * jnp.asarray([0.212671, 0.715160, 0.072169])).sum(-1)
        return Splats(
            pos=u[:, None, 0:2],
            value=value[:, None, :],
            lum=lum,
        )

    return trace


def make_mega_trace_diff(scene0: Scene, cfg, interpret: bool = False):
    """Differentiable fast path (VERDICT r2 #7): trace(scene, u)->Splats
    whose FORWARD runs the Pallas megakernel and whose BACKWARD replays
    the lane-exact XLA wavefront (trace_paths) under jax.vjp.

    The two implementations compute the same function lane-for-lane
    (tests/test_megatrace.py), so the wavefront's cotangents are exact
    for the kernel's primal values; the backward rematerializes the trace
    from the SAME primary-sample vector u (O(1) PSS replay — no stored
    intermediates, HBM cost is just the replayed forward).  `scene0`
    fixes the static structure (kinds, shapes); the scene ARGUMENT
    carries the live, possibly traced, parameter leaves — the same
    calling convention as trace_paths, so jax.grad w.r.t. any scene leaf
    works unchanged.  Ref for the north star: BASELINE.md ("parameter
    gradients ... backward pass")."""
    from drmlt_mitsuba_tpu.integrators.path import Splats, trace_paths

    n_tris = np.asarray(scene0.tris.v0).shape[0]
    n_mats = np.asarray(scene0.materials.kind).shape[0]
    n_ems = np.asarray(scene0.emitters.kind).shape[0]
    n_sphs = (np.asarray(scene0.spheres.valid).shape[0]
              if bool(np.any(np.asarray(scene0.spheres.valid))) else 0)
    tex_shape0 = (tuple(np.asarray(scene0.textures.data).shape[:3])
                  if scene0.textures is not None else None)
    if scene0.emitters.env_image is not None:
        env_shape0 = tuple(np.asarray(scene0.emitters.env_image).shape[:2])
        env_row_pick0 = float(np.sum(np.where(
            np.asarray(scene0.emitters.kind) == 4,
            np.asarray(scene0.emitters.pmf), 0.0)))
    else:
        env_shape0, env_row_pick0 = None, 0.0
    kinds = tuple(sorted(set(
        int(k) for k in np.unique(np.asarray(scene0.materials.kind)))))
    n_dims = cfg.n_dims

    big_scene = n_tris > 8192
    kernel = functools.partial(
        _mega_kernel, n_tris=n_tris, n_mats=n_mats, n_ems=n_ems,
        n_sphs=n_sphs, tex_shape=tex_shape0, env_shape=env_shape0,
        env_row_pick=env_row_pick0, big_scene=big_scene,
        max_depth=cfg.max_depth, min_depth=cfg.min_depth,
        rr_depth=cfg.rr_depth, use_nee=cfg.use_nee, kinds=kinds,
        thinlens=getattr(cfg, "thinlens", False),
        env_const=bool(
            float(np.abs(np.asarray(scene0.emitters.env_radiance)).sum())
            > 0),
    )

    def _fwd_impl(scene, u):
        (tri, mat, emt, cam, sph, tri_ext, tex,
         env_tab, env_col, env_row) = pack_mega_tables_jnp(scene)
        if big_scene:
            tri = tri[:1]            # chunked sweeps read tri_ext only
        R = u.shape[0]
        R8 = R // 8
        L = min(R8, 512)
        while R8 % L:
            L //= 2
        uT = u[:, :n_dims].T.reshape(n_dims, 8, R8)
        out = pl.pallas_call(
            kernel,
            grid=(R8 // L,),
            in_specs=[
                pl.BlockSpec(tuple(tri.shape), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((n_mats, _MAT_COLS), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((n_ems, _EM_COLS), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, _CAM_COLS), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((n_dims, 8, L), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tuple(tri_ext.shape), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((sph.shape[0], _SPH_COLS), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tex.shape[0], _TEX_COLS), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((env_tab.shape[0], _TEX_COLS),
                             lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(tuple(env_col.shape), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tuple(env_row.shape), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((3, 8, L), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, 8, R8), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(tri, mat, emt, cam, uT, tri_ext, sph, tex, env_tab, env_col,
          env_row)
        value = out.reshape(3, R).T
        lum = (value * jnp.asarray([0.212671, 0.715160, 0.072169])).sum(-1)
        return Splats(pos=u[:, None, 0:2], value=value[:, None, :],
                      lum=lum)

    @jax.custom_vjp
    def trace(scene, u):
        return _fwd_impl(scene, u)

    def trace_fwd(scene, u):
        return _fwd_impl(scene, u), (scene, u)

    def trace_bwd(res, ct):
        scene, u = res
        # the replay MUST trace through the XLA sweeps: the Pallas
        # intersect kernels carry no autodiff rules, so on TPU the
        # default dispatch would make jax.vjp fail to linearize
        from drmlt_mitsuba_tpu.ops.intersect import force_xla_intersect

        with force_xla_intersect():
            _, vjp = jax.vjp(
                lambda s, uu: trace_paths(s, cfg, uu[:, :n_dims]), scene, u)
        return vjp(ct)

    trace.defvjp(trace_fwd, trace_bwd)
    return trace
