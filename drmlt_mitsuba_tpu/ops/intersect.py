"""Ray-scene intersection (the analog of ShapeKDTree::rayIntersect,
include/mitsuba/render/skdtree.h:125).

TPU stance: rays arrive in large batches (one per Markov chain / pixel lane),
so intersection is a dense rays x primitives sweep rather than a per-ray tree
walk.  Three tiers:

  * `intersect` / `occluded` — chunked brute force over the triangle soup
    (lax.scan over static-size chunks; XLA keeps the (R, chunk) temporaries
    fused in registers/VMEM).  Exact, used for small scenes and as the
    reference oracle for the accelerated paths.
  * MXU variant (ops/intersect_mxu.py) — Wald TriAccel-style affine
    projection expressed as two (R,4)x(4,3T) matmuls.
  * Pallas kernel (ops/pallas/) — BVH-clustered sweep with triangle blocks
    staged in VMEM.

All functions broadcast over a single leading ray axis R.
"""
from __future__ import annotations

import contextlib

import flax.struct as struct
import jax
import jax.numpy as jnp

from drmlt_mitsuba_tpu.core.math import RAY_EPS, normalize, safe_sqrt
from drmlt_mitsuba_tpu.scene.types import Scene

INF = jnp.float32(3.0e38)

# static chunk size for the triangle sweep; multiple of the 128-lane VPU width
TRI_CHUNK = 256


@struct.dataclass
class Hit:
    """Surface interaction record (ref: Intersection, shape.h)."""
    valid: jnp.ndarray    # (R,) bool
    t: jnp.ndarray        # (R,)
    p: jnp.ndarray        # (R, 3) hit position
    ng: jnp.ndarray       # (R, 3) geometric normal (unit)
    ns: jnp.ndarray       # (R, 3) shading normal (unit)
    uv: jnp.ndarray       # (R, 2) barycentric / param coords
    tex_uv: jnp.ndarray   # (R, 2) interpolated texture coords
    mat_id: jnp.ndarray   # (R,) int32
    emitter_id: jnp.ndarray  # (R,) int32 (-1 = none)
    prim: jnp.ndarray     # (R,) int32 triangle index (or ~sphere_idx)


def _tri_sweep(tris, o, d, t_max, find_best: bool, motion=None, time=None):
    """Scan all triangles in chunks; returns (best_t, best_idx, best_uv) or an
    any-hit mask when find_best is False.

    With (motion, time), each ray intersects the geometry LERPED to its
    own normalized shutter time (linear motion blur, ref
    src/shapes/deformable.cpp per-ray space-time lookup): v0(t) = v0 +
    t*dv0 etc.  Per-(ray, chunk) lerp costs one fma per vertex field —
    the same order as the Moller-Trumbore intermediates already paid."""
    T = tris.v0.shape[0]
    moving = motion is not None and time is not None
    pad = (-T) % TRI_CHUNK
    fields = [tris.v0, tris.e1, tris.e2]
    if moving:
        fields += [motion.dv0, motion.de1, motion.de2]
    if pad:
        padf = lambda a: jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)
        fields = [padf(a) for a in fields]
        valid = jnp.concatenate([tris.valid, jnp.zeros((pad,), bool)], 0)
    else:
        valid = tris.valid
    n_chunks = fields[0].shape[0] // TRI_CHUNK
    fields = [a.reshape(n_chunks, TRI_CHUNK, 3) for a in fields]
    valid = valid.reshape(n_chunks, TRI_CHUNK)

    R = o.shape[0]
    o_ = o[:, None, :]
    d_ = d[:, None, :]
    tl = time[:, None, None] if moving else None

    def chunk_hits(chunk):
        cvalid = chunk[-1]
        if moving:
            cv0, ce1, ce2, cdv0, cde1, cde2 = chunk[:-1]
            cv0 = cv0[None] + tl * cdv0[None]
            ce1 = ce1[None] + tl * cde1[None]
            ce2 = ce2[None] + tl * cde2[None]
        else:
            cv0, ce1, ce2 = (a[None] for a in chunk[:-1])
        # Moller-Trumbore against one chunk: (R, TRI_CHUNK)
        pvec = jnp.cross(d_, ce2)
        det = jnp.sum(ce1 * pvec, axis=-1)
        ok = jnp.abs(det) > 1e-12
        inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        tvec = o_ - cv0
        b1 = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, ce1)
        b2 = jnp.sum(d_ * qvec, axis=-1) * inv_det
        t = jnp.sum(ce2 * qvec, axis=-1) * inv_det
        hit = (
            ok & cvalid[None]
            & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
            & (t > RAY_EPS) & (t < t_max[:, None])
        )
        return hit, t, b1, b2

    if not find_best:
        def body(any_hit, chunk):
            hit, _, _, _ = chunk_hits(chunk)
            return any_hit | jnp.any(hit, axis=-1), None

        any_hit, _ = jax.lax.scan(body, jnp.zeros((R,), bool),
                                  (*fields, valid))
        return any_hit

    def body(carry, chunk):
        best_t, best_idx, best_b1, best_b2 = carry
        base = chunk[-1]
        hit, t, b1, b2 = chunk_hits(chunk[:-1])
        t = jnp.where(hit, t, INF)
        j = jnp.argmin(t, axis=-1)
        rows = jnp.arange(R)
        tj = t[rows, j]
        better = tj < best_t
        best_idx = jnp.where(better, base + j, best_idx)
        best_b1 = jnp.where(better, b1[rows, j], best_b1)
        best_b2 = jnp.where(better, b2[rows, j], best_b2)
        best_t = jnp.minimum(best_t, tj)
        return (best_t, best_idx, best_b1, best_b2), None

    base = jnp.arange(n_chunks, dtype=jnp.int32) * TRI_CHUNK
    init = (
        jnp.full((R,), INF),
        jnp.full((R,), -1, jnp.int32),
        jnp.zeros((R,)),
        jnp.zeros((R,)),
    )
    (best_t, best_idx, b1, b2), _ = jax.lax.scan(
        body, init, (*fields, valid, base)
    )
    return best_t, best_idx, b1, b2


def _sphere_hits(spheres, o, d, t_max):
    """Analytic sphere intersection; returns (t, idx) best over spheres."""
    oc = o[:, None, :] - spheres.center[None]          # (R, S, 3)
    b = jnp.sum(oc * d[:, None, :], axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - spheres.radius[None] ** 2
    disc = b * b - c
    ok = (disc >= 0.0) & spheres.valid[None]
    sq = safe_sqrt(disc)
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > RAY_EPS, t0, t1)
    hit = ok & (t > RAY_EPS) & (t < t_max[:, None])
    t = jnp.where(hit, t, INF)
    j = jnp.argmin(t, axis=-1)
    rows = jnp.arange(o.shape[0])
    return t[rows, j], j.astype(jnp.int32)


def _on_tpu() -> bool:
    try:
        import jax

        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


_FORCE_XLA_DEPTH = [0]


@contextlib.contextmanager
def force_xla_intersect():
    """Force the pure-XLA sweep while tracing inside this context.

    Pallas calls carry no autodiff rules, so any code path that will be
    differentiated (e.g. the wavefront replay inside megatrace's
    custom-VJP backward) must trace its intersections through XLA even
    on TPU.  The dispatch decisions below are made at Python trace time,
    so a trace-time context manager is sufficient and jit-safe."""
    _FORCE_XLA_DEPTH[0] += 1
    try:
        yield
    finally:
        _FORCE_XLA_DEPTH[0] -= 1


def _use_pallas(scene: Scene, o) -> bool:
    """Static decision: the brute Pallas sweep (small scenes) on TPU."""
    if scene.tris_packed is None or o.shape[0] % 8 != 0:
        return False
    return _on_tpu() and not _FORCE_XLA_DEPTH[0]


def _use_clusters(scene: Scene, o) -> bool:
    """Static decision: the clustered Pallas sweep (large scenes) on TPU."""
    if scene.cluster_aabbs is None or o.shape[0] % 8 != 0:
        return False
    return _on_tpu() and not _FORCE_XLA_DEPTH[0]


def _sweep_any(scene: Scene, rays6):
    """Dispatch to the right Pallas sweep; returns (t, original_tri_idx)."""
    if scene.cluster_aabbs is not None:
        from drmlt_mitsuba_tpu.ops.pallas.bvh_kernel import sweep_clusters

        t, pi = sweep_clusters(rays6, scene.cluster_aabbs,
                               scene.cluster_blocks)
        idx = jnp.where(
            pi >= 0, scene.cluster_gidx[jnp.clip(pi, 0, None)], -1
        )
        return t, idx
    from drmlt_mitsuba_tpu.ops.pallas.intersect_kernel import sweep_closest_v2

    return sweep_closest_v2(rays6, scene.tris_packed)


def _tri_best_pallas(scene: Scene, o, d, t_max):
    """Closest triangle via the Pallas sweep + one-triangle barycentric
    recomputation for the winner."""
    rays6 = jnp.concatenate([o.T, d.T], axis=0)
    t, idx = _sweep_any(scene, rays6)
    ok = (idx >= 0) & (t < t_max)
    t = jnp.where(ok, t, INF)
    idx = jnp.where(ok, idx, -1)
    ti = jnp.clip(idx, 0, scene.tris.v0.shape[0] - 1)
    # barycentrics of the winning triangle (Cramer on the gathered data)
    tris = scene.tris
    pvec = jnp.cross(d, tris.e2[ti])
    det = jnp.sum(tris.e1[ti] * pvec, axis=-1)
    inv = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    tvec = o - tris.v0[ti]
    b1 = jnp.sum(tvec * pvec, axis=-1) * inv
    b2 = jnp.sum(d * jnp.cross(tvec, tris.e1[ti]), axis=-1) * inv
    return t, idx, jnp.clip(b1, 0.0, 1.0), jnp.clip(b2, 0.0, 1.0)


def intersect(scene: Scene, o, d, t_max=None, time=None) -> Hit:
    """Closest-hit query for a batch of rays (R, 3).

    `time` (R,) in [0,1]: per-ray shutter time for motion scenes
    (scene.motion is not None) — forces the XLA sweep (the Pallas fast
    paths statically require static geometry)."""
    R = o.shape[0]
    if t_max is None:
        t_max = jnp.full((R,), INF)
    moving = scene.motion is not None and time is not None
    if not moving and (_use_pallas(scene, o) or _use_clusters(scene, o)):
        tri_t, tri_idx, b1, b2 = _tri_best_pallas(scene, o, d, t_max)
    else:
        tri_t, tri_idx, b1, b2 = _tri_sweep(
            scene.tris, o, d, t_max, find_best=True,
            motion=scene.motion if moving else None, time=time,
        )
    return _assemble_hit(scene, o, d, t_max, tri_t, tri_idx, b1, b2,
                         time=time if moving else None)


def _assemble_hit(scene: Scene, o, d, t_max, tri_t, tri_idx, b1, b2,
                  time=None) -> Hit:
    return _assemble_hit_packed(scene, o, d, t_max, tri_t, tri_idx, b1, b2,
                                time=time)


def _assemble_hit_legacy(scene: Scene, o, d, t_max, tri_t, tri_idx,
                         b1, b2) -> Hit:
    sph_t, sph_idx = _sphere_hits(scene.spheres, o, d, t_max)

    use_sph = sph_t < tri_t
    t = jnp.where(use_sph, sph_t, tri_t)
    valid = t < INF

    ti = jnp.clip(tri_idx, 0, scene.tris.v0.shape[0] - 1)
    tris = scene.tris
    p_tri = tris.v0[ti] + b1[:, None] * tris.e1[ti] + b2[:, None] * tris.e2[ti]
    ng_tri = normalize(jnp.cross(tris.e1[ti], tris.e2[ti]))
    w = 1.0 - b1 - b2
    ns_tri = normalize(
        w[:, None] * tris.n0[ti] + b1[:, None] * tris.n1[ti] + b2[:, None] * tris.n2[ti]
    )
    uv_tri = jnp.stack([b1, b2], axis=-1)
    tex_tri = (
        w[:, None] * tris.uv0[ti] + b1[:, None] * tris.uv1[ti] + b2[:, None] * tris.uv2[ti]
    )
    mat_tri = tris.mat_id[ti]
    emit_tri = tris.emitter_id[ti]

    si = sph_idx
    # SAFE t for geometry construction: sphere-missing rays carry t = INF,
    # and inf positions NaN the reverse-mode pass through the masked
    # where (0 * NaN); the where below still selects the triangle fields
    t_sph = jnp.where(use_sph, sph_t, 1.0)
    p_sph = o + t_sph[:, None] * d
    ng_sph = normalize(p_sph - scene.spheres.center[si])
    mat_sph = scene.spheres.mat_id[si]
    emit_sph = scene.spheres.emitter_id[si]
    # sphere param uv (theta, phi) — used only for textures
    uv_sph = jnp.stack(
        [jnp.arccos(jnp.clip(ng_sph[..., 2], -1, 1)) / jnp.pi,
         (jnp.arctan2(ng_sph[..., 1], ng_sph[..., 0]) / (2 * jnp.pi)) + 0.5],
        axis=-1,
    )

    us = use_sph[:, None]
    p = jnp.where(us, p_sph, p_tri)
    ng = jnp.where(us, ng_sph, ng_tri)
    ns = jnp.where(us, ng_sph, ns_tri)
    uv = jnp.where(us, uv_sph, uv_tri)
    tex_uv = jnp.where(us, uv_sph, tex_tri)
    mat_id = jnp.where(use_sph, mat_sph, mat_tri)
    emitter_id = jnp.where(use_sph, emit_sph, emit_tri)
    prim = jnp.where(use_sph, ~si, tri_idx)

    return Hit(
        valid=valid,
        t=jnp.where(valid, t, INF),
        p=p,
        ng=ng,
        ns=ns,
        uv=uv,
        tex_uv=tex_uv,
        mat_id=jnp.where(valid, mat_id, 0),
        emitter_id=jnp.where(valid, emitter_id, -1),
        prim=prim,
    )


def _assemble_hit_packed(scene: Scene, o, d, t_max, tri_t, tri_idx,
                         b1, b2, time=None) -> Hit:
    """Hit assembly with ONE packed-row lookup (one-hot matmul for small
    scenes) instead of a dozen separate gathers.  The row matrix is built
    from the live triangle fields (gradients flow; hoisted out of scans).
    With `time`, the winner's vertex fields lerp to the ray's shutter
    time before shading-frame construction (motion blur)."""
    from drmlt_mitsuba_tpu.ops.gather import onehot_gather, pack_rows

    tris_ = scene.tris
    tri_shade = pack_rows(
        tris_.v0, tris_.e1, tris_.e2, tris_.n0, tris_.n1, tris_.n2,
        tris_.uv0, tris_.uv1, tris_.uv2, tris_.mat_id, tris_.emitter_id,
    )
    sph_t, sph_idx = _sphere_hits(scene.spheres, o, d, t_max)
    use_sph = sph_t < tri_t
    t = jnp.where(use_sph, sph_t, tri_t)
    valid = t < INF

    ti = jnp.clip(tri_idx, 0, scene.tris.v0.shape[0] - 1)
    row = onehot_gather(tri_shade, ti)          # (R, 26)
    geo = row[:, 0:18]
    if time is not None and scene.motion is not None:
        mo = scene.motion
        drow = onehot_gather(
            pack_rows(mo.dv0, mo.de1, mo.de2, mo.dn0, mo.dn1, mo.dn2), ti)
        geo = geo + time[:, None] * drow
    v0 = geo[:, 0:3]
    e1 = geo[:, 3:6]
    e2 = geo[:, 6:9]
    p_tri = v0 + b1[:, None] * e1 + b2[:, None] * e2
    ng_tri = normalize(jnp.cross(e1, e2))
    w = 1.0 - b1 - b2
    ns_tri = normalize(
        w[:, None] * geo[:, 9:12] + b1[:, None] * geo[:, 12:15]
        + b2[:, None] * geo[:, 15:18]
    )
    uv_tri = jnp.stack([b1, b2], axis=-1)
    tex_tri = (
        w[:, None] * row[:, 18:20] + b1[:, None] * row[:, 20:22]
        + b2[:, None] * row[:, 22:24]
    )
    mat_tri = row[:, 24].astype(jnp.int32)
    emit_tri = row[:, 25].astype(jnp.int32)

    si = sph_idx
    # SAFE t for geometry construction: sphere-missing rays carry t = INF,
    # and inf positions NaN the reverse-mode pass through the masked
    # where (0 * NaN); the where below still selects the triangle fields
    t_sph = jnp.where(use_sph, sph_t, 1.0)
    p_sph = o + t_sph[:, None] * d
    ng_sph = normalize(p_sph - scene.spheres.center[si])
    mat_sph = scene.spheres.mat_id[si]
    emit_sph = scene.spheres.emitter_id[si]
    uv_sph = jnp.stack(
        [jnp.arccos(jnp.clip(ng_sph[..., 2], -1, 1)) / jnp.pi,
         (jnp.arctan2(ng_sph[..., 1], ng_sph[..., 0]) / (2 * jnp.pi)) + 0.5],
        axis=-1,
    )

    us = use_sph[:, None]
    return Hit(
        valid=valid,
        t=jnp.where(valid, t, INF),
        p=jnp.where(us, p_sph, p_tri),
        ng=jnp.where(us, ng_sph, ng_tri),
        ns=jnp.where(us, ng_sph, ns_tri),
        uv=jnp.where(us, uv_sph, uv_tri),
        tex_uv=jnp.where(us, uv_sph, tex_tri),
        mat_id=jnp.where(valid, jnp.where(use_sph, mat_sph, mat_tri), 0),
        emitter_id=jnp.where(valid,
                             jnp.where(use_sph, emit_sph, emit_tri), -1),
        prim=jnp.where(use_sph, ~si, tri_idx),
    )


def intersect_and_occluded(scene: Scene, o, d, so, sd, s_tmax, time=None):
    """Fused closest-hit (o, d) + shadow any-hit (so, sd, s_tmax) query.

    On the Pallas path both ray sets go through ONE 2R-ray sweep (halves the
    kernel invocations per bounce and doubles the batch the kernel sees —
    the wavefront's two ray casts per vertex, SURVEY §2.8.6).
    Returns (Hit, blocked_mask).
    """
    R = o.shape[0]
    t_max = jnp.full((R,), INF)
    if scene.motion is not None and time is not None:
        hit = intersect(scene, o, d, time=time)
        return hit, occluded(scene, so, sd, s_tmax, time=time)
    if _use_pallas(scene, o) or _use_clusters(scene, o):
        rays6 = jnp.concatenate(
            [jnp.concatenate([o.T, d.T], axis=0),
             jnp.concatenate([so.T, sd.T], axis=0)], axis=1
        )
        t2, i2 = _sweep_any(scene, rays6)
        t, idx = t2[:R], i2[:R]
        ok = idx >= 0
        t = jnp.where(ok, t, INF)
        idx = jnp.where(ok, idx, -1)
        ti = jnp.clip(idx, 0, scene.tris.v0.shape[0] - 1)
        tris = scene.tris
        pvec = jnp.cross(d, tris.e2[ti])
        det = jnp.sum(tris.e1[ti] * pvec, axis=-1)
        inv = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
        tvec = o - tris.v0[ti]
        b1 = jnp.clip(jnp.sum(tvec * pvec, axis=-1) * inv, 0.0, 1.0)
        b2 = jnp.clip(
            jnp.sum(d * jnp.cross(tvec, tris.e1[ti]), axis=-1) * inv,
            0.0, 1.0,
        )
        hit = _assemble_hit(scene, o, d, t_max, t, idx, b1, b2)
        blocked_tri = (i2[R:] >= 0) & (t2[R:] < s_tmax)
        sph_t, _ = _sphere_hits(scene.spheres, so, sd, s_tmax)
        return hit, blocked_tri | (sph_t < INF)
    hit = intersect(scene, o, d)
    return hit, occluded(scene, so, sd, s_tmax)


def occluded(scene: Scene, o, d, t_max, time=None) -> jnp.ndarray:
    """Any-hit (shadow ray) query; t_max should already be shortened by eps."""
    moving = scene.motion is not None and time is not None
    if not moving and (_use_pallas(scene, o) or _use_clusters(scene, o)):
        rays6 = jnp.concatenate([o.T, d.T], axis=0)
        t, idx = _sweep_any(scene, rays6)
        tri_any = (idx >= 0) & (t < t_max)
    else:
        tri_any = _tri_sweep(scene.tris, o, d, t_max, find_best=False,
                             motion=scene.motion if moving else None,
                             time=time)
    sph_t, _ = _sphere_hits(scene.spheres, o, d, t_max)
    return tri_any | (sph_t < INF)
