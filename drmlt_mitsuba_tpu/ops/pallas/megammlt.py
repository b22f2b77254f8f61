"""Pallas MMLT megakernel: the whole selected-strategy MMLT trace in ONE
kernel.

Profiling (CLAUDE.md round 2) showed the XLA trace_mmlt is dominated by
the two subpath walks (~10 ms each at 65536 lanes, depth 6) — all
fusion-boundary HBM traffic, exactly like the unidirectional wavefront
before ops/pallas/megatrace.py.  This kernel runs the eye walk, the
light walk, the lane's selected (s, t) connection, the balance-heuristic
MIS recursion and the single shadow sweep with ALL state in VMEM: HBM
traffic is one read of u and one write of (pos, val).

Semantics mirror integrators/bidir.py:trace_mmlt EXACTLY (same PSS
layout, warps, pdf conversions, MIS recursion) so the two are
interchangeable in the MCMC stack; tests/test_megammlt.py pins
lane-for-lane agreement against the XLA path (which is itself pinned to
the dense all-strategy sweep).  Reference analog: PathSampler::EMMLT
(pathsampler.cpp:84-320) + Path::miWeight.

Scene subset (mega_mmlt_eligible): triangles + area emitters + constant
albedos + megatrace's BSDF kinds + pinhole perspective + no media.
Everything else falls back to the XLA trace; results never change, only
speed.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drmlt_mitsuba_tpu.ops.pallas.megatrace import (
    RAY_EPS, _CAM_COLS, _EM_COLS, _INF, _MAT_COLS, _TRI_COLS, _cross,
    _dot, _cosine_hemisphere, _eval_kinds, _lum, _normalize, _sample_kinds,
    _to_local, _to_world, mega_eligible, pack_mega_tables,
)
from drmlt_mitsuba_tpu.scene.types import Scene

_PI = math.pi


def mega_mmlt_eligible(scene: Scene, cfg) -> bool:
    """Static host-side check that the MMLT megakernel covers this
    scene/config (megatrace's scene subset; surface-only, pinhole)."""
    if getattr(cfg, "thinlens", False) or getattr(cfg, "medium", False):
        return False

    class _P:   # adapt: mega_eligible reads path-config style fields
        thinlens = False
    return mega_eligible(scene, _P)


def _mat_select(mat_ref, n_mats, mat_id, shape, with_tid=False):
    """Row-select the material attribute tiles for per-lane mat ids."""
    f32 = jnp.float32
    zero = jnp.zeros(shape, f32)
    out = dict(kind=zero, alx=zero, aly=zero, alz=zero, etx=zero, ety=zero,
               etz=zero, kx=zero, ky=zero, kz=zero,
               rough=jnp.full(shape, 1e-3, f32),
               srx=zero, sry=zero, srz=zero, stx=zero, sty=zero, stz=zero)
    keys = ["kind", "alx", "aly", "alz", "etx", "ety", "etz", "kx", "ky",
            "kz", "rough", "srx", "sry", "srz", "stx", "sty", "stz"]
    if with_tid:
        out["tid"] = jnp.full(shape, -1.0, f32)
        keys = keys + ["tid"]
    for m in range(n_mats):
        sel = mat_id == m
        for c, k in enumerate(keys):
            out[k] = jnp.where(sel, mat_ref[m, c], out[k])
    return out


def _tex_override(mt, tex_ref, tex_shape, shape, tu, tv):
    """Replace the constant albedo with the bitmap fetch where the
    material carries a texture id (mirrors path_trace_tile)."""
    from drmlt_mitsuba_tpu.ops.pallas.megatrace import tex_albedo_tile

    tr, tg, tb = tex_albedo_tile(tex_ref, tex_shape, shape, mt["tid"],
                                 tu, tv)
    has_t = mt["tid"] >= 0
    mt = dict(mt)
    mt["alx"] = jnp.where(has_t, tr, mt["alx"])
    mt["aly"] = jnp.where(has_t, tg, mt["aly"])
    mt["alz"] = jnp.where(has_t, tb, mt["alz"])
    return mt


def _closest_sweep(tri_ref, n_tris, shape, ox, oy, oz, dx, dy, dz):
    f32 = jnp.float32
    zero = jnp.zeros(shape, f32)

    def body(t, carry):
        (best_t, av) = carry
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
        new_av = tuple(jnp.where(hit, tri_ref[t, c], av[c])
                       for c in range(_TRI_COLS))
        return (best_t, new_av)

    init_av = tuple(zero for _ in range(_TRI_COLS))
    init_av = init_av[:19] + (jnp.full(shape, -1.0, f32),)
    return jax.lax.fori_loop(
        0, n_tris, body, (jnp.full(shape, _INF, f32), init_av))


def _shadow_sweep(tri_ref, n_tris, shape, ox, oy, oz, dx, dy, dz, tmax):
    def body(t, blocked):
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
               & (tt > RAY_EPS) & (tt < tmax))
        return jnp.where(hit, 1.0, blocked)

    return jax.lax.fori_loop(
        0, n_tris, body, jnp.zeros(shape, jnp.float32)) > 0.5


_VTX_KEYS = ("px", "py", "pz", "nsx", "nsy", "nsz", "ngx", "ngy", "ngz",
             "wix", "wiy", "wiz", "bx", "by", "bz", "mat", "valid",
             "esc", "tu", "tv")


def _sphere_closest(sph_ref, n_sphs, shape, ox, oy, oz, dx, dy, dz,
                    best_t):
    """Analytic sphere sweep (mirrors megatrace.sphere_closest): returns
    (t, hit_any, cx, cy, cz, r, mat, erow) of the winner."""
    f32 = jnp.float32
    zero = jnp.zeros(shape, f32)
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


def _sphere_blocked(sph_ref, n_sphs, shape, ox, oy, oz, dx, dy, dz, tmax):
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


def _sel_init(shape):
    # NOTE: "valid" rides as f32 0/1 — Mosaic (2026-08 jaxlib) fails on
    # i8->i1 truncation when i1 vectors flow through select chains (same
    # workaround as megatrace's shadow sweep)
    z = jnp.zeros(shape, jnp.float32)
    return {k: z for k in _VTX_KEYS}


def _sel_copy(dst, sel, src):
    return {k: jnp.where(sel, src[k], dst[k]) for k in _VTX_KEYS}


def _mega_mmlt_kernel(tri_ref, mat_ref, em_ref, cam_ref, u_ref,
                      tri_vmem_ref, sph_ref, tex_ref, env_tab_ref, *refs,
                      n_tris, n_mats, n_ems, max_depth, light_image, kinds,
                      eye_dims, clu_tpc=0, clu_passes=2, env_const=False,
                      n_sphs=0, tex_shape=None, env_shape=None):
    """One MMLT mutation trace per lane (8, L) tile."""
    if clu_tpc:
        clu_aabb_ref, clu_tri_ref, out_ref = refs
    else:
        clu_aabb_ref = clu_tri_ref = None
        (out_ref,) = refs
    vx, vy, vz, opx, opy = mmlt_trace_tile(
        tri_ref, mat_ref, em_ref, cam_ref, lambda j: u_ref[j],
        u_ref.shape[1:], n_tris=n_tris, n_mats=n_mats, n_ems=n_ems,
        max_depth=max_depth, light_image=light_image, kinds=kinds,
        eye_dims=eye_dims, tri_vmem_ref=tri_vmem_ref,
        clu_aabb_ref=clu_aabb_ref, clu_tri_ref=clu_tri_ref,
        clu_tpc=clu_tpc, clu_passes=clu_passes, env_const=env_const,
        sph_ref=sph_ref, n_sphs=n_sphs, tex_ref=tex_ref,
        tex_shape=tex_shape, env_tab_ref=env_tab_ref,
        env_shape=env_shape)
    out_ref[0] = vx
    out_ref[1] = vy
    out_ref[2] = vz
    out_ref[3] = opx
    out_ref[4] = opy


def mmlt_trace_tile(tri_ref, mat_ref, em_ref, cam_ref, udim, shape, *,
                    n_tris, n_mats, n_ems, max_depth, light_image, kinds,
                    eye_dims, tri_vmem_ref=None, clu_aabb_ref=None,
                    clu_tri_ref=None, clu_tpc=0, clu_passes=2,
                    env_const=False, sph_ref=None, n_sphs=0,
                    tex_ref=None, tex_shape=None, env_tab_ref=None,
                    env_shape=None):
    """The whole selected-strategy MMLT trace on one (8, L) tile.

    `udim(j)` yields PSS dim j as a tile (a ref read for the one-shot
    kernel; a live VMEM value inside the multi-mutation DRMLT kernel).
    Returns (vx, vy, vz, pos_x, pos_y) with the n_strats * max_depth
    strategy/depth-pmf scaling applied to the value.
    """
    f32 = jnp.float32
    zero = jnp.zeros(shape, f32)
    one = jnp.ones(shape, f32)
    fbool = jnp.zeros(shape, bool)
    n_eye = max_depth + 1
    n_light = max_depth

    # ---- technique dims --------------------------------------------------
    depth = jnp.minimum(jnp.floor(udim(0) * max_depth), max_depth - 1.0) + 1.0
    n_strats = depth + 1.0
    s_pick = jnp.minimum(jnp.floor(udim(1) * n_strats), depth)
    t_pick = depth + 1.0 - s_pick
    case_hit = s_pick == 0
    case_lt = t_pick == 1

    ev = jnp.clip(t_pick - 1.0, 0.0, n_eye - 1.0)
    ev0 = jnp.clip(t_pick - 2.0, 0.0, n_eye - 1.0)
    lv = jnp.clip(s_pick - 1.0, 0.0, n_light - 1.0)
    lv0 = jnp.clip(s_pick - 2.0, 0.0, n_light - 1.0)

    cam_fx = jnp.broadcast_to(cam_ref[0, 2], shape)
    cam_fy = jnp.broadcast_to(cam_ref[0, 5], shape)
    cam_fz = jnp.broadcast_to(cam_ref[0, 8], shape)
    cam_ox = jnp.broadcast_to(cam_ref[0, 9], shape)
    cam_oy = jnp.broadcast_to(cam_ref[0, 10], shape)
    cam_oz = jnp.broadcast_to(cam_ref[0, 11], shape)
    film_area = 4.0 * cam_ref[0, 12] * cam_ref[0, 13]

    # =====================================================================
    # generic walk: returns per-slot MIS scalars + selected vertices
    # =====================================================================
    def walk(o0, d0, beta0, pdf0_sa, src_p, src_ns, n_slots, ubase,
             per_step, importance_mode, sel_slots, endpoint):
        """sel_slots: dict name -> float tile of the slot index to capture.
        endpoint: dict with slot-0 fields (pdf_fwd, delta) and vertex data
        captured when a selected slot == 0."""
        pdf_fwd = [zero] * n_slots
        pdf_rev = [zero] * n_slots
        delta_s = [fbool] * n_slots
        valid_s = [fbool] * n_slots
        pdf_fwd[0] = endpoint["pdf_fwd"]
        delta_s[0] = endpoint["delta"]
        valid_s[0] = endpoint["valid"]
        sel = {name: _sel_copy(_sel_init(shape), idx == 0.0,
                               endpoint["vertex"])
               for name, idx in sel_slots.items()}
        erow_sel = {name: jnp.full(shape, -1.0, f32) for name in sel_slots}
        erad_sel = {name: (zero, zero, zero) for name in sel_slots}

        ox, oy, oz = o0
        dx, dy, dz = d0
        bx, by, bz = beta0
        pdf_sa = pdf0_sa
        act = endpoint["valid"]
        ppx, ppy, ppz = src_p
        pnx, pny, pnz = src_ns

        for v in range(1, n_slots):
            if clu_aabb_ref is not None:
                from drmlt_mitsuba_tpu.ops.pallas.cluster_sweep import (
                    closest_sweep_clustered,
                )
                from drmlt_mitsuba_tpu.ops.pallas.megatrace import (
                    fetch_tri_attrs_split,
                )
                best_t, best_id = closest_sweep_clustered(
                    clu_aabb_ref, clu_tri_ref, clu_aabb_ref.shape[0],
                    clu_tpc, clu_passes, shape, ox, oy, oz, dx, dy, dz)
                av = fetch_tri_attrs_split(
                    tri_vmem_ref, shape, best_id,
                    with_uv=tex_shape is not None)
                # exact-f32 hit-distance recompute (traversal = bf16
                # planes; av carries the 3-pass exact attributes)
                pxr, pyr, pzr = _cross(dx, dy, dz, av[6], av[7], av[8])
                detr = av[3] * pxr + av[4] * pyr + av[5] * pzr
                okr = jnp.abs(detr) > 1e-12
                invr = 1.0 / jnp.where(okr, detr, 1.0)
                txr, tyr, tzr = ox - av[0], oy - av[1], oz - av[2]
                qxr, qyr, qzr = _cross(txr, tyr, tzr,
                                       av[3], av[4], av[5])
                ttr = (av[6] * qxr + av[7] * qyr + av[8] * qzr) * invr
                best_t = jnp.where((best_id >= 0) & okr & (ttr > 0),
                                   ttr, best_t)
            elif tri_vmem_ref is not None and (n_tris > 512
                                               or tex_shape is not None):
                from drmlt_mitsuba_tpu.ops.pallas.megatrace import (
                    closest_sweep_idx, fetch_tri_attrs,
                )
                best_t, best_id = closest_sweep_idx(
                    tri_ref, n_tris, shape, ox, oy, oz, dx, dy, dz)
                av = fetch_tri_attrs(tri_vmem_ref, n_tris, shape, best_id)
            else:
                best_t, av = _closest_sweep(tri_ref, n_tris, shape,
                                            ox, oy, oz, dx, dy, dz)
            use_sph = jnp.zeros(shape, bool)
            if n_sphs:
                (best_t, use_sph, scx, scy, scz, srr, smat,
                 sem) = _sphere_closest(sph_ref, n_sphs, shape,
                                        ox, oy, oz, dx, dy, dz, best_t)
            hit_valid = best_t < _INF
            t_hit = jnp.where(hit_valid, best_t, _INF)
            # escaped: the segment entering THIS slot left the scene —
            # wi/beta below stay meaningful for constant-env eval
            # (mirrors SubpathSoA.escaped, bidir.py:131)
            escaped = act & ~hit_valid
            active = act & hit_valid
            v0x, v0y, v0z = av[0], av[1], av[2]
            e1x, e1y, e1z = av[3], av[4], av[5]
            e2x, e2y, e2z = av[6], av[7], av[8]
            mat_id = av[18]
            erow = jnp.where(hit_valid, av[19], -1.0)
            if n_sphs:
                mat_id = jnp.where(use_sph, smat, mat_id)
                erow = jnp.where(use_sph, sem, erow)
            hpx = ox + t_hit * dx
            hpy = oy + t_hit * dy
            hpz = oz + t_hit * dz
            px, py, pz = _cross(dx, dy, dz, e2x, e2y, e2z)
            det = e1x * px + e1y * py + e1z * pz
            inv = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
            tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
            b1 = jnp.clip((tx * px + ty * py + tz * pz) * inv, 0.0, 1.0)
            qx, qy, qz = _cross(tx, ty, tz, e1x, e1y, e1z)
            b2 = jnp.clip((dx * qx + dy * qy + dz * qz) * inv, 0.0, 1.0)
            w0 = 1.0 - b1 - b2
            ngx, ngy, ngz = _normalize(
                *_cross(e1x, e1y, e1z, e2x, e2y, e2z))
            nsx = w0 * av[9] + b1 * av[12] + b2 * av[15]
            nsy = w0 * av[10] + b1 * av[13] + b2 * av[16]
            nsz = w0 * av[11] + b1 * av[14] + b2 * av[17]
            nsx, nsy, nsz = _normalize(nsx, nsy, nsz)
            if n_sphs:
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
            if tex_shape is not None:
                from drmlt_mitsuba_tpu.ops.pallas.megatrace import (
                    _acos as _tacos, _atan2 as _tatan2,
                )
                tuc = w0 * av[20] + b1 * av[22] + b2 * av[24]
                tvc = w0 * av[21] + b1 * av[23] + b2 * av[25]
                if n_sphs:
                    stu = _tacos(jnp.clip(sngz, -1.0, 1.0)) / _PI
                    stv = _tatan2(sngy, sngx) / (2.0 * _PI) + 0.5
                    tuc = jnp.where(use_sph, stu, tuc)
                    tvc = jnp.where(use_sph, stv, tvc)
            else:
                tuc = tvc = zero

            # pdf_fwd: prev dir pdf -> area at this vertex
            segx, segy, segz = hpx - ppx, hpy - ppy, hpz - ppz
            d2 = jnp.maximum(segx * segx + segy * segy + segz * segz, 1e-20)
            dinv = jax.lax.rsqrt(d2)
            wx, wy, wz = segx * dinv, segy * dinv, segz * dinv
            cos_to = jnp.abs(wx * ngx + wy * ngy + wz * ngz)
            pdf_fwd[v] = jnp.where(active, pdf_sa * cos_to / d2, 0.0)
            valid_s[v] = active

            mt = _mat_select(mat_ref, n_mats, mat_id, shape,
                             with_tid=tex_shape is not None)
            if tex_shape is not None:
                mt = _tex_override(mt, tex_ref, tex_shape, shape, tuc, tvc)
            kind = mt["kind"]
            is_delta = fbool
            from drmlt_mitsuba_tpu.ops.pallas.megatrace import _DELTA_KINDS
            for kk in _DELTA_KINDS:
                if kk in kinds:
                    is_delta = is_delta | (kind == kk)
            delta_s[v] = is_delta & active

            wiwx, wiwy, wiwz = -dx, -dy, -dz
            vtx = dict(px=hpx, py=hpy, pz=hpz, nsx=nsx, nsy=nsy, nsz=nsz,
                       ngx=ngx, ngy=ngy, ngz=ngz,
                       wix=wiwx, wiy=wiwy, wiz=wiwz,
                       bx=jnp.where(act, bx, 0.0),
                       by=jnp.where(act, by, 0.0),
                       bz=jnp.where(act, bz, 0.0),
                       mat=mat_id,
                       valid=jnp.where(active, 1.0, 0.0),
                       esc=jnp.where(escaped, 1.0, 0.0),
                       tu=tuc, tv=tvc)
            for name, idx in sel_slots.items():
                m = idx == float(v)
                sel[name] = _sel_copy(sel[name], m, vtx)
                erow_sel[name] = jnp.where(m, erow, erow_sel[name])

            # BSDF sample + reverse pdf (mirrors _walk)
            wix, wiy, wiz = _to_local((nsx, nsy, nsz), (wiwx, wiwy, wiwz))
            cos_i = wiz
            sign_i = jnp.where(cos_i == 0, 1.0, jnp.sign(cos_i))
            # the final slot samples no direction — its bounce dims are
            # zeros in the XLA layout (eye/light_subpath zero-pad the last
            # step), so consume zeros here too for lane equality
            if v == n_slots - 1:
                ub = [zero, zero, zero]
            else:
                ub = [udim(ubase + (v - 1) * per_step + j) for j in range(3)]
            (swx, swy, swz, bwx, bwy, bwz, bs_pdf, bs_delta,
             _bs_eta) = _sample_kinds(
                kinds, kind, cos_i, sign_i, wix, wiy, wiz,
                ub[0], ub[1], ub[2],
                mt["alx"], mt["aly"], mt["alz"], mt["etx"], mt["ety"],
                mt["etz"], mt["kx"], mt["ky"], mt["kz"], mt["rough"],
                mt["srx"], mt["sry"], mt["srz"], mt["stx"], mt["sty"],
                mt["stz"], shape)
            wowx, wowy, wowz = _to_world((nsx, nsy, nsz), (swx, swy, swz))
            # reverse pdf of the PREVIOUS vertex (slot v-1)
            _fx, _fy, _fz, rev_sa = _eval_kinds(
                kinds, kind, swz, swx, swy, swz, wix, wiy, wiz,
                mt["alx"], mt["aly"], mt["alz"], mt["etx"], mt["ety"],
                mt["etz"], mt["kx"], mt["ky"], mt["kz"], mt["rough"],
                mt["srx"], mt["sry"], mt["srz"], shape)
            cos_prev = jnp.abs(wx * pnx + wy * pny + wz * pnz)
            # Dirac bounces store reverse pdf 1*conversion, matching the
            # forward pdf_sa convention below (see bidir.py _walk; fixes
            # the delta-chain MIS bias measured on mirror Cornell)
            rev_sa = jnp.where(bs_delta, 1.0, rev_sa)
            pdf_rev[v - 1] = jnp.where(active, rev_sa * cos_prev / d2, 0.0)

            bnx = bx * bwx
            bny = by * bwy
            bnz = bz * bwz
            if importance_mode:
                num = (jnp.abs(wiwx * nsx + wiwy * nsy + wiwz * nsz)
                       * jnp.abs(wowx * ngx + wowy * ngy + wowz * ngz))
                den = (jnp.abs(wiwx * ngx + wiwy * ngy + wiwz * ngz)
                       * jnp.abs(wowx * nsx + wowy * nsy + wowz * nsz))
                corr = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0),
                                 1.0)
                bnx, bny, bnz = bnx * corr, bny * corr, bnz * corr

            cont = active & (_lum(bnx, bny, bnz) > 0) & ((bs_pdf > 0)
                                                         | bs_delta)
            eps_n = RAY_EPS * jnp.maximum(1.0, t_hit)
            ox = jnp.where(active, hpx + wowx * eps_n, ox)
            oy = jnp.where(active, hpy + wowy * eps_n, oy)
            oz = jnp.where(active, hpz + wowz * eps_n, oz)
            dx = jnp.where(active, wowx, dx)
            dy = jnp.where(active, wowy, dy)
            dz = jnp.where(active, wowz, dz)
            bx = jnp.where(cont, bnx, 0.0)
            by = jnp.where(cont, bny, 0.0)
            bz = jnp.where(cont, bnz, 0.0)
            pdf_sa = jnp.where(bs_delta, 1.0, bs_pdf)
            act = cont
            ppx, ppy, ppz = (jnp.where(active, hpx, ppx),
                             jnp.where(active, hpy, ppy),
                             jnp.where(active, hpz, ppz))
            pnx, pny, pnz = (jnp.where(active, nsx, pnx),
                             jnp.where(active, nsy, pny),
                             jnp.where(active, nsz, pnz))

        return dict(pdf_fwd=pdf_fwd, pdf_rev=pdf_rev, delta=delta_s,
                    valid=valid_s, sel=sel, erow=erow_sel)

    # =====================================================================
    # eye walk
    # =====================================================================
    ux, uy = udim(2), udim(3)
    x = (2.0 * ux - 1.0) * cam_ref[0, 12]
    y = (1.0 - 2.0 * uy) * cam_ref[0, 13]
    edx = cam_ref[0, 0] * x + cam_ref[0, 1] * y + cam_ref[0, 2]
    edy = cam_ref[0, 3] * x + cam_ref[0, 4] * y + cam_ref[0, 5]
    edz = cam_ref[0, 6] * x + cam_ref[0, 7] * y + cam_ref[0, 8]
    edx, edy, edz = _normalize(edx, edy, edz)
    cos0 = edx * cam_fx + edy * cam_fy + edz * cam_fz
    pdf0 = jnp.where(cos0 > 1e-6,
                     1.0 / (film_area * jnp.maximum(cos0, 1e-6) ** 3), 0.0)
    cam_vtx = dict(px=cam_ox, py=cam_oy, pz=cam_oz,
                   nsx=cam_fx, nsy=cam_fy, nsz=cam_fz,
                   ngx=cam_fx, ngy=cam_fy, ngz=cam_fz,
                   wix=-cam_fx, wiy=-cam_fy, wiz=-cam_fz,
                   bx=one, by=one, bz=one, mat=zero, valid=one,
                   esc=zero, tu=zero, tv=zero)
    E = walk(
        (cam_ox, cam_oy, cam_oz), (edx, edy, edz), (one, one, one), pdf0,
        (cam_ox, cam_oy, cam_oz), (cam_fx, cam_fy, cam_fz),
        n_eye, 4, 3, True,
        dict(ev=ev, ev0=ev0),
        dict(pdf_fwd=one, delta=jnp.ones(shape, bool),
             valid=jnp.ones(shape, bool), vertex=cam_vtx),
    )

    # =====================================================================
    # light walk (area emitters only)
    # =====================================================================
    lbase = 2 + eye_dims
    u_pick = udim(lbase)
    row = zero
    for e in range(n_ems):
        row = row + jnp.where(u_pick >= em_ref[e, 5], 1.0, 0.0)
    row = jnp.minimum(row, float(max(n_ems - 1, 0)))
    l_radx = l_rady = l_radz = zero
    l_area = one
    l_pmf = zero
    lv0x = lv0y = lv0z = zero
    le1x = le1y = le1z = zero
    le2x = le2y = le2z = zero
    lngx = lngy = lngz = zero
    for e in range(n_ems):
        selr = row == e
        l_radx = jnp.where(selr, em_ref[e, 0], l_radx)
        l_rady = jnp.where(selr, em_ref[e, 1], l_rady)
        l_radz = jnp.where(selr, em_ref[e, 2], l_radz)
        l_area = jnp.where(selr, em_ref[e, 3], l_area)
        l_pmf = jnp.where(selr, em_ref[e, 4], l_pmf)
        lv0x = jnp.where(selr, em_ref[e, 6], lv0x)
        lv0y = jnp.where(selr, em_ref[e, 7], lv0y)
        lv0z = jnp.where(selr, em_ref[e, 8], lv0z)
        le1x = jnp.where(selr, em_ref[e, 9], le1x)
        le1y = jnp.where(selr, em_ref[e, 10], le1y)
        le1z = jnp.where(selr, em_ref[e, 11], le1z)
        le2x = jnp.where(selr, em_ref[e, 12], le2x)
        le2y = jnp.where(selr, em_ref[e, 13], le2y)
        le2z = jnp.where(selr, em_ref[e, 14], le2z)
        lngx = jnp.where(selr, em_ref[e, 15], lngx)
        lngy = jnp.where(selr, em_ref[e, 16], lngy)
        lngz = jnp.where(selr, em_ref[e, 17], lngz)
    l_kind = zero
    for e in range(n_ems):
        l_kind = jnp.where(row == e, em_ref[e, 18], l_kind)
    tw = jnp.sqrt(jnp.maximum(1.0 - udim(lbase + 1), 0.0))
    lb0 = 1.0 - tw
    lb1 = tw * udim(lbase + 2)
    p0x = lv0x + lb0 * le1x + lb1 * le2x
    p0y = lv0y + lb0 * le1y + lb1 * le2y
    p0z = lv0z + lb0 * le1z + lb1 * le2z
    pdf_pos = l_pmf / jnp.maximum(l_area, 1e-20)
    # only AREA rows start light walks (light_subpath marks env/delta-dir
    # rows invalid; their transport reaches the film via s=0 at weight 1)
    valid0 = (l_pmf > 0) & (l_kind == 0.0)
    cx, cy, cz = _cosine_hemisphere(udim(lbase + 3), udim(lbase + 4))
    ldx, ldy, ldz = _to_world((lngx, lngy, lngz), (cx, cy, cz))
    pdf_dir = jnp.maximum(cz, 1e-12) / _PI
    cos_l0 = jnp.maximum(cz, 0.0)
    bscale = cos_l0 / jnp.maximum(pdf_pos * pdf_dir, 1e-30)
    lb_x = l_radx * bscale
    lb_y = l_rady * bscale
    lb_z = l_radz * bscale
    l_end_bx = jnp.where(valid0, l_radx / jnp.maximum(pdf_pos, 1e-20), 0.0)
    l_end_by = jnp.where(valid0, l_rady / jnp.maximum(pdf_pos, 1e-20), 0.0)
    l_end_bz = jnp.where(valid0, l_radz / jnp.maximum(pdf_pos, 1e-20), 0.0)
    light_vtx = dict(px=p0x, py=p0y, pz=p0z,
                     nsx=lngx, nsy=lngy, nsz=lngz,
                     ngx=lngx, ngy=lngy, ngz=lngz,
                     wix=lngx, wiy=lngy, wiz=lngz,
                     bx=l_end_bx, by=l_end_by, bz=l_end_bz,
                     mat=zero, valid=jnp.where(valid0, 1.0, 0.0),
                     esc=zero, tu=zero, tv=zero)
    o0x = p0x + ldx * (RAY_EPS * 10.0)
    o0y = p0y + ldy * (RAY_EPS * 10.0)
    o0z = p0z + ldz * (RAY_EPS * 10.0)
    LW = walk(
        (o0x, o0y, o0z), (ldx, ldy, ldz),
        (jnp.where(valid0, lb_x, 0.0), jnp.where(valid0, lb_y, 0.0),
         jnp.where(valid0, lb_z, 0.0)),
        pdf_dir, (p0x, p0y, p0z), (lngx, lngy, lngz),
        n_light, lbase + 5, 3, False,
        dict(lv=lv, lv0=lv0),
        dict(pdf_fwd=pdf_pos, delta=fbool, valid=valid0, vertex=light_vtx),
    )
    # light endpoint reverse pdf: generated from bounce vertex 1 — the walk
    # stored it at pdf_rev[0]; for the MIS list that IS slot 0's rev pdf.
    L_pdf_fwd, L_pdf_rev = LW["pdf_fwd"], LW["pdf_rev"]
    L_delta, L_valid = LW["delta"], LW["valid"]
    E_pdf_fwd, E_pdf_rev = E["pdf_fwd"], E["pdf_rev"]
    E_delta, E_valid = E["delta"], E["valid"]
    E_pdf_rev[0] = zero

    Se, Se0 = E["sel"]["ev"], E["sel"]["ev0"]
    Sl, Sl0 = LW["sel"]["lv"], LW["sel"]["lv0"]
    erow_ev = E["erow"]["ev"]

    # =====================================================================
    # case s = 0: the selected eye vertex IS the emitter
    # =====================================================================
    he_radx = he_rady = he_radz = zero
    he_area = one
    he_pmf = zero
    for e in range(n_ems):
        selr = erow_ev == e
        he_radx = jnp.where(selr, em_ref[e, 0], he_radx)
        he_rady = jnp.where(selr, em_ref[e, 1], he_rady)
        he_radz = jnp.where(selr, em_ref[e, 2], he_radz)
        he_area = jnp.where(selr, em_ref[e, 3], he_area)
        he_pmf = jnp.where(selr, em_ref[e, 4], he_pmf)
    cos_e_hit = (Se["wix"] * Se["ngx"] + Se["wiy"] * Se["ngy"]
                 + Se["wiz"] * Se["ngz"])
    ok_hit = (case_hit & (Se["valid"] > 0.5) & (erow_ev >= 0)
              & (cos_e_hit > 0))
    ch_x = Se["bx"] * he_radx
    ch_y = Se["by"] * he_rady
    ch_z = Se["bz"] * he_radz

    # =====================================================================
    # connection geometry (conn + light tracing share it; ev=0 for t=1)
    # =====================================================================
    dvx = Se["px"] - Sl["px"]
    dvy = Se["py"] - Sl["py"]
    dvz = Se["pz"] - Sl["pz"]
    dist2 = dvx * dvx + dvy * dvy + dvz * dvz
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
    wlx, wly, wlz = dvx / dist, dvy / dist, dvz / dist
    cos_l = jnp.abs(wlx * Sl["ngx"] + wly * Sl["ngy"] + wlz * Sl["ngz"])
    cos_e = jnp.abs(wlx * Se["ngx"] + wly * Se["ngy"] + wlz * Se["ngz"])
    safe_d2 = jnp.maximum(dist2, 1e-20)
    g = cos_l * cos_e / safe_d2

    is_s1 = s_pick == 1
    # light end: area-emitter endpoint lobe for s=1, BSDF otherwise
    front = (wlx * Sl["ngx"] + wly * Sl["ngy"] + wlz * Sl["ngz"]) > 0
    mtl = _mat_select(mat_ref, n_mats, Sl["mat"], shape,
                      with_tid=tex_shape is not None)
    if tex_shape is not None:
        mtl = _tex_override(mtl, tex_ref, tex_shape, shape,
                            Sl["tu"], Sl["tv"])
    wl_loc = _to_local((Sl["nsx"], Sl["nsy"], Sl["nsz"]), (wlx, wly, wlz))
    wi_l_loc = _to_local((Sl["nsx"], Sl["nsy"], Sl["nsz"]),
                         (Sl["wix"], Sl["wiy"], Sl["wiz"]))
    flx_c, fly_c, flz_c, pdf_l_fwd = _eval_kinds(
        kinds, mtl["kind"], wi_l_loc[2], *wi_l_loc, *wl_loc,
        mtl["alx"], mtl["aly"], mtl["alz"], mtl["etx"], mtl["ety"],
        mtl["etz"], mtl["kx"], mtl["ky"], mtl["kz"], mtl["rough"],
        mtl["srx"], mtl["sry"], mtl["srz"], shape)
    inv_cos_wl = 1.0 / jnp.maximum(jnp.abs(wl_loc[2]), 1e-9)
    flx = flx_c * inv_cos_wl
    fly = fly_c * inv_cos_wl
    flz = flz_c * inv_cos_wl
    f_l_ep = jnp.where(front, 1.0, 0.0)
    flx = jnp.where(is_s1, f_l_ep, flx)
    fly = jnp.where(is_s1, f_l_ep, fly)
    flz = jnp.where(is_s1, f_l_ep, flz)

    # eye end: BSDF (t >= 2) or sensor importance (t = 1)
    mte = _mat_select(mat_ref, n_mats, Se["mat"], shape,
                      with_tid=tex_shape is not None)
    if tex_shape is not None:
        mte = _tex_override(mte, tex_ref, tex_shape, shape,
                            Se["tu"], Se["tv"])
    we_loc = _to_local((Se["nsx"], Se["nsy"], Se["nsz"]),
                       (-wlx, -wly, -wlz))
    wi_e_loc = _to_local((Se["nsx"], Se["nsy"], Se["nsz"]),
                         (Se["wix"], Se["wiy"], Se["wiz"]))
    fex_c, fey_c, fez_c, pdf_e_fwd = _eval_kinds(
        kinds, mte["kind"], wi_e_loc[2], *wi_e_loc, *we_loc,
        mte["alx"], mte["aly"], mte["alz"], mte["etx"], mte["ety"],
        mte["etz"], mte["kx"], mte["ky"], mte["kz"], mte["rough"],
        mte["srx"], mte["sry"], mte["srz"], shape)
    inv_cos_we = 1.0 / jnp.maximum(jnp.abs(we_loc[2]), 1e-9)
    fex = fex_c * inv_cos_we
    fey = fey_c * inv_cos_we
    fez = fez_c * inv_cos_we
    # sensor importance for -w_le (pinhole; mirrors sensor_importance)
    cosv = -(wlx * cam_fx + wly * cam_fy + wlz * cam_fz)
    inv_cosv = 1.0 / jnp.maximum(cosv, 1e-6)
    # camera left/up columns
    x_cam = -(wlx * cam_ref[0, 0] + wly * cam_ref[0, 3]
              + wlz * cam_ref[0, 6]) * inv_cosv
    y_cam = -(wlx * cam_ref[0, 1] + wly * cam_ref[0, 4]
              + wlz * cam_ref[0, 7]) * inv_cosv
    fu = (x_cam / cam_ref[0, 12] + 1.0) * 0.5
    fv = (1.0 - y_cam / cam_ref[0, 13]) * 0.5
    inside = ((cosv > 1e-6) & (fu >= 0) & (fu < 1) & (fv >= 0) & (fv < 1))
    we_imp = jnp.where(
        inside, 1.0 / (film_area * jnp.maximum(cosv, 1e-6) ** 4), 0.0)
    fex = jnp.where(case_lt, we_imp, fex)
    fey = jnp.where(case_lt, we_imp, fey)
    fez = jnp.where(case_lt, we_imp, fez)

    cc_x = Sl["bx"] * flx * fex * Se["bx"] * g
    cc_y = Sl["by"] * fly * fey * Se["by"] * g
    cc_z = Sl["bz"] * flz * fez * Se["bz"] * g

    # boolean algebra, not where: an i1-vector select lowers to a
    # trunci i8->i1 Mosaic rejects (caught on-chip 2026-08-20, first
    # GLASS scene through this kernel on real TPU)
    l_deltab = ~is_s1 & _delta_at(L_delta, lv, shape)
    e_deltab = _delta_at(E_delta, ev, shape)
    case_conn = ~case_hit & ~case_lt
    ok_conn = (case_conn & (Sl["valid"] > 0.5) & (Se["valid"] > 0.5)
               & ~l_deltab & ~e_deltab & (dist2 > 1e-12))
    ok_lt = (case_lt & (Sl["valid"] > 0.5)
             & ~_delta_at(L_delta, lv, shape)
             & inside & (dist2 > 1e-12))
    if not light_image:
        ok_lt = jnp.zeros(shape, bool)
    ok_c = (ok_conn | ok_lt) & (_lum(cc_x, cc_y, cc_z) > 0)

    sh_eps = RAY_EPS * jnp.maximum(1.0, dist)
    if clu_aabb_ref is not None:
        from drmlt_mitsuba_tpu.ops.pallas.cluster_sweep import (
            shadow_sweep_clustered,
        )
        blocked = shadow_sweep_clustered(
            clu_aabb_ref, clu_tri_ref, clu_aabb_ref.shape[0], clu_tpc,
            clu_passes, shape,
            Sl["px"] + wlx * sh_eps, Sl["py"] + wly * sh_eps,
            Sl["pz"] + wlz * sh_eps, wlx, wly, wlz,
            jnp.where(ok_c, dist * (1.0 - 1e-3), 0.0))
    else:
        blocked = _shadow_sweep(
            tri_ref, n_tris, shape,
            Sl["px"] + wlx * sh_eps, Sl["py"] + wly * sh_eps,
            Sl["pz"] + wlz * sh_eps, wlx, wly, wlz,
            jnp.where(ok_c, dist * (1.0 - 1e-3), 0.0))
    if n_sphs:
        blocked = blocked | _sphere_blocked(
            sph_ref, n_sphs, shape,
            Sl["px"] + wlx * sh_eps, Sl["py"] + wly * sh_eps,
            Sl["pz"] + wlz * sh_eps, wlx, wly, wlz,
            jnp.where(ok_c, dist * (1.0 - 1e-3), 0.0))
    ok_c = ok_c & ~blocked

    # =====================================================================
    # junction pdfs
    # =====================================================================
    def sa_to_area(pdf_sa, fx_, fy_, fz_, tx_, ty_, tz_, nx_, ny_, nz_):
        sx, sy, sz = tx_ - fx_, ty_ - fy_, tz_ - fz_
        d2 = jnp.maximum(sx * sx + sy * sy + sz * sz, 1e-20)
        di = jax.lax.rsqrt(d2)
        c = jnp.abs((sx * nx_ + sy * ny_ + sz * nz_) * di)
        return pdf_sa * c / d2

    # emitter cosine-lobe dir pdf (area rows only) light -> eye vertex
    cos_em = jnp.maximum(
        wlx * Sl["ngx"] + wly * Sl["ngy"] + wlz * Sl["ngz"], 0.0)
    pLs_em = sa_to_area(cos_em / _PI, Sl["px"], Sl["py"], Sl["pz"],
                        Se["px"], Se["py"], Se["pz"],
                        Se["ngx"], Se["ngy"], Se["ngz"])
    pLs_bsdf = sa_to_area(pdf_l_fwd, Sl["px"], Sl["py"], Sl["pz"],
                          Se["px"], Se["py"], Se["pz"],
                          Se["ngx"], Se["ngy"], Se["ngz"])
    pLs_hit = jnp.where(erow_ev >= 0,
                        he_pmf / jnp.maximum(he_area, 1e-20), 0.0)
    pL_s = jnp.where(case_hit, pLs_hit, jnp.where(is_s1, pLs_em, pLs_bsdf))

    # pdf at the eye vertex sampling BACK toward ev-1 given light-side in
    _f1, _f2, _f3, pdf_e_rev = _eval_kinds(
        kinds, mte["kind"], we_loc[2], *we_loc, *wi_e_loc,
        mte["alx"], mte["aly"], mte["alz"], mte["etx"], mte["ety"],
        mte["etz"], mte["kx"], mte["ky"], mte["kz"], mte["rough"],
        mte["srx"], mte["sry"], mte["srz"], shape)
    pLs1_bsdf = sa_to_area(pdf_e_rev, Se["px"], Se["py"], Se["pz"],
                           Se0["px"], Se0["py"], Se0["pz"],
                           Se0["ngx"], Se0["ngy"], Se0["ngz"])
    # emitter dir pdf from the HIT vertex toward ev-1 (s = 0 case)
    hw_x = Se0["px"] - Se["px"]
    hw_y = Se0["py"] - Se["py"]
    hw_z = Se0["pz"] - Se["pz"]
    hd2 = jnp.maximum(hw_x * hw_x + hw_y * hw_y + hw_z * hw_z, 1e-20)
    hdi = jax.lax.rsqrt(hd2)
    cos_hit_l = jnp.maximum(
        (hw_x * Se["ngx"] + hw_y * Se["ngy"] + hw_z * Se["ngz"]) * hdi, 0.0)
    pLs1_hit = sa_to_area(cos_hit_l / _PI, Se["px"], Se["py"], Se["pz"],
                          Se0["px"], Se0["py"], Se0["pz"],
                          Se0["ngx"], Se0["ngy"], Se0["ngz"])
    pL_s1 = jnp.where(t_pick >= 3,
                      jnp.where(case_hit, pLs1_hit, pLs1_bsdf), 0.0)

    pEt_sens = sa_to_area(
        jnp.where(cosv > 1e-6,
                  1.0 / (film_area * jnp.maximum(cosv, 1e-6) ** 3), 0.0),
        Se["px"], Se["py"], Se["pz"], Sl["px"], Sl["py"], Sl["pz"],
        Sl["ngx"], Sl["ngy"], Sl["ngz"])
    pEt_bsdf = sa_to_area(pdf_e_fwd, Se["px"], Se["py"], Se["pz"],
                          Sl["px"], Sl["py"], Sl["pz"],
                          Sl["ngx"], Sl["ngy"], Sl["ngz"])
    pE_t = jnp.where(case_lt, pEt_sens, pEt_bsdf)
    _g1, _g2, _g3, pdf_l_rev = _eval_kinds(
        kinds, mtl["kind"], wl_loc[2], *wl_loc, *wi_l_loc,
        mtl["alx"], mtl["aly"], mtl["alz"], mtl["etx"], mtl["ety"],
        mtl["etz"], mtl["kx"], mtl["ky"], mtl["kz"], mtl["rough"],
        mtl["srx"], mtl["sry"], mtl["srz"], shape)
    pE_t1 = jnp.where(
        s_pick >= 2,
        sa_to_area(pdf_l_rev, Sl["px"], Sl["py"], Sl["pz"],
                   Sl0["px"], Sl0["py"], Sl0["pz"],
                   Sl0["ngx"], Sl0["ngy"], Sl0["ngz"]),
        0.0)

    # =====================================================================
    # balance-heuristic MIS (mask-controlled recursion over slots)
    # =====================================================================
    def ratio(p_num, p_den):
        num = jnp.where(p_num > 0, p_num, 1.0)
        den = jnp.where(p_den > 0, p_den, 1.0)
        return num / den

    sum_ri = zero
    ri = one
    for i in reversed(range(n_light)):
        fi = float(i)
        pE_i = jnp.where(fi == s_pick - 1.0, pE_t,
                         jnp.where(fi == s_pick - 2.0, pE_t1, L_pdf_rev[i]))
        in_range = fi <= s_pick - 1.0
        ri = jnp.where(in_range, ri * ratio(pE_i, L_pdf_fwd[i]), ri)
        d_lo = L_delta[i - 1] if i >= 2 else fbool
        d_hi = L_delta[i]
        sum_ri = sum_ri + jnp.where(in_range & ~(d_lo | d_hi), ri, 0.0)
    rj = one
    for j in reversed(range(1, n_eye)):
        fj = float(j)
        pL_j = jnp.where(fj == t_pick - 1.0, pL_s,
                         jnp.where(fj == t_pick - 2.0, pL_s1, E_pdf_rev[j]))
        in_range = fj <= t_pick - 1.0
        rj = jnp.where(in_range, rj * ratio(pL_j, E_pdf_fwd[j]), rj)
        d_lo = E_delta[j]
        d_hi = E_delta[j - 1] if j - 1 >= 1 else fbool
        ok_j = in_range & ~(d_lo | d_hi)
        if not light_image and j == 1:
            ok_j = fbool
        sum_ri = sum_ri + jnp.where(ok_j, rj, 0.0)
    w_mis = 1.0 / (1.0 + sum_ri)

    # =====================================================================
    # combine
    # =====================================================================
    vx = jnp.where(ok_hit, ch_x * w_mis, 0.0)
    vy = jnp.where(ok_hit, ch_y * w_mis, 0.0)
    vz = jnp.where(ok_hit, ch_z * w_mis, 0.0)
    if env_const or env_shape is not None:
        # env on an ESCAPED s=0 eye walk, MIS weight 1 (mirrors
        # trace_mmlt's case_hit & Eesc term, bidir.py:1350); the escape
        # direction is -wi of the captured (virtual) vertex
        ok_env = case_hit & (Se["esc"] > 0.5)
        if env_shape is not None:
            from drmlt_mitsuba_tpu.ops.pallas.megatrace import (
                _acos as _eacos, _atan2 as _eatan2, fetch_rows,
            )
            edx, edy, edz = -Se["wix"], -Se["wiy"], -Se["wiz"]
            theta = _eacos(jnp.clip(edy, -1.0, 1.0))
            phi = _eatan2(edx, -edz)
            ue = (phi / _PI + 1.0) * 0.5
            ve = theta / _PI
            He, We = env_shape
            xx = jnp.clip(ue, 0.0, 1.0 - 1e-6) * We - 0.5
            yy = jnp.clip(ve, 0.0, 1.0 - 1e-6) * He - 0.5
            x0 = jnp.clip(jnp.floor(xx), 0.0, We - 1.0)
            y0 = jnp.clip(jnp.floor(yy), 0.0, He - 1.0)
            x1 = jnp.mod(x0 + 1.0, float(We))
            y1 = jnp.minimum(y0 + 1.0, He - 1.0)
            fx = jnp.clip(xx - x0, 0.0, 1.0)
            fy = jnp.clip(yy - y0, 0.0, 1.0)
            er = eg = eb = zero
            for yc, xc, wgt in ((y0, x0, (1 - fx) * (1 - fy)),
                                (y0, x1, fx * (1 - fy)),
                                (y1, x0, (1 - fx) * fy),
                                (y1, x1, fx * fy)):
                idx = (yc * We + xc).astype(jnp.int32)
                cr, cg, cb, _p = fetch_rows(env_tab_ref, He * We, shape,
                                            idx, passes=2)
                er += wgt * cr
                eg += wgt * cg
                eb += wgt * cb
        else:
            er = jnp.broadcast_to(cam_ref[0, 16], shape)
            eg = jnp.broadcast_to(cam_ref[0, 17], shape)
            eb = jnp.broadcast_to(cam_ref[0, 18], shape)
        vx = vx + jnp.where(ok_env, Se["bx"] * er, 0.0)
        vy = vy + jnp.where(ok_env, Se["by"] * eg, 0.0)
        vz = vz + jnp.where(ok_env, Se["bz"] * eb, 0.0)
    vx = vx + jnp.where(ok_c, cc_x * w_mis, 0.0)
    vy = vy + jnp.where(ok_c, cc_y * w_mis, 0.0)
    vz = vz + jnp.where(ok_c, cc_z * w_mis, 0.0)
    scale = n_strats * float(max_depth)
    return (vx * scale, vy * scale, vz * scale,
            jnp.where(case_lt, fu, ux), jnp.where(case_lt, fv, uy))


def _delta_at(delta_list, idx, shape):
    out = jnp.zeros(shape, bool)
    for i, d in enumerate(delta_list):
        out = out | ((idx == float(i)) & d)
    return out


def make_mega_mmlt(scene: Scene, cfg, interpret: bool = False,
                   force_clusters: bool = False, cluster_min: int = 4096):
    """Build trace(u) -> Splats for the MMLT technique running entirely in
    one Pallas kernel.  u = [depth dim, strategy dim, eye..., light...]
    exactly like integrators/mmlt.make_mmlt_trace; the D (depth-pmf) and
    n_strats scalings are applied inside the kernel."""
    from drmlt_mitsuba_tpu.integrators.path import Splats

    T0 = int(np.asarray(scene.tris.v0).shape[0])
    use_clusters = force_clusters or T0 > cluster_min
    clu_tpc = 0
    clu_aabb = clu_tri = None
    if use_clusters:
        from drmlt_mitsuba_tpu.ops.pallas.cluster_sweep import (
            cluster_reorder, pack_cluster_tables,
        )
        from drmlt_mitsuba_tpu.ops.pallas.megatrace import pick_tpc

        clu_tpc = pick_tpc(T0)
        scene, aabbs, starts, _C = cluster_reorder(scene, clu_tpc)
        clu_aabb, clu_tri = pack_cluster_tables(scene, aabbs, starts,
                                                clu_tpc)

    (tri, mat, emt, cam, sph, tri_ext, tex,
     env_tab, *_rest) = pack_mega_tables(scene)
    n_tris, n_mats, n_ems = tri.shape[0], mat.shape[0], emt.shape[0]
    if use_clusters:
        tri = tri[:1]         # sweeps run off the cluster/fetch tables
    n_sphs = (sph.shape[0]
              if bool(np.any(np.asarray(scene.spheres.valid))) else 0)
    tex_shape = (tuple(np.asarray(scene.textures.data).shape[:3])
                 if scene.textures is not None else None)
    env_const = bool(
        float(np.abs(np.asarray(scene.emitters.env_radiance)).sum()) > 0)
    env_shape = (tuple(np.asarray(scene.emitters.env_image).shape[:2])
                 if scene.emitters.env_image is not None else None)
    kinds = tuple(sorted(set(
        int(k) for k in np.unique(np.asarray(scene.materials.kind)))))
    n_core = 2 + cfg.eye_dims + cfg.light_dims

    kernel = functools.partial(
        _mega_mmlt_kernel, n_tris=n_tris, n_mats=n_mats, n_ems=n_ems,
        max_depth=cfg.max_depth, light_image=bool(cfg.light_image),
        kinds=kinds, eye_dims=cfg.eye_dims, clu_tpc=clu_tpc,
        env_const=env_const, n_sphs=n_sphs, tex_shape=tex_shape,
        env_shape=env_shape,
    )

    @jax.jit
    def trace(u):
        R = u.shape[0]
        R8 = R // 8
        # lane-dim block: a divisor of R8 that is a multiple of 128, else
        # one whole-array block (Pallas requires %128 or == array dim)
        L = 256 if R8 % 256 == 0 else (128 if R8 % 128 == 0 else R8)
        uT = u[:, :n_core].T.reshape(n_core, 8, R8)
        in_specs = [
            pl.BlockSpec(tuple(tri.shape), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_mats, _MAT_COLS), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_ems, _EM_COLS), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _CAM_COLS), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_core, 8, L), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tuple(tri_ext.shape), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tuple(sph.shape), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(tuple(tex.shape), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tuple(env_tab.shape), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [tri, mat, emt, cam, uT, tri_ext, sph, tex, env_tab]
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
            out_specs=pl.BlockSpec((5, 8, L), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((5, 8, R8), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(*operands)
        value = out[0:3].reshape(3, R).T
        pos = out[3:5].reshape(2, R).T
        lum = (value * jnp.asarray([0.212671, 0.715160, 0.072169])).sum(-1)
        return Splats(pos=pos[:, None, :], value=value[:, None, :], lum=lum)

    return trace
