"""Pallas multi-mutation DRMLT megakernel: N mutations per launch with the
ENTIRE Markov-chain loop VMEM-resident.

Round-2 profiling (scripts/profile_step.py, 2026-08-19, 65536 chains,
one v5e chip) split the depth-grouped DRMLT-over-MMLT step into

    k=1:  trace2x 0.75 ms | splat3C 2.55 ms | glue 0.19 ms  -> 2.90 full
    k=6:  trace2x 2.51 ms | splat3C 2.60 ms | glue 2.06 ms  -> 6.70 full

i.e. the mutation loop pays, EVERY step, (a) a 196k-splat one-hot-matmul
film call, (b) XLA-level proposal RNG + state-select glue that grows with
the PSS dimension, and (c) two Pallas launch round-trips.  This kernel
runs N_MUT whole mutations per launch — per-chain PSS state, luminance
and current splat live in VMEM registers across mutations; proposals are
generated in-kernel from the Mosaic PRNG; both stage traces reuse the
megammlt trace body; the three-state splat is accumulated into a
VMEM-resident film via channel-stacked one-hot NT matmuls on the MXU
(measured 79 TFLOPS realized for the splat matmul, scripts/
probe_splat_shapes.py).  HBM traffic per launch collapses to one read +
one write of the packed chain state and one film accumulation.

Reference work unit being replicated: drmlt_proc.cpp:518-770 (the
mutation loop: stage-1 trace, stage-2 trace on rejection, per-type
acceptance, three-state weighted splat, accept/reject bookkeeping).
Acceptance rules mirror integrators/drmlt.py (drmlt_step) exactly; the
fixed-depth MMLT trace mirrors ops/pallas/megammlt.py lane-for-lane.

The in-kernel RNG stream (Mosaic per-core PRNG) intentionally differs
from jax.random's threefry stream: MCMC correctness never depends on
WHICH uniforms drive the chain, only on their distribution, and the
debug_uniforms mode (tests/test_megadrmlt.py) pins every piece of the
proposal/acceptance/splat math against the XLA drmlt_step on identical
uniforms.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drmlt_mitsuba_tpu.ops.pallas.megammlt import (
    mega_mmlt_eligible, mmlt_trace_tile,
)
from drmlt_mitsuba_tpu.ops.pallas.megatrace import (
    _CAM_COLS, _EM_COLS, _MAT_COLS, _TRI_COLS, _lum, pack_mega_tables,
)

_PI = math.pi


# --------------------------------------------------------------- helpers
def _wrap(y):
    """Reflective mod-2 wrap (mirrors core/rng.pss_wrap)."""
    t = jnp.mod(y, 2.0)
    return jnp.where(t > 1.0, 2.0 - t, t)


def _clamp01_ratio(r):
    """metropolis_clamp: min(1, r) with NaN/negative guarded to 0."""
    r = jnp.where(jnp.isfinite(r) & (r >= 0), r, 0.0)
    return jnp.minimum(r, 1.0)


def _kelemen_sample(u, s1, s2):
    """Kelemen 'hole' kernel (kernels.Kelemen.sample, 1 uniform)."""
    log_ratio = -math.log(s2 / s1)
    sign = jnp.where(u < 0.5, 1.0, -1.0)
    x = jnp.where(u < 0.5, 2.0 * u, 2.0 * (u - 0.5))
    return sign * (s2 * jnp.exp((1.0 - x) * log_ratio))


def _kelemen_log_pdf(du, s1, s2):
    d = jnp.abs(du)
    ok = (d >= s1) & (d <= s2)
    p = 1.0 / (2.0 * jnp.maximum(d, 1e-20) * math.log(s2 / s1))
    return jnp.log(jnp.maximum(jnp.where(ok, p, 0.0), 1e-38))


def _gaussian_sample(u1, u2, sigma):
    """Box-Muller (kernels.Gaussian.sample, 2 uniforms)."""
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - u1, 1e-38)))
    return r * jnp.cos(2.0 * _PI * u2) * sigma


def _wrapped_cauchy_cos_sin(u, rho):
    """(cos th, sin th) of a wrapped-Cauchy angle (1 uniform) WITHOUT
    evaluating arccos (kernels.WrappedCauchy.sample computes th itself;
    the orbital rotation only ever consumes cos/sin, and
    cos(arccos(a)) == a, sin(sign*arccos(a)) == sign*sqrt(1-a^2))."""
    disp = 2.0 * rho / (1.0 + rho * rho)
    sign = jnp.where(u < 0.5, 1.0, -1.0)
    x = jnp.where(u < 0.5, 2.0 * u, 2.0 * (u - 0.5))
    v = jnp.cos(2.0 * _PI * x)
    c = jnp.clip((v + disp) / (1.0 + disp * v), -1.0, 1.0)
    s = sign * jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
    return c, s


# --------------------------------------------------------------- kernel
def _mega_drmlt_kernel(
        tri_ref, mat_ref, em_ref, cam_ref, seed_ref, unif_ref,
        tri_vmem_ref, sph_ref, tex_ref, env_tab_ref, state_ref, *refs,
        n_tris, n_mats, n_ems, k_depth, light_image, kinds, eye_dims,
        n_dims, n_core, n_mut, drtype, p_large, s1, s2, sigma,
        scale_second, rho, kelemen_scale, timid_after_large,
        fix_emitter_path, em_lo, em_hi, film_h, film_w, n_chan, passes,
        splat_mode, debug_uniforms, n_rand, splat_batch,
        technique="mmlt", min_depth=1, rr_depth=1000, use_nee=True,
        thinlens=False, env_const=False, n_sphs=0, tex_shape=None,
        clu_tpc=0, clu_passes=2, pssmlt=False, env_shape=None):
    if clu_tpc:
        (clu_aabb_ref, clu_tri_ref, out_state_ref, film_ref, stats_ref,
         rec_ref) = refs
    else:
        clu_aabb_ref = clu_tri_ref = None
        out_state_ref, film_ref, stats_ref, rec_ref = refs
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    D = n_dims
    shape = state_ref.shape[1:]          # (8, L)
    L = shape[1]
    K = 8 * L
    zero = jnp.zeros(shape, f32)
    # MMLT freezes the strategy dim (index 0) on small steps; the path
    # technique has no frozen dims (dims 0/1 are the film position)
    frozen0 = technique == "mmlt"
    n_states = (1 if splat_mode == "sampled" else
                (2 if pssmlt else 3))
    mb = splat_batch                     # mutations batched per splat flush
    NS = mb * n_states                   # splat slots per flush
    NN = NS * K                          # contraction width of the flush

    if not debug_uniforms:
        pltpu.prng_seed(seed_ref[0]
                        + pl.program_id(0) * jnp.int32(1000003)
                        + seed_ref[1] * jnp.int32(7919))

    @pl.when(pl.program_id(0) == 0)
    def _init_film():
        film_ref[...] = jnp.zeros_like(film_ref)

    # loop-invariant iotas for the splat one-hots (i32 compares; wheres
    # produce f32 then cast — i1-mask where with a BF16-packed output
    # needs an (8,128)->(16,128) i1 relayout Mosaic rejects, and bf16
    # cmpf does not lower either; both caught on-chip 2026-08-20)
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (film_h, K), 0)
    colsC = jax.lax.broadcasted_iota(jnp.int32, (n_chan * film_w, K), 0)
    cols_mod = colsC % film_w
    chanC = colsC // film_w

    # fixed-depth MMLT: dim 0 of the kernel's PSS layout is the (pinned)
    # depth; the chain's dims follow (strategy, eye..., light...)
    u_depth = jnp.full(shape, 1.0 - 0.5 / k_depth, f32)

    def trace(u_tiles):
        if technique == "path":
            from drmlt_mitsuba_tpu.ops.pallas.megatrace import (
                path_trace_tile,
            )
            vx, vy, vz = path_trace_tile(
                tri_ref, mat_ref, em_ref, cam_ref,
                lambda j: u_tiles[j], shape, n_tris=n_tris,
                n_mats=n_mats, n_ems=n_ems, max_depth=k_depth,
                min_depth=min_depth, rr_depth=rr_depth, use_nee=use_nee,
                kinds=kinds, thinlens=thinlens, env_const=env_const,
                tri_vmem_ref=tri_vmem_ref, sph_ref=sph_ref,
                n_sphs=n_sphs, tex_ref=tex_ref, tex_shape=tex_shape,
                big_scene=bool(clu_tpc),
                clu_aabb_ref=clu_aabb_ref, clu_tri_ref=clu_tri_ref,
                clu_tpc=clu_tpc, clu_passes=clu_passes)
            px, py = u_tiles[0], u_tiles[1]
        else:
            vx, vy, vz, px, py = mmlt_trace_tile(
                tri_ref, mat_ref, em_ref, cam_ref,
                lambda j: u_depth if j == 0 else u_tiles[j - 1],
                shape, n_tris=n_tris, n_mats=n_mats, n_ems=n_ems,
                max_depth=k_depth, light_image=light_image, kinds=kinds,
                eye_dims=eye_dims, tri_vmem_ref=tri_vmem_ref,
                clu_aabb_ref=clu_aabb_ref, clu_tri_ref=clu_tri_ref,
                clu_tpc=clu_tpc, clu_passes=clu_passes,
                env_const=env_const, sph_ref=sph_ref, n_sphs=n_sphs,
                tex_ref=tex_ref, tex_shape=tex_shape,
                env_tab_ref=env_tab_ref, env_shape=env_shape)
            inv = 1.0 / k_depth      # undo the uniform-depth pmf factor
            vx, vy, vz = vx * inv, vy * inv, vz * inv
        lum = _lum(vx, vy, vz)
        lum = jnp.where(jnp.isfinite(lum) & (lum >= 0), lum, 0.0)
        li = jnp.where(lum > 0, 1.0 / jnp.maximum(lum, 1e-30), 0.0)
        return lum, px, py, vx * li, vy * li, vz * li

    def stash_splats(m, states):
        """Record this mutation's splat states into the VMEM ring buffer
        and flush the batched one-hot matmul every `mb` mutations.

        states: list of (px, py, vr, vg, vb, w) tiles, pos in [0,1).
        Out-of-range pixels (pos == 1.0 after wrap) produce all-zero
        one-hot columns, matching the XLA path's zero-weight drop.

        Batching the splat across mutations is free: the film is a pure
        accumulation, so only the CHAIN state is sequentially dependent —
        deferring splats lengthens the matmul contraction dim (K -> NN)
        for better MXU utilization and amortizes the one-hot builds.
        """
        slot0 = (m % mb) * n_states
        for s, (px, py, vr, vg, vb, w) in enumerate(states):
            r0 = (slot0 + s) * 6
            pyi = jnp.floor(py * film_h)
            pxi = jnp.floor(px * film_w)
            for c, tile in enumerate((pyi, pxi, vr, vg, vb, w)):
                rec_ref[pl.dslice(r0 + c, 1)] = tile[None]

        @pl.when(m % mb == mb - 1)
        def _flush():
            # round-3-proven splat matmul form: ONE channel-stacked
            # (H, K) @ (n_chan*W, K)^T per slot (the per-slot
            # split-channel 3-matmul variant measured 5-17% SLOWER
            # on-chip 2026-08-20: extra MXU launches + f32 row builds)
            dn = (((1,), (1,)), ((), ()))
            delta = jnp.zeros((film_h, n_chan * film_w), f32)
            for i in range(NS):
                pyi = rec_ref[i * 6 + 0].astype(jnp.int32).reshape(1, K)
                pxi = rec_ref[i * 6 + 1].astype(jnp.int32).reshape(1, K)
                w = rec_ref[i * 6 + 5].reshape(1, K)
                A = (rows_iota == pyi).astype(bf16)
                cr = rec_ref[i * 6 + 2].reshape(1, K) * w
                cg = rec_ref[i * 6 + 3].reshape(1, K) * w
                cb = rec_ref[i * 6 + 4].reshape(1, K) * w
                onc = cols_mod == pxi
                B = (jnp.where(onc & (chanC == 0), cr, 0.0)
                     + jnp.where(onc & (chanC == 1), cg, 0.0)
                     + jnp.where(onc & (chanC == 2), cb, 0.0))
                if n_chan == 4:
                    B = B + jnp.where(onc & (chanC == 3), w, 0.0)
                if passes == 2:
                    B_hi = B.astype(bf16)
                    B_lo = (B - B_hi.astype(f32)).astype(bf16)
                    delta += jax.lax.dot_general(
                        A, B_hi, dn, preferred_element_type=f32)
                    delta += jax.lax.dot_general(
                        A, B_lo, dn, preferred_element_type=f32)
                else:
                    delta += jax.lax.dot_general(
                        A, B.astype(bf16), dn, preferred_element_type=f32)
            film_ref[0] += delta

    # ---- mutation loop ---------------------------------------------------
    def uniform_fn(m):
        ctr = [0]

        def next_u():
            j = ctr[0]
            ctr[0] += 1
            if debug_uniforms:
                return unif_ref[m * n_rand + j]
            bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
            return (bits & jnp.int32(0x7FFFFF)).astype(f32) * (2.0 ** -23)
        return next_u

    def body(m, carry):
        x = list(carry[0:D])
        lum_x = carry[D]
        px_x, py_x = carry[D + 1], carry[D + 2]
        vr_x, vg_x, vb_x = carry[D + 3], carry[D + 4], carry[D + 5]
        st = list(carry[D + 6:D + 12])
        next_u = uniform_fn(m)

        # ---- proposals (mirrors propose_stage1/2; frozen dim = 0) --------
        large = next_u() < p_large
        u_large = [next_u() for _ in range(D)]
        y_raw = [None] * D
        if drtype == "orbital":
            ks1 = s1 * kelemen_scale
            ks2 = s2 * kelemen_scale
            u_rad = [next_u() for _ in range(D // 2)]
            u_ang = [next_u() for _ in range(D // 2)]
            for p in range(D // 2):
                d = _kelemen_sample(u_rad[p], ks1, ks2)
                ang = u_ang[p] * (2.0 * _PI)
                du0 = d * jnp.cos(ang)
                du1 = d * jnp.sin(ang)
                if 2 * p == 0 and frozen0:   # frozen strategy dim (MMLT)
                    du0 = zero
                y_raw[2 * p] = x[2 * p] + du0
                y_raw[2 * p + 1] = x[2 * p + 1] + du1
        else:
            u_kel = [next_u() for _ in range(D)]
            for dd in range(D):
                du = _kelemen_sample(u_kel[dd], s1, s2)
                if dd == 0 and frozen0:
                    du = zero
                y_raw[dd] = x[dd] + du
        y_raw = [jnp.where(large, ul, yr) for ul, yr in zip(u_large, y_raw)]
        y = [_wrap(t) for t in y_raw]

        z_raw = [None] * D
        if drtype == "orbital":
            u_th = [next_u() for _ in range(D // 2)]
            for p in range(D // 2):
                cth, sth = _wrapped_cauchy_cos_sin(u_th[p], rho)
                du0 = y_raw[2 * p] - x[2 * p]
                du1 = y_raw[2 * p + 1] - x[2 * p + 1]
                # rotate (y-x) about y by th, norm-preserving; identical to
                # the arctan2/arccos form in propose_stage2 (orbital):
                #   z = y + |y-x| * (cos, sin)(th + atan2(-du1, -du0))
                z_raw[2 * p] = y_raw[2 * p] - cth * du0 + sth * du1
                z_raw[2 * p + 1] = y_raw[2 * p + 1] - sth * du0 - cth * du1
            if frozen0:
                z_raw[0] = x[0]         # frozen dim anchors to current
        else:
            sig2 = scale_second * sigma
            u_g1 = [next_u() for _ in range(D)]
            u_g2 = [next_u() for _ in range(D)]
            for dd in range(D):
                z_raw[dd] = x[dd] + _gaussian_sample(u_g1[dd], u_g2[dd],
                                                     sig2)
            if frozen0:
                z_raw[0] = x[0]
        if fix_emitter_path and technique == "mmlt":
            # stage-2 identity on emitter dims unless light-tracing
            # (drmlt_proc.cpp:133-141); s == k  <=>  t == 1
            s_cur = jnp.minimum(jnp.floor(x[0] * (k_depth + 1)),
                                float(k_depth))
            lt = s_cur == float(k_depth)
            for dd in range(em_lo, em_hi):
                z_raw[dd] = jnp.where(lt, z_raw[dd], x[dd])
        z = [_wrap(t) for t in z_raw]

        coin1 = next_u()
        coin2 = next_u()

        # ---- traces -------------------------------------------------------
        lum_y, px_y, py_y, vr_y, vg_y, vb_y = trace(y)
        if pssmlt:
            # PSSMLT control mode (equal-time study, VERDICT r4 item 3):
            # stage 1 only — no z trace, no delayed rejection; the splat
            # below degenerates to the Veach expected-value two-state
            # form (pssmlt_proc.cpp:204-225 non-Kelemen weights)
            lum_z = px_z = py_z = vr_z = vg_z = vb_z = zero
        else:
            lum_z, px_z, py_z, vr_z, vg_z, vb_z = trace(z)

        a1 = _clamp01_ratio(lum_y / jnp.maximum(lum_x, 1e-30))
        accept1 = coin1 < a1
        do_second = ~accept1
        if pssmlt:
            do_second = do_second & False
        if not timid_after_large:
            do_second = do_second & ~large

        lum_ratio = lum_z / jnp.maximum(lum_x, 1e-30)
        if drtype == "orbital":
            num = lum_z - lum_y
            den = lum_x - lum_y
            a2 = jnp.where(
                lum_z < lum_y, 0.0,
                jnp.where(lum_z >= lum_x, 1.0,
                          _clamp01_ratio(
                              num / jnp.where(jnp.abs(den) > 0, den, 1.0))))
        elif drtype == "mira":
            a_rev = _clamp01_ratio(lum_y / jnp.maximum(lum_z, 1e-30))
            lq = zero
            for dd in range(1 if frozen0 else 0, D):  # frozen dim skipped
                lq = lq + (_kelemen_log_pdf(z_raw[dd] - y_raw[dd], s1, s2)
                           - _kelemen_log_pdf(x[dd] - y_raw[dd], s1, s2))
            q_ratio = jnp.where(large, 1.0, jnp.exp(lq))
            a2 = _clamp01_ratio(lum_ratio * q_ratio * (1.0 - a_rev)
                                / jnp.maximum(1.0 - a1, 1e-12))
            a2 = jnp.where(a_rev >= 1.0, 0.0, a2)
            a2 = jnp.where(jnp.isfinite(q_ratio), a2, 0.0)
        else:                           # green: reverse-path third trace
            y_star = [_wrap(zr - (yr - xx))
                      for zr, yr, xx in zip(z_raw, y_raw, x)]
            lum_rev = trace(y_star)[0]
            a_rev = _clamp01_ratio(lum_rev / jnp.maximum(lum_z, 1e-30))
            a2 = _clamp01_ratio(lum_ratio * (1.0 - a_rev)
                                / jnp.maximum(1.0 - a1, 1e-12))
            a2 = jnp.where(a_rev >= 1.0, 0.0, a2)

        a2 = jnp.where(lum_z > 0, a2, 0.0)
        a2 = jnp.where(do_second, a2, 0.0)
        accept2 = (coin2 < a2) & do_second

        # ---- three-state weighted splat (drmlt_proc.cpp:676-688) ---------
        w_y = a1
        w_z = (1.0 - a1) * a2
        w_x = 1.0 - w_y - w_z
        if splat_mode == "sampled":
            # Resample the Rao-Blackwellized 3-state mixture: the weights
            # sum to exactly 1, so picking one state with prob w_s and
            # splatting it at weight 1 is unbiased (E = three-state splat)
            # and cuts splat MACs 3x — the k=1 group is splat-MXU-bound
            # (ROOFLINE.md).
            u_sel = next_u()
            pick_y = u_sel < w_y
            pick_z = (~pick_y) & (u_sel < w_y + w_z)

            def sel(ay, az, ax):
                return jnp.where(pick_y, ay, jnp.where(pick_z, az, ax))

            stash_splats(m, [(sel(px_y, px_z, px_x), sel(py_y, py_z, py_x),
                              sel(vr_y, vr_z, vr_x), sel(vg_y, vg_z, vg_x),
                              sel(vb_y, vb_z, vb_x), jnp.ones(shape, f32))])
        elif pssmlt:
            stash_splats(m, [(px_x, py_x, vr_x, vg_x, vb_x, w_x),
                             (px_y, py_y, vr_y, vg_y, vb_y, w_y)])
        else:
            stash_splats(m, [(px_x, py_x, vr_x, vg_x, vb_x, w_x),
                             (px_y, py_y, vr_y, vg_y, vb_y, w_y),
                             (px_z, py_z, vr_z, vg_z, vb_z, w_z)])

        # ---- state select: accept1 wins, then accept2 --------------------
        a1m = accept1
        a2m = accept2 & ~accept1
        new = []
        for dd in range(D):
            new.append(jnp.where(a1m, y[dd], jnp.where(a2m, z[dd], x[dd])))
        pick = lambda ay, az, ax: jnp.where(a1m, ay, jnp.where(a2m, az, ax))
        new_lum = pick(lum_y, lum_z, lum_x)
        new_px = pick(px_y, px_z, px_x)
        new_py = pick(py_y, py_z, py_x)
        new_vr = pick(vr_y, vr_z, vr_x)
        new_vg = pick(vg_y, vg_z, vg_x)
        new_vb = pick(vb_y, vb_z, vb_x)

        st = [st[0] + a1, st[1] + a2,
              st[2] + accept1.astype(f32), st[3] + accept2.astype(f32),
              st[4] + large.astype(f32),
              st[5] + (a1m | a2m).astype(f32)]
        return tuple(new) + (new_lum, new_px, new_py, new_vr, new_vg,
                             new_vb) + tuple(st)

    init = tuple(state_ref[d] for d in range(D + 6)) + tuple(
        zero for _ in range(6))
    final = jax.lax.fori_loop(0, n_mut, body, init)

    for d in range(D + 6):
        out_state_ref[d] = final[d]
    for s in range(6):
        stats_ref[s] = final[D + 6 + s]


# --------------------------------------------------------------- wrapper
def mega_drmlt_eligible(scene, bcfg_k, dcfg, film_cfg) -> bool:
    """Static host-side coverage check for the multi-mutation kernel."""
    if dcfg.use_mixture or dcfg.acceptance_map:
        return False
    if dcfg.type not in ("orbital", "mira", "green"):
        return False
    if film_cfg.filter.footprint != 1:       # box filter only
        return False
    if film_cfg.height % 8 or film_cfg.width % 128:
        return False
    return mega_mmlt_eligible(scene, bcfg_k)


def mega_drmlt_path_eligible(scene, pcfg, dcfg, film_cfg) -> bool:
    """Static host-side coverage check for the PATH-technique variant of
    the multi-mutation kernel (megatrace's scene subset)."""
    from drmlt_mitsuba_tpu.ops.pallas.megatrace import mega_eligible

    if dcfg.use_mixture or dcfg.acceptance_map:
        return False
    if dcfg.type not in ("orbital", "mira", "green"):
        return False
    if film_cfg.filter.footprint != 1:       # box filter only
        return False
    if film_cfg.height % 8 or film_cfg.width % 128:
        return False
    if scene.emitters.env_image is not None:
        return False   # image-env tables not yet wired into this kernel
    return mega_eligible(scene, pcfg)


def pack_chain_state(state, n_dims):
    """ChainState (C, D)/(C,)/(C, 1, 2)/(C, 1, 3) -> (D+6, 8, C//8)."""
    C = state.u.shape[0]
    rows = [state.u[:, d] for d in range(n_dims)]
    rows.append(state.lum)
    rows.append(state.pos[:, 0, 0])
    rows.append(state.pos[:, 0, 1])
    rows += [state.value[:, 0, c] for c in range(3)]
    return jnp.stack(rows).reshape(n_dims + 6, 8, C // 8)


def unpack_chain_state(arr, n_dims):
    from drmlt_mitsuba_tpu.integrators.mcmc import ChainState

    D = n_dims
    flat = arr.reshape(D + 6, -1)
    C = flat.shape[1]
    return ChainState(
        u=flat[:D].T,
        lum=flat[D],
        pos=flat[D + 1:D + 3].T.reshape(C, 1, 2),
        value=flat[D + 3:D + 6].T.reshape(C, 1, 3),
    )


def make_mega_drmlt(scene, bcfg_k, dcfg, film_cfg, k_depth: int,
                    n_dims: int, *, n_mut: int = 16, interpret: bool = False,
                    passes: int = 1, weight_channel: bool = True,
                    splat_mode: str = "three",
                    debug_uniforms: bool = False,
                    lane_block: int | None = None,
                    technique: str = "mmlt",
                    force_clusters: bool = False,
                    cluster_min: int = 4096,
                    pssmlt: bool = False):
    """Build step_block(state_arr, seed2, [uniforms]) ->
    (state_arr, film_delta, stats) running n_mut whole DRMLT mutations of
    a fixed-depth-k MMLT group (or, technique="path", of the
    unidirectional path technique — bcfg_k is then a PathConfig and
    k_depth its max_depth) in ONE Pallas launch.

    state_arr: (n_dims+6, 8, C//8) packed chain state (pack_chain_state).
    seed2: (2,) int32 [root seed, launch counter].
    film_delta: (H, W, n_chan) splat accumulation from these mutations.
    stats: (6,) sums over chains x mutations of [a1, a2, accept1,
    accept2, large, moved].
    """
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
     env_tab, env_col, env_row) = pack_mega_tables(scene)
    n_tris, n_mats, n_ems = tri.shape[0], mat.shape[0], emt.shape[0]
    if use_clusters:
        tri = tri[:1]         # sweeps run off the cluster/fetch tables
    kinds = tuple(sorted(set(
        int(k) for k in np.unique(np.asarray(scene.materials.kind)))))
    if technique == "path":
        n_core_chain = bcfg_k.n_dims
        path_kw = dict(
            technique="path", min_depth=bcfg_k.min_depth,
            rr_depth=bcfg_k.rr_depth, use_nee=bcfg_k.use_nee,
            thinlens=bool(getattr(bcfg_k, "thinlens", False)),
            env_const=bool(float(np.abs(np.asarray(
                scene.emitters.env_radiance)).sum()) > 0),
            n_sphs=(sph.shape[0] if bool(np.any(
                np.asarray(scene.spheres.valid))) else 0),
            tex_shape=(tuple(np.asarray(scene.textures.data).shape[:3])
                       if scene.textures is not None else None),
            env_shape=(tuple(np.asarray(
                scene.emitters.env_image).shape[:2])
                if scene.emitters.env_image is not None else None))
    else:
        n_core_chain = 1 + bcfg_k.eye_dims + bcfg_k.light_dims
        path_kw = dict(
            technique="mmlt",
            env_const=bool(float(np.abs(np.asarray(
                scene.emitters.env_radiance)).sum()) > 0),
            n_sphs=(sph.shape[0] if bool(np.any(
                np.asarray(scene.spheres.valid))) else 0),
            tex_shape=(tuple(np.asarray(scene.textures.data).shape[:3])
                       if scene.textures is not None else None),
            env_shape=(tuple(np.asarray(
                scene.emitters.env_image).shape[:2])
                if scene.emitters.env_image is not None else None))
    assert n_dims >= n_core_chain and n_dims % 2 == 0
    H, W = film_cfg.height, film_cfg.width
    n_chan = 4 if weight_channel else 3
    if technique == "path":
        em_lo = em_hi = 0
    else:
        em_lo = 1 + bcfg_k.eye_dims
        em_hi = em_lo + bcfg_k.light_dims

    if dcfg.type == "orbital":
        n_rand = 3 + n_dims + n_dims // 2 + n_dims // 2 + n_dims // 2
    elif dcfg.type == "mira":
        n_rand = 3 + n_dims + n_dims + 2 * n_dims
    else:
        n_rand = 3 + n_dims + n_dims + 2 * n_dims
    if splat_mode == "sampled":
        n_rand += 1                       # u_sel, drawn after coin2

    # interpret mode (CPU tests) has no Mosaic PRNG: feed uniforms as an
    # input there; on real TPU the in-kernel PRNG is the fast path
    debug_uniforms = debug_uniforms or interpret

    NR = n_dims + 6
    n_states = (1 if splat_mode == "sampled" else
                (2 if pssmlt else 3))

    @jax.jit
    def step_block(state_arr, seed2, uniforms=None):
        R8 = state_arr.shape[2]
        if lane_block is not None:
            L = lane_block
        else:
            # measured on v5e (scripts/tune_megadrmlt.py): L=256 beats 128
            # and 512 at every depth (k=4: 29.2 vs 25.0/26.3 M mut/s)
            # measured on v5e (scripts/tune_megadrmlt.py): L=256 beats 128
            # and 512 at every depth (k=4: 29.2 vs 25.0/26.3 M mut/s);
            # ALSO at 19.6k tris with the clustered sweep (k=1: 2.57M at
            # 256 vs 2.21M at 128 — the smaller while-loop tile gate does
            # not pay for the extra launches)
            L = 256 if R8 % 256 == 0 else (128 if R8 % 128 == 0 else R8)
        # splat batch: defer splats until the matmul contraction width
        # reaches ~8192 columns (VMEM budget for the (H, NN) one-hots),
        # constrained to divide n_mut so the last flush is never partial
        mb = max(1, min(n_mut, 8192 // (n_states * 8 * L)))
        while n_mut % mb:
            mb -= 1
        if uniforms is None and debug_uniforms:
            key = jax.random.PRNGKey(0)
            key = jax.random.fold_in(key, seed2[0])
            key = jax.random.fold_in(key, seed2[1])
            uniforms = jax.random.uniform(key, (n_mut * n_rand, 8, R8))
        elif uniforms is None:
            uniforms = jnp.zeros((1, 8, R8), jnp.float32)
        kernel = functools.partial(
            _mega_drmlt_kernel, n_tris=n_tris, n_mats=n_mats, n_ems=n_ems,
            k_depth=k_depth,
            light_image=bool(getattr(bcfg_k, "light_image", False)),
            kinds=kinds, eye_dims=getattr(bcfg_k, "eye_dims", 0),
            n_dims=n_dims,
            n_core=n_core_chain, n_mut=n_mut, drtype=dcfg.type,
            p_large=float(dcfg.p_large), s1=float(dcfg.s1),
            s2=float(dcfg.s2), sigma=float(dcfg.sigma),
            scale_second=float(dcfg.scale_second), rho=float(dcfg.rho),
            kelemen_scale=float(dcfg.kelemen_scale),
            timid_after_large=bool(dcfg.timid_after_large),
            fix_emitter_path=bool(dcfg.fix_emitter_path),
            em_lo=em_lo, em_hi=em_hi, film_h=H, film_w=W, n_chan=n_chan,
            passes=passes, splat_mode=splat_mode,
            debug_uniforms=debug_uniforms, n_rand=n_rand, splat_batch=mb,
            clu_tpc=clu_tpc, pssmlt=pssmlt,
            **path_kw,
        )
        in_specs = [
            pl.BlockSpec(tuple(tri.shape), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_mats, _MAT_COLS), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_ems, _EM_COLS), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _CAM_COLS), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((uniforms.shape[0], 8, L),
                         lambda i: (0, 0, i)),
            pl.BlockSpec(tuple(tri_ext.shape), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sph.shape[0], 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tex.shape[0], 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tuple(env_tab.shape), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NR, 8, L), lambda i: (0, 0, i)),
        ]
        operands = [tri, mat, emt, cam, jnp.asarray(seed2, jnp.int32),
                    uniforms, tri_ext, sph, tex, env_tab, state_arr]
        if clu_tpc:
            in_specs += [
                pl.BlockSpec(tuple(clu_aabb.shape), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tuple(clu_tri.shape), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
            operands += [clu_aabb, clu_tri]
        out_state, film, stats = pl.pallas_call(
            kernel,
            grid=(R8 // L,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((NR, 8, L), lambda i: (0, 0, i)),
                pl.BlockSpec((1, H, n_chan * W), lambda i: (0, 0, 0)),
                pl.BlockSpec((6, 8, L), lambda i: (0, 0, i)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((NR, 8, R8), jnp.float32),
                jax.ShapeDtypeStruct((1, H, n_chan * W), jnp.float32),
                jax.ShapeDtypeStruct((6, 8, R8), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((mb * n_states * 6, 8, L), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(*operands)
        film_delta = film[0].reshape(H, n_chan, W).transpose(0, 2, 1)
        return out_state, film_delta, stats.sum(axis=(1, 2))

    return step_block
