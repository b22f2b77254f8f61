"""Depth-grouped MMLT: static per-depth chain batches.

The MMLT depth dimension is PINNED — a chain never changes path depth —
so the chain population factorizes into independent per-depth groups.
The pooled encoding (integrators/mmlt.py) still carries every chain
through max_depth-length subpath walks even though a depth-k chain only
ever uses k of them.  Grouping chains by depth and compiling a depth-k
trace per group cuts the walk work from O(max_depth) to O(k) per
mutation; with luminance-proportional allocation the expected k is small
(most transport is short paths), a multi-x end-to-end win.

This mirrors the reference MORE closely than the pooled form: the
reference allocates bootstrap budget per depth (drmlt.cpp:456-473),
generates per-depth seeds (pathsampler.cpp:884-934), and each of its
MMLT work units is a fixed-depth chain.

Normalization: group k's chains target the depth-k restriction pi_k of
the luminance with mass b_k = E[lum_k].  Each group accumulates into its
OWN film and develops with scale b_k * npixels / (N_k * n_steps), so the
integer rounding of the group sizes N_k cancels exactly (every group is
normalized by its own mutation count); the final image is the sum.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from drmlt_mitsuba_tpu.integrators.bidir import BDPTConfig, trace_mmlt
from drmlt_mitsuba_tpu.integrators.drmlt import (
    DRMLTConfig, drmlt_mixture_step, drmlt_step,
)
from drmlt_mitsuba_tpu.integrators.mcmc import state_from_splats
from drmlt_mitsuba_tpu.integrators.path import Splats
from drmlt_mitsuba_tpu.render import film as filmlib
from drmlt_mitsuba_tpu.scene.types import Scene


def make_mmlt_trace_fixed(scene: Scene, k: int, light_image: bool = True,
                          force_xla: bool = False, thinlens: bool = False,
                          medium: bool = False):
    """trace(u) for a depth-k group.

    u = [strategy dim, eye dims(k)..., light dims(k)..., (pad)].  There is
    no depth dim and no uniform-depth pmf factor (the pooled x max_depth):
    luminance-proportional group ALLOCATION replaces the pmf.

    Returns (trace, cfg_k, n_dims) with n_dims even-padded for orbital.
    """
    from drmlt_mitsuba_tpu.ops.intersect import _on_tpu
    from drmlt_mitsuba_tpu.ops.pallas.megammlt import (
        make_mega_mmlt, mega_mmlt_eligible,
    )

    cfg = BDPTConfig(max_depth=k, light_image=light_image,
                     thinlens=thinlens, medium=medium)
    n_core = 1 + cfg.eye_dims + cfg.light_dims
    n_dims = n_core + (n_core % 2)

    use_mega = ((not force_xla) and _on_tpu()
                and mega_mmlt_eligible(scene, cfg))
    mega = make_mega_mmlt(scene, cfg) if use_mega else None
    u_depth = 1.0 - 0.5 / k   # depth dim value that selects depth == k

    def trace(u) -> Splats:
        if mega is not None and u.shape[0] % 8 == 0:
            col = jnp.full((u.shape[0], 1), u_depth, u.dtype)
            sp = mega(jnp.concatenate([col, u[:, :n_core]], axis=1))
            inv = 1.0 / k   # undo the kernel's uniform-depth pmf factor
            return Splats(pos=sp.pos, value=sp.value * inv, lum=sp.lum * inv)
        depth = jnp.full((u.shape[0],), k, jnp.int32)
        return trace_mmlt(scene, cfg, u[:, :n_core], depth)

    return trace, cfg, n_dims


def grouped_masks(cfg: BDPTConfig, n_dims: int):
    """frozen mask for a depth-k group: the strategy dim (index 0) moves
    only on large steps; there is no pinned dim."""
    return jnp.zeros((n_dims,), bool).at[0].set(True)


def grouped_emitter_mask(cfg: BDPTConfig, n_dims: int):
    mask = jnp.zeros((n_dims,), bool)
    start = 1 + cfg.eye_dims
    return mask.at[start:start + cfg.light_dims].set(True)


def grouped_lt_mask_fn(cfg: BDPTConfig):
    k = cfg.max_depth

    def lt(u):
        s = jnp.minimum((u[:, 0] * (k + 1)).astype(jnp.int32), k)
        return s == k   # t = k+1-s == 1
    return lt


def _group_bootstrap(trace, root_key, n_dims: int, n_boot: int,
                     batch: int = 8192):
    """Luminance pass only: returns (lums (n_total,), b_k, sampler) where
    sampler(idx) regenerates candidate idx's u (the PathSeed contract)."""
    n_batches = max(1, -(-n_boot // batch))
    n_total = n_batches * batch

    def sample_u(sample_idx):
        return jax.random.uniform(
            jax.random.fold_in(root_key, sample_idx), (n_dims,))

    @jax.jit
    def lum_pass():
        def body(carry, i):
            u = jax.vmap(sample_u)(i * batch + jnp.arange(batch))
            sp = trace(u)
            lum = jnp.where(jnp.isfinite(sp.lum) & (sp.lum >= 0), sp.lum, 0.0)
            return carry + jnp.sum(lum), lum

        total, lums = jax.lax.scan(body, jnp.float32(0.0),
                                   jnp.arange(n_batches))
        return lums.reshape(n_total), total / n_total

    lums, b_k = lum_pass()
    return lums, b_k, sample_u


def _group_starts(trace, sample_u, lums, root_key, n_chains: int):
    """cdf-inversion resample of n_chains starts proportional to lums."""
    cdf = jnp.cumsum(lums)
    u_pick = jax.random.uniform(
        jax.random.fold_in(root_key, 0x5EED), (n_chains,)) * cdf[-1]
    idx = jnp.clip(jnp.searchsorted(cdf, u_pick), 0, lums.shape[0] - 1)
    u0 = jax.vmap(sample_u)(idx)
    return state_from_splats(u0, trace(u0))


def _run_group_mega(scene, cfg_k, dcfg, film_cfg, trace_k, lums, sample_u,
                    boot_key, run_key, n_dims, n_chains, n_steps_k,
                    n_mut=64, pssmlt=False):
    """Run one depth group through the multi-mutation DRMLT megakernel
    (ops/pallas/megadrmlt.py): n_mut whole mutations per Pallas launch,
    chain state + film VMEM-resident.  Returns (film_rgb, stats, steps)."""
    from drmlt_mitsuba_tpu.ops.pallas.megadrmlt import (
        make_mega_drmlt, pack_chain_state,
    )

    # per-launch fixed cost is big (state io + film flush): n_mut=64 beats
    # 16 by 1.4x at k=1 (scripts/tune_megadrmlt.py) — but cap the overshoot
    # for tiny luminance-mass groups (steps round UP to a launch multiple)
    if n_steps_k < 32:
        n_mut = 16
    n_launches = max(1, -(-n_steps_k // n_mut))
    steps_eff = n_launches * n_mut
    state = _group_starts(trace_k, sample_u, lums, boot_key, n_chains)
    arr = pack_chain_state(state, n_dims)
    step = make_mega_drmlt(scene, cfg_k, dcfg, film_cfg, cfg_k.max_depth,
                           n_dims, n_mut=n_mut, weight_channel=False,
                           splat_mode=dcfg.splat_mode, pssmlt=pssmlt)
    seed0 = jax.random.randint(run_key, (), 0, 2**31 - 1, jnp.int32)

    @jax.jit
    def run(arr):
        film = jnp.zeros((film_cfg.height, film_cfg.width, 3))

        def body(carry, i):
            arr, film = carry
            arr, delta, stats = step(arr, jnp.stack([seed0, i]))
            return (arr, film + delta), stats

        (arr, film), stats = jax.lax.scan(
            body, (arr, film), jnp.arange(n_launches))
        return film, stats.sum(0)

    film, stats = run(arr)
    denom = n_chains * steps_eff
    stats_d = dict(a1=stats[0] / denom, a2=stats[1] / denom,
                   accept1=stats[2] / denom, accept2=stats[3] / denom,
                   large=stats[4] / denom)
    return film, stats_d, steps_eff


def render_drmlt_mmlt_grouped(scene: Scene, bcfg: BDPTConfig,
                              dcfg: DRMLTConfig, film_cfg, root_key,
                              n_steps: int, average_luminance=None,
                              force_xla: bool = False, min_group: int = 1024,
                              equal_chains: bool = True,
                              pssmlt: bool = False):
    """Full depth-grouped DRMLT-over-MMLT render.

    Returns (image, aux) like drmlt.render_drmlt; aux adds per-group
    sizes/b_k.  Ref: drmlt.cpp:393-611 (the process being beaten) with
    the per-depth work-unit structure of pathsampler.cpp:884-934.

    Two allocation schemes (mutations per depth stay proportional to the
    depth's luminance mass b_k either way, so the estimator is unchanged):

    * equal_chains=True (default): EVERY group runs dcfg.n_chains chains
      and the per-group STEP count scales with b_k.  Each group's batch
      sits at the chip's throughput-optimal size instead of starving deep
      groups (measured 2026-08-18: a 1024-chain depth-6 group runs 2.3M
      mut/s vs ~12M at 65536 chains — per-call overhead dominates tiny
      batches).  Valid because bootstrap resampling draws starts from the
      stationary distribution, so many short chains are as unbiased as
      few long ones (Kelemen et al. 2002, §5.1; drmlt.cpp:456-473 uses
      many independent short work units the same way).
    * equal_chains=False: luminance-proportional chain counts, a common
      n_steps (the round-1 scheme; kept for A/B and tests).
    """
    D = bcfg.max_depth
    k_boot, k_run = jax.random.split(root_key)
    n_boot_grp = max(8192, dcfg.n_bootstrap // D)

    groups = []
    for k in range(1, D + 1):
        trace_k, cfg_k, n_k = make_mmlt_trace_fixed(
            scene, k, bcfg.light_image, force_xla,
            thinlens=bcfg.thinlens, medium=bcfg.medium)
        lums, b_k, sample_u = _group_bootstrap(
            trace_k, jax.random.fold_in(k_boot, k), n_k, n_boot_grp)
        groups.append(dict(k=k, trace=trace_k, cfg=cfg_k, n_dims=n_k,
                           lums=lums, b=b_k, sample_u=sample_u))

    b_ks = [float(g["b"]) for g in groups]     # one host sync at setup
    b_total = sum(b_ks)
    if average_luminance is not None and b_total > 0:
        scale_b = float(average_luminance) / b_total
        b_ks = [bk * scale_b for bk in b_ks]
        b_total = float(average_luminance)

    # group sizes + per-group step counts (see docstring)
    sizes, steps_per_group = [], []
    for bk in b_ks:
        if b_total <= 0 or bk <= 0:
            sizes.append(0)
            steps_per_group.append(0)
            continue
        if equal_chains:
            # no max(1, ...) floor: a negligible-mass group whose
            # proportional share rounds to zero steps is SKIPPED rather
            # than promoted to a full n_chains-wide step (round-2 advisor:
            # at small n_steps the floor silently degraded the documented
            # proportional allocation to near-equal allocation)
            sizes.append(dcfg.n_chains)
            steps_per_group.append(int(round(n_steps * bk / b_total)))
        else:
            raw = dcfg.n_chains * bk / b_total
            sizes.append(max(min_group,
                             int(round(raw / min_group)) * min_group))
            steps_per_group.append(n_steps)

    img = jnp.zeros((film_cfg.height, film_cfg.width, 3))
    accmap = filmlib.new_film(film_cfg) if dcfg.acceptance_map else None
    all_stats = {}
    step = drmlt_mixture_step if dcfg.use_mixture else drmlt_step

    from drmlt_mitsuba_tpu.ops.intersect import _on_tpu
    from drmlt_mitsuba_tpu.ops.pallas.megadrmlt import mega_drmlt_eligible

    for g, n_k_chains, bk, n_steps_k in zip(groups, sizes, b_ks,
                                            steps_per_group):
        if n_k_chains == 0 or n_steps_k == 0:
            continue
        trace_k, cfg_k, n_dims = g["trace"], g["cfg"], g["n_dims"]

        # multi-mutation megakernel fast path (VMEM-resident chain loop)
        if ((not force_xla) and _on_tpu() and step is drmlt_step
                and n_k_chains % 2048 == 0
                and mega_drmlt_eligible(scene, cfg_k, dcfg, film_cfg)):
            film_rgb, stats_d, steps_eff = _run_group_mega(
                scene, cfg_k, dcfg, film_cfg, trace_k, g["lums"],
                g["sample_u"], jax.random.fold_in(k_boot, 100 + g["k"]),
                jax.random.fold_in(k_run, g["k"]), n_dims, n_k_chains,
                n_steps_k, pssmlt=pssmlt)
            n_per_pixel = n_k_chains * steps_eff / film_cfg.npixels
            img = img + film_rgb * (bk / n_per_pixel)
            all_stats[g["k"]] = stats_d
            continue

        if pssmlt:
            # the pssmlt control mode exists only in the megakernel (the
            # XLA fallback would silently run DRMLT) — fail loudly
            raise ValueError(
                f"pssmlt=True but depth group k={g['k']} is not "
                "megakernel-eligible; use integrators.pssmlt instead")

        if dcfg.splat_mode != "three":
            # only the megakernel consumes splat_mode; the XLA wavefront
            # always runs the three-state splat — surface the mismatch so
            # bench rows can't be silently mislabeled (round-3 advisor)
            import logging
            logging.getLogger(__name__).warning(
                "splat_mode=%r requested but depth group k=%d fell back to "
                "the XLA wavefront (three-state splat executed)",
                dcfg.splat_mode, g["k"])
        frozen = grouped_masks(cfg_k, n_dims)
        emitter_mask = (grouped_emitter_mask(cfg_k, n_dims)
                        if dcfg.fix_emitter_path else None)
        lt_fn = grouped_lt_mask_fn(cfg_k) if dcfg.fix_emitter_path else None
        state = _group_starts(trace_k, g["sample_u"], g["lums"],
                              jax.random.fold_in(k_boot, 100 + g["k"]),
                              n_k_chains)
        film = filmlib.new_film(film_cfg)
        key_g = jax.random.fold_in(k_run, g["k"])

        @jax.jit
        def run(state, film, accmap, key_g=key_g, trace_k=trace_k,
                frozen=frozen, emitter_mask=emitter_mask, lt_fn=lt_fn):
            def body(carry, i):
                key = jax.random.fold_in(key_g, i)
                if step is drmlt_step:
                    return step(trace_k, dcfg, film_cfg, frozen, carry, key,
                                emitter_mask=emitter_mask, lt_mask_fn=lt_fn)
                return step(trace_k, dcfg, film_cfg, frozen, carry, key)

            (state, film, accmap), stats = jax.lax.scan(
                body, (state, film, accmap), jnp.arange(n_steps_k))
            return state, film, accmap, stats

        state, film, accmap, stats = run(state, film, accmap)
        n_per_pixel = n_k_chains * n_steps_k / film_cfg.npixels
        img = img + filmlib.develop(
            film_cfg, film, mode="splat", scale=bk / n_per_pixel)[..., :3]
        all_stats[g["k"]] = stats

    return img, dict(b=b_total, b_k=b_ks, sizes=sizes,
                     steps_per_group=steps_per_group, stats=all_stats,
                     accmap=accmap)


def render_drmlt_mmlt_grouped_sharded(
        mesh, scene: Scene, bcfg: BDPTConfig, dcfg: DRMLTConfig, film_cfg,
        root_key, n_steps: int, average_luminance=None, n_mut: int = 16,
        interpret: bool = False, equal_chains: bool = True):
    """The FLAGSHIP configuration under a device mesh: every depth group
    runs the multi-mutation megadrmlt kernel per-device on its chain
    shard (chains are exchangeable -> pure data parallelism, SURVEY
    §2.8.1), with the film psum-reduced over ('host','chain').  This is
    the TPU-native subsumption of the reference's remote work-unit
    scheduler for its flagship (src/libcore/sched_remote.cpp:156-287).

    Bootstrap (small) runs replicated on the host program; only the
    mutation loop - the ~100% term - is sharded.  interpret=True lets the
    virtual CPU mesh (tests, dryrun_multichip) run the same code path.

    Returns (image, aux) like render_drmlt_mmlt_grouped."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from drmlt_mitsuba_tpu.ops.pallas.megadrmlt import (
        make_mega_drmlt, pack_chain_state,
    )
    from drmlt_mitsuba_tpu.parallel.mesh import CHAIN_AXES

    n_shards = mesh.devices.size
    assert dcfg.n_chains % (n_shards * 8) == 0, (dcfg.n_chains, n_shards)
    k_boot, k_run = jax.random.split(root_key)

    groups, b_ks = [], []
    for k in range(1, bcfg.max_depth + 1):
        trace_k, cfg_k, n_dims = make_mmlt_trace_fixed(scene, k)
        lums, b_k, sample_u = _group_bootstrap(
            trace_k, jax.random.fold_in(k_boot, k), n_dims,
            min(dcfg.n_bootstrap, 32768))
        groups.append(dict(k=k, trace=trace_k, cfg=cfg_k, n_dims=n_dims,
                           lums=lums, sample_u=sample_u))
        b_ks.append(float(b_k))
    b_total = sum(b_ks)
    if average_luminance is not None:
        b_total = float(average_luminance)

    # per-device film accumulator, sharded over the mesh: each group
    # adds its LOCAL (unreduced) film here, so the cross-device film
    # reduction happens ONCE at the end of the render instead of once
    # per depth group — the group-k reduction fully overlaps group-k+1's
    # bootstrap/compile/mutations (SURVEY §5.8 "overlapping film
    # reduction with the next mutation batch").
    img_shards = jax.device_put(
        jnp.zeros((n_shards, film_cfg.height, film_cfg.width, 3)),
        jax.sharding.NamedSharding(mesh, P(CHAIN_AXES)))
    all_stats = {}
    # local lane block: per-device chain count / 8, capped at 256.  The
    # Mosaic legality gate is loop-invariant — check it BEFORE any group
    # bootstraps/compiles so a misconfigured TPU run fails fast.
    local_c8 = dcfg.n_chains // 8 // n_shards
    L = 256 if local_c8 % 256 == 0 else (
        128 if local_c8 % 128 == 0 else local_c8)
    if not interpret and L % 128 != 0:
        # Mosaic legality: the deferred-splat flush reshapes each
        # (8, L/8) record row to (1, L) lanes — a sublane->lane cast
        # that only lowers for 128-multiple lane blocks (caught on
        # chip, round 4: (8,8)->(1,64) fails infer-vector-layout)
        raise ValueError(
            f"sharded megadrmlt on real TPU needs chains per device to "
            f"be a multiple of 1024 (lane block {L} is not a multiple "
            f"of 128); got {dcfg.n_chains} chains over {n_shards} "
            "shards — raise n_chains or pass interpret=True")
    for g, bk in zip(groups, b_ks):
        if equal_chains:
            steps_k = int(round(n_steps * bk / b_total))
        else:
            steps_k = n_steps
        if steps_k == 0:
            continue
        n_launches = max(1, -(-steps_k // n_mut))
        steps_eff = n_launches * n_mut
        n_dims = g["n_dims"]
        state = _group_starts(g["trace"], g["sample_u"], g["lums"],
                              jax.random.fold_in(k_boot, 100 + g["k"]),
                              dcfg.n_chains)
        arr = pack_chain_state(state, n_dims)
        step = make_mega_drmlt(scene, g["cfg"], dcfg, film_cfg,
                               g["cfg"].max_depth, n_dims, n_mut=n_mut,
                               weight_channel=False, interpret=interpret,
                               splat_mode=dcfg.splat_mode, lane_block=L)
        seed0 = jax.random.randint(jax.random.fold_in(k_run, g["k"]), (),
                                   0, 2 ** 31 - 1, jnp.int32)

        @partial(
            shard_map, mesh=mesh,
            in_specs=(P(None, None, CHAIN_AXES), P(), P(CHAIN_AXES)),
            out_specs=(P(None, None, CHAIN_AXES), P(CHAIN_AXES), P()),
            check_vma=False,
        )
        def run(arr_l, seed, img_l):
            # independent per-device RNG: fold the mesh position into the
            # kernel seed (the kernel folds program_id per lane tile)
            dev = (jax.lax.axis_index(CHAIN_AXES[0])
                   * jax.lax.axis_size(CHAIN_AXES[1])
                   + jax.lax.axis_index(CHAIN_AXES[1]))
            s0 = seed[0] + dev * jnp.int32(1000003)

            def body(carry, i):
                a, f = carry
                a, delta, stats = step(a, jnp.stack([s0, i]))
                return (a, f + delta), stats

            film0 = jnp.zeros(
                (film_cfg.height, film_cfg.width, 3))
            (arr_l, film), stats = jax.lax.scan(
                body, (arr_l, film0), jnp.arange(n_launches))
            # NO film psum here: the local delta joins the sharded
            # accumulator; one reduction happens after the group loop
            n_per_pixel = dcfg.n_chains * steps_eff / film_cfg.npixels
            img_l = img_l + film[None] * (bk / n_per_pixel)
            stats = jax.lax.psum(
                jax.lax.psum(stats.sum(0), CHAIN_AXES[0]), CHAIN_AXES[1])
            return arr_l, img_l, stats

        arr, img_shards, stats = jax.jit(run)(arr, seed0[None], img_shards)
        denom = dcfg.n_chains * steps_eff
        all_stats[g["k"]] = dict(
            a1=stats[0] / denom, a2=stats[1] / denom,
            accept1=stats[2] / denom, accept2=stats[3] / denom,
            large=stats[4] / denom)
    img = img_shards.sum(0)      # the single cross-device film reduction
    return img, dict(b=b_total, b_k=b_ks, stats=all_stats)
