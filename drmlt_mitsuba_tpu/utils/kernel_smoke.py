"""On-TPU Pallas kernel lowering smoke (VERDICT r2 next-round #3).

Interpret-mode CPU tests cannot catch Mosaic lowering regressions (commit
5c1c27c: a BlockSpec violating the (8,128) rule crashed every eligible
TPU render while interpret tests passed).  This module lowers AND runs
every Pallas kernel across the shape families the renderer uses, on the
real device, asserting a handful of lanes against the XLA reference
path.  bench.py runs it first and reports `kernel_smoke` in its JSON;
it can also be run standalone:

    PYTHONPATH=/root/repo:/root/.axon_site python -m \
        drmlt_mitsuba_tpu.utils.kernel_smoke
"""
from __future__ import annotations

import traceback

import jax
import jax.numpy as jnp
import numpy as np


def _check(name, fn, results):
    try:
        fn()
        results[name] = "ok"
    except Exception as e:  # noqa: BLE001 - report, don't crash the bench
        results[name] = f"FAIL: {type(e).__name__}: {e}"
        results["_tracebacks"] = results.get("_tracebacks", "") + \
            f"\n--- {name} ---\n{traceback.format_exc()}"


def run_kernel_smoke(verbose: bool = False) -> dict:
    """Lower + run every Pallas kernel on the current default device."""
    from drmlt_mitsuba_tpu.integrators.bidir import BDPTConfig, trace_mmlt
    from drmlt_mitsuba_tpu.integrators.drmlt import DRMLTConfig
    from drmlt_mitsuba_tpu.integrators.layout import PathConfig
    from drmlt_mitsuba_tpu.integrators.mcmc import state_from_splats
    from drmlt_mitsuba_tpu.integrators.path import trace_paths
    from drmlt_mitsuba_tpu.render import film as filmlib
    from drmlt_mitsuba_tpu.scene.builders import cornell_box
    from drmlt_mitsuba_tpu.scene.types import prepare_scene

    results: dict = {}
    key = jax.random.PRNGKey(42)
    scene = prepare_scene(cornell_box(256, 256))
    fc = filmlib.make_film_config(256, 256, "box")

    # ---- splat one-hot matmul kernel (shape families: K-pad + exact) ----
    def splat_case(n):
        from drmlt_mitsuba_tpu.ops.pallas.splat_kernel import splat_add

        film = jnp.zeros((256, 256, 4))
        py = jax.random.randint(key, (n,), 0, 256)
        px = jax.random.randint(jax.random.fold_in(key, 1), (n,), 0, 256)
        vals = jax.random.uniform(jax.random.fold_in(key, 2), (n, 4))
        got = splat_add(film, py, px, vals)
        ref = film.reshape(-1, 4).at[py * 256 + px].add(vals).reshape(
            256, 256, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-3)

    for n in (1024, 1000, 196608):
        _check(f"splat_add[N={n}]", lambda n=n: splat_case(n), results)

    # ---- intersect kernels across dispatch tiers -------------------------
    def intersect_case():
        from drmlt_mitsuba_tpu.ops.intersect import intersect

        o = jnp.tile(jnp.asarray([[278.0, 273.0, -800.0]]), (2048, 1))
        d0 = jax.random.normal(key, (2048, 3))
        d = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
        d = d.at[:, 2].set(jnp.abs(d[:, 2]) + 0.3)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        hit = intersect(scene, o, d)
        assert bool(jnp.any(hit.valid)), "no hits on cornell sweep"

    _check("intersect[brute/clustered dispatch]", intersect_case, results)

    def sweep_v2_case():
        from drmlt_mitsuba_tpu.ops.pallas.intersect_kernel import (
            sweep_closest_v2,
        )

        o = jnp.tile(jnp.asarray([278.0, 273.0, -800.0]), (4096, 1))
        d = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (4096, 1))
        rays6 = jnp.concatenate([o.T, d.T], axis=0)
        t, i = sweep_closest_v2(rays6, scene.tris_packed)
        assert bool(jnp.all(t < 3e38)), "axis rays must hit the box"

    _check("sweep_closest_v2[SMEM]", sweep_v2_case, results)

    def cluster_case():
        # force the clustered-streaming tables even on the tiny scene so
        # the BVH/cluster kernel gets a real lowering check
        from drmlt_mitsuba_tpu.ops.pallas.bvh_kernel import sweep_clusters
        from drmlt_mitsuba_tpu.scene.builders import cornell_box as _cb
        from drmlt_mitsuba_tpu.scene.types import prepare_scene as _ps

        cs = _ps(_cb(64, 64), cluster_threshold=16)
        o = jnp.tile(jnp.asarray([278.0, 273.0, -800.0]), (4096, 1))
        d = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (4096, 1))
        rays6 = jnp.concatenate([o.T, d.T], axis=0)
        t, i = sweep_clusters(rays6, cs.cluster_aabbs, cs.cluster_blocks)
        assert bool(jnp.all(t < 3e38))

    _check("sweep_clusters[streaming]", cluster_case, results)

    # ---- path megakernel vs XLA wavefront on a few lanes ------------------
    def megatrace_case(depth):
        from drmlt_mitsuba_tpu.ops.pallas.megatrace import make_mega_trace

        pcfg = PathConfig(max_depth=depth, rr_depth=100)
        trace = make_mega_trace(scene, pcfg)
        u = jax.random.uniform(key, (2048, pcfg.n_dims))
        sp = trace(u)
        ref = trace_paths(scene, pcfg, u[:256])
        got = np.asarray(sp.lum[:256])
        want = np.asarray(ref.lum[:256])
        # branchy lanes diverge between evaluators (f32 ordering flips a
        # bounce decision and the whole lane follows a different path);
        # bound the fraction loosely and pin the mean tightly
        rel = np.abs(got - want) / (np.abs(want) + 1e-4)
        assert (rel > 1e-2).mean() < 0.15, f"{(rel > 1e-2).sum()} lanes"
        np.testing.assert_allclose(
            np.median(got), np.median(want), rtol=2e-2, atol=1e-3)

    for depth in (1, 6):
        _check(f"megatrace[depth={depth}]",
               lambda depth=depth: megatrace_case(depth), results)

    # ---- round-3 kernel variants: thinlens ray gen + constant env --------
    def megatrace_variant_case(thinlens, env):
        from drmlt_mitsuba_tpu.ops.pallas.megatrace import (
            make_mega_trace, mega_eligible,
        )

        sc = scene
        if thinlens:
            sc = sc.replace(camera=sc.camera.replace(
                aperture_radius=jnp.float32(25.0),
                focus_distance=jnp.float32(800.0)))
        if env:
            sc = sc.replace(emitters=sc.emitters.replace(
                env_radiance=jnp.asarray([0.4, 0.5, 0.7])))
        pcfg = PathConfig(max_depth=4, rr_depth=100, thinlens=thinlens)
        assert mega_eligible(sc, pcfg)
        trace = make_mega_trace(sc, pcfg)
        u = jax.random.uniform(key, (2048, pcfg.n_dims))
        sp = trace(u)
        ref = trace_paths(sc, pcfg, u[:256])
        got = np.asarray(sp.lum[:256])
        want = np.asarray(ref.lum[:256])
        rel = np.abs(got - want) / (np.abs(want) + 1e-4)
        assert (rel > 1e-2).mean() < 0.15, f"{(rel > 1e-2).sum()} lanes"

    _check("megatrace[thinlens]",
           lambda: megatrace_variant_case(True, False), results)
    _check("megatrace[const-env]",
           lambda: megatrace_variant_case(False, True), results)

    def megatrace_veach_case():
        from drmlt_mitsuba_tpu.ops.pallas.megatrace import (
            make_mega_trace, mega_eligible,
        )
        from drmlt_mitsuba_tpu.scene.builders import veach_door

        sc = veach_door(64, 64)
        pcfg = PathConfig(max_depth=5, rr_depth=100)
        assert mega_eligible(sc, pcfg)   # rough-diffuse kind in-kernel
        trace = make_mega_trace(sc, pcfg)
        u = jax.random.uniform(key, (2048, pcfg.n_dims))
        sp = trace(u)
        ref = trace_paths(sc, pcfg, u[:256])
        got = np.asarray(sp.lum[:256])
        want = np.asarray(ref.lum[:256])
        rel = np.abs(got - want) / (np.abs(want) + 1e-4)
        assert (rel > 1e-2).mean() < 0.15, f"{(rel > 1e-2).sum()} lanes"

    _check("megatrace[veach-door]", megatrace_veach_case, results)

    # ---- MMLT megakernel vs XLA selected-strategy trace -------------------
    def megammlt_case(depth):
        from drmlt_mitsuba_tpu.ops.pallas.megammlt import make_mega_mmlt

        bcfg = BDPTConfig(max_depth=depth)
        trace = make_mega_mmlt(scene, bcfg)
        n_core = 2 + bcfg.eye_dims + bcfg.light_dims
        u = jax.random.uniform(key, (2048, n_core))
        sp = trace(u)
        n = 256
        dd = jnp.minimum((u[:n, 0] * depth).astype(jnp.int32),
                         depth - 1) + 1
        ref = trace_mmlt(scene, bcfg, u[:n, 1:], dd)
        got = np.asarray(sp.lum[:n])
        want = np.asarray(ref.lum[:n]) * depth  # kernel keeps the pmf factor
        rel = np.abs(got - want) / (np.abs(want) + 1e-4)
        assert (rel > 1e-2).mean() < 0.15, f"{(rel > 1e-2).sum()} lanes"
        np.testing.assert_allclose(
            np.median(got), np.median(want), rtol=2e-2, atol=1e-3)

    for depth in (1, 6):
        _check(f"megammlt[depth={depth}]",
               lambda depth=depth: megammlt_case(depth), results)

    # ---- multi-mutation DRMLT kernel (all types, both splat passes) -------
    def megadrmlt_case(drtype, passes):
        from drmlt_mitsuba_tpu.integrators.mmlt_grouped import (
            make_mmlt_trace_fixed,
        )
        from drmlt_mitsuba_tpu.ops.pallas.megadrmlt import (
            make_mega_drmlt, pack_chain_state, unpack_chain_state,
        )

        k = 2
        trace_k, cfg_k, n_dims = make_mmlt_trace_fixed(scene, k)
        dcfg = DRMLTConfig(type=drtype, n_chains=2048)
        u0 = jax.random.uniform(key, (2048, n_dims))
        state = state_from_splats(u0, trace_k(u0))
        arr = pack_chain_state(state, n_dims)
        step = make_mega_drmlt(scene, cfg_k, dcfg, fc, k, n_dims, n_mut=4,
                               passes=passes)
        out, delta, stats = step(arr, jnp.asarray([5, 0], jnp.int32))
        st = unpack_chain_state(out, n_dims)
        assert bool(jnp.all(jnp.isfinite(st.u))), "non-finite chain state"
        assert bool(jnp.isfinite(delta).all()), "non-finite film delta"
        a1 = float(stats[0]) / (2048 * 4)
        large = float(stats[4]) / (2048 * 4)
        assert 0.05 < a1 < 0.95, f"implausible a1 {a1}"
        assert 0.2 < large < 0.4, f"large-step rate {large} != ~0.3"

    for drtype in ("orbital", "mira", "green"):
        _check(f"megadrmlt[{drtype},passes=1]",
               lambda t=drtype: megadrmlt_case(t, 1), results)
    _check("megadrmlt[orbital,passes=2]",
           lambda: megadrmlt_case("orbital", 2), results)

    # ---- round-4 features: spheres / textures / image env in-kernel ------
    def megatrace_sphere_case():
        from drmlt_mitsuba_tpu.ops.pallas.megatrace import (
            make_mega_trace, mega_eligible,
        )

        sc = prepare_scene(cornell_box(64, 64, sphere_material="mirror"))
        pcfg = PathConfig(max_depth=4, rr_depth=100)
        assert mega_eligible(sc, pcfg)
        trace = make_mega_trace(sc, pcfg)
        u = jax.random.uniform(key, (2048, pcfg.n_dims))
        sp = trace(u)
        ref = trace_paths(sc, pcfg, u[:256])
        rel = np.abs(np.asarray(sp.lum[:256]) - np.asarray(ref.lum[:256]))             / (np.abs(np.asarray(ref.lum[:256])) + 1e-4)
        assert (rel > 1e-2).mean() < 0.15, f"{(rel > 1e-2).sum()} lanes"

    _check("megatrace[sphere]", megatrace_sphere_case, results)

    def megatrace_textured_case():
        from drmlt_mitsuba_tpu.ops.pallas.megatrace import (
            make_mega_trace, mega_eligible,
        )
        from drmlt_mitsuba_tpu.scene import types as st

        sc = cornell_box(64, 64)
        p0 = sc.tris.v0
        p1 = p0 + sc.tris.e1
        p2 = p0 + sc.tris.e2

        def wuv(p):
            return jnp.stack([p[:, 0] / 556.0, p[:, 1] / 556.0], axis=-1)

        tris = sc.tris.replace(uv0=wuv(p0), uv1=wuv(p1), uv2=wuv(p2))
        tex = 0.2 + 0.8 * jax.random.uniform(jax.random.fold_in(key, 3),
                                             (1, 16, 16, 3))
        mats = sc.materials.replace(tex_id=sc.materials.tex_id.at[0].set(0))
        sc = prepare_scene(sc.replace(tris=tris, materials=mats,
                                      textures=st.TextureAtlas(data=tex)))
        pcfg = PathConfig(max_depth=4, rr_depth=100)
        assert mega_eligible(sc, pcfg)
        trace = make_mega_trace(sc, pcfg)
        u = jax.random.uniform(key, (2048, pcfg.n_dims))
        sp = trace(u)
        ref = trace_paths(sc, pcfg, u[:256])
        rel = np.abs(np.asarray(sp.lum[:256]) - np.asarray(ref.lum[:256]))             / (np.abs(np.asarray(ref.lum[:256])) + 1e-4)
        assert (rel > 1e-2).mean() < 0.15, f"{(rel > 1e-2).sum()} lanes"

    _check("megatrace[textured]", megatrace_textured_case, results)

    def megatrace_image_env_case():
        from drmlt_mitsuba_tpu.ops.pallas.megatrace import (
            make_mega_trace, mega_eligible,
        )
        from drmlt_mitsuba_tpu.scene import types as st

        sc = cornell_box(64, 64)
        src_eid = jnp.where(sc.tris.emitter_id >= 0, 0, -1)
        sc = sc.replace(tris=sc.tris.replace(emitter_id=src_eid))
        ei = 0.1 + 2.0 * jax.random.uniform(jax.random.fold_in(key, 4),
                                            (16, 32, 3))
        emitters = st.build_emitters(
            sc.tris, np.asarray([[18.4, 15.6, 8.0]], np.float32),
            env_image=np.asarray(ei))
        area_rows = np.nonzero(
            np.asarray(emitters.kind) == st.EMITTER_AREA)[0]
        row_of_tri = np.full(sc.tris.v0.shape[0], -1, np.int32)
        row_of_tri[np.asarray(emitters.tri_idx)[area_rows]] = (
            area_rows.astype(np.int32))
        sc = prepare_scene(sc.replace(
            tris=sc.tris.replace(emitter_id=jnp.asarray(row_of_tri)),
            emitters=emitters))
        pcfg = PathConfig(max_depth=4, rr_depth=100)
        assert mega_eligible(sc, pcfg)
        trace = make_mega_trace(sc, pcfg)
        u = jax.random.uniform(key, (2048, pcfg.n_dims))
        sp = trace(u)
        ref = trace_paths(sc, pcfg, u[:256])
        rel = np.abs(np.asarray(sp.lum[:256]) - np.asarray(ref.lum[:256]))             / (np.abs(np.asarray(ref.lum[:256])) + 1e-4)
        assert (rel > 1e-2).mean() < 0.2, f"{(rel > 1e-2).sum()} lanes"

    _check("megatrace[image-env]", megatrace_image_env_case, results)

    def megadrmlt_path_case(splat_mode):
        from drmlt_mitsuba_tpu.ops.pallas.megadrmlt import (
            make_mega_drmlt, mega_drmlt_path_eligible, pack_chain_state,
            unpack_chain_state,
        )

        pcfg = PathConfig(max_depth=4, rr_depth=100)
        n_dims = pcfg.n_dims + pcfg.n_dims % 2
        dcfg = DRMLTConfig(type="orbital", n_chains=2048,
                           splat_mode=splat_mode)
        assert mega_drmlt_path_eligible(scene, pcfg, dcfg, fc)
        u0 = jax.random.uniform(key, (2048, n_dims))
        state = state_from_splats(u0, trace_paths(scene, pcfg, u0))
        arr = pack_chain_state(state, n_dims)
        step = make_mega_drmlt(scene, pcfg, dcfg, fc, pcfg.max_depth,
                               n_dims, n_mut=4, weight_channel=False,
                               splat_mode=splat_mode, technique="path")
        out, delta, stats = step(arr, jnp.asarray([5, 0], jnp.int32))
        st_out = unpack_chain_state(out, n_dims)
        assert bool(jnp.all(jnp.isfinite(st_out.u)))
        assert bool(jnp.isfinite(delta).all())
        a1 = float(stats[0]) / (2048 * 4)
        assert 0.05 < a1 < 0.95, f"implausible a1 {a1}"

    _check("megadrmlt[path,three]",
           lambda: megadrmlt_path_case("three"), results)
    _check("megadrmlt[path,sampled]",
           lambda: megadrmlt_path_case("sampled"), results)

    def megadrmlt_sampled_case():
        from drmlt_mitsuba_tpu.integrators.mmlt_grouped import (
            make_mmlt_trace_fixed,
        )
        from drmlt_mitsuba_tpu.ops.pallas.megadrmlt import (
            make_mega_drmlt, pack_chain_state,
        )

        k = 2
        trace_k, cfg_k, n_dims = make_mmlt_trace_fixed(scene, k)
        dcfg = DRMLTConfig(type="orbital", n_chains=2048,
                           splat_mode="sampled")
        u0 = jax.random.uniform(key, (2048, n_dims))
        state = state_from_splats(u0, trace_k(u0))
        arr = pack_chain_state(state, n_dims)
        step = make_mega_drmlt(scene, cfg_k, dcfg, fc, k, n_dims, n_mut=4,
                               splat_mode="sampled", weight_channel=True)
        out, delta, stats = step(arr, jnp.asarray([5, 0], jnp.int32))
        assert bool(jnp.isfinite(delta).all())
        # sampled mode: in-image splat weight per mutation per chain == 1
        wsum = float(delta[..., 3].sum())
        assert 0.8 * 2048 * 4 <= wsum <= 2048 * 4 + 1, wsum

    _check("megadrmlt[mmlt,sampled]", megadrmlt_sampled_case, results)

    def megatrace_big_scene_case():
        from drmlt_mitsuba_tpu.ops.pallas.megatrace import (
            make_mega_trace, mega_eligible,
        )
        from drmlt_mitsuba_tpu.scene.builders import cornell_box as cb

        sc = prepare_scene(cb(64, 64, tessellate=40))    # ~57k tris
        T = int(np.asarray(sc.tris.v0).shape[0])
        assert T > 50_000, T
        pcfg = PathConfig(max_depth=2, rr_depth=100)
        assert mega_eligible(sc, pcfg)
        trace = make_mega_trace(sc, pcfg)
        u = jax.random.uniform(key, (2048, pcfg.n_dims))
        sp = trace(u)
        ref = trace_paths(sc, pcfg, u[:64])
        rel = np.abs(np.asarray(sp.lum[:64]) - np.asarray(ref.lum[:64])) \
            / (np.abs(np.asarray(ref.lum[:64])) + 1e-4)
        assert (rel > 1e-2).mean() < 0.15, f"{(rel > 1e-2).sum()} lanes"

    _check("megatrace[big-scene-57k]", megatrace_big_scene_case, results)

    def megadrmlt_glass_case():
        """GLASS scene through the MMLT megakernel family: dielectric
        lanes exercise bool-select paths the diffuse bench scenes never
        hit (the l_deltab i1-select lowering bug hid here until the
        first on-chip glass run, 2026-08-20)."""
        from drmlt_mitsuba_tpu.integrators.mmlt_grouped import (
            make_mmlt_trace_fixed,
        )
        from drmlt_mitsuba_tpu.ops.pallas.megadrmlt import (
            make_mega_drmlt, pack_chain_state,
        )

        sc = prepare_scene(cornell_box(256, 256,
                                       tall_box_material="glass"))
        k = 3
        trace_k, cfg_k, n_dims = make_mmlt_trace_fixed(sc, k)
        dcfg = DRMLTConfig(type="orbital", n_chains=2048)
        u0 = jax.random.uniform(key, (2048, n_dims))
        state = state_from_splats(u0, trace_k(u0))
        arr = pack_chain_state(state, n_dims)
        step = make_mega_drmlt(sc, cfg_k, dcfg, fc, k, n_dims, n_mut=4,
                               weight_channel=False)
        out, delta, stats = step(arr, jnp.asarray([5, 0], jnp.int32))
        assert bool(jnp.isfinite(delta).all())
        a1 = float(stats[0]) / (2048 * 4)
        assert 0.02 < a1 < 0.98, f"implausible a1 {a1}"

    _check("megadrmlt[mmlt,glass]", megadrmlt_glass_case, results)

    def megadrmlt_path_general_case():
        """Parity-class generality: a textured, sphere-bearing scene runs
        the multi-mutation DRMLT kernel end-to-end (path technique)."""
        from drmlt_mitsuba_tpu.ops.pallas.megadrmlt import (
            make_mega_drmlt, mega_drmlt_path_eligible, pack_chain_state,
        )
        from drmlt_mitsuba_tpu.scene import types as st

        sc = cornell_box(256, 256, sphere_material="mirror")
        p0 = sc.tris.v0
        p1 = p0 + sc.tris.e1
        p2 = p0 + sc.tris.e2

        def wuv(p):
            return jnp.stack([p[:, 0] / 556.0, p[:, 1] / 556.0], axis=-1)

        tris = sc.tris.replace(uv0=wuv(p0), uv1=wuv(p1), uv2=wuv(p2))
        tex = 0.2 + 0.8 * jax.random.uniform(jax.random.fold_in(key, 9),
                                             (1, 16, 16, 3))
        mats = sc.materials.replace(tex_id=sc.materials.tex_id.at[0].set(0))
        sc = prepare_scene(sc.replace(tris=tris, materials=mats,
                                      textures=st.TextureAtlas(data=tex)))
        pcfg = PathConfig(max_depth=4, rr_depth=100)
        n_dims = pcfg.n_dims + pcfg.n_dims % 2
        dcfg = DRMLTConfig(type="orbital", n_chains=2048)
        assert mega_drmlt_path_eligible(sc, pcfg, dcfg, fc)
        u0 = jax.random.uniform(key, (2048, n_dims))
        state = state_from_splats(u0, trace_paths(sc, pcfg, u0))
        arr = pack_chain_state(state, n_dims)
        step = make_mega_drmlt(sc, pcfg, dcfg, fc, pcfg.max_depth,
                               n_dims, n_mut=4, weight_channel=False,
                               technique="path")
        out, delta, stats = step(arr, jnp.asarray([5, 0], jnp.int32))
        assert bool(jnp.isfinite(delta).all())
        a1 = float(stats[0]) / (2048 * 4)
        assert 0.05 < a1 < 0.95, f"implausible a1 {a1}"

    _check("megadrmlt[path,textured+sphere]",
           megadrmlt_path_general_case, results)

    def mega_rad_grad_case():
        from drmlt_mitsuba_tpu.ops.pallas.megatrace import (
            make_mega_trace_rad,
        )

        pcfg = PathConfig(max_depth=4, rr_depth=100)
        trace_r = make_mega_trace_rad(scene, pcfg)
        u = jax.random.uniform(key, (2048, pcfg.n_dims))
        g = jax.grad(lambda r: jnp.mean(trace_r(r, u).lum))(
            scene.emitters.radiance)
        assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).sum()) > 0

    _check("megatrace[rad-grad]", mega_rad_grad_case, results)

    def mega_alb_grad_case():
        from drmlt_mitsuba_tpu.ops.pallas.megatrace import (
            make_mega_trace_alb,
        )

        pcfg = PathConfig(max_depth=4, rr_depth=100)
        trace_a = make_mega_trace_alb(scene, pcfg)
        u = jax.random.uniform(key, (2048, pcfg.n_dims))
        g = jax.grad(lambda a: jnp.mean(trace_a(a, u).lum))(
            scene.materials.albedo)
        assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).sum()) > 0

    _check("megatrace[alb-grad]", mega_alb_grad_case, results)

    def megammlt_feature_case(feature):
        """Round-5 MMLT-kernel scene-scope closes (VERDICT r4 item 2):
        constant env on escaped eye walks, analytic spheres, bitmap
        albedos — each must LOWER AND RUN on real TPU (Mosaic traps do
        not show in interpret mode)."""
        from drmlt_mitsuba_tpu.ops.pallas.megammlt import (
            make_mega_mmlt, mega_mmlt_eligible,
        )
        from drmlt_mitsuba_tpu.scene import types as st

        if feature == "env":
            sc = cornell_box(256, 256)
            sc = sc.replace(emitters=sc.emitters.replace(
                env_radiance=jnp.asarray([0.4, 0.5, 0.7])))
        elif feature == "image-env":
            sc = cornell_box(256, 256)
            ei = 0.1 + 2.0 * jax.random.uniform(
                jax.random.fold_in(key, 11), (16, 32, 3))
            src_eid = jnp.where(sc.tris.emitter_id >= 0, 0, -1)
            sc = sc.replace(tris=sc.tris.replace(emitter_id=src_eid))
            emitters = st.build_emitters(
                sc.tris, np.asarray([[18.4, 15.6, 8.0]], np.float32),
                env_image=np.asarray(ei))
            area_rows = np.nonzero(
                np.asarray(emitters.kind) == st.EMITTER_AREA)[0]
            row_of_tri = np.full(sc.tris.v0.shape[0], -1, np.int32)
            row_of_tri[np.asarray(emitters.tri_idx)[area_rows]] = (
                area_rows.astype(np.int32))
            sc = sc.replace(
                tris=sc.tris.replace(emitter_id=jnp.asarray(row_of_tri)),
                emitters=emitters)
        elif feature == "sphere":
            sc = cornell_box(256, 256, sphere_material="mirror")
        else:
            sc = cornell_box(256, 256)
            p0 = sc.tris.v0
            p1 = p0 + sc.tris.e1
            p2 = p0 + sc.tris.e2

            def wuv(p):
                return jnp.stack([p[:, 0] / 556.0, p[:, 1] / 556.0],
                                 axis=-1)

            tris = sc.tris.replace(uv0=wuv(p0), uv1=wuv(p1), uv2=wuv(p2))
            tex = 0.2 + 0.8 * jax.random.uniform(
                jax.random.fold_in(key, 10), (1, 16, 16, 3))
            mats = sc.materials.replace(
                tex_id=sc.materials.tex_id.at[0].set(0))
            sc = sc.replace(tris=tris, materials=mats,
                            textures=st.TextureAtlas(data=tex))
        sc = prepare_scene(sc)
        bcfg = BDPTConfig(max_depth=4)
        assert mega_mmlt_eligible(sc, bcfg)
        trace = make_mega_mmlt(sc, bcfg)
        n_core = 2 + bcfg.eye_dims + bcfg.light_dims
        u = jax.random.uniform(key, (2048, n_core))
        sp = trace(u)
        lum = np.asarray(sp.lum)
        assert np.isfinite(lum).all() and lum.mean() > 0

    for feature in ("env", "image-env", "sphere", "textured"):
        _check(f"megammlt[{feature}]",
               lambda f=feature: megammlt_feature_case(f), results)

    def megadrmlt_clustered_case():
        """Flagship MMLT megadrmlt at 19.6k tris: the clustered
        traversal inside the multi-mutation kernel (round 5) — this
        configuration overflowed SMEM before."""
        from drmlt_mitsuba_tpu.integrators.mmlt_grouped import (
            make_mmlt_trace_fixed,
        )
        from drmlt_mitsuba_tpu.ops.pallas.megadrmlt import (
            make_mega_drmlt, pack_chain_state,
        )
        from drmlt_mitsuba_tpu.scene.builders import cornell_box as cb

        sc = prepare_scene(cb(256, 256, tessellate=24))
        assert int(np.asarray(sc.tris.v0).shape[0]) > 4096
        k = 2
        trace_k, cfg_k, n_dims = make_mmlt_trace_fixed(sc, k)
        dcfg = DRMLTConfig(type="orbital", n_chains=2048)
        u0 = jax.random.uniform(key, (2048, n_dims))
        state = state_from_splats(u0, trace_k(u0))
        arr = pack_chain_state(state, n_dims)
        step = make_mega_drmlt(sc, cfg_k, dcfg, fc, k, n_dims, n_mut=4,
                               weight_channel=False)
        out, delta, stats = step(arr, jnp.asarray([5, 0], jnp.int32))
        assert bool(jnp.isfinite(delta).all())
        a1 = float(stats[0]) / (2048 * 4)
        assert 0.02 < a1 < 0.98, f"implausible a1 {a1}"

    _check("megadrmlt[mmlt,clustered-19.6k]", megadrmlt_clustered_case,
           results)

    def megadrmlt_clustered_glass_case():
        """GLASS x clustered traversal: dielectric branches exercise
        select/compare paths the diffuse big-scene cases never compile
        (the l_deltab i1-select class), now through the while_loop
        cluster sweep."""
        from drmlt_mitsuba_tpu.integrators.mmlt_grouped import (
            make_mmlt_trace_fixed,
        )
        from drmlt_mitsuba_tpu.ops.pallas.megadrmlt import (
            make_mega_drmlt, pack_chain_state,
        )
        from drmlt_mitsuba_tpu.scene.builders import cornell_box as cb

        sc = prepare_scene(cb(256, 256, tall_box_material="glass",
                              tessellate=13))
        assert int(np.asarray(sc.tris.v0).shape[0]) > 4096
        k = 3
        trace_k, cfg_k, n_dims = make_mmlt_trace_fixed(sc, k)
        dcfg = DRMLTConfig(type="orbital", n_chains=2048)
        u0 = jax.random.uniform(key, (2048, n_dims))
        state = state_from_splats(u0, trace_k(u0))
        arr = pack_chain_state(state, n_dims)
        step = make_mega_drmlt(sc, cfg_k, dcfg, fc, k, n_dims, n_mut=4,
                               weight_channel=False)
        out, delta, stats = step(arr, jnp.asarray([5, 0], jnp.int32))
        assert bool(jnp.isfinite(delta).all())
        a1 = float(stats[0]) / (2048 * 4)
        assert 0.02 < a1 < 0.98, f"implausible a1 {a1}"

    _check("megadrmlt[mmlt,glass-clustered-5.7k]",
           megadrmlt_clustered_glass_case, results)

    def megadrmlt_pssmlt_case():
        """PSSMLT control mode (stage-1-only, two-state splat)."""
        from drmlt_mitsuba_tpu.integrators.mmlt_grouped import (
            make_mmlt_trace_fixed,
        )
        from drmlt_mitsuba_tpu.ops.pallas.megadrmlt import (
            make_mega_drmlt, pack_chain_state,
        )

        k = 2
        trace_k, cfg_k, n_dims = make_mmlt_trace_fixed(scene, k)
        dcfg = DRMLTConfig(type="mira", n_chains=2048)
        u0 = jax.random.uniform(key, (2048, n_dims))
        state = state_from_splats(u0, trace_k(u0))
        arr = pack_chain_state(state, n_dims)
        step = make_mega_drmlt(scene, cfg_k, dcfg, fc, k, n_dims, n_mut=4,
                               weight_channel=False, pssmlt=True)
        out, delta, stats = step(arr, jnp.asarray([5, 0], jnp.int32))
        assert bool(jnp.isfinite(delta).all())
        assert float(stats[1]) == 0.0, "stage-2 mass in pssmlt mode"

    _check("megadrmlt[pssmlt-mode]", megadrmlt_pssmlt_case, results)

    if verbose:
        for k, v in results.items():
            if not k.startswith("_"):
                print(f"  {k:40s} {v}")
        if "_tracebacks" in results:
            print(results["_tracebacks"])
    return results


def main():
    res = run_kernel_smoke(verbose=True)
    bad = [k for k, v in res.items()
           if not k.startswith("_") and v != "ok"]
    print(f"{len([k for k in res if not k.startswith('_')]) - len(bad)} ok, "
          f"{len(bad)} failed")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
