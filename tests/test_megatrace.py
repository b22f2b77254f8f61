"""Megakernel == wavefront tracer equivalence (interpret mode on CPU).

The Pallas megakernel (ops/pallas/megatrace.py) mirrors trace_paths
exactly (same PSS consumption, same warps, same MIS/RR), so identical u
must give identical radiance up to f32 reassociation.  These tests run
the kernel in interpret mode so they work on the CPU test mesh.
"""
import numpy as np
import pytest

import jax

from drmlt_mitsuba_tpu.integrators.layout import PathConfig
from drmlt_mitsuba_tpu.integrators.path import trace_paths
from drmlt_mitsuba_tpu.ops.pallas.megatrace import (
    make_mega_trace, mega_eligible,
)
from drmlt_mitsuba_tpu.scene.builders import cornell_box

R = 1024


@pytest.mark.parametrize("tall", ["diffuse", "mirror", "glass",
                                  "roughconductor"])
def test_megatrace_matches_wavefront(tall):
    scene = cornell_box(64, 64, tall_box_material=tall)
    cfg = PathConfig(max_depth=4, rr_depth=3)
    assert mega_eligible(scene, cfg)
    trace = make_mega_trace(scene, cfg, interpret=True)
    u = jax.random.uniform(jax.random.PRNGKey(3), (R, cfg.n_dims))
    va = np.asarray(trace_paths(scene, cfg, u).value[:, 0, :])
    vb = np.asarray(trace(u).value[:, 0, :])
    rel = np.abs(va - vb) / (np.abs(va) + 1e-3)
    # identical math modulo f32 reassociation; allow a handful of lanes to
    # flip at decision boundaries (hit epsilons, RR thresholds)
    bad = (rel > 1e-3).any(-1).sum()
    assert bad <= R // 500, f"{bad} lanes diverge"
    np.testing.assert_allclose(va.mean(0), vb.mean(0), rtol=5e-3)


def test_megatrace_matches_wavefront_veach_door():
    """Oren-Nayar (rough diffuse) kind in-kernel: the procedural
    veach-door parity scene is mega-eligible and lane-exact."""
    from drmlt_mitsuba_tpu.scene.builders import veach_door

    scene = veach_door(64, 64)
    cfg = PathConfig(max_depth=5, rr_depth=3)
    assert mega_eligible(scene, cfg)
    trace = make_mega_trace(scene, cfg, interpret=True)
    u = jax.random.uniform(jax.random.PRNGKey(3), (R, cfg.n_dims))
    va = np.asarray(trace_paths(scene, cfg, u).value[:, 0, :])
    vb = np.asarray(trace(u).value[:, 0, :])
    rel = np.abs(va - vb) / (np.abs(va) + 1e-3)
    assert (rel > 1e-3).any(-1).sum() <= R // 500
    np.testing.assert_allclose(va.mean(0), vb.mean(0), rtol=5e-3)


def test_megatrace_matches_wavefront_thinlens():
    """Thin-lens camera in-kernel (sensor.py thinlens branch, u[2:4]
    aperture dims): depth-of-field scenes run the mega path lane-exactly."""
    import jax.numpy as jnp

    scene = cornell_box(64, 64)
    scene = scene.replace(camera=scene.camera.replace(
        aperture_radius=jnp.float32(25.0),
        focus_distance=jnp.float32(800.0)))
    cfg = PathConfig(max_depth=4, rr_depth=3, thinlens=True)
    assert mega_eligible(scene, cfg)
    trace = make_mega_trace(scene, cfg, interpret=True)
    u = jax.random.uniform(jax.random.PRNGKey(3), (R, cfg.n_dims))
    va = np.asarray(trace_paths(scene, cfg, u).value[:, 0, :])
    vb = np.asarray(trace(u).value[:, 0, :])
    rel = np.abs(va - vb) / (np.abs(va) + 1e-3)
    assert (rel > 1e-3).any(-1).sum() <= R // 500
    np.testing.assert_allclose(va.mean(0), vb.mean(0), rtol=5e-3)
    # and a pinhole config on the same scene must stay eligible too
    assert mega_eligible(cornell_box(32, 32), PathConfig(max_depth=3))


def test_megatrace_matches_wavefront_constant_env():
    """Constant environment radiance in-kernel: escaped paths add
    env_radiance (no NEE row exists for a constant env, so no MIS —
    mirrors trace_paths); the open Cornell leaks env light everywhere."""
    import jax.numpy as jnp

    scene = cornell_box(64, 64)
    scene = scene.replace(emitters=scene.emitters.replace(
        env_radiance=jnp.asarray([0.4, 0.5, 0.7])))
    cfg = PathConfig(max_depth=4, rr_depth=3)
    assert mega_eligible(scene, cfg)
    trace = make_mega_trace(scene, cfg, interpret=True)
    u = jax.random.uniform(jax.random.PRNGKey(3), (R, cfg.n_dims))
    va = np.asarray(trace_paths(scene, cfg, u).value[:, 0, :])
    vb = np.asarray(trace(u).value[:, 0, :])
    rel = np.abs(va - vb) / (np.abs(va) + 1e-3)
    assert (rel > 1e-3).any(-1).sum() <= R // 500
    # round 5: the MMLT kernel handles constant env on escaped eye walks
    # (tests/test_megammlt.py::test_megammlt_constant_env)
    from drmlt_mitsuba_tpu.integrators.bidir import BDPTConfig
    from drmlt_mitsuba_tpu.ops.pallas.megammlt import mega_mmlt_eligible

    assert mega_mmlt_eligible(scene, BDPTConfig(max_depth=4))


def test_megatrace_no_nee_and_min_depth():
    scene = cornell_box(64, 64)
    for kw in (dict(use_nee=False), dict(min_depth=3)):
        cfg = PathConfig(max_depth=4, rr_depth=99, **kw)
        trace = make_mega_trace(scene, cfg, interpret=True)
        u = jax.random.uniform(jax.random.PRNGKey(5), (R, cfg.n_dims))
        va = np.asarray(trace_paths(scene, cfg, u).value[:, 0, :])
        vb = np.asarray(trace(u).value[:, 0, :])
        rel = np.abs(va - vb) / (np.abs(va) + 1e-3)
        assert (rel > 1e-3).any(-1).sum() <= R // 500


def test_megatrace_eligibility_gates():
    scene = cornell_box(32, 32)
    cfg = PathConfig(max_depth=3)
    assert mega_eligible(scene, cfg)
    # thinlens is in-kernel since round 3; aperture>0 WITHOUT the lens
    # dims (pinhole config on a lens camera) still falls back
    assert mega_eligible(scene, PathConfig(max_depth=3, thinlens=True))
    import jax.numpy as _jnp

    lens_scene = scene.replace(camera=scene.camera.replace(
        aperture_radius=_jnp.float32(10.0)))
    assert not mega_eligible(lens_scene, PathConfig(max_depth=3))
    assert mega_eligible(lens_scene,
                         PathConfig(max_depth=3, thinlens=True))
    import dataclasses

    from drmlt_mitsuba_tpu.render.medium import HomogeneousMedium
    import jax.numpy as jnp

    med = HomogeneousMedium(
        sigma_t=jnp.ones(3), albedo=jnp.full(3, 0.5), g=jnp.float32(0.0)
    )
    assert not mega_eligible(scene.replace(medium=med), cfg)


@pytest.mark.parametrize("sph", ["mirror", "glass", "diffuse"])
def test_megatrace_matches_wavefront_sphere(sph):
    """Analytic spheres in-kernel (round 4): quadratic closest-hit +
    exact analytic normal (ns == ng) + sphere shadow occlusion, selected
    lane-wise against the triangle sweep winner.  Mirrors
    ops/intersect._sphere_hits semantics."""
    scene = cornell_box(64, 64, sphere_material=sph)
    cfg = PathConfig(max_depth=4, rr_depth=3)
    assert mega_eligible(scene, cfg)
    trace = make_mega_trace(scene, cfg, interpret=True)
    u = jax.random.uniform(jax.random.PRNGKey(3), (R, cfg.n_dims))
    va = np.asarray(trace_paths(scene, cfg, u).value[:, 0, :])
    vb = np.asarray(trace(u).value[:, 0, :])
    rel = np.abs(va - vb) / (np.abs(va) + 1e-3)
    bad = (rel > 1e-3).any(-1).sum()
    assert bad <= R // 500, f"{bad} lanes diverge"
    np.testing.assert_allclose(va.mean(0), vb.mean(0), rtol=5e-3)


def test_megatrace_matches_wavefront_textured():
    """Bitmap albedo in-kernel (round 4): per-lane bilinear atlas fetch
    via 4 corner one-hot MXU matmuls (2-pass bf16 split, ~16 mantissa
    bits) must match the wavefront's f32 bilinear _albedo lookup."""
    import jax.numpy as jnp

    from drmlt_mitsuba_tpu.scene import types as st

    scene = cornell_box(64, 64)
    T = scene.tris.v0.shape[0]
    # planar uvs from world position so interpolation is exercised
    def wuv(p):
        return jnp.stack([p[:, 0] / 556.0, p[:, 1] / 556.0], axis=-1)
    p0 = scene.tris.v0
    p1 = scene.tris.v0 + scene.tris.e1
    p2 = scene.tris.v0 + scene.tris.e2
    tris = scene.tris.replace(uv0=wuv(p0), uv1=wuv(p1), uv2=wuv(p2))
    tex = (0.2 + 0.8 * jax.random.uniform(jax.random.PRNGKey(5),
                                          (1, 16, 16, 3)))
    mats = scene.materials.replace(
        tex_id=scene.materials.tex_id.at[0].set(0))
    scene = scene.replace(tris=tris, materials=mats,
                          textures=st.TextureAtlas(data=tex))
    cfg = PathConfig(max_depth=4, rr_depth=3)
    assert mega_eligible(scene, cfg)
    trace = make_mega_trace(scene, cfg, interpret=True)
    u = jax.random.uniform(jax.random.PRNGKey(3), (R, cfg.n_dims))
    va = np.asarray(trace_paths(scene, cfg, u).value[:, 0, :])
    vb = np.asarray(trace(u).value[:, 0, :])
    rel = np.abs(va - vb) / (np.abs(va) + 1e-3)
    # texel-grid boundaries add a new decision-flip class: ~1e-4 of f32
    # positional noise at bounce 3+ flips floor(u * 15) on ~1% of lanes,
    # picking the adjacent texel (verified depth<=2 is EXACT, so the
    # lookup math itself agrees); both picks are valid MC estimates
    bad = (rel > 2e-3).any(-1).sum()
    assert bad <= R // 50, f"{bad} lanes diverge"
    np.testing.assert_allclose(va.mean(0), vb.mean(0), rtol=1e-2)


def test_megatrace_matches_wavefront_image_env():
    """Image environment in-kernel (round 4): escape-side bilinear
    lat-long lookup MIS'd against env NEE, plus env NEE itself (marginal
    row cdf + per-row col cdf inversion with the cdf-residual jitter) —
    all via one-hot MXU fetches.  Mirrors emitter.py env_lookup /
    env_pdf_dir / sample_emitter_direct lane-for-lane."""
    import jax.numpy as jnp

    from drmlt_mitsuba_tpu.scene import types as st
    from drmlt_mitsuba_tpu.scene.types import prepare_scene

    scene = cornell_box(64, 64)
    # smooth-ish random lat-long map, 16x32 (He*We = 512 <= cap)
    ei = 0.1 + 2.0 * jax.random.uniform(jax.random.PRNGKey(7), (16, 32, 3))
    # undo the builder's row rewrite (emitter_id back to source index 0)
    src_eid = jnp.where(scene.tris.emitter_id >= 0, 0, -1)
    scene = scene.replace(tris=scene.tris.replace(emitter_id=src_eid))
    emitters = st.build_emitters(
        scene.tris,
        np.asarray([[18.4, 15.6, 8.0]], np.float32),
        env_image=np.asarray(ei))
    # rewrite per-tri emitter rows like the builder does
    area_rows = np.nonzero(np.asarray(emitters.kind) == st.EMITTER_AREA)[0]
    row_of_tri = np.full(scene.tris.v0.shape[0], -1, np.int32)
    row_of_tri[np.asarray(emitters.tri_idx)[area_rows]] = (
        area_rows.astype(np.int32))
    scene = scene.replace(
        tris=scene.tris.replace(emitter_id=jnp.asarray(row_of_tri)),
        emitters=emitters)
    scene = prepare_scene(scene)
    cfg = PathConfig(max_depth=4, rr_depth=3)
    assert mega_eligible(scene, cfg)
    trace = make_mega_trace(scene, cfg, interpret=True)
    u = jax.random.uniform(jax.random.PRNGKey(3), (R, cfg.n_dims))
    va = np.asarray(trace_paths(scene, cfg, u).value[:, 0, :])
    vb = np.asarray(trace(u).value[:, 0, :])
    rel = np.abs(va - vb) / (np.abs(va) + 1e-3)
    # env texel grid adds floor-flip boundaries like the bitmap test
    bad = (rel > 2e-3).any(-1).sum()
    assert bad <= R // 50, f"{bad} lanes diverge"
    np.testing.assert_allclose(va.mean(0), vb.mean(0), rtol=1e-2)


def test_megatrace_chunked_big_scene_path():
    """Big-scene sweep path (round 4, lifts the 8k-tri cap): triangle
    chunks stream from the VMEM fetch table ((chunk,1)x(1,L) broadcast
    math per sublane) and the attr fetch runs chunked — forced on the
    small cornell here so interpret mode pins it lane-for-lane against
    the SMEM sweep path."""
    scene = cornell_box(64, 64)
    cfg = PathConfig(max_depth=3, rr_depth=100)
    trace_a = make_mega_trace(scene, cfg, interpret=True)
    trace_b = make_mega_trace(scene, cfg, interpret=True, force_big=True)
    u = jax.random.uniform(jax.random.PRNGKey(3), (512, cfg.n_dims))
    va = np.asarray(trace_a(u).value[:, 0, :])
    vb = np.asarray(trace_b(u).value[:, 0, :])
    np.testing.assert_allclose(va, vb, rtol=1e-5, atol=1e-7)


def test_megatrace_big_scene_cap_lifted():
    """>8192 triangles route to the chunked big-scene path automatically
    and stay mega-eligible (the round-4 cap lift, 8k -> 65k); a tiny
    lane batch in interpret mode pins it against the XLA wavefront."""
    scene = cornell_box(64, 64, tessellate=24)     # ~21k tris
    T = scene.tris.v0.shape[0]
    assert T > 8192, T
    cfg = PathConfig(max_depth=2, rr_depth=100)
    assert mega_eligible(scene, cfg)
    trace = make_mega_trace(scene, cfg, interpret=True)
    u = jax.random.uniform(jax.random.PRNGKey(3), (64, cfg.n_dims))
    va = np.asarray(trace_paths(scene, cfg, u).value[:, 0, :])
    vb = np.asarray(trace(u).value[:, 0, :])
    rel = np.abs(va - vb) / (np.abs(va) + 1e-3)
    bad = (rel > 1e-3).any(-1).sum()
    assert bad <= 1, f"{bad} lanes diverge"


def test_kernel_atan2_accuracy():
    """The in-kernel Cephes-style _atan/_atan2/_acos (Mosaic lowers no
    inverse trig) must match numpy to ~1e-6 rad across quadrants."""
    import jax.numpy as jnp

    from drmlt_mitsuba_tpu.ops.pallas.megatrace import _acos, _atan2

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=4096).astype(np.float32))
    x = jnp.asarray(rng.normal(size=4096).astype(np.float32))
    got = np.asarray(_atan2(y, x))
    ref = np.arctan2(np.asarray(y), np.asarray(x))
    np.testing.assert_allclose(got, ref, atol=2e-6)
    c = jnp.asarray(rng.uniform(-1, 1, 4096).astype(np.float32))
    np.testing.assert_allclose(np.asarray(_acos(c)),
                               np.arccos(np.asarray(c)), atol=2e-6)
