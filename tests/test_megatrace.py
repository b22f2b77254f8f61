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
    # the MMLT kernel has no env escape handling: must stay XLA
    from drmlt_mitsuba_tpu.integrators.bidir import BDPTConfig
    from drmlt_mitsuba_tpu.ops.pallas.megammlt import mega_mmlt_eligible

    assert not mega_mmlt_eligible(scene, BDPTConfig(max_depth=4))


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
