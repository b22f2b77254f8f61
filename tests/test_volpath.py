"""Volumetric path tracing tests (homogeneous medium + HG phase)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drmlt_mitsuba_tpu.integrators.layout import PathConfig
from drmlt_mitsuba_tpu.integrators.path import trace_paths
from drmlt_mitsuba_tpu.integrators.pssmlt import PSSMLTConfig, render_pssmlt
from drmlt_mitsuba_tpu.render import film as filmlib
from drmlt_mitsuba_tpu.render.medium import (
    hg_phase, make_medium, sample_distance, sample_hg, transmittance,
)
from drmlt_mitsuba_tpu.scene.builders import cornell_box


class TestMedium:
    def test_hg_normalized(self):
        """HG phase integrates to 1 over the sphere."""
        for g in [0.0, 0.3, -0.5, 0.9]:
            mu = np.linspace(-1, 1, 400_001)
            p = np.asarray(hg_phase(jnp.float32(g), jnp.asarray(mu)))
            integral = 2 * np.pi * np.trapezoid(p, mu)
            np.testing.assert_allclose(integral, 1.0, atol=2e-3, err_msg=str(g))

    def test_hg_sampling_matches_pdf(self):
        """Sampled cos(theta) mean matches the analytic HG mean = g."""
        for g in [0.0, 0.5, -0.3]:
            wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (100_000, 3))
            u2 = jax.random.uniform(jax.random.PRNGKey(1), (100_000, 2))
            wo, pdf = sample_hg(jnp.float32(g), wi, u2)
            # forward direction is -wi = +z
            cos = np.asarray(wo[:, 2])
            np.testing.assert_allclose(cos.mean(), g, atol=5e-3, err_msg=str(g))
            np.testing.assert_allclose(
                np.asarray(jnp.linalg.norm(wo, axis=-1)), 1.0, atol=1e-5
            )

    def test_distance_sampling_unbiased(self):
        """E[weight * indicator] reproduces transmittance: for a beam to a
        surface at distance D, E[w | escape] * P(escape est) = tr(D)."""
        med = make_medium([0.5, 1.0, 2.0], [1.0, 1.0, 1.0])
        n = 200_000
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        uc = jax.random.uniform(k1, (n,))
        ud = jax.random.uniform(k2, (n,))
        D = 1.3
        md = sample_distance(med, uc, ud, jnp.full((n,), D))
        # escape estimator: weight where not scattered averages to tr(D)
        w_esc = np.where(~np.asarray(md["scattered"])[:, None],
                         np.asarray(md["weight"]), 0.0)
        tr = np.asarray(transmittance(med, jnp.asarray(D)))
        np.testing.assert_allclose(w_esc.mean(axis=0), tr, rtol=0.02)


@pytest.fixture(scope="module")
def fog_scenes():
    vac = cornell_box(16, 16)
    thin = vac.replace(medium=make_medium([2e-4] * 3, [1.0] * 3, 0.0))
    absb = vac.replace(medium=make_medium([2e-3] * 3, [0.0] * 3, 0.0))
    return vac, thin, absb


class TestVolpath:
    def test_vacuum_regression(self, fog_scenes):
        vac, _, _ = fog_scenes
        cfg = PathConfig(max_depth=4, rr_depth=100)
        u = jax.random.uniform(jax.random.PRNGKey(3), (4096, cfg.n_dims))
        sp = trace_paths(vac, cfg, u)
        assert bool(jnp.all(jnp.isfinite(sp.value)))

    def test_fog_energy(self, fog_scenes):
        vac, thin, absb = fog_scenes
        cfg = PathConfig(max_depth=6, rr_depth=100)
        u = jax.random.uniform(jax.random.PRNGKey(4), (16384, cfg.n_dims))
        l_vac = float(trace_paths(vac, cfg, u).lum.mean())
        l_thin = float(trace_paths(thin, cfg, u).lum.mean())
        l_abs = float(trace_paths(absb, cfg, u).lum.mean())
        # pure-scattering thin fog only redirects light: close to vacuum
        assert abs(l_thin - l_vac) / l_vac < 0.15, (l_thin, l_vac)
        # absorbing fog is strictly dimmer
        assert l_abs < 0.8 * l_vac, (l_abs, l_vac)

    def test_mcmc_fog_consistency(self, fog_scenes):
        """PSSMLT over the volumetric trace matches plain MC."""
        _, _, absb = fog_scenes
        scene = absb.replace(medium=make_medium([1e-3] * 3, [0.7] * 3, 0.3))
        cfg = PathConfig(max_depth=4, rr_depth=100)
        fc = filmlib.make_film_config(16, 16, "box")
        u = jax.random.uniform(jax.random.PRNGKey(5), (16384 * 4, cfg.n_dims))
        # reference: direct mean luminance of the estimator
        ref = float(trace_paths(scene, cfg, u).lum.mean())
        trace = lambda uu: trace_paths(scene, cfg, uu)
        img, aux = render_pssmlt(
            trace, PSSMLTConfig(n_chains=512, n_bootstrap=8192,
                                kelemen_style_weights=False),
            fc, jax.random.PRNGKey(6), cfg.n_dims, 300,
        )
        assert np.all(np.isfinite(np.asarray(img)))
        np.testing.assert_allclose(float(aux["b"]), ref, rtol=0.1)
