"""Path-space MLT (integrators/pathspace.py): structure + MCMC-vs-MC.

The binding oracle (SURVEY §4 hierarchy) is image consistency against the
plain path tracer restricted to the same depth range: any acceptance or
measure error in the vertex-path mutations shows up as image bias.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drmlt_mitsuba_tpu.integrators import pathspace as P
from drmlt_mitsuba_tpu.integrators.layout import PathConfig
from drmlt_mitsuba_tpu.integrators.path import render_pt
from drmlt_mitsuba_tpu.render import film as filmlib
from drmlt_mitsuba_tpu.scene.builders import cornell_box
from drmlt_mitsuba_tpu.scene.types import prepare_scene


def _scene(tall="diffuse", wh=32):
    return prepare_scene(cornell_box(wh, wh, tall_box_material=tall))


def test_seed_paths_valid():
    scene = _scene()
    cfg = P.MLTConfig(max_depth=4, n_chains=128, n_bootstrap=4096)
    ps, b = P.build_seed_paths(scene, cfg, jax.random.PRNGKey(0), 128, 4096)
    val, lum, pix, ok = P.eval_path(scene, ps, cfg.max_depth)
    assert float(b) > 0
    assert float((lum > 0).mean()) > 0.95
    assert bool(jnp.all((ps.k >= 2) & (ps.k <= 4)))
    # pixel positions in range
    assert bool(jnp.all((pix >= 0) & (pix <= 1)))


@pytest.mark.parametrize("tall", ["diffuse", "mirror"])
def test_mutators_propose(tall):
    scene = _scene(tall)
    cfg = P.MLTConfig(max_depth=4, n_chains=256, n_bootstrap=8192)
    ps, _ = P.build_seed_paths(scene, cfg, jax.random.PRNGKey(0), 256, 8192)
    prop, a, ok = P.mut_bidir(scene, cfg, jax.random.PRNGKey(1), ps)
    assert 0.05 < float(a.mean()) < 0.95
    prop, a, ok = P.mut_lens(scene, cfg, jax.random.PRNGKey(2), ps, 32, 32)
    assert float(a.mean()) > 0.05
    prop, a, ok = P.mut_caustic(scene, cfg, jax.random.PRNGKey(3), ps)
    assert float(jnp.isfinite(a).all())
    assert float(a.max()) <= 1.0


@pytest.mark.parametrize("tall", ["diffuse", "mirror"])
def test_mlt_matches_pt(tall):
    """MCMC-vs-MC: path-space MLT == PT restricted to k in [2, maxDepth]."""
    W = H = 32
    scene = _scene(tall, W)
    fc = filmlib.make_film_config(W, H, "box")
    cfg = P.MLTConfig(max_depth=4, n_chains=2048, n_bootstrap=32768)
    img, aux = P.render_mlt(scene, cfg, fc, jax.random.PRNGKey(0),
                            n_steps=768)
    a = np.asarray(img)

    pcfg = PathConfig(max_depth=4, rr_depth=100, min_depth=2)
    film = render_pt(scene, pcfg, jax.random.PRNGKey(9), W * H * 768, fc,
                     mode="accum")
    ref = np.asarray(filmlib.develop(fc, film, mode="accum"))

    ratio = a.mean() / ref.mean()
    assert 0.9 < ratio < 1.1, f"global mean off: {ratio}"
    import scipy.ndimage as ndi
    sa = ndi.uniform_filter(a.mean(-1), 6)
    sb = ndi.uniform_filter(ref.mean(-1), 6)
    rerr = np.abs(sa - sb) / (sb + 1e-2)
    assert np.percentile(rerr, 95) < 0.12, \
        f"local bias: p95 {np.percentile(rerr, 95)}"


def test_mlt_cli_dispatch(tmp_path):
    """-D integrator=mlt runs the path-space integrator on an eligible
    scene (no substitution warning)."""
    import os
    import warnings

    from drmlt_mitsuba_tpu.utils.cli import main

    scene_xml = os.path.join(os.path.dirname(__file__), "data",
                             "cornell.xml")
    out = tmp_path / "out.npy"
    with warnings.catch_warnings():
        warnings.simplefilter("error")   # the pssmlt fallback would warn
        rc = main([str(scene_xml), "-D", "integrator=mlt",
                   "-D", "maxDepth=4", "-D", "luminanceSamples=8192",
                   "-o", str(out), "-q", "--chains", "512", "--spp", "4"])
    assert rc == 0
    img = np.load(out)
    assert np.isfinite(img).all() and img.mean() > 0
