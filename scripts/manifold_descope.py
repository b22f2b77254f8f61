"""Manifold-perturbation descope evidence (VERDICT r3 #8).

The reference's manifold walk (mut_manifold.cpp + manifold.cpp:1324)
targets tight specular-chain neighborhoods via per-vertex Newton
iteration — hostile to SIMD lanes.  Our coverage claim: orbital DRMLT's
pairwise rotations + the path-space lens/caustic/MCHAIN trio explore the
same neighborhoods.  This script measures, on THREE scenes of rising
specular-chain difficulty (single chain, double chain, long double
chain), masked mean relative error vs an equal-mutation-count PT
reference for (a) pssmlt, (b) drmlt-orbital, (c) path-space mlt without
mchain, (d) with mchain.  Writes MANIFOLD_DESCOPE.json.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/manifold_descope.py
"""
import json
import os
import sys

import jax

if os.environ.get("DRMLT_CPU") or True:   # CPU study (no TPU dependency)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from drmlt_mitsuba_tpu.integrators import pathspace as P
from drmlt_mitsuba_tpu.integrators.bidir import BDPTConfig
from drmlt_mitsuba_tpu.integrators.drmlt import DRMLTConfig, render_drmlt
from drmlt_mitsuba_tpu.integrators.layout import PathConfig
from drmlt_mitsuba_tpu.integrators.path import make_path_trace, render_pt
from drmlt_mitsuba_tpu.integrators.pssmlt import PSSMLTConfig, render_pssmlt
from drmlt_mitsuba_tpu.render import film as filmlib
from drmlt_mitsuba_tpu.scene.builders import cornell_box
from drmlt_mitsuba_tpu.scene.types import prepare_scene


def err(img, ref):
    m = np.asarray(ref).mean(-1)
    a = np.asarray(img).mean(-1)
    mask = m > 0.05 * m.mean()
    return float(np.abs(a - m)[mask].mean() / m[mask].mean())


def main():
    W = H = 32
    depth = 6
    chains, steps = 4096, 1500
    fc = filmlib.make_film_config(W, H, "box")
    scenes = {
        "glass-box (1 chain)": prepare_scene(
            cornell_box(W, H, tall_box_material="glass")),
        "mirror-box+mirror-sphere (2 chains)": prepare_scene(
            cornell_box(W, H, tall_box_material="mirror",
                        sphere_material="mirror")),
        "glass-box+glass-sphere (long chains)": prepare_scene(
            cornell_box(W, H, tall_box_material="glass",
                        sphere_material="glass")),
    }
    out = {"film": [W, H], "depth": depth, "chains": chains,
           "steps": steps, "scenes": {}}
    for name, scene in scenes.items():
        pcfg = PathConfig(max_depth=depth, rr_depth=100)
        # full-range reference (pssmlt/drmlt rows) and a k>=2 restricted
        # one (the path-space mlt targets k in [2, max_depth])
        pcfg2 = PathConfig(max_depth=depth, rr_depth=100, min_depth=2)
        ref = ref2 = None
        for i in range(8):
            film = render_pt(scene, pcfg, jax.random.fold_in(
                jax.random.PRNGKey(77), i), W * H * 512, fc, mode="accum")
            img = np.asarray(filmlib.develop(fc, film, mode="accum"))
            ref = img if ref is None else ref + img
            film = render_pt(scene, pcfg2, jax.random.fold_in(
                jax.random.PRNGKey(99), i), W * H * 512, fc, mode="accum")
            img = np.asarray(filmlib.develop(fc, film, mode="accum"))
            ref2 = img if ref2 is None else ref2 + img
        ref /= 8
        ref2 /= 8
        rows = {}

        trace = make_path_trace(scene, pcfg)
        n_dims = pcfg.n_dims + pcfg.n_dims % 2
        img, _ = render_pssmlt(trace, PSSMLTConfig(
            n_chains=chains, n_bootstrap=32768), fc,
            jax.random.PRNGKey(1), n_dims, steps)
        rows["pssmlt"] = err(img[..., :3], ref)

        img, _ = render_drmlt(trace, DRMLTConfig(
            type="orbital", n_chains=chains, n_bootstrap=32768), fc,
            jax.random.PRNGKey(2), n_dims, steps)
        rows["drmlt-orbital"] = err(np.asarray(img)[..., :3], ref)

        mcfg = P.MLTConfig(max_depth=depth, n_chains=chains,
                           n_bootstrap=32768)
        img, _ = P.render_mlt(scene, mcfg, fc, jax.random.PRNGKey(3),
                              n_steps=steps // 2,
                              mutators=("bidir", "lens", "bidir",
                                        "caustic"))
        rows["mlt(no mchain)"] = err(img, ref2)
        img, _ = P.render_mlt(scene, mcfg, fc, jax.random.PRNGKey(3),
                              n_steps=steps // 2,
                              mutators=("bidir", "lens", "mchain",
                                        "caustic"))
        rows["mlt(+mchain)"] = err(img, ref2)

        out["scenes"][name] = rows
        print(name, rows, flush=True)
    with open("MANIFOLD_DESCOPE.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote MANIFOLD_DESCOPE.json")


if __name__ == "__main__":
    main()
