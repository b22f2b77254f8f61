"""Clustered in-kernel traversal (ops/pallas/cluster_sweep.py) ==
brute sweeps, lane for lane (interpret mode).

The clustered sweep is the kd-tree analog on the hot path (VERDICT r4
item 1): host-side SAH clusters + in-kernel front-to-back per-lane
one-hot traversal.  These tests pin it against the XLA wavefront and the
brute in-kernel sweeps on small scenes (forced clustering) and at real
scale (tessellated cornell, ~20k tris), across the path, MMLT, and
multi-mutation DRMLT kernels.  Traversal runs 2 bf16 planes, so a
sub-1e-4 near-tie winner flip is tolerated on a handful of lanes.
"""
import jax
import numpy as np
import pytest

from drmlt_mitsuba_tpu.integrators.bidir import BDPTConfig
from drmlt_mitsuba_tpu.integrators.layout import PathConfig
from drmlt_mitsuba_tpu.integrators.mmlt import make_mmlt_trace, mmlt_n_dims
from drmlt_mitsuba_tpu.integrators.path import trace_paths
from drmlt_mitsuba_tpu.ops.pallas.cluster_sweep import (
    cluster_reorder, pack_cluster_tables,
)
from drmlt_mitsuba_tpu.ops.pallas.megammlt import make_mega_mmlt
from drmlt_mitsuba_tpu.ops.pallas.megatrace import make_mega_trace
from drmlt_mitsuba_tpu.scene.builders import cornell_box


def test_cluster_reorder_structure():
    """Permutation covers every triangle once; clusters stay within
    their AABBs; emitter tri_idx remap preserves emissive geometry."""
    scene = cornell_box(64, 64, tessellate=8)
    sc, aabbs, starts, C = cluster_reorder(scene, 64)
    T = np.asarray(scene.tris.v0).shape[0]
    assert int(starts[C]) <= T
    # same triangle multiset (sorted vertex sums)
    a = np.sort(np.asarray(scene.tris.v0).sum(-1))
    b = np.sort(np.asarray(sc.tris.v0).sum(-1))
    np.testing.assert_allclose(a, b, rtol=1e-6)
    v0 = np.asarray(sc.tris.v0)
    e1 = np.asarray(sc.tris.e1)
    e2 = np.asarray(sc.tris.e2)
    for c in range(C):
        s, e = int(starts[c]), int(starts[c + 1])
        if e == s:
            continue
        for p in (v0[s:e], v0[s:e] + e1[s:e], v0[s:e] + e2[s:e]):
            assert (p >= aabbs[c, 0:3] - 1e-4).all()
            assert (p <= aabbs[c, 3:6] + 1e-4).all()
    # emitters still point at the same geometry
    ti_old = np.asarray(scene.emitters.tri_idx)
    ti_new = np.asarray(sc.emitters.tri_idx)
    np.testing.assert_allclose(
        np.asarray(scene.tris.v0)[ti_old], v0[ti_new], rtol=1e-6)


def test_clustered_megatrace_matches_smem_sweep():
    """Forced clustering on the 32-tri cornell == the SMEM brute sweep
    (a near-tie winner flip from the 2-plane traversal is allowed on
    <=0.5% of lanes)."""
    scene = cornell_box(64, 64)
    cfg = PathConfig(max_depth=3, rr_depth=100)
    ta = make_mega_trace(scene, cfg, interpret=True)
    tb = make_mega_trace(scene, cfg, interpret=True, force_clusters=True)
    u = jax.random.uniform(jax.random.PRNGKey(3), (512, cfg.n_dims))
    va = np.asarray(ta(u).value[:, 0, :])
    vb = np.asarray(tb(u).value[:, 0, :])
    # 2-plane normal fetch -> ~1e-4 relative shading noise; near-tie
    # winner flips on a handful of lanes
    bad = (np.abs(va - vb) > 1e-3 * (1 + np.abs(va))).any(-1).sum()
    assert bad <= 3, bad
    np.testing.assert_allclose(va.mean(0), vb.mean(0), rtol=1e-2)


def test_clustered_megatrace_big_scene_matches_wavefront():
    """~20k-tri tessellated cornell routes to the clustered sweep
    automatically and matches the XLA wavefront."""
    scene = cornell_box(64, 64, tessellate=24)
    assert scene.tris.v0.shape[0] > 4096
    cfg = PathConfig(max_depth=2, rr_depth=100)
    tr = make_mega_trace(scene, cfg, interpret=True)
    u = jax.random.uniform(jax.random.PRNGKey(3), (64, cfg.n_dims))
    va = np.asarray(trace_paths(scene, cfg, u).value[:, 0, :])
    vb = np.asarray(tr(u).value[:, 0, :])
    rel = np.abs(va - vb) / (np.abs(va) + 1e-3)
    assert (rel > 1e-3).any(-1).sum() <= 1


@pytest.mark.parametrize("tall", ["diffuse", "glass"])
def test_clustered_megammlt_matches_xla(tall):
    """MMLT walk + connection shadow through the clustered sweeps =="""
    scene = cornell_box(32, 32, tall_box_material=tall)
    cfg = BDPTConfig(max_depth=4)
    xla = make_mmlt_trace(scene, cfg)
    mega = make_mega_mmlt(scene, cfg, interpret=True, force_clusters=True)
    n = mmlt_n_dims(cfg)
    R = 512
    u = jax.random.uniform(jax.random.PRNGKey(0), (R, n))
    a, b = xla(u), mega(u)
    va, vb = np.asarray(a.value[:, 0]), np.asarray(b.value[:, 0])
    rel = np.abs(va - vb) / (np.abs(va) + 1e-4)
    bad = (rel > 1e-3).any(-1)
    assert bad.sum() <= 4, f"{bad.sum()} lanes diverge; worst {rel.max()}"
    np.testing.assert_allclose(va.mean(0), vb.mean(0), rtol=5e-3, atol=1e-5)


def test_clustered_megadrmlt_matches_plain_kernel():
    """Flagship multi-mutation kernel with forced clustering == the
    un-clustered kernel on identical uniforms (debug mode).  A 2-plane
    near-tie winner flip may diverge a chain's whole trajectory, so a
    handful of chains are allowed to differ; the rest must be exact."""
    import jax.numpy as jnp

    from drmlt_mitsuba_tpu.integrators.drmlt import DRMLTConfig
    from drmlt_mitsuba_tpu.integrators.mcmc import state_from_splats
    from drmlt_mitsuba_tpu.integrators.mmlt_grouped import (
        make_mmlt_trace_fixed,
    )
    from drmlt_mitsuba_tpu.ops.pallas import megadrmlt as MD
    from drmlt_mitsuba_tpu.render import film as filmlib
    from drmlt_mitsuba_tpu.scene.types import prepare_scene

    W, H = 128, 32
    scene = prepare_scene(cornell_box(W, H))
    fc = filmlib.make_film_config(W, H, "box")
    k, C, n_mut = 2, 64, 3
    trace_k, cfg_k, n_dims = make_mmlt_trace_fixed(scene, k)
    dcfg = DRMLTConfig(type="orbital", n_chains=C)
    u0 = jax.random.uniform(jax.random.PRNGKey(11), (C, n_dims))
    state0 = state_from_splats(u0, trace_k(u0))
    arr = MD.pack_chain_state(state0, n_dims)
    n_rand = 3 + n_dims + 3 * (n_dims // 2)
    uniforms = jax.random.uniform(jax.random.PRNGKey(5),
                                  (n_mut * n_rand, 8, C // 8))
    outs = []
    for fc_flag in (False, True):
        step = MD.make_mega_drmlt(scene, cfg_k, dcfg, fc, k, n_dims,
                                  n_mut=n_mut, interpret=True, passes=2,
                                  debug_uniforms=True,
                                  lane_block=C // 8,
                                  force_clusters=fc_flag)
        outs.append(step(arr, jnp.asarray([0, 0], jnp.int32), uniforms))
    (sa, fa, _), (sb, fb, _) = outs
    ua = np.asarray(MD.unpack_chain_state(sa, n_dims).u)
    ub = np.asarray(MD.unpack_chain_state(sb, n_dims).u)
    diff_chain = (np.abs(ua - ub) > 1e-5).any(-1)
    assert diff_chain.sum() <= 3, diff_chain.sum()
    scale = np.abs(np.asarray(fa)).max() + 1e-8
    assert (np.abs(np.asarray(fa) - np.asarray(fb)) / scale).mean() < 2e-3
