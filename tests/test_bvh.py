"""BVH builder + clustered-sweep kernel tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drmlt_mitsuba_tpu.ops.intersect import _tri_sweep
from drmlt_mitsuba_tpu.ops.pallas.bvh_kernel import (
    pack_clusters, sweep_clusters,
)
from drmlt_mitsuba_tpu.scene import types as st
from drmlt_mitsuba_tpu.scene.bvh import (
    build_bvh, build_bvh_native, build_bvh_numpy, validate_bvh,
)


def _soup(T, seed=0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-10, 10, (T, 3)).astype(np.float32)
    e1 = rng.uniform(-0.6, 0.6, (T, 3)).astype(np.float32)
    e2 = rng.uniform(-0.6, 0.6, (T, 3)).astype(np.float32)
    return v0, e1, e2


class TestBuilders:
    @pytest.mark.parametrize("leaf", [4, 8, 64, 256])
    def test_native_valid(self, leaf):
        v0, e1, e2 = _soup(3000)
        out = build_bvh_native(v0, e1, e2, max_leaf=leaf)
        if out is None:
            pytest.skip("native builder unavailable (no compiler)")
        bvh, order = out
        assert validate_bvh(bvh, order, v0, e1, e2)
        assert int(np.asarray(bvh.count).max()) <= leaf

    def test_numpy_valid(self):
        v0, e1, e2 = _soup(1000)
        bvh, order = build_bvh_numpy(v0, e1, e2, max_leaf=8)
        assert validate_bvh(bvh, order, v0, e1, e2)

    def test_dfs_layout(self):
        """Inner node's left child is node+1 (depth-first emission)."""
        v0, e1, e2 = _soup(500)
        bvh, _ = build_bvh(v0, e1, e2, max_leaf=8)
        count = np.asarray(bvh.count)
        first = np.asarray(bvh.first)
        inner = count == 0
        np.testing.assert_array_equal(
            first[inner], np.nonzero(inner)[0] + 1
        )


class TestClusterSweep:
    def test_matches_xla_sweep(self):
        """Interpret-mode cluster kernel agrees with the XLA sweep exactly."""
        T = 1500
        v0, e1, e2 = _soup(T, seed=1)
        valid = np.ones(T, bool)
        bvh, order = build_bvh(v0, e1, e2, max_leaf=256)
        aabbs, blocks, gidx = pack_clusters(
            bvh, order, v0, e1, e2, valid, tpc=256
        )
        R = 512
        rng = np.random.default_rng(2)
        o = rng.uniform(-12, 12, (R, 3)).astype(np.float32)
        d = rng.normal(size=(R, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        rays6 = jnp.asarray(np.concatenate([o.T, d.T], 0))
        t_c, i_c = sweep_clusters(rays6, aabbs, blocks, interpret=True,
                                  block=256)
        tris = st.TriangleSoA(
            v0=jnp.asarray(v0), e1=jnp.asarray(e1), e2=jnp.asarray(e2),
            n0=jnp.asarray(v0), n1=jnp.asarray(v0), n2=jnp.asarray(v0),
            uv0=jnp.zeros((T, 2)), uv1=jnp.zeros((T, 2)),
            uv2=jnp.zeros((T, 2)), mat_id=jnp.zeros(T, jnp.int32),
            emitter_id=jnp.zeros(T, jnp.int32), valid=jnp.ones(T, bool),
        )
        bt, bi, _, _ = _tri_sweep(tris, jnp.asarray(o), jnp.asarray(d),
                                  jnp.full((R,), 3e38), True)
        bt = np.asarray(bt)
        tc = np.asarray(t_c)
        g = np.asarray(gidx).reshape(-1)
        icg = np.where(np.asarray(i_c) >= 0,
                       g[np.clip(np.asarray(i_c), 0, None)], -1)
        np.testing.assert_allclose(
            np.where(bt < 1e30, bt, 0), np.where(tc < 1e30, tc, 0),
            rtol=1e-4,
        )
        np.testing.assert_array_equal(icg, np.asarray(bi))


def test_prepare_scene_picks_clusters():
    """prepare_scene routes big scenes to the cluster tables."""
    from drmlt_mitsuba_tpu.scene.types import prepare_scene
    from drmlt_mitsuba_tpu.scene.builders import cornell_box

    small = prepare_scene(cornell_box(16, 16))
    assert small.tris_packed is not None
    assert small.cluster_aabbs is None

    small2 = prepare_scene(cornell_box(16, 16), cluster_threshold=8)
    assert small2.cluster_aabbs is not None
    assert small2.tris_packed is None
