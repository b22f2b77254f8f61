"""MMLT megakernel == XLA trace_mmlt, lane for lane (interpret mode).

The Pallas kernel (ops/pallas/megammlt.py) mirrors the selected-strategy
MMLT evaluation exactly (same PSS consumption, warps, pdf conversions,
MIS recursion); the XLA path is itself pinned to the dense all-strategy
sweep, so this chain grounds the kernel in the reference semantics.
"""
import jax
import numpy as np
import pytest

from drmlt_mitsuba_tpu.integrators.bidir import BDPTConfig
from drmlt_mitsuba_tpu.integrators.mmlt import make_mmlt_trace, mmlt_n_dims
from drmlt_mitsuba_tpu.ops.pallas.megammlt import (
    make_mega_mmlt, mega_mmlt_eligible,
)
from drmlt_mitsuba_tpu.scene.builders import cornell_box

R = 1024


def _compare(scene, cfg, seed=0, bad_frac=250):
    assert mega_mmlt_eligible(scene, cfg)
    xla = make_mmlt_trace(scene, cfg)
    mega = make_mega_mmlt(scene, cfg, interpret=True)
    n = mmlt_n_dims(cfg)
    u = jax.random.uniform(jax.random.PRNGKey(seed), (R, n))
    a = xla(u)
    b = mega(u)
    va, vb = np.asarray(a.value[:, 0]), np.asarray(b.value[:, 0])
    pa, pb = np.asarray(a.pos[:, 0]), np.asarray(b.pos[:, 0])
    rel = np.abs(va - vb) / (np.abs(va) + 1e-4)
    bad = (rel > 1e-3).any(-1)
    assert bad.sum() <= R // bad_frac, (
        f"{bad.sum()} lanes diverge; worst {rel.max()}"
    )
    np.testing.assert_allclose(va.mean(0), vb.mean(0), rtol=5e-3, atol=1e-5)
    lit = (np.abs(va) > 1e-7).any(-1) & ~bad
    np.testing.assert_allclose(pa[lit], pb[lit], atol=1e-5)


@pytest.mark.parametrize("tall", ["diffuse", "mirror", "roughconductor",
                                  "glass"])
def test_megammlt_matches_xla(tall):
    scene = cornell_box(32, 32, tall_box_material=tall)
    _compare(scene, BDPTConfig(max_depth=4))


def test_megammlt_matches_xla_veach_door():
    """Rough-diffuse (Oren-Nayar) kind: the procedural veach-door parity
    scene runs the MMLT megakernel lane-exactly."""
    from drmlt_mitsuba_tpu.scene.builders import veach_door

    _compare(veach_door(64, 64), BDPTConfig(max_depth=5), seed=1)


def test_megammlt_matches_xla_depth6():
    scene = cornell_box(32, 32)
    _compare(scene, BDPTConfig(max_depth=6), seed=2)


def test_megammlt_no_light_image():
    scene = cornell_box(32, 32)
    _compare(scene, BDPTConfig(max_depth=4, light_image=False), seed=3)


def test_megammlt_ineligible_cases():
    scene = cornell_box(16, 16)
    assert not mega_mmlt_eligible(scene, BDPTConfig(max_depth=4,
                                                    thinlens=True))
    assert not mega_mmlt_eligible(scene, BDPTConfig(max_depth=4,
                                                    medium=True))


def test_megammlt_constant_env():
    """Round 5 (VERDICT r4 item 2): constant env on ESCAPED s=0 eye
    walks, MIS weight 1 — the open cornell leaks env light everywhere,
    so every depth exercises the new term."""
    import jax.numpy as jnp

    scene = cornell_box(32, 32)
    scene = scene.replace(emitters=scene.emitters.replace(
        env_radiance=jnp.asarray([0.4, 0.5, 0.7])))
    _compare(scene, BDPTConfig(max_depth=4), seed=4)


def test_megammlt_sphere():
    """Analytic sphere vertices in the MMLT walk + sphere shadow
    blocking on the connection (round 5)."""
    scene = cornell_box(32, 32, sphere_material="diffuse")
    _compare(scene, BDPTConfig(max_depth=4), seed=5)


def test_megammlt_mirror_sphere():
    scene = cornell_box(32, 32, sphere_material="mirror")
    _compare(scene, BDPTConfig(max_depth=4), seed=6)


def test_megammlt_textured():
    """Bitmap albedos in the MMLT walk: per-slot uv interpolation +
    atlas fetch for the walk BSDFs AND the captured junction vertices
    (round 5)."""
    import jax.numpy as jnp

    from drmlt_mitsuba_tpu.scene import types as st

    scene = cornell_box(32, 32)

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
    _compare(scene, BDPTConfig(max_depth=3), seed=7, bad_frac=50)


def test_megammlt_image_env():
    """Image env on ESCAPED s=0 eye walks (round 5): bilinear lat-long
    fetch at MIS weight 1, env emitter rows excluded from light walks —
    both mirroring trace_mmlt / light_subpath."""
    import jax.numpy as jnp

    from drmlt_mitsuba_tpu.scene import types as st
    from drmlt_mitsuba_tpu.scene.types import prepare_scene

    scene = cornell_box(32, 32)
    ei = 0.1 + 2.0 * jax.random.uniform(jax.random.PRNGKey(7), (16, 32, 3))
    src_eid = jnp.where(scene.tris.emitter_id >= 0, 0, -1)
    scene = scene.replace(tris=scene.tris.replace(emitter_id=src_eid))
    emitters = st.build_emitters(
        scene.tris,
        np.asarray([[18.4, 15.6, 8.0]], np.float32),
        env_image=np.asarray(ei))
    area_rows = np.nonzero(np.asarray(emitters.kind) == st.EMITTER_AREA)[0]
    row_of_tri = np.full(scene.tris.v0.shape[0], -1, np.int32)
    row_of_tri[np.asarray(emitters.tri_idx)[area_rows]] = (
        area_rows.astype(np.int32))
    scene = scene.replace(
        tris=scene.tris.replace(emitter_id=jnp.asarray(row_of_tri)),
        emitters=emitters)
    scene = prepare_scene(scene)
    # env texel-grid boundaries flip floor() picks on ~2-3% of lanes
    # (the same class test_megatrace_matches_wavefront_image_env allows)
    _compare(scene, BDPTConfig(max_depth=4), seed=8, bad_frac=30)
