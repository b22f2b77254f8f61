"""Film splatting tests (ImageBlock::put semantics)."""
import jax.numpy as jnp
import numpy as np

from drmlt_mitsuba_tpu.render import film as filmlib


def test_splat_conserves_energy_all_filters():
    """A splat in splat-mode deposits exactly its value (footprint weights
    normalized), for every reconstruction filter."""
    for name in ["box", "tent", "gaussian", "mitchell", "catmullrom", "lanczos"]:
        cfg = filmlib.make_film_config(16, 16, name)
        f = filmlib.new_film(cfg)
        pos = jnp.asarray([[7.3, 8.9], [3.0, 3.0]])
        val = jnp.asarray([[1.0, 2.0, 3.0], [0.5, 0.5, 0.5]])
        f = filmlib.splat(cfg, f, pos, val, mode="splat")
        total = np.asarray(jnp.sum(f[..., :3], axis=(0, 1)))
        np.testing.assert_allclose(total, [1.5, 2.5, 3.5], atol=1e-5, err_msg=name)


def test_splat_weighted():
    cfg = filmlib.make_film_config(8, 8, "box")
    f = filmlib.new_film(cfg)
    pos = jnp.asarray([[4.5, 4.5]])
    val = jnp.asarray([[1.0, 1.0, 1.0]])
    f = filmlib.splat(cfg, f, pos, val, weight=jnp.asarray([0.25]), mode="splat")
    np.testing.assert_allclose(float(jnp.sum(f[..., 0])), 0.25, atol=1e-6)


def test_border_clipping():
    """Splats at the image border lose out-of-bounds taps but stay finite."""
    cfg = filmlib.make_film_config(8, 8, "gaussian")
    f = filmlib.new_film(cfg)
    pos = jnp.asarray([[0.1, 0.1], [7.9, 7.9]])
    val = jnp.ones((2, 3))
    f = filmlib.splat(cfg, f, pos, val, mode="splat")
    assert bool(jnp.all(jnp.isfinite(f)))
    # energy still conserved: in-image weights renormalized
    np.testing.assert_allclose(float(jnp.sum(f[..., 0])), 2.0, atol=1e-5)


def test_accum_develop_average():
    """ACCUM mode divides by filter weight: constant-radiance samples
    develop to that constant."""
    cfg = filmlib.make_film_config(4, 4, "tent")
    f = filmlib.new_film(cfg)
    n = 4000
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, 4, size=(n, 2)), jnp.float32)
    val = jnp.ones((n, 3)) * 2.0
    f = filmlib.splat(cfg, f, pos, val, mode="accum")
    img = filmlib.develop(cfg, f, mode="accum")
    np.testing.assert_allclose(np.asarray(img), 2.0, atol=1e-4)


def test_matmul_splat_matches_scatter():
    """The one-hot-matmul splat kernel (ops/pallas/splat_kernel.py) must
    agree with the serialized scatter to its documented hi/lo-bf16
    precision on a film shape it declares eligible (W*4 % 128 == 0)."""
    import jax

    from drmlt_mitsuba_tpu.ops.pallas.splat_kernel import (
        splat_add, splat_add_eligible,
    )

    H, W = 32, 64
    assert splat_add_eligible(H, W)
    rng = np.random.default_rng(7)
    N = 3000
    py = jnp.asarray(rng.integers(0, H, N), jnp.int32)
    px = jnp.asarray(rng.integers(0, W, N), jnp.int32)
    vals = jnp.asarray(rng.gamma(1.0, 2.0, size=(N, 4)), jnp.float32)
    film0 = jnp.asarray(rng.uniform(0, 1, size=(H, W, 4)), jnp.float32)

    got = splat_add(film0, py, px, vals)
    want = film0.reshape(-1, 4).at[py * W + px].add(vals).reshape(H, W, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)

    # gradients: d/dvals is the gather of the film cotangent
    def loss(v):
        return jnp.sum(splat_add(film0, py, px, v) ** 2)

    g = jax.grad(loss)(vals)
    out = np.asarray(want)
    expect = 2.0 * out[np.asarray(py), np.asarray(px)]
    np.testing.assert_allclose(np.asarray(g), expect, rtol=2e-2, atol=2e-2)
