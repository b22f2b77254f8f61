"""Sample-generator tests (halton/hammersley/stratified correctness —
the analog of src/tests/test_samplers.cpp radical-inverse checks)."""
import jax
import jax.numpy as jnp
import numpy as np

from drmlt_mitsuba_tpu.render.sampler import (
    halton, hammersley, make_sampler, radical_inverse,
)


def test_radical_inverse_base2():
    """First values of the van der Corput sequence in base 2."""
    idx = jnp.arange(8)
    v = np.asarray(radical_inverse(idx, 2))
    np.testing.assert_allclose(
        v, [0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875], atol=1e-6
    )


def test_radical_inverse_base3():
    idx = jnp.arange(4)
    v = np.asarray(radical_inverse(idx, 3))
    np.testing.assert_allclose(v, [0, 1 / 3, 2 / 3, 1 / 9], atol=1e-6)


def test_halton_discrepancy_beats_random():
    """Halton integrates a smooth function with less error than MC."""
    n = 4096
    key = jax.random.PRNGKey(0)
    pts_h = halton(key, jnp.arange(n), 2)
    pts_r = jax.random.uniform(key, (n, 2))

    def f(p):
        return jnp.sin(jnp.pi * p[:, 0]) * p[:, 1] ** 2

    truth = (2 / np.pi) * (1 / 3)
    err_h = abs(float(f(pts_h).mean()) - truth)
    err_r = abs(float(f(pts_r).mean()) - truth)
    assert err_h < err_r, (err_h, err_r)


def test_sampler_ranges():
    for kind in ["independent", "halton", "hammersley", "stratified"]:
        fn = make_sampler(kind)
        u = fn(jax.random.PRNGKey(1), 0, 1000, 8, 1000)
        u = np.asarray(u)
        assert u.shape == (1000, 8)
        assert (u >= 0).all() and (u < 1).all(), kind
        # roughly uniform marginals
        assert abs(u.mean() - 0.5) < 0.05, kind
