"""ERPT — energy-redistribution path tracing (ref: src/integrators/erpt/).

The reference redistributes each path-traced sample's energy through short
Veach-mutator Metropolis chains (equal-deposition rule).  The TPU-native
formulation works in primary sample space (capability-equivalent, same
estimator family as our other MCMC code):

  per batch: trace N uniform PT samples -> energies e_i and the batch
  normalization b = mean(e); resample C chain seeds ~ e_i (energy
  redistribution); run m small-step MH mutations per chain, splatting both
  states with Veach weights; develop with the PER-BATCH b — no global
  bootstrap pass, the PT samples themselves normalize each batch (the
  defining ERPT property).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from drmlt_mitsuba_tpu.core.rng import pss_wrap
from drmlt_mitsuba_tpu.integrators import kernels
from drmlt_mitsuba_tpu.integrators.mcmc import (
    metropolis_clamp, select_state, splat_state, state_from_splats,
)


@dataclasses.dataclass(frozen=True)
class ERPTConfig:
    n_chains: int = 4096          # chains per batch
    chain_length: int = 100       # numChains*mutations equivalent
    samples_per_batch: int = 16384
    sigma: float = kernels.SIGMA_DEFAULT
    kelemen: bool = True


def render_erpt(trace_fn, cfg: ERPTConfig, film_cfg, root_key, n_dims: int,
                n_batches: int):
    """Returns (image, aux)."""
    from drmlt_mitsuba_tpu.render import film as filmlib

    kern = (kernels.Kelemen() if cfg.kelemen
            else kernels.Gaussian(cfg.sigma))

    def one_batch(film_total, bi):
        from drmlt_mitsuba_tpu.render import film as filmlib

        film = filmlib.new_film(film_cfg)
        key = jax.random.fold_in(root_key, bi)
        k_pt, k_pick, k_run = jax.random.split(key, 3)

        # PT stage: energies + batch normalization
        u = jax.random.uniform(k_pt, (cfg.samples_per_batch, n_dims))
        sp = trace_fn(u)
        e = jnp.where(jnp.isfinite(sp.lum) & (sp.lum >= 0), sp.lum, 0.0)
        b = jnp.mean(e)

        # redistribute: chain seeds ~ energy (cdf inversion)
        cdf = jnp.cumsum(e)
        u_pick = jax.random.uniform(k_pick, (cfg.n_chains,)) * cdf[-1]
        idx = jnp.clip(jnp.searchsorted(cdf, u_pick),
                       0, cfg.samples_per_batch - 1)
        state = state_from_splats(
            u[idx],
            jax.tree.map(lambda a: a[idx], sp),
        )

        def mh(carry, i):
            state, film = carry
            kk = jax.random.fold_in(k_run, i)
            k1, k2 = jax.random.split(kk)
            du = kern.sample(
                jax.random.uniform(k1, state.u.shape + (2,))
            )
            u_prop = pss_wrap(state.u + du)
            prop = state_from_splats(u_prop, trace_fn(u_prop))
            a = metropolis_clamp(prop.lum / jnp.maximum(state.lum, 1e-30))
            film = splat_state(film_cfg, film, state.pos, state.value,
                               1.0 - a)
            film = splat_state(film_cfg, film, prop.pos, prop.value, a)
            accept = jax.random.uniform(k2, a.shape) < a
            return (select_state(accept, prop, state), film), jnp.mean(a)

        (state, film), accs = jax.lax.scan(
            mh, (state, film), jnp.arange(cfg.chain_length)
        )
        # each batch is normalized by ITS OWN b (the ERPT property)
        return film_total + film * b, (b, jnp.mean(accs))

    @jax.jit
    def run():
        film0 = filmlib.new_film(film_cfg)
        film, (bs, accs) = jax.lax.scan(
            one_batch, film0, jnp.arange(n_batches)
        )
        return film, bs, accs

    film, bs, accs = run()
    n_pp = (n_batches * cfg.n_chains * cfg.chain_length) / film_cfg.npixels
    img = filmlib.develop(film_cfg, film, mode="splat", scale=1.0 / n_pp)
    return img, dict(b=bs, accept=accs)
