"""Benchmark: DRMLT mutations/sec on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference repo publishes no numbers (BASELINE.md); the CPU anchor for
vs_baseline is the driver-set target of a 64-core CPU node running the
reference drmlt (path technique, ~200k mutations/work-unit).  Until that
anchor is measured on the eval machine we use 2.0e6 mutations/s as the
stand-in (conservative for 64 cores of scalar Mitsuba on a ~40-triangle
scene; see BASELINE.md "north-star" — target is >=10x => vs_baseline >= 10).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

CPU_ANCHOR_MUTATIONS_PER_SEC = 2.0e6


def main():
    from drmlt_mitsuba_tpu.integrators.drmlt import DRMLTConfig, drmlt_step
    from drmlt_mitsuba_tpu.integrators.layout import PathConfig
    from drmlt_mitsuba_tpu.integrators.mcmc import state_from_splats
    from drmlt_mitsuba_tpu.integrators.path import trace_paths
    from drmlt_mitsuba_tpu.render import film as filmlib
    from drmlt_mitsuba_tpu.scene.builders import cornell_box
    from drmlt_mitsuba_tpu.scene.types import prepare_scene

    width = height = 256
    scene = prepare_scene(cornell_box(width, height))
    pcfg = PathConfig(max_depth=6, rr_depth=5)
    n_dims = pcfg.n_dims + pcfg.n_dims % 2
    n_chains = 65536
    steps_per_call = 16
    dcfg = DRMLTConfig(type="orbital", n_chains=n_chains)
    fc = filmlib.make_film_config(width, height, "box")

    def trace(u):
        return trace_paths(scene, pcfg, u[:, : pcfg.n_dims])

    frozen = jnp.zeros((n_dims,), bool)
    root = jax.random.PRNGKey(0)

    @jax.jit
    def run_block(state, film, i0):
        def body(carry, i):
            key = jax.random.fold_in(root, i)
            (state, film, _), stats = drmlt_step(
                trace, dcfg, fc, frozen, (carry[0], carry[1], None), key
            )
            return (state, film), stats["a1"]

        (state, film), _ = jax.lax.scan(
            body, (state, film), i0 + jnp.arange(steps_per_call)
        )
        return state, film

    u0 = jax.random.uniform(root, (n_chains, n_dims))
    state = state_from_splats(u0, trace(u0))
    film = filmlib.new_film(fc)

    # warmup / compile
    state, film = run_block(state, film, jnp.int32(0))
    jax.block_until_ready(film)

    n_calls = 5
    t0 = time.perf_counter()
    for c in range(n_calls):
        state, film = run_block(state, film, jnp.int32((c + 1) * steps_per_call))
    jax.block_until_ready(film)
    dt = time.perf_counter() - t0

    mutations = n_calls * steps_per_call * n_chains
    rate = mutations / dt
    print(json.dumps({
        "metric": "drmlt_orbital_mutations_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "mutations/s",
        "vs_baseline": round(rate / CPU_ANCHOR_MUTATIONS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
