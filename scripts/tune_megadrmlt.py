"""Tune megadrmlt: lane block / n_mut sweeps + splat-precision bias check.

The passes=1 vs passes=2 films come from IDENTICAL chain trajectories
(state math is f32 either way; passes only changes the film matmul
rounding), so their relative difference measures the single-pass bf16
splat error directly.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from drmlt_mitsuba_tpu.integrators.drmlt import DRMLTConfig
from drmlt_mitsuba_tpu.integrators.mcmc import state_from_splats
from drmlt_mitsuba_tpu.integrators.mmlt_grouped import make_mmlt_trace_fixed
from drmlt_mitsuba_tpu.ops.pallas.megadrmlt import (
    make_mega_drmlt, pack_chain_state,
)
from drmlt_mitsuba_tpu.render import film as filmlib
from drmlt_mitsuba_tpu.scene.builders import cornell_box
from drmlt_mitsuba_tpu.scene.types import prepare_scene

N_CALLS = 4


def bench(step, arr, n_mut, n_chains):
    @jax.jit
    def run(arr, film, i):
        arr, delta, stats = step(arr, jnp.stack([jnp.int32(1234), i]))
        return arr, film + delta

    film = jnp.zeros((256, 256, 3))
    a, f = run(arr, film, jnp.int32(0))
    jax.block_until_ready(f)
    t0 = time.perf_counter()
    for c in range(N_CALLS):
        a, f = run(a, f, jnp.int32(c + 1))
    jax.block_until_ready(f)
    dt = (time.perf_counter() - t0) / (N_CALLS * n_mut)
    return n_chains / dt, f


def main():
    scene = prepare_scene(cornell_box(256, 256))
    fc = filmlib.make_film_config(256, 256, "box")
    root = jax.random.PRNGKey(0)
    dcfg = DRMLTConfig(type="orbital")

    def setup(k, n_chains):
        trace_k, cfg_k, n_dims = make_mmlt_trace_fixed(scene, k)
        u0 = jax.random.uniform(root, (n_chains, n_dims))
        state = state_from_splats(u0, trace_k(u0))
        return cfg_k, n_dims, pack_chain_state(state, n_dims)

    # lane-block sweep at k=6 and k=4
    for k in (4, 6):
        cfg_k, n_dims, arr = setup(k, 65536)
        for L in (128, 256, 512):
            try:
                step = make_mega_drmlt(scene, cfg_k, dcfg, fc, k, n_dims,
                                       n_mut=16, passes=1,
                                       weight_channel=False, lane_block=L)
                rate, _ = bench(step, arr, 16, 65536)
                print(f"k={k} L={L}: {rate/1e6:6.2f}M mut/s", flush=True)
            except Exception as e:
                print(f"k={k} L={L}: FAIL {type(e).__name__} "
                      f"{str(e)[:120]}", flush=True)

    # n_mut + chain-count sweep at k=1
    cfg_k, n_dims, arr = setup(1, 65536)
    for n_mut in (16, 32, 64):
        step = make_mega_drmlt(scene, cfg_k, dcfg, fc, 1, n_dims,
                               n_mut=n_mut, passes=1, weight_channel=False)
        rate, _ = bench(step, arr, n_mut, 65536)
        print(f"k=1 n_mut={n_mut}: {rate/1e6:6.2f}M mut/s", flush=True)
    cfg_k, n_dims, arr2 = setup(1, 131072)
    step = make_mega_drmlt(scene, cfg_k, dcfg, fc, 1, n_dims,
                           n_mut=16, passes=1, weight_channel=False)
    rate, _ = bench(step, arr2, 16, 131072)
    print(f"k=1 chains=131072: {rate/1e6:6.2f}M mut/s", flush=True)

    # splat-precision bias: same trajectory, passes=1 vs 2, 32 launches
    cfg_k, n_dims, arr = setup(2, 65536)
    films = {}
    for passes in (1, 2):
        step = make_mega_drmlt(scene, cfg_k, dcfg, fc, 2, n_dims,
                               n_mut=16, passes=passes, weight_channel=False)

        @jax.jit
        def runm(arr):
            film = jnp.zeros((256, 256, 3))

            def body(carry, i):
                arr, film = carry
                arr, delta, _ = step(arr, jnp.stack([jnp.int32(77), i]))
                return (arr, film + delta), 0.0

            (arr, film), _ = jax.lax.scan(body, (arr, film),
                                          jnp.arange(32))
            return film

        films[passes] = np.asarray(runm(arr))
    f1, f2 = films[1], films[2]
    denom = np.abs(f2).mean() + 1e-12
    print(f"splat bias: mean|f1-f2|/mean|f2| = "
          f"{np.abs(f1-f2).mean()/denom:.2e}, "
          f"max rel = {(np.abs(f1-f2)/(np.abs(f2)+1e-3)).max():.2e}, "
          f"mean shift = {(f1.mean()-f2.mean())/denom:+.2e}")


if __name__ == "__main__":
    main()
