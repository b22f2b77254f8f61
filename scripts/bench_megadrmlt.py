"""Measure the multi-mutation DRMLT megakernel per depth group on TPU.

Compares against the round-2 per-group rates (profile_step.py: k=1 22.6M,
k=2 16.0M, k=4 12.8M, k=6 9.8M mut/s at 65536 chains).
"""
import sys
import time

import jax
import jax.numpy as jnp

from drmlt_mitsuba_tpu.integrators.drmlt import DRMLTConfig
from drmlt_mitsuba_tpu.integrators.mcmc import state_from_splats
from drmlt_mitsuba_tpu.integrators.mmlt_grouped import make_mmlt_trace_fixed
from drmlt_mitsuba_tpu.ops.pallas.megadrmlt import (
    make_mega_drmlt, mega_drmlt_eligible, pack_chain_state,
)
from drmlt_mitsuba_tpu.render import film as filmlib
from drmlt_mitsuba_tpu.scene.builders import cornell_box
from drmlt_mitsuba_tpu.scene.types import prepare_scene

N_CHAINS = 65536
N_MUT = 64
N_CALLS = 4


def main():
    ks = [int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1
                           else "1,2,3,4,5,6".split(","))]
    passes_list = [int(x) for x in (sys.argv[2].split(",")
                                    if len(sys.argv) > 2 else [1])]
    splat_mode = sys.argv[3] if len(sys.argv) > 3 else "three"
    tess = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    width = height = 256
    scene = prepare_scene(cornell_box(width, height, tessellate=tess)
                          if tess else cornell_box(width, height))
    print("T =", scene.tris.v0.shape[0], flush=True)
    fc = filmlib.make_film_config(width, height, "box")
    root = jax.random.PRNGKey(0)
    dcfg = DRMLTConfig(type="orbital", n_chains=N_CHAINS)

    f_k = {1: 0.5508, 2: 0.2477, 3: 0.1074, 4: 0.0558, 5: 0.0257, 6: 0.0126}
    rates = {}
    for k in ks:
        trace_k, cfg_k, n_dims = make_mmlt_trace_fixed(scene, k)
        assert mega_drmlt_eligible(scene, cfg_k, dcfg, fc)
        u0 = jax.random.uniform(root, (N_CHAINS, n_dims))
        state = state_from_splats(u0, trace_k(u0))
        arr = pack_chain_state(state, n_dims)
        for passes in passes_list:
            step = make_mega_drmlt(scene, cfg_k, dcfg, fc, k, n_dims,
                                   n_mut=N_MUT, passes=passes,
                                   weight_channel=False,
                                   splat_mode=splat_mode)

            @jax.jit
            def run(arr, film, i0):
                def body(carry, i):
                    arr, film = carry
                    arr, delta, stats = step(
                        arr, jnp.stack([jnp.int32(1234), i]))
                    return (arr, film + delta), stats[0]
                (arr, film), _ = jax.lax.scan(body, (arr, film),
                                              i0 + jnp.arange(1))
                return arr, film

            film = jnp.zeros((height, width, 3))
            a, f = run(arr, film, jnp.int32(0))
            jax.block_until_ready(f)
            t0 = time.perf_counter()
            for c in range(N_CALLS):
                a, f = run(a, f, jnp.int32(c + 1))
            jax.block_until_ready(f)
            dt = (time.perf_counter() - t0) / (N_CALLS * N_MUT)
            rate = N_CHAINS / dt
            rates[(k, passes)] = rate
            print(f"k={k} dims={n_dims:3d} passes={passes} | "
                  f"{dt*1e3:6.3f} ms/step | {rate/1e6:6.2f}M mut/s",
                  flush=True)

    for passes in passes_list:
        inv = sum(f_k[k] / rates[(k, passes)]
                  for k in ks if (k, passes) in rates)
        wsum = sum(f_k[k] for k in ks)
        print(f"passes={passes}: weighted-harmonic aggregate over measured "
              f"groups ~ {wsum / inv / 1e6:.1f}M mut/s "
              f"(weights renormalized over ks={ks})")


if __name__ == "__main__":
    main()
