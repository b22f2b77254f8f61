import time, json
import jax, jax.numpy as jnp
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
root = jax.random.PRNGKey(0)
fc = filmlib.make_film_config(width, height, "box")
frozen = jnp.zeros((n_dims,), bool)

def trace(u):
    return trace_paths(scene, pcfg, u[:, :pcfg.n_dims])

for C in (65536, 131072, 262144):
    dcfg = DRMLTConfig(type="orbital", n_chains=C)
    u0 = jax.random.uniform(root, (C, n_dims))
    state = state_from_splats(u0, trace(u0))
    film = filmlib.new_film(fc)

    @jax.jit
    def step_block(state, film, i0):
        def body(carry, i):
            key = jax.random.fold_in(root, i)
            (s, f, _), stats = drmlt_step(trace, dcfg, fc, frozen,
                                          (carry[0], carry[1], None), key)
            return (s, f), stats["a1"]
        (state, film), _ = jax.lax.scan(body, (state, film),
                                        i0 + jnp.arange(16))
        return state, film

    t0=time.time(); s,f = step_block(state, film, jnp.int32(0)); jax.block_until_ready((s,f))
    comp = time.time()-t0
    t0=time.time()
    for i in range(3):
        s,f = step_block(s, f, jnp.int32(16*(i+1)))
    jax.block_until_ready((s,f))
    dt = (time.time()-t0)/3
    print(f"C={C}: {16*C/dt/1e6:.2f}M mut/s  ({dt*1000:.0f} ms/block, compile {comp:.0f}s)")
