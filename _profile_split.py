"""Measure: raw trace throughput vs full drmlt_step, on the TPU."""
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
C = 65536

def trace(u):
    return trace_paths(scene, pcfg, u[:, :pcfg.n_dims])

root = jax.random.PRNGKey(0)

# --- raw trace: how many L(u) evals/sec -------------------------------
@jax.jit
def trace_block(key):
    def body(carry, i):
        u = jax.random.uniform(jax.random.fold_in(key, i), (C, n_dims))
        sp = trace(u)
        return carry + sp.lum.sum(), None
    acc, _ = jax.lax.scan(body, 0.0, jnp.arange(16))
    return acc

t0=time.time(); trace_block(root).block_until_ready(); print("trace compile", time.time()-t0)
t0=time.time()
for i in range(4):
    trace_block(jax.random.fold_in(root, 100+i)).block_until_ready()
dt = (time.time()-t0)/4
print("raw traces/s:", 16*C/dt, f"({dt*1000:.0f} ms / 16-step block)")

# --- full drmlt orbital step ------------------------------------------
dcfg = DRMLTConfig(type="orbital", n_chains=C)
fc = filmlib.make_film_config(width, height, "box")
frozen = jnp.zeros((n_dims,), bool)

u0 = jax.random.uniform(root, (C, n_dims))
sp0 = trace(u0)
state = state_from_splats(u0, sp0)
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

t0=time.time(); s,f = step_block(state, film, jnp.int32(0)); jax.block_until_ready((s,f)); print("step compile", time.time()-t0)
t0=time.time()
for i in range(4):
    s,f = step_block(s, f, jnp.int32(16*(i+1)))
jax.block_until_ready((s,f))
dt2 = (time.time()-t0)/4
print("drmlt steps/s:", 16*C/dt2, f"({dt2*1000:.0f} ms / 16-step block)")
print("traces per step equivalent:", dt2/ (dt/ (16*C)) / (16*C))
