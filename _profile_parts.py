import time
import jax, jax.numpy as jnp
from drmlt_mitsuba_tpu.integrators.drmlt import DRMLTConfig, drmlt_step
from drmlt_mitsuba_tpu.integrators.layout import PathConfig
from drmlt_mitsuba_tpu.integrators.mcmc import state_from_splats, splat_state
from drmlt_mitsuba_tpu.integrators.path import trace_paths
from drmlt_mitsuba_tpu.render import film as filmlib
from drmlt_mitsuba_tpu.scene.builders import cornell_box
from drmlt_mitsuba_tpu.scene.types import prepare_scene

width = height = 256
scene = prepare_scene(cornell_box(width, height))
pcfg = PathConfig(max_depth=6, rr_depth=5)
n_dims = pcfg.n_dims + pcfg.n_dims % 2
C = 65536
root = jax.random.PRNGKey(0)
fc = filmlib.make_film_config(width, height, "box")

def trace(u):
    return trace_paths(scene, pcfg, u[:, :pcfg.n_dims])

u0 = jax.random.uniform(root, (C, n_dims))
sp0 = trace(u0)
st0 = state_from_splats(u0, sp0)

def timeit(fn, *args, n=3, tag=""):
    r = fn(*args); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    print(f"{tag}: {(time.time()-t0)/n*1000:.1f} ms")
    return r

# 16x trace only
@jax.jit
def just_traces(key):
    def body(c, i):
        u = jax.random.uniform(jax.random.fold_in(key, i), (C, n_dims))
        sp = trace(u)
        return c + sp.lum.sum() + sp.value.sum() + sp.pos.sum(), None
    a,_ = jax.lax.scan(body, 0.0, jnp.arange(32))
    return a
timeit(just_traces, root, tag="32 traces (no film)")

# 16x splat only (48 splats = 3/step)
film0 = filmlib.new_film(fc)
@jax.jit
def just_splats(film):
    def body(f, i):
        f = splat_state(fc, f, st0.pos, st0.value, st0.lum * 0.3)
        return f, None
    f,_ = jax.lax.scan(body, film, jnp.arange(48))
    return f
timeit(just_splats, film0, tag="48 splats")

# full step block for comparison
dcfg = DRMLTConfig(type="orbital", n_chains=C)
frozen = jnp.zeros((n_dims,), bool)
@jax.jit
def step_block(state, film, i0):
    def body(carry, i):
        key = jax.random.fold_in(root, i)
        (s, f, _), stats = drmlt_step(trace, dcfg, fc, frozen,
                                      (carry[0], carry[1], None), key)
        return (s, f), stats["a1"]
    (state, film), _ = jax.lax.scan(body, (state, film), i0 + jnp.arange(16))
    return state, film
timeit(step_block, st0, film0, jnp.int32(0), tag="16 drmlt steps (= 32 traces + 48 splats + MH)")
