"""Probe: Mosaic lowering of the megadrmlt building blocks on real TPU.

Checks, inside ONE kernel: prng_seed/prng_random_bits in a fori_loop,
(8, L) -> (1, 8L) lane-flatten reshape, bf16 NT dot_general accumulating
into an out ref inside the loop.  Also times the one-hot film splat
matmul at the shapes megadrmlt will use.
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = W = 256
L = 256
N_MUT = 16
N_STATES = 3


def kernel(seed_ref, pos_ref, val_ref, film_ref, stat_ref):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    @pl.when(pl.program_id(0) == 0)
    def _():
        film_ref[...] = jnp.zeros_like(film_ref)

    def body(m, acc):
        # random uniforms (8, L)
        bits = pltpu.prng_random_bits((8, L))
        u = (bits >> jnp.uint32(8)).astype(jnp.float32) * (2.0 ** -24)
        py = jnp.minimum((pos_ref[0] + u * 0.0) * H, H - 1.0)
        px = jnp.minimum(pos_ref[1] * W, W - 1.0)
        pyf = jnp.floor(py).astype(jnp.int32)
        pxf = jnp.floor(px).astype(jnp.int32)
        # lane-flatten (8, L) -> (1, 8L)
        py1 = pyf.reshape(1, 8 * L)
        px1 = pxf.reshape(1, 8 * L)
        v1 = (val_ref[0] * (1.0 + u * 1e-6)).reshape(1, 8 * L)
        # one-hot NT matmul: A (H, K) onehot rows, B (W, K) onehot cols * val
        rows = jax.lax.broadcasted_iota(jnp.int32, (H, 8 * L), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (W, 8 * L), 0)
        A = (rows == py1).astype(jnp.bfloat16)
        Bv = jnp.where(cols == px1, v1, 0.0).astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))
        delta = jax.lax.dot_general(A, Bv, dn,
                                    preferred_element_type=jnp.float32)
        film_ref[0] += delta
        return acc + jnp.sum(u)

    acc = jax.lax.fori_loop(0, N_MUT, body, jnp.zeros((8, L), jnp.float32))
    stat_ref[...] = acc


def main():
    n_blocks = 32
    C = n_blocks * 8 * L
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (2, 8, n_blocks * L))
    val = jax.random.uniform(key, (3, 8, n_blocks * L))

    @jax.jit
    def run(pos, val):
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((2, 8, L), lambda i: (0, 0, i)),
                pl.BlockSpec((3, 8, L), lambda i: (0, 0, i)),
            ],
            out_specs=[
                pl.BlockSpec((1, H, W), lambda i: (0, 0, 0)),
                pl.BlockSpec((8, L), lambda i: (0, i)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, H, W), jnp.float32),
                jax.ShapeDtypeStruct((8, n_blocks * L), jnp.float32),
            ],
        )(jnp.asarray([1234], jnp.int32), pos, val)

    film, stat = run(pos, val)
    jax.block_until_ready(film)
    print("lowered OK; film sum", float(film.sum()),
          "expected ~", C * N_MUT * 0.5, "stat mean", float(stat.mean()))
    t0 = time.perf_counter()
    for _ in range(10):
        film, stat = run(pos, val)
    jax.block_until_ready(film)
    dt = (time.perf_counter() - t0) / 10
    # one matmul per mutation per block here; megadrmlt = 3 states x 3ch x2
    print(f"{dt*1e3:.3f} ms / launch ({N_MUT} mutations, {C} lanes, "
          f"1 matmul per mut-block); per-step equiv {dt/N_MUT*1e3:.3f} ms")


if __name__ == "__main__":
    main()
