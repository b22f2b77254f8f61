"""Probe 2: realized MXU efficiency of the in-kernel one-hot film splat
at candidate shapes.  Variants:
  A: matmul-only (A, B prebuilt outside the loop)      -> MXU ceiling
  B: construction (iota-compare one-hots) + matmul      -> realistic
  C: B + lane-flatten reshapes from (8, L) tiles        -> full path
Each runs N_MUT iterations per block over 32 blocks (65536 lanes) so the
per-step-equivalent time is directly comparable to profile_step.py.
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 256, 256
L = 256
K = 8 * L          # 2048 splat slots per block-mutation (one state)
N_MUT = 16
N_BLOCKS = 32
W3 = 3 * W         # channels stacked along N


def kern(seed_ref, pos_ref, val_ref, film_ref, *, variant):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    @pl.when(pl.program_id(0) == 0)
    def _():
        film_ref[...] = jnp.zeros_like(film_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, (H, K), 0)
    cols3 = jax.lax.broadcasted_iota(jnp.int32, (W3, K), 0) % W
    chan3 = jax.lax.broadcasted_iota(jnp.int32, (W3, K), 0) // W

    py0 = jnp.minimum(pos_ref[0] * H, H - 1.0).astype(jnp.int32)
    px0 = jnp.minimum(pos_ref[1] * W, W - 1.0).astype(jnp.int32)
    A0 = (rows == py0.reshape(1, K)).astype(jnp.bfloat16)
    px1_0 = px0.reshape(1, K)
    v3_0 = jnp.concatenate(
        [val_ref[c].reshape(1, K) for c in range(3)], axis=0)  # (3, K)
    B0 = jnp.where(
        cols3 == px1_0,
        jnp.take_along_axis(v3_0, chan3, axis=0)
        if False else (jnp.where(chan3 == 0, v3_0[0:1], 0.0)
                       + jnp.where(chan3 == 1, v3_0[1:2], 0.0)
                       + jnp.where(chan3 == 2, v3_0[2:3], 0.0)),
        0.0).astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((), ()))

    def body(m, acc):
        bits = pltpu.prng_random_bits((8, L))
        u = (bits >> jnp.uint32(8)).astype(jnp.float32) * (2.0 ** -24)
        if variant == "A":
            A, B = A0, B0
        else:
            py = jnp.minimum((pos_ref[0] + u * 1e-6) * H, H - 1.0)
            px = jnp.minimum((pos_ref[1] + u * 1e-6) * W, W - 1.0)
            pyi = jnp.floor(py).astype(jnp.int32).reshape(1, K)
            pxi = jnp.floor(px).astype(jnp.int32).reshape(1, K)
            vr = (val_ref[0] + u * 1e-6).reshape(1, K)
            vg = (val_ref[1] + u * 1e-6).reshape(1, K)
            vb = (val_ref[2] + u * 1e-6).reshape(1, K)
            A = (rows == pyi).astype(jnp.bfloat16)
            onc = cols3 == pxi
            B = (jnp.where(onc & (chan3 == 0), vr, 0.0)
                 + jnp.where(onc & (chan3 == 1), vg, 0.0)
                 + jnp.where(onc & (chan3 == 2), vb, 0.0)).astype(jnp.bfloat16)
        delta = jax.lax.dot_general(A, B, dn,
                                    preferred_element_type=jnp.float32)
        film_ref[0] += delta
        return acc + jnp.sum(u)

    jax.lax.fori_loop(0, N_MUT, body, jnp.float32(0.0))


def run_variant(variant, pos, val):
    @jax.jit
    def run(pos, val):
        return pl.pallas_call(
            functools.partial(kern, variant=variant),
            grid=(N_BLOCKS,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((2, 8, L), lambda i: (0, 0, i)),
                pl.BlockSpec((3, 8, L), lambda i: (0, 0, i)),
            ],
            out_specs=pl.BlockSpec((1, H, W3), lambda i: (0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, H, W3), jnp.float32),
        )(jnp.asarray([1234], jnp.int32), pos, val)

    film = run(pos, val)
    jax.block_until_ready(film)
    t0 = time.perf_counter()
    for _ in range(10):
        film = run(pos, val)
    jax.block_until_ready(film)
    dt = (time.perf_counter() - t0) / 10
    flops = N_BLOCKS * N_MUT * 2 * H * K * W3
    print(f"variant {variant}: {dt*1e3:7.3f} ms/launch | per-step-equiv "
          f"{dt/N_MUT*1e3:6.3f} ms (1 state, 3ch, 1 pass) | "
          f"{flops/dt/1e12:6.1f} TFLOPS eff | film sum {float(film.sum()):.1f}",
          flush=True)


def main():
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (2, 8, N_BLOCKS * L))
    val = jax.random.uniform(key, (3, 8, N_BLOCKS * L))
    for v in ("A", "B"):
        run_variant(v, pos, val)


if __name__ == "__main__":
    main()
