"""Pallas TPU ray-triangle sweep kernel.

The XLA brute-force sweep (ops/intersect.py) leaves >5x on the table for
small scenes because the triangle axis lands on the 128-lane dimension and
gets padded.  This kernel pins the layout: rays ride the 128-lane axis,
triangles ride the 8-sublane axis — every VPU op is a dense (8, BR) tile
(Moller-Trumbore against 8 triangles x BR rays at once).

Inputs are SoA-transposed on the host once per scene:
  rays  (8, R)     rows ox oy oz dx dy dz (2 pad rows)
  tris  (T/8, 8, 16) last axis: v0 e1 e2 xyz + valid flag (7 pad cols)
Output: best_t (8, R) partial minima + best_i (8, R) indices, reduced to
(R,) outside the kernel (cross-sublane argmin is cheaper in XLA).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_BLOCK = 1024
_INF = 3.0e38


def _sweep_kernel(rays_ref, tris_ref, t_ref, i_ref, *, n_tri_blocks,
                  ray_eps):
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]

    shape = (8, ox.shape[1])
    best_t0 = jnp.full(shape, _INF, jnp.float32)
    best_i0 = jnp.full(shape, -1, jnp.int32)

    def body(tb, carry):
        best_t, best_i = carry
        td = tris_ref[tb]                     # (8, 16)
        v0x, v0y, v0z = td[:, 0:1], td[:, 1:2], td[:, 2:3]
        e1x, e1y, e1z = td[:, 3:4], td[:, 4:5], td[:, 5:6]
        e2x, e2y, e2z = td[:, 6:7], td[:, 7:8], td[:, 8:9]
        valid = td[:, 9:10] > 0.5

        # pvec = d x e2  -> (8, BR)
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok = jnp.abs(det) > 1e-12
        inv = 1.0 / jnp.where(ok, det, 1.0)
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        b1 = (tx * px + ty * py + tz * pz) * inv
        # qvec = tvec x e1
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        b2 = (dx * qx + dy * qy + dz * qz) * inv
        t = (e2x * qx + e2y * qy + e2z * qz) * inv
        hit = (
            ok & valid & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
            & (t > ray_eps) & (t < best_t)
        )
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        idx = tb * 8 + row
        best_i = jnp.where(hit, idx, best_i)
        best_t = jnp.where(hit, t, best_t)
        return best_t, best_i

    carry = (best_t0, best_i0)
    if n_tri_blocks <= 64:
        for tb in range(n_tri_blocks):   # unrolled: keeps carries in regs
            carry = body(tb, carry)
        best_t, best_i = carry
    else:
        best_t, best_i = jax.lax.fori_loop(
            0, n_tri_blocks, body, carry
        )
    t_ref[:, :] = best_t
    i_ref[:, :] = best_i


def pack_triangles(v0, e1, e2, valid) -> jnp.ndarray:
    """Host-side: (T,3) arrays -> (ceil(T/8), 8, 16) kernel layout."""
    T = v0.shape[0]
    pad = (-T) % 8
    td = np.zeros((T + pad, 16), np.float32)
    td[:T, 0:3] = np.asarray(v0)
    td[:T, 3:6] = np.asarray(e1)
    td[:T, 6:9] = np.asarray(e2)
    td[:T, 9] = np.asarray(valid, np.float32)
    return jnp.asarray(td.reshape(-1, 8, 16))


@functools.partial(jax.jit, static_argnames=("ray_eps", "interpret"))
def sweep_closest(rays6, tris_packed, ray_eps: float = 1e-4,
                  interpret: bool = False):
    """rays6: (6, R) [ox oy oz dx dy dz]; returns (best_t (R,), idx (R,)).

    R must be a multiple of RAY_BLOCK (callers pad).
    """
    R = rays6.shape[1]
    n_tri_blocks = tris_packed.shape[0]
    pad_rows = jnp.zeros((2, R), rays6.dtype)
    rays8 = jnp.concatenate([rays6, pad_rows], axis=0)

    kernel = functools.partial(
        _sweep_kernel, n_tri_blocks=n_tri_blocks, ray_eps=ray_eps
    )
    t8, i8 = pl.pallas_call(
        kernel,
        grid=(R // RAY_BLOCK,),
        in_specs=[
            pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tri_blocks, 8, 16), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, R), jnp.float32),
            jax.ShapeDtypeStruct((8, R), jnp.int32),
        ],
        interpret=interpret,
    )(rays8, tris_packed)

    # cross-sublane reduction outside the kernel (min + masked-min index;
    # gathers are slow on TPU)
    best_t = jnp.min(t8, axis=0)
    big = jnp.int32(2**30)
    best_i = jnp.min(jnp.where(t8 <= best_t[None, :], i8, big), axis=0)
    best_i = jnp.where(best_t < _INF, best_i, -1)
    return best_t, best_i


# ---------------------------------------------------------------------------
# v2: scalar-driven sweep — triangle scalars stream from SMEM, rays sit as
# dense (8, R/8) VMEM tiles, so every VPU op is a full dense tile with a
# free scalar broadcast (no (8,1)x(1,N) broadcast materialization).
# ---------------------------------------------------------------------------

def _sweep_kernel_v2(tri_ref, rays_ref, t_ref, i_ref, *, n_tris, ray_eps):
    ox = rays_ref[0]
    oy = rays_ref[1]
    oz = rays_ref[2]
    dx = rays_ref[3]
    dy = rays_ref[4]
    dz = rays_ref[5]
    shape = ox.shape

    def body(t, carry):
        best_t, best_i = carry
        v0x = tri_ref[t, 0]
        v0y = tri_ref[t, 1]
        v0z = tri_ref[t, 2]
        e1x = tri_ref[t, 3]
        e1y = tri_ref[t, 4]
        e1z = tri_ref[t, 5]
        e2x = tri_ref[t, 6]
        e2y = tri_ref[t, 7]
        e2z = tri_ref[t, 8]
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok = jnp.abs(det) > 1e-12
        inv = 1.0 / jnp.where(ok, det, 1.0)
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        b1 = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        b2 = (dx * qx + dy * qy + dz * qz) * inv
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv
        hit = (
            ok & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
            & (tt > ray_eps) & (tt < best_t)
        )
        best_i = jnp.where(hit, t, best_i)
        best_t = jnp.where(hit, tt, best_t)
        return best_t, best_i

    best_t, best_i = jax.lax.fori_loop(
        0, n_tris, body,
        (jnp.full(shape, _INF, jnp.float32), jnp.full(shape, -1, jnp.int32)),
    )
    t_ref[:, :] = best_t
    i_ref[:, :] = best_i


def pack_triangles_v2(v0, e1, e2, valid) -> jnp.ndarray:
    """(T,3) arrays -> (T, 16) SMEM scalar table (invalid tris degenerate)."""
    T = v0.shape[0]
    td = np.zeros((T, 16), np.float32)
    td[:, 0:3] = np.asarray(v0)
    td[:, 3:6] = np.asarray(e1)
    td[:, 6:9] = np.asarray(e2)
    # degenerate edges for invalid triangles -> det 0 -> never hit
    bad = ~np.asarray(valid, bool)
    td[bad, 3:9] = 0.0
    return jnp.asarray(td)


@functools.partial(jax.jit, static_argnames=("ray_eps", "interpret"))
def sweep_closest_v2(rays6, tris_smem, ray_eps: float = 1e-4,
                     interpret: bool = False):
    """rays6: (6, R); tris_smem: (T, 16).  Returns (t (R,), idx (R,))."""
    R = rays6.shape[1]
    n_tris = tris_smem.shape[0]
    R8 = R // 8
    rays = rays6.reshape(6, 8, R8)
    block = min(R8, 4096)

    kernel = functools.partial(
        _sweep_kernel_v2, n_tris=n_tris, ray_eps=ray_eps
    )
    t8, i8 = pl.pallas_call(
        kernel,
        grid=(R8 // block,),
        in_specs=[
            pl.BlockSpec((n_tris, 16), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((6, 8, block), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, R8), jnp.float32),
            jax.ShapeDtypeStruct((8, R8), jnp.int32),
        ],
        interpret=interpret,
    )(tris_smem, rays)
    return t8.reshape(R), i8.reshape(R)
