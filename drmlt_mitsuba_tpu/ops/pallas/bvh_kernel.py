"""Pallas clustered sweep for large scenes (the BVH-accelerated path).

SMEM on this TPU caps at ~32-64KB, so a node-walk with a resident tree is
out; instead the native SAH builder (native/bvh_builder.cpp) cuts the scene
into C spatially-tight clusters (= BVH leaves of <= TPC triangles), and the
kernel streams one cluster per grid step through VMEM (double-buffered DMA
by the Pallas pipeline) while the cluster AABBs sit in SMEM:

    grid = (ray_tiles, C); out blocks revisit per ray tile
    step (i, c): slab-test cluster c's AABB against the whole (8, blk) ray
    tile; @pl.when(any ray hits) -> Moller-Trumbore the cluster's triangle
    blocks (8 tris x tile per VPU op).

Tile-level culling skips distant clusters for coherent rays; the worst
(incoherent) case degrades to the brute sweep plus C AABB tests.  HBM
traffic is T*64B per ray tile — streaming, so scene size is unbounded by
VMEM/SMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.0e38


def pack_clusters(bvh, order, v0, e1, e2, valid, tpc: int = 256):
    """Host-side: BVH (built with max_leaf=tpc) -> cluster tables.

    Returns (aabbs (C, 8) f32, blocks (C, tpc//8, 8, 16) f32,
    gidx (C, tpc) i32 original-triangle ids, -1 = padding).
    """
    count = np.asarray(bvh.count)
    first = np.asarray(bvh.first)
    nmin = np.asarray(bvh.nodes_min, np.float32)
    nmax = np.asarray(bvh.nodes_max, np.float32)
    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    valid = np.asarray(valid, bool)

    leaves = np.nonzero(count > 0)[0]
    C = len(leaves)
    blocks = np.zeros((C, tpc // 8, 8, 16), np.float32)
    gidx = np.full((C, tpc), -1, np.int32)
    aabbs = np.zeros((C, 8), np.float32)
    for s, node in enumerate(leaves):
        idx = np.asarray(order[first[node]:first[node] + count[node]])
        k = len(idx)
        assert k <= tpc, (k, tpc)
        flat = np.zeros((tpc, 16), np.float32)
        flat[:k, 0:3] = v0[idx]
        flat[:k, 3:6] = e1[idx]
        flat[:k, 6:9] = e2[idx]
        flat[:k, 9] = valid[idx].astype(np.float32)
        blocks[s] = flat.reshape(tpc // 8, 8, 16)
        gidx[s, :k] = idx
        aabbs[s, 0:3] = nmin[node]
        aabbs[s, 3:6] = nmax[node]
    return jnp.asarray(aabbs), jnp.asarray(blocks), jnp.asarray(gidx)


def _cluster_kernel(aabb_ref, tris_ref, rays_ref, t_ref, i_ref, *,
                    n_tri_blocks, tpc, ray_eps):
    # layout: rays_ref (8, blk) rows = [ox oy oz dx dy dz pad pad]; the
    # triangle data rides the 8 sublanes so each VPU op tests 8 triangles
    # against blk rays (same layout as the v1 brute kernel)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        t_ref[:, :] = jnp.full(t_ref.shape, _INF, jnp.float32)
        i_ref[:, :] = jnp.full(i_ref.shape, -1, jnp.int32)

    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]

    eps = 1e-12
    inv_x = 1.0 / jnp.where(jnp.abs(dx) > eps, dx,
                            jnp.where(dx >= 0, eps, -eps))
    inv_y = 1.0 / jnp.where(jnp.abs(dy) > eps, dy,
                            jnp.where(dy >= 0, eps, -eps))
    inv_z = 1.0 / jnp.where(jnp.abs(dz) > eps, dz,
                            jnp.where(dz >= 0, eps, -eps))

    lox = aabb_ref[c, 0]; loy = aabb_ref[c, 1]; loz = aabb_ref[c, 2]
    hix = aabb_ref[c, 3]; hiy = aabb_ref[c, 4]; hiz = aabb_ref[c, 5]

    tx0 = (lox - ox) * inv_x
    tx1 = (hix - ox) * inv_x
    ty0 = (loy - oy) * inv_y
    ty1 = (hiy - oy) * inv_y
    tz0 = (loz - oz) * inv_z
    tz1 = (hiz - oz) * inv_z
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.minimum(tz0, tz1),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.maximum(tz0, tz1),
    )
    # per-ray current best = min over the 8 tri-sublane rows
    cur_best = jnp.min(t_ref[:, :], axis=0, keepdims=True)
    box_hit = (tmax >= jnp.maximum(tmin, ray_eps)) & (tmin < cur_best)

    @pl.when(jnp.any(box_hit))
    def _():
        best_t = t_ref[:, :]
        best_i = i_ref[:, :]
        for tb in range(n_tri_blocks):
            td = tris_ref[0, tb]           # (8, 16)
            v0x = td[:, 0:1]; v0y = td[:, 1:2]; v0z = td[:, 2:3]
            e1x = td[:, 3:4]; e1y = td[:, 4:5]; e1z = td[:, 5:6]
            e2x = td[:, 6:7]; e2y = td[:, 7:8]; e2z = td[:, 8:9]
            ok_tri = td[:, 9:10] > 0.5
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            okd = jnp.abs(det) > 1e-12
            inv = 1.0 / jnp.where(okd, det, 1.0)
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
                okd & ok_tri & (b1 >= 0.0) & (b2 >= 0.0)
                & (b1 + b2 <= 1.0) & (tt > ray_eps) & (tt < best_t)
            )
            row = jax.lax.broadcasted_iota(jnp.int32, best_t.shape, 0)
            gi = (c * tpc + tb * 8) + row
            best_i = jnp.where(hit, gi, best_i)
            best_t = jnp.where(hit, tt, best_t)
        t_ref[:, :] = best_t
        i_ref[:, :] = best_i


@functools.partial(jax.jit, static_argnames=("ray_eps", "interpret", "block"))
def sweep_clusters(rays6, aabbs, blocks, ray_eps: float = 1e-4,
                   interpret: bool = False, block: int = 1024):
    """rays6 (6, R) -> (best_t (R,), packed_idx (R,)).

    packed_idx = cluster*tpc + local; map to original triangle ids with the
    gidx array from pack_clusters (flattened)."""
    R = rays6.shape[1]
    C, n_tri_blocks, _, _ = blocks.shape
    tpc = n_tri_blocks * 8
    pad_rows = jnp.zeros((2, R), rays6.dtype)
    rays8 = jnp.concatenate([rays6, pad_rows], axis=0)   # (8, R)
    blk = min(R, block)

    kernel = functools.partial(
        _cluster_kernel, n_tri_blocks=n_tri_blocks, tpc=tpc, ray_eps=ray_eps
    )
    t8, i8 = pl.pallas_call(
        kernel,
        grid=(R // blk, C),
        in_specs=[
            pl.BlockSpec((C, 8), lambda i, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_tri_blocks, 8, 16), lambda i, c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, blk), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, blk), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, blk), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, R), jnp.float32),
            jax.ShapeDtypeStruct((8, R), jnp.int32),
        ],
        interpret=interpret,
    )(aabbs, blocks, rays8)
    # cross-sublane (8 tris per block row) reduction
    best_t = jnp.min(t8, axis=0)
    big = jnp.int32(2**30)
    best_i = jnp.min(jnp.where(t8 <= best_t[None, :], i8, big), axis=0)
    best_i = jnp.where(best_t < _INF, best_i, -1)
    return best_t, best_i
