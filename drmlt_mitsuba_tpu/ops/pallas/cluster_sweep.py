"""In-kernel clustered ray traversal: the TPU answer to the reference's
SAH kd-tree (include/mitsuba/render/gkdtree.h:958 build,
skdtree.h:125,156 traversal).

The brute in-kernel sweep is O(T) per ray and every lane pays every
triangle; a scalar kd-tree walk is the opposite extreme and maps terribly
onto 8x128 SIMD lanes (per-lane gathers run ~1 row/cycle on TPU).  This
module takes the middle road that fits the hardware:

  host:   a binned-SAH BVH (native/bvh_builder.cpp) is cut at leaves,
          leaves are greedily merge-packed (DFS order, so spatially
          adjacent) into clusters of <= TPC triangles at ~95% fill, and
          the scene's triangle array is REORDERED cluster-contiguous
          (cluster_reorder).  Each traversal-table slot carries its
          global triangle id as a fetched feature, so clusters need no
          fixed stride in the attribute table.
  kernel: phase 1 slab-tests every cluster AABB against every lane
          (a (C, K) entry-distance table -- pure VPU, ~35 ops per
          8-cluster chunk).  Phase 2 iterates per-lane FRONT-TO-BACK:
          each lane selects its nearest unvisited cluster (cross-sublane
          argmin + iota tie-break -- no gathers), a one-hot (C, K)
          selection matrix fetches that cluster's triangle block over the
          MXU (telescoped bf16 planes), and the TPC fetched triangles are
          Moller-Trumbore-tested 8 per VPU op.  A lane prunes every
          cluster whose entry distance exceeds its current best hit, so
          typical rays finish in 2-4 iterations (the while_loop runs to
          the max over the lane tile).

Per-iteration cost is 10*T*K*passes MXU MACs (invariant to TPC: COLS *
C = 10*T) + ~45*TPC/8 VPU ops per 128 lanes; the MXU term is linear in
scene size but with a ~20x smaller constant than the brute sweep's VPU
term, and the iteration count is O(clusters overlapping the ray), not
O(T).  Traversal runs 2 bf16 planes (~16 mantissa bits) by default; the
winner's hit distance is recomputed in exact f32 from the 3-pass
attribute fetch, so only the WINNER IDENTITY near sub-1e-4 ties can
differ from the brute sweep.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_INF = 3.0e38
_BIG = 3.0e37
RAY_EPS = 1e-4

# traversal features per slot: v0(3) e1(3) e2(3) gid(1); padding slots
# keep zero edges -> det 0 -> never hit
_CLU_FEATS = 10


# ----------------------------------------------------------------- host
def cluster_reorder(scene, tpc: int = 128):
    """Reorder scene.tris cluster-contiguous and return
    (scene', aabbs (Cp, 8) np.float32, starts (Cp,) np.int64, n_clusters).

    Clusters are greedy merge-packs of binned-SAH BVH leaves (DFS leaf
    order, so merged leaves are spatially adjacent) holding <= tpc valid
    triangles each; the triangle array is PERMUTED (no padding -- slot
    counts vary), cluster c owning rows [starts[c], starts[c+1]).  Cp is
    the cluster count rounded up to a multiple of 8; padding clusters
    get inverted AABBs that never pass the slab test.
    emitters.tri_idx is remapped through the permutation."""
    from drmlt_mitsuba_tpu.scene.bvh import build_bvh

    tris = scene.tris
    v0 = np.asarray(tris.v0, np.float32)
    e1 = np.asarray(tris.e1, np.float32)
    e2 = np.asarray(tris.e2, np.float32)
    valid = np.asarray(tris.valid, bool)
    T = v0.shape[0]
    # build with tpc-sized leaves and merge-pack the remainder; a
    # small-leaf build + repack measured WORSE on chip (fill collapsed
    # under the SA gate at 19.6k tris: 0.14 at slack=1)
    bvh, order = build_bvh(v0, e1, e2, max_leaf=tpc)
    count = np.asarray(bvh.count)
    first = np.asarray(bvh.first)
    leaves = np.nonzero(count > 0)[0]

    # merge-pack leaves (DFS order) into clusters of <= tpc valid tris.
    # A merge is only accepted when the union AABB's surface area stays
    # below the children's sum — without this, runs crossing BVH-subtree
    # boundaries produce sprawling boxes that EVERY ray pierces (measured:
    # p99 rays visited all 215 clusters on tessellated cornell; with the
    # gate, p99 = a handful).
    def half_area(lo, hi):
        d = np.maximum(hi - lo, 0.0)
        return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]

    groups, cur = [], []
    cur_n = 0
    cur_lo = cur_hi = None
    for node in leaves:
        idx = np.asarray(order[first[node]:first[node] + count[node]])
        idx = idx[valid[idx]]
        if len(idx) == 0:
            continue
        p0 = v0[idx]
        p1 = p0 + e1[idx]
        p2 = p0 + e2[idx]
        llo = np.minimum(np.minimum(p0, p1), p2).min(axis=0)
        lhi = np.maximum(np.maximum(p0, p1), p2).max(axis=0)
        fits = cur_n + len(idx) <= tpc
        if cur_n > 0 and fits:
            ulo = np.minimum(cur_lo, llo)
            uhi = np.maximum(cur_hi, lhi)
            fits = (half_area(ulo, uhi)
                    <= 2.0 * (half_area(cur_lo, cur_hi)
                              + half_area(llo, lhi)))
        if cur_n > 0 and not fits:
            groups.append(np.concatenate(cur))
            cur, cur_n = [], 0
            cur_lo = cur_hi = None
        cur.append(idx)
        cur_n += len(idx)
        cur_lo = llo if cur_lo is None else np.minimum(cur_lo, llo)
        cur_hi = lhi if cur_hi is None else np.maximum(cur_hi, lhi)
    if cur_n:
        groups.append(np.concatenate(cur))
    if not groups:                          # fully-invalid scene
        groups = [np.zeros(0, np.int64)]

    perm = (np.concatenate(groups) if groups else
            np.zeros(0, np.int64)).astype(np.int64)
    starts = np.zeros(len(groups) + 1, np.int64)
    np.cumsum([len(g) for g in groups], out=starts[1:])
    aabb_list = []
    for g in groups:
        if len(g):
            p0 = v0[g]
            p1 = p0 + e1[g]
            p2 = p0 + e2[g]
            lo = np.minimum(np.minimum(p0, p1), p2).min(axis=0)
            hi = np.maximum(np.maximum(p0, p1), p2).max(axis=0)
        else:
            lo, hi = np.full(3, _INF), np.full(3, -_INF)
        row = np.zeros(8, np.float32)
        row[0:3] = lo
        row[3:6] = hi
        aabb_list.append(row)
    C = len(groups)
    aabbs = np.stack(aabb_list).astype(np.float32)
    Cp = -(-C // 8) * 8
    if Cp > C:
        pad = np.zeros((Cp - C, 8), np.float32)
        pad[:, 0:3] = _INF
        pad[:, 3:6] = -_INF
        aabbs = np.concatenate([aabbs, pad], axis=0)

    # append any dropped (invalid) source rows at the tail so the scene
    # keeps its static T (they belong to no cluster; nothing reaches them)
    dropped = np.setdiff1d(np.arange(T, dtype=np.int64), perm)
    full_perm = np.concatenate([perm, dropped])

    def permf(a):
        return jnp.asarray(np.asarray(a)[full_perm])

    new_tris = tris.replace(
        v0=permf(tris.v0), e1=permf(tris.e1), e2=permf(tris.e2),
        n0=permf(tris.n0), n1=permf(tris.n1), n2=permf(tris.n2),
        uv0=permf(tris.uv0), uv1=permf(tris.uv1), uv2=permf(tris.uv2),
        mat_id=permf(tris.mat_id),
        emitter_id=permf(tris.emitter_id),
        valid=permf(tris.valid),
    )
    inv = np.zeros(max(T, 1), np.int64)
    inv[full_perm] = np.arange(len(full_perm))
    em = scene.emitters
    ti = np.asarray(em.tri_idx)
    new_em = em.replace(tri_idx=jnp.asarray(
        inv[np.clip(ti, 0, T - 1)].astype(ti.dtype)))
    starts_p = np.zeros(Cp + 1, np.int64)
    starts_p[:C + 1] = starts
    starts_p[C + 1:] = starts[C]
    return (scene.replace(tris=new_tris, emitters=new_em), aabbs,
            starts_p, C)


def pack_cluster_tables(scene, aabbs, starts, tpc: int, passes: int = 2):
    """Cluster tables for the kernels (scene must be cluster_reorder'ed).

    Returns (clu_aabb (Cp, 8) f32, clu_tri (passes*Cp, 10*tpc) bf16).
    clu_tri column layout is feature-major: col = feat*tpc + slot, so an
    8-triangle sublane block of feature f is rows [f*tpc+8b, f*tpc+8b+8).
    Feature 9 is the slot's GLOBAL triangle id (exact under 2 bf16
    planes for ids < 2^16: hi rounds to 8 mantissa bits, the residual is
    < 256 and bf16-exact).  The f32 geometry is telescoped into `passes`
    bf16 planes (hi, x-hi, ...) like megatrace.fetch_rows; 2 planes give
    ~16 mantissa bits, enough to pick the winner everywhere except
    sub-1e-4 ties (callers recompute the exact hit distance from the
    3-pass attribute fetch)."""
    v0 = np.asarray(scene.tris.v0, np.float32)
    e1 = np.asarray(scene.tris.e1, np.float32)
    e2 = np.asarray(scene.tris.e2, np.float32)
    valid = np.asarray(scene.tris.valid, bool)
    e1 = np.where(valid[:, None], e1, 0.0)
    e2 = np.where(valid[:, None], e2, 0.0)
    Cp = aabbs.shape[0]
    tab = np.zeros((Cp, _CLU_FEATS, tpc), np.float32)
    tab[:, 9, :] = -1.0
    for c in range(Cp):
        s, e = int(starts[c]), int(starts[c + 1])
        n = e - s
        if n == 0:
            continue
        tab[c, 0:3, :n] = v0[s:e].T
        tab[c, 3:6, :n] = e1[s:e].T
        tab[c, 6:9, :n] = e2[s:e].T
        tab[c, 9, :n] = np.arange(s, e, dtype=np.float32)
    tab = tab.reshape(Cp, _CLU_FEATS * tpc)
    planes = []
    rem = tab
    for _ in range(passes):
        part = rem.astype(jnp.bfloat16)
        planes.append(part)
        rem = rem - np.asarray(part, np.float32)
    clu_tri = np.concatenate(planes, axis=0)              # (passes*Cp, .)
    return jnp.asarray(aabbs, jnp.float32), jnp.asarray(clu_tri)


# --------------------------------------------------------------- kernel
def _flat(t, shape):
    return t.reshape(1, shape[0] * shape[1])


def _unflat(row, shape):
    L = shape[1]
    return jnp.concatenate(
        [row[0:1, s * L:(s + 1) * L] for s in range(shape[0])], axis=0)


def _entry_table(aabb_ref, n_clusters, K, oxf, oyf, ozf, dxf, dyf, dzf,
                 tmax=None):
    """(Cp, K) per-(cluster, lane) AABB entry distances; _INF = miss.

    tmax (closest: None, shadow: (1, K)) additionally rejects clusters
    entered beyond the ray segment."""
    eps = 1e-12
    inv_x = 1.0 / jnp.where(jnp.abs(dxf) > eps, dxf,
                            jnp.where(dxf >= 0, eps, -eps))
    inv_y = 1.0 / jnp.where(jnp.abs(dyf) > eps, dyf,
                            jnp.where(dyf >= 0, eps, -eps))
    inv_z = 1.0 / jnp.where(jnp.abs(dzf) > eps, dzf,
                            jnp.where(dzf >= 0, eps, -eps))
    chunks = []
    for cc in range(n_clusters // 8):
        lox = aabb_ref[cc * 8:cc * 8 + 8, 0:1]
        loy = aabb_ref[cc * 8:cc * 8 + 8, 1:2]
        loz = aabb_ref[cc * 8:cc * 8 + 8, 2:3]
        hix = aabb_ref[cc * 8:cc * 8 + 8, 3:4]
        hiy = aabb_ref[cc * 8:cc * 8 + 8, 4:5]
        hiz = aabb_ref[cc * 8:cc * 8 + 8, 5:6]
        tx0 = (lox - oxf) * inv_x
        tx1 = (hix - oxf) * inv_x
        ty0 = (loy - oyf) * inv_y
        ty1 = (hiy - oyf) * inv_y
        tz0 = (loz - ozf) * inv_z
        tz1 = (hiz - ozf) * inv_z
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1))
        tmax_b = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1))
        enter = jnp.maximum(tmin, 0.0)
        ok = tmax_b >= jnp.maximum(tmin, RAY_EPS * 0.5)
        if tmax is not None:
            ok = ok & (enter < tmax)
        chunks.append(jnp.where(ok, enter, _INF))
    return jnp.concatenate(chunks, axis=0)


def _test_cluster(clu_ref, oh, tpc, n_passes, Cp,
                  oxf, oyf, ozf, dxf, dyf, dzf, tmf=None):
    """One-hot fetch the selected cluster per lane and Moller-Trumbore
    its tpc slots.  Returns (t_m (1,K) best t in cluster or _BIG,
    gid (1,K) i32 winning global triangle id).  tmf: any-hit mode —
    count only hits below tmax (gid is then meaningless)."""
    K = oxf.shape[1]
    dn = (((0,), (0,)), ((), ()))
    fetched = None
    for p in range(n_passes):
        part = clu_ref[p * Cp:(p + 1) * Cp, :]
        d = jax.lax.dot_general(part, oh, dn,
                                preferred_element_type=jnp.float32)
        fetched = d if fetched is None else fetched + d

    def feat(f, b):
        return fetched[f * tpc + b * 8:f * tpc + b * 8 + 8, :]

    best = jnp.full((1, K), _BIG, jnp.float32)
    gid = jnp.full((1, K), -1, jnp.int32)
    for b in range(tpc // 8):
        v0x, v0y, v0z = feat(0, b), feat(1, b), feat(2, b)
        e1x, e1y, e1z = feat(3, b), feat(4, b), feat(5, b)
        e2x, e2y, e2z = feat(6, b), feat(7, b), feat(8, b)
        px = dyf * e2z - dzf * e2y
        py = dzf * e2x - dxf * e2z
        pz = dxf * e2y - dyf * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok = jnp.abs(det) > 1e-12
        inv = 1.0 / jnp.where(ok, det, 1.0)
        tx, ty, tz = oxf - v0x, oyf - v0y, ozf - v0z
        b1 = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        b2 = (dxf * qx + dyf * qy + dzf * qz) * inv
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv
        hit = (ok & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
               & (tt > RAY_EPS))
        if tmf is not None:
            hit = hit & (tt < tmf)
        t_m = jnp.where(hit, tt, _BIG)
        m8 = jnp.min(t_m, axis=0, keepdims=True)
        g8 = jnp.min(jnp.where(t_m <= m8, feat(9, b).astype(jnp.int32),
                               jnp.int32(2 ** 30)),
                     axis=0, keepdims=True)
        better = m8 < best
        best = jnp.where(better, m8, best)
        gid = jnp.where(better, g8, gid)
    return best, gid


def closest_sweep_clustered(aabb_ref, clu_ref, n_clusters, tpc, n_passes,
                            shape, ox, oy, oz, dx, dy, dz):
    """Front-to-back clustered closest hit.  Returns ((8,L) best_t,
    (8,L) best global triangle id; -1 = miss), ids valid against the
    cluster_reorder'ed triangle table.  best_t carries the traversal
    table's bf16-plane precision — callers recompute it in exact f32
    from the winner's 3-pass attribute fetch."""
    K = shape[0] * shape[1]
    Cp = aabb_ref.shape[0]
    oxf, oyf, ozf = _flat(ox, shape), _flat(oy, shape), _flat(oz, shape)
    dxf, dyf, dzf = _flat(dx, shape), _flat(dy, shape), _flat(dz, shape)
    t_rem = _entry_table(aabb_ref, Cp, K, oxf, oyf, ozf, dxf, dyf, dzf)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (Cp, K), 0)

    def cond(carry):
        t_rem, _bt, _bi = carry
        return jnp.min(t_rem) < _BIG

    def body(carry):
        t_rem, best_t, best_id = carry
        m = jnp.min(t_rem, axis=0, keepdims=True)            # (1, K)
        sel = jnp.min(jnp.where(t_rem <= m, iota_c, jnp.int32(2 ** 30)),
                      axis=0, keepdims=True)
        act = (m < _BIG).astype(jnp.float32)                 # lanes w/ work
        oh = ((iota_c == sel).astype(jnp.float32)
              * act).astype(jnp.bfloat16)                    # (Cp, K)
        t_c, gid_c = _test_cluster(clu_ref, oh, tpc, n_passes, Cp,
                                   oxf, oyf, ozf, dxf, dyf, dzf)
        better = (t_c < best_t) & (act > 0.5)
        best_t = jnp.where(better, t_c, best_t)
        best_id = jnp.where(better, gid_c, best_id)
        # consume the visited cluster, prune everything past best_t
        t_rem = jnp.where(iota_c == sel, _INF, t_rem)
        t_rem = jnp.where(t_rem < best_t, t_rem, _INF)
        return t_rem, best_t, best_id

    _t, best_t, best_id = jax.lax.while_loop(
        cond, body,
        (t_rem, jnp.full((1, K), _INF, jnp.float32),
         jnp.full((1, K), -1, jnp.int32)))
    best_t = jnp.where(best_id >= 0, best_t, _INF)
    return _unflat(best_t, shape), _unflat(best_id, shape)


def shadow_sweep_clustered(aabb_ref, clu_ref, n_clusters, tpc, n_passes,
                           shape, ox, oy, oz, dx, dy, dz, tmax):
    """Any-hit clustered occlusion test.  Returns (8, L) bool blocked.
    Visits clusters front-to-back (blockers usually sit near the segment
    ends) and retires a lane on its first hit."""
    K = shape[0] * shape[1]
    Cp = aabb_ref.shape[0]
    oxf, oyf, ozf = _flat(ox, shape), _flat(oy, shape), _flat(oz, shape)
    dxf, dyf, dzf = _flat(dx, shape), _flat(dy, shape), _flat(dz, shape)
    tmf = _flat(tmax, shape)
    t_rem = _entry_table(aabb_ref, Cp, K, oxf, oyf, ozf, dxf, dyf, dzf,
                         tmax=tmf)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (Cp, K), 0)

    def cond(carry):
        t_rem, _b = carry
        return jnp.min(t_rem) < _BIG

    def body(carry):
        t_rem, blocked = carry
        m = jnp.min(t_rem, axis=0, keepdims=True)
        sel = jnp.min(jnp.where(t_rem <= m, iota_c, jnp.int32(2 ** 30)),
                      axis=0, keepdims=True)
        act = (m < _BIG).astype(jnp.float32)
        oh = ((iota_c == sel).astype(jnp.float32)
              * act).astype(jnp.bfloat16)
        t_c, _gid = _test_cluster(clu_ref, oh, tpc, n_passes, Cp,
                                  oxf, oyf, ozf, dxf, dyf, dzf, tmf=tmf)
        blocked = jnp.maximum(blocked,
                              jnp.where((t_c < _BIG) & (act > 0.5),
                                        1.0, 0.0))
        t_rem = jnp.where(iota_c == sel, _INF, t_rem)
        t_rem = jnp.where(blocked > 0.5, _INF, t_rem)   # lane done
        return t_rem, blocked

    _t, blocked = jax.lax.while_loop(
        cond, body, (t_rem, jnp.zeros((1, K), jnp.float32)))
    return _unflat(blocked, shape) > 0.5
