"""Benchmark: DRMLT mutations/sec on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The headline metric is the flagship configuration BASELINE.json names:
DRMLT (orbital) driving the MMLT technique, measured through the
DEPTH-GROUPED driver (integrators/mmlt_grouped.py — per-depth chain
groups with luminance-proportional allocation, the same work-unit
structure the reference uses, pathsampler.cpp:884-934).  Its aggregate
rate = total mutations / total sequential group time, the real render
schedule.  The pooled single-tensor encoding and the path-technique
number are reported alongside in "extra".

CPU anchor (vs_baseline denominator): the reference renderer cannot be
built in this image (boost/xerces headers and the OpenEXR-2 API are
absent), so the anchor is MEASURED with the independent scalar C++
renderer `native/cpu_oracle` running the same per-mutation DRMLT work
(stage-1 trace always, stage-2 trace on rejection, three splats) on the
same Cornell scene at depth 6, PER TECHNIQUE (2026-08-18, 4-core eval
machine, 20 s runs, stable across repeats):

    $ native/cpu_oracle mlt cornell_bench.bin o.raw orbital 20 6 4 path
    189,305 mutations/s/core
    $ native/cpu_oracle mlt cornell_bench.bin o.raw orbital 20 6 4 mmlt
    663,096 mutations/s/core (mean of 650,264 / 675,928)

The scalar mmlt mutation is CHEAPER than a path mutation: it walks only
as deep as the lane's pinned depth and evaluates one (s, t) strategy,
while a depth-6 path mutation always traces six bounces.  (The pooled
SIMD form pays max-depth walks on every lane — the depth-grouped MMLT
driver exists to close exactly this gap.)  Chains are embarrassingly
parallel (the reference farms independent work units across cores,
drmlt_proc.cpp), so 64-core anchors extrapolate linearly.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# measured: native/cpu_oracle, orbital/depth6, per-core x 64 (see above)
CPU_ANCHOR_PATH_PER_SEC = 189305.0 * 64
CPU_ANCHOR_MMLT_PER_SEC = 663096.0 * 64


def _bench_loop(run_block, state, film, steps_per_call, n_chains, n_calls=5):
    state, film = run_block(state, film, jnp.int32(0))
    jax.block_until_ready(film)
    t0 = time.perf_counter()
    for c in range(n_calls):
        state, film = run_block(state, film,
                                jnp.int32((c + 1) * steps_per_call))
    jax.block_until_ready(film)
    dt = time.perf_counter() - t0
    return n_calls * steps_per_call * n_chains / dt


def main():
    from drmlt_mitsuba_tpu.integrators.bidir import BDPTConfig
    from drmlt_mitsuba_tpu.integrators.drmlt import DRMLTConfig, drmlt_step
    from drmlt_mitsuba_tpu.integrators.layout import PathConfig
    from drmlt_mitsuba_tpu.integrators.mcmc import state_from_splats
    from drmlt_mitsuba_tpu.integrators.mmlt import (
        make_mmlt_trace, mmlt_emitter_mask, mmlt_lt_mask_fn, mmlt_masks,
    )
    from drmlt_mitsuba_tpu.integrators.path import make_path_trace
    from drmlt_mitsuba_tpu.render import film as filmlib
    from drmlt_mitsuba_tpu.scene.builders import cornell_box
    from drmlt_mitsuba_tpu.scene.types import prepare_scene

    width = height = 256
    scene = prepare_scene(cornell_box(width, height))
    n_chains = 65536
    steps_per_call = 16
    fc = filmlib.make_film_config(width, height, "box")
    root = jax.random.PRNGKey(0)

    def bench_config(trace, n_dims, frozen, pinned=None, extras=None):
        dcfg = DRMLTConfig(type="orbital", n_chains=n_chains)
        extras = extras or {}

        @jax.jit
        def run_block(state, film, i0):
            def body(carry, i):
                key = jax.random.fold_in(root, i)
                (state, film, _), stats = drmlt_step(
                    trace, dcfg, fc, frozen, (carry[0], carry[1], None),
                    key, pinned_mask=pinned,
                    emitter_mask=extras.get("emitter_mask"),
                    lt_mask_fn=extras.get("lt_mask_fn"),
                )
                return (state, film), stats["a1"]

            (state, film), _ = jax.lax.scan(
                body, (state, film), i0 + jnp.arange(steps_per_call)
            )
            return state, film

        u0 = jax.random.uniform(root, (n_chains, n_dims))
        state = state_from_splats(u0, trace(u0))
        film = filmlib.new_film(fc)
        return _bench_loop(run_block, state, film, steps_per_call, n_chains)

    # ---- drmlt(orbital) over the path technique (canonical shape) --------
    pcfg = PathConfig(max_depth=6, rr_depth=5)
    n_path = pcfg.n_dims + pcfg.n_dims % 2
    rate_path = bench_config(
        make_path_trace(scene, pcfg),   # Pallas megakernel on TPU
        n_path, jnp.zeros((n_path,), bool),
    )

    # ---- pooled drmlt(orbital) over mmlt (single-tensor encoding) --------
    bcfg = BDPTConfig(max_depth=6)
    frozen, pinned, n_mmlt = mmlt_masks(bcfg)
    rate_mmlt_pooled = bench_config(
        make_mmlt_trace(scene, bcfg), n_mmlt, frozen, pinned,
        dict(emitter_mask=mmlt_emitter_mask(bcfg, n_mmlt),
             lt_mask_fn=mmlt_lt_mask_fn(bcfg)),
    )

    # ---- flagship: depth-grouped drmlt(orbital) over mmlt ----------------
    # equal-chains schedule (mmlt_grouped.render_drmlt_mmlt_grouped
    # docstring): every depth group runs n_chains chains at the chip's
    # throughput-optimal batch size and the per-group STEP count scales
    # with the depth's luminance mass f_k = b_k / b_total, so the
    # aggregate render rate is the f_k-weighted harmonic mean of the
    # per-group rates: 1 / sum_k (f_k / r_k).
    from drmlt_mitsuba_tpu.integrators.mmlt_grouped import (
        _group_bootstrap, _group_starts, grouped_emitter_mask,
        grouped_lt_mask_fn, grouped_masks, make_mmlt_trace_fixed,
    )

    dcfg = DRMLTConfig(type="orbital", n_chains=n_chains)
    k_boot = jax.random.fold_in(root, 1)
    groups = []
    for k in range(1, bcfg.max_depth + 1):
        trace_k, cfg_k, n_k = make_mmlt_trace_fixed(scene, k)
        lums, b_k, sample_u = _group_bootstrap(
            trace_k, jax.random.fold_in(k_boot, k), n_k, 8192)
        groups.append((k, trace_k, cfg_k, n_k, lums, float(b_k), sample_u))
    b_total = sum(g[5] for g in groups)

    per_group = []
    inv_rate = 0.0
    for k, trace_k, cfg_k, n_dims, lums, b_k, sample_u in groups:
        frozen_k = grouped_masks(cfg_k, n_dims)
        extras_k = dict(emitter_mask=grouped_emitter_mask(cfg_k, n_dims),
                        lt_mask_fn=grouped_lt_mask_fn(cfg_k))

        @jax.jit
        def run_block(state, film, i0, trace_k=trace_k, frozen_k=frozen_k,
                      extras_k=extras_k, k=k):
            def body(carry, i):
                key = jax.random.fold_in(jax.random.fold_in(root, 50 + k), i)
                (st, fi, _), stats = drmlt_step(
                    trace_k, dcfg, fc, frozen_k, (carry[0], carry[1], None),
                    key, **extras_k)
                return (st, fi), stats["a1"]
            (state, film), _ = jax.lax.scan(
                body, (state, film), i0 + jnp.arange(steps_per_call))
            return state, film

        state = _group_starts(trace_k, sample_u, lums,
                              jax.random.fold_in(k_boot, 100 + k), n_chains)
        film = filmlib.new_film(fc)
        rate_k = _bench_loop(run_block, state, film, steps_per_call,
                             n_chains)
        f_k = b_k / b_total
        per_group.append({"k": k, "chains": n_chains, "weight": round(f_k, 4),
                          "rate": round(rate_k, 1)})
        inv_rate += f_k / rate_k
    rate_mmlt = 1.0 / inv_rate

    print(json.dumps({
        "metric": "drmlt_mmlt_orbital_mutations_per_sec_per_chip",
        "value": round(rate_mmlt, 1),
        "unit": "mutations/s",
        "vs_baseline": round(rate_mmlt / CPU_ANCHOR_MMLT_PER_SEC, 3),
        "extra": {
            "mmlt_driver": "depth-grouped, equal-chains schedule "
                           f"({n_chains} chains/group, steps weighted by "
                           "luminance mass; aggregate = weighted harmonic "
                           "mean of per-group rates)",
            "mmlt_per_group": per_group,
            "drmlt_mmlt_pooled_mutations_per_sec": round(rate_mmlt_pooled, 1),
            "drmlt_path_orbital_mutations_per_sec": round(rate_path, 1),
            "path_vs_baseline": round(
                rate_path / CPU_ANCHOR_PATH_PER_SEC, 3),
            "cpu_anchor_mmlt_mutations_per_sec": CPU_ANCHOR_MMLT_PER_SEC,
            "cpu_anchor_path_mutations_per_sec": CPU_ANCHOR_PATH_PER_SEC,
            "anchor_note": "measured cpu_oracle orbital/depth6 per "
                           "technique, per-core x 64 (2026-08-18)",
        },
    }))


if __name__ == "__main__":
    main()
