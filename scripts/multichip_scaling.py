"""Sharded-flagship scaling on the virtual CPU mesh (VERDICT r4 item 8).

Runs render_drmlt_mmlt_grouped_sharded at the SAME global chain count on
a 1-device and an 8-device mesh and records steps/s + efficiency in
MULTICHIP_SCALING_r05.json.  Caveat recorded in the artifact: the 8
"devices" are XLA host-platform partitions of the SAME 4-core box, so
wall-clock efficiency here validates the program structure (per-device
kernels, deferred single film reduction, no hidden serialization), not
ICI bandwidth — true multi-chip hardware is unavailable in this image
(BASELINE.md).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/multichip_scaling.py
"""
import json
import os
import time

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from drmlt_mitsuba_tpu.integrators.bidir import BDPTConfig  # noqa: E402
from drmlt_mitsuba_tpu.integrators.drmlt import DRMLTConfig  # noqa: E402
from drmlt_mitsuba_tpu.integrators.mmlt_grouped import (  # noqa: E402
    render_drmlt_mmlt_grouped_sharded,
)
from drmlt_mitsuba_tpu.parallel.mesh import make_mesh  # noqa: E402
from drmlt_mitsuba_tpu.render import film as filmlib  # noqa: E402
from drmlt_mitsuba_tpu.scene.builders import cornell_box  # noqa: E402
from drmlt_mitsuba_tpu.scene.types import prepare_scene  # noqa: E402


def run_mesh(n_dev, scene, fc, n_steps, chains):
    mesh = make_mesh(n_devices=n_dev, n_hosts=1 if n_dev == 1 else 2)
    bcfg = BDPTConfig(max_depth=3)
    dcfg = DRMLTConfig(type="orbital", n_chains=chains, n_bootstrap=8192)
    t0 = time.perf_counter()
    img, aux = render_drmlt_mmlt_grouped_sharded(
        mesh, scene, bcfg, dcfg, fc, jax.random.PRNGKey(7), n_steps,
        interpret=True, n_mut=16)
    jax.block_until_ready(img)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    img, aux = render_drmlt_mmlt_grouped_sharded(
        mesh, scene, bcfg, dcfg, fc, jax.random.PRNGKey(8), n_steps,
        interpret=True, n_mut=16)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    return dt, warm, float(np.asarray(img).mean())


def main():
    scene = prepare_scene(cornell_box(64, 64))
    fc = filmlib.make_film_config(64, 64, "box")
    chains, n_steps = 8192, 96
    out = {"chains_global": chains, "steps": n_steps,
           "scene": "cornell 64x64", "meshes": {}}
    for n_dev in (1, 8):
        dt, warm, mean = run_mesh(n_dev, scene, fc, n_steps, chains)
        out["meshes"][str(n_dev)] = {
            "seconds": round(dt, 2), "warm_seconds": round(warm, 2),
            "steps_per_sec": round(n_steps / dt, 2), "img_mean": mean}
        print(f"{n_dev} devices: {dt:.2f}s ({n_steps / dt:.2f} steps/s)",
              flush=True)
    t1 = out["meshes"]["1"]["seconds"]
    t8 = out["meshes"]["8"]["seconds"]
    out["efficiency_8dev"] = round(t1 / t8, 3)
    out["caveat"] = (
        "8 virtual XLA host devices on one 4-core box: this validates "
        "the sharded program structure (per-device megadrmlt + deferred "
        "single film reduction, round 5) — compute is oversubscribed, so "
        "t8 ~= t1 is the EXPECTED ceiling here, not a hardware scaling "
        "claim; real multi-chip is unavailable (BASELINE.md)")
    with open("MULTICHIP_SCALING_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote MULTICHIP_SCALING_r05.json")


if __name__ == "__main__":
    main()
