"""TPU end-to-end check: grouped DRMLT render via megadrmlt vs the XLA
step vs a plain path-traced ground truth."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from drmlt_mitsuba_tpu.integrators.bidir import BDPTConfig
from drmlt_mitsuba_tpu.integrators.drmlt import DRMLTConfig
from drmlt_mitsuba_tpu.integrators.layout import PathConfig
from drmlt_mitsuba_tpu.integrators.mmlt_grouped import (
    render_drmlt_mmlt_grouped,
)
from drmlt_mitsuba_tpu.integrators.path import render_pt
from drmlt_mitsuba_tpu.render import film as filmlib
from drmlt_mitsuba_tpu.scene.builders import cornell_box
from drmlt_mitsuba_tpu.scene.types import prepare_scene


def stats(name, a, b):
    import scipy.ndimage as ndi
    sa = ndi.uniform_filter(np.asarray(a).mean(-1), 8)
    sb = ndi.uniform_filter(np.asarray(b).mean(-1), 8)
    rerr = np.abs(sa - sb) / (sb + 1e-2)
    print(f"{name}: means {np.asarray(a).mean():.5f} vs "
          f"{np.asarray(b).mean():.5f} | p95 smoothed rel "
          f"{np.percentile(rerr, 95):.4f} p99 {np.percentile(rerr, 99):.4f}",
          flush=True)
    return np.percentile(rerr, 95)


def main():
    W = H = 128
    scene = prepare_scene(cornell_box(W, H))
    fc = filmlib.make_film_config(W, H, "box")
    bcfg = BDPTConfig(max_depth=4)
    dcfg = DRMLTConfig(type="orbital", n_chains=16384, n_bootstrap=32768)

    img_mega, aux1 = render_drmlt_mmlt_grouped(
        scene, bcfg, dcfg, fc, jax.random.PRNGKey(3), n_steps=512)
    print("mega b:", aux1["b"], "steps:", aux1["steps_per_group"],
          flush=True)
    img_xla, aux2 = render_drmlt_mmlt_grouped(
        scene, bcfg, dcfg, fc, jax.random.PRNGKey(4), n_steps=512,
        force_xla=True)
    print("xla  b:", aux2["b"], flush=True)

    pcfg = PathConfig(max_depth=4, rr_depth=100)
    film = render_pt(scene, pcfg, jax.random.PRNGKey(9), W * H * 512, fc,
                     mode="accum")
    ref = np.asarray(filmlib.develop(fc, film, mode="accum"))

    e1 = stats("mega vs PT", img_mega, ref)
    e2 = stats("xla  vs PT", img_xla, ref)
    e3 = stats("mega vs xla", img_mega, img_xla)
    ok = e1 < 0.12 and e3 < 0.15
    print("MEGA RENDER CONSISTENCY", "OK" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
