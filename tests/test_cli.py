"""End-to-end CLI tests (the `mitsuba scene.xml -D ...` surface)."""
import os

import numpy as np
import pytest

from drmlt_mitsuba_tpu.utils.cli import main as cli_main
from drmlt_mitsuba_tpu.utils.exr import read_exr
from drmlt_mitsuba_tpu.utils.heatmap import stages_heatmap

DATA = os.path.join(os.path.dirname(__file__), "data")
SCENE = os.path.join(DATA, "cornell.xml")


def _run(tmp_path, *extra):
    out = str(tmp_path / "out.exr")
    rc = cli_main([SCENE, "-o", out, "-q", *extra])
    assert rc == 0
    img = read_exr(out)
    assert img.shape[2] == 3
    assert np.all(np.isfinite(img))
    assert img.mean() > 1e-4
    return img, out


def test_cli_path(tmp_path):
    _run(tmp_path, "-D", "integrator=path", "--spp", "4")


def test_cli_bdpt(tmp_path):
    _run(tmp_path, "-D", "integrator=bdpt", "--spp", "4")


def test_cli_pssmlt(tmp_path):
    img, out = _run(tmp_path, "-D", "integrator=pssmlt", "--spp", "8",
                    "--chains", "256")
    # stats file written
    assert os.path.exists(out.replace(".exr", "_stats.txt"))


def test_cli_drmlt_orbital_mmlt_accmap(tmp_path):
    img, out = _run(
        tmp_path, "-D", "integrator=drmlt", "-D", "technique=mmlt",
        "-D", "type=orbital", "--spp", "8", "--chains", "256",
    )
    # acceptance-map mode writes the R/G map and the heatmap tool reads it
    img2, out2 = _run(
        tmp_path, "-D", "integrator=drmlt", "-D", "type=orbital",
        "--spp", "8", "--chains", "256",
    )


def test_cli_skip_existing(tmp_path):
    out = str(tmp_path / "out.exr")
    open(out, "w").write("x")
    rc = cli_main([SCENE, "-o", out, "-q", "-x", "-D", "integrator=path"])
    assert rc == 0
    assert open(out).read() == "x"  # untouched


def test_heatmap_tool(tmp_path):
    acc = np.zeros((8, 8, 3), np.float32)
    acc[..., 0] = 1.0
    acc[2:4, :, 1] = 3.0
    heat = stages_heatmap(acc)
    assert heat.shape == (8, 8, 3)
    # rows with stage-2 accepts are colored differently
    assert not np.allclose(heat[2], heat[0])


def test_cli_sharded(tmp_path):
    """--shard runs the chains over the virtual 8-device CPU mesh."""
    img, out = _run(tmp_path, "-D", "integrator=drmlt", "--spp", "8",
                    "--chains", "256", "--shard")
