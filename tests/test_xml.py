"""Scene-XML loader + mesh IO + EXR IO tests."""
import os

import jax
import numpy as np
import pytest

from drmlt_mitsuba_tpu.scene.xml import load_scene_xml
from drmlt_mitsuba_tpu.scene import mesh_io
from drmlt_mitsuba_tpu.utils.exr import read_exr, write_exr

DATA = os.path.join(os.path.dirname(__file__), "data")


class TestXml:
    def test_load_cornell(self):
        scene, settings = load_scene_xml(
            os.path.join(DATA, "cornell.xml"),
            defaults={"integrator": "drmlt"},
        )
        assert settings.integrator["type"] == "drmlt"
        assert settings.integrator["maxDepth"] == 4
        assert settings.width == 64 and settings.filter_name == "box"
        assert settings.spp == 16
        # 6 rectangles x 2 tris = 12 triangles; 1 sphere
        assert scene.tris.v0.shape[0] == 12
        assert scene.spheres.center.shape[0] == 1
        # light: 2 emissive triangles with power-weighted pmf
        assert scene.emitters.tri_idx.shape[0] == 2
        np.testing.assert_allclose(
            float(np.asarray(scene.emitters.pmf).sum()), 1.0, atol=1e-6
        )
        # materials: white/red/green(twosided)/metal + inline light bsdf
        assert scene.materials.kind.shape[0] == 5

    def test_default_substitution(self):
        _, s1 = load_scene_xml(os.path.join(DATA, "cornell.xml"),
                               defaults={"integrator": "path", "spp": 99})
        assert s1.integrator["type"] == "path"
        assert s1.spp == 99

    def test_renders(self):
        """The loaded scene actually renders with the path tracer."""
        from drmlt_mitsuba_tpu.integrators.layout import PathConfig
        from drmlt_mitsuba_tpu.integrators.path import trace_paths
        import jax.numpy as jnp

        scene, _ = load_scene_xml(os.path.join(DATA, "cornell.xml"),
                                  defaults={"integrator": "path"})
        cfg = PathConfig(max_depth=3, rr_depth=100)
        u = jax.random.uniform(jax.random.PRNGKey(0), (512, cfg.n_dims))
        sp = trace_paths(scene, cfg, u)
        assert bool(jnp.all(jnp.isfinite(sp.value)))
        assert float(jnp.mean(sp.lum)) > 0


class TestMeshIO:
    def test_obj_roundtrip(self, tmp_path):
        p = tmp_path / "tri.obj"
        p.write_text(
            "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
            "vn 0 0 1\nvn 0 0 1\nvn 0 0 1\nvn 0 0 1\n"
            "f 1//1 2//2 4//4 3//3\n"
        )
        v, f, n, uv = mesh_io.load_obj(str(p))
        assert v.shape == (4, 3)
        assert f.shape == (2, 3)  # quad fan-triangulated
        np.testing.assert_allclose(n, [[0, 0, 1]] * 4)

    def test_ply_ascii(self, tmp_path):
        p = tmp_path / "tri.ply"
        p.write_text(
            "ply\nformat ascii 1.0\n"
            "element vertex 3\nproperty float x\nproperty float y\n"
            "property float z\n"
            "element face 1\nproperty list uchar int vertex_indices\n"
            "end_header\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n"
        )
        v, f, n, uv = mesh_io.load_ply(str(p))
        assert v.shape == (3, 3) and f.shape == (1, 3) and n is None

    def test_ply_binary(self, tmp_path):
        import struct

        header = (
            b"ply\nformat binary_little_endian 1.0\n"
            b"element vertex 3\nproperty float x\nproperty float y\n"
            b"property float z\n"
            b"element face 1\nproperty list uchar int vertex_indices\n"
            b"end_header\n"
        )
        body = b"".join(
            struct.pack("<fff", *v) for v in [(0, 0, 0), (1, 0, 0), (0, 1, 0)]
        ) + struct.pack("<Biii", 3, 0, 1, 2)
        p = tmp_path / "b.ply"
        p.write_bytes(header + body)
        v, f, n, uv = mesh_io.load_ply(str(p))
        np.testing.assert_allclose(v[1], [1, 0, 0])
        np.testing.assert_array_equal(f[0], [0, 1, 2])

    def test_serialized(self, tmp_path):
        """Write a minimal Mitsuba .serialized container and read it back."""
        import struct
        import zlib

        verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        faces = np.asarray([[0, 1, 2]], np.uint32)
        flags = 0x1000  # single precision, no normals/uvs
        stream = struct.pack("<I", flags) + struct.pack("<QQ", 3, 1)
        stream += verts.tobytes() + faces.tobytes()
        blob = struct.pack("<HH", 0x041C, 0x0003) + zlib.compress(stream)
        blob += struct.pack("<Q", 0) + struct.pack("<I", 1)
        p = tmp_path / "m.serialized"
        p.write_bytes(blob)
        v, f, n, uv = mesh_io.load_serialized(str(p))
        np.testing.assert_allclose(v, verts)
        np.testing.assert_array_equal(f, faces.astype(np.int32))


class TestExr:
    @pytest.mark.parametrize("half,comp", [
        (False, "none"), (True, "none"), (False, "zip"), (False, "zips"),
    ])
    def test_roundtrip(self, tmp_path, half, comp):
        img = np.random.default_rng(0).random((17, 23, 3)).astype(np.float32)
        p = str(tmp_path / "t.exr")
        write_exr(p, img, half=half, compression=comp)
        r = read_exr(p)
        tol = 2e-3 if half else 1e-7
        assert r.shape == img.shape
        np.testing.assert_allclose(r, img, atol=tol)
