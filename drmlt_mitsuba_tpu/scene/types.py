"""Flat SoA scene representation (device-resident pytrees).

The reference keeps a refcounted object graph (Scene -> Shape -> BSDF ...,
include/mitsuba/render/scene.h) and dispatches virtually per ray.  On TPU the
whole scene lives in HBM as structure-of-arrays; per-lane "virtual dispatch"
becomes branchless evaluate-and-select over small enum tables.  Everything
here is a registered pytree so scenes pass straight through jit/vmap/shard.

Capability mapping (SURVEY.md §2.6):
  shapes obj/ply/rect/cube/sphere -> TriangleSoA + SphereSoA
  bsdf plugins                    -> MaterialTable (kind enum + params)
  area/point/constant emitters    -> EmitterTable + env/point fields
  perspective/thinlens sensor     -> Camera
"""
from __future__ import annotations

import flax.struct as struct
import jax.numpy as jnp
import numpy as np

# BSDF kind enum (MaterialTable.kind)
BSDF_DIFFUSE = 0
BSDF_CONDUCTOR = 1       # smooth, delta
BSDF_DIELECTRIC = 2      # smooth, delta (reflect+refract)
BSDF_ROUGH_CONDUCTOR = 3  # GGX microfacet
BSDF_PLASTIC = 4          # smooth dielectric coat over diffuse
BSDF_ROUGH_PLASTIC = 5
BSDF_THIN_DIELECTRIC = 6
BSDF_ROUGH_DIELECTRIC = 7
BSDF_MIRROR = 8           # ideal mirror (conductor with F=reflectance)
BSDF_NULL = 9             # passthrough
BSDF_PHONG = 10
BSDF_WARD = 11
BSDF_ROUGH_DIFFUSE = 12   # Oren-Nayar

DELTA_BSDFS = (BSDF_CONDUCTOR, BSDF_DIELECTRIC, BSDF_MIRROR, BSDF_NULL,
               BSDF_THIN_DIELECTRIC)


@struct.dataclass
class TriangleSoA:
    """Triangle soup: p = v0 + b1*e1 + b2*e2."""
    v0: jnp.ndarray      # (T, 3)
    e1: jnp.ndarray      # (T, 3)
    e2: jnp.ndarray      # (T, 3)
    n0: jnp.ndarray      # (T, 3) per-vertex shading normals
    n1: jnp.ndarray      # (T, 3)
    n2: jnp.ndarray      # (T, 3)
    uv0: jnp.ndarray     # (T, 2) texture coords
    uv1: jnp.ndarray     # (T, 2)
    uv2: jnp.ndarray     # (T, 2)
    mat_id: jnp.ndarray  # (T,) int32
    emitter_id: jnp.ndarray  # (T,) int32, -1 = not emissive
    valid: jnp.ndarray   # (T,) bool — False for padding triangles


@struct.dataclass
class SphereSoA:
    center: jnp.ndarray   # (S, 3)
    radius: jnp.ndarray   # (S,)
    mat_id: jnp.ndarray   # (S,) int32
    emitter_id: jnp.ndarray  # (S,) int32
    valid: jnp.ndarray    # (S,) bool


@struct.dataclass
class MaterialTable:
    kind: jnp.ndarray        # (M,) int32 enum above
    albedo: jnp.ndarray      # (M, 3) diffuse reflectance / specular tint
    eta: jnp.ndarray         # (M, 3) real IOR (dielectric: channel 0)
    k: jnp.ndarray           # (M, 3) imaginary IOR (conductors)
    roughness: jnp.ndarray   # (M,) GGX alpha
    spec_refl: jnp.ndarray   # (M, 3) specular reflectance scale
    spec_trans: jnp.ndarray  # (M, 3) specular transmittance scale
    tex_id: jnp.ndarray      # (M,) int32, -1 = constant albedo
    two_sided: jnp.ndarray   # (M,) bool
    # static set of kinds present — lets the BSDF kernels skip absent lobes
    # at compile time (the SPMD answer to per-plugin virtual dispatch)
    kinds_present: tuple = struct.field(pytree_node=False, default=())


@struct.dataclass
class TextureAtlas:
    """Bitmap textures packed into one fixed-size atlas page per scene.

    data is (N, H, W, 3); lookups are bilinear.  Constant textures do not
    occupy a page (tex_id = -1).
    """
    data: jnp.ndarray        # (N, H, W, 3) float32


@struct.dataclass
class EmitterTable:
    """Area emitters referencing triangles, plus point lights and a constant
    environment.  The sampling pmf is proportional to power (radiance
    luminance x area), matching Scene::sampleEmitterDirect behavior."""
    tri_idx: jnp.ndarray    # (E,) int32 triangle carrying this emitter
    radiance: jnp.ndarray   # (E, 3)
    area: jnp.ndarray       # (E,)
    pmf: jnp.ndarray        # (E,) selection pmf
    cdf: jnp.ndarray        # (E,) inclusive cdf for categorical sampling
    # point lights
    point_pos: jnp.ndarray       # (P, 3)
    point_intensity: jnp.ndarray  # (P, 3)
    # constant environment emitter (zeros = none)
    env_radiance: jnp.ndarray    # (3,)


@struct.dataclass
class Camera:
    """Perspective / thinlens sensor (ref: src/sensors/perspective.cpp,
    thinlens.cpp).  aperture_radius == 0 -> pinhole perspective."""
    to_world: jnp.ndarray        # (4, 4)
    tan_half_fov_x: jnp.ndarray  # scalar
    tan_half_fov_y: jnp.ndarray  # scalar
    aperture_radius: jnp.ndarray  # scalar
    focus_distance: jnp.ndarray   # scalar


@struct.dataclass
class BVH:
    """Flattened 2-wide BVH in depth-first layout (built on host, scene/bvh.py).

    nodes_min/max: (N, 3) AABBs.  For leaf nodes, `left` is the first
    triangle index (into the BVH-reordered triangle arrays) and `count` > 0;
    for inner nodes `count` == 0 and `left`/`right` are child node indices.
    `skip` is the escape pointer for stackless traversal.
    """
    nodes_min: jnp.ndarray  # (N, 3)
    nodes_max: jnp.ndarray  # (N, 3)
    first: jnp.ndarray      # (N,) int32 first prim (leaf) or left child
    count: jnp.ndarray      # (N,) int32 prim count (0 = inner)
    skip: jnp.ndarray       # (N,) int32 escape-pointer node index (stackless)


@struct.dataclass
class Scene:
    tris: TriangleSoA
    spheres: SphereSoA
    materials: MaterialTable
    emitters: EmitterTable
    camera: Camera
    bvh: BVH | None = None
    textures: TextureAtlas | None = None
    # (T, 16) scalar table for the Pallas sweep kernel (ops/pallas);
    # built by prepare_scene(), None = use the XLA sweep
    tris_packed: jnp.ndarray | None = None


def prepare_scene(scene: "Scene") -> "Scene":
    """Attach accelerator-specific tables (Pallas triangle pack)."""
    from drmlt_mitsuba_tpu.ops.pallas.intersect_kernel import (
        pack_triangles_v2,
    )

    packed = pack_triangles_v2(
        np.asarray(scene.tris.v0), np.asarray(scene.tris.e1),
        np.asarray(scene.tris.e2), np.asarray(scene.tris.valid),
    )
    return scene.replace(tris_packed=packed)


def make_material_table(mats: list[dict]) -> MaterialTable:
    """Build a MaterialTable from a list of parameter dicts (host-side)."""
    m = len(mats)

    def field(name, default, shape):
        out = np.zeros((m,) + shape, dtype=np.float32)
        for i, d in enumerate(mats):
            v = d.get(name, default)
            out[i] = np.broadcast_to(np.asarray(v, np.float32), shape)
        return out

    kind = np.array([d["kind"] for d in mats], dtype=np.int32)
    tex_id = np.array([d.get("tex_id", -1) for d in mats], dtype=np.int32)
    two_sided = np.array([bool(d.get("two_sided", True)) for d in mats])
    return MaterialTable(
        kind=jnp.asarray(kind),
        kinds_present=tuple(sorted(set(int(k) for k in kind))),
        albedo=jnp.asarray(field("albedo", 0.5, (3,))),
        eta=jnp.asarray(field("eta", 1.5, (3,))),
        k=jnp.asarray(field("k", 0.0, (3,))),
        roughness=jnp.asarray(field("roughness", 0.1, ())),
        spec_refl=jnp.asarray(field("spec_refl", 1.0, (3,))),
        spec_trans=jnp.asarray(field("spec_trans", 1.0, (3,))),
        tex_id=jnp.asarray(tex_id),
        two_sided=jnp.asarray(two_sided),
    )


def build_triangles(
    vertices: np.ndarray,
    faces: np.ndarray,
    mat_id: np.ndarray,
    emitter_id: np.ndarray,
    normals: np.ndarray | None = None,
    uvs: np.ndarray | None = None,
) -> TriangleSoA:
    """Host-side constructor from an indexed mesh."""
    v = np.asarray(vertices, np.float32)
    f = np.asarray(faces, np.int32)
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    e1 = p1 - p0
    e2 = p2 - p0
    gn = np.cross(e1, e2)
    gl = np.linalg.norm(gn, axis=-1, keepdims=True)
    gn = gn / np.maximum(gl, 1e-20)
    if normals is None:
        n0 = n1 = n2 = gn
    else:
        n = np.asarray(normals, np.float32)
        n0, n1, n2 = n[f[:, 0]], n[f[:, 1]], n[f[:, 2]]
    if uvs is None:
        z2 = np.zeros((len(f), 2), np.float32)
        uv0 = uv1 = uv2 = z2
    else:
        uv = np.asarray(uvs, np.float32)
        uv0, uv1, uv2 = uv[f[:, 0]], uv[f[:, 1]], uv[f[:, 2]]
    return TriangleSoA(
        v0=jnp.asarray(p0), e1=jnp.asarray(e1), e2=jnp.asarray(e2),
        n0=jnp.asarray(n0), n1=jnp.asarray(n1), n2=jnp.asarray(n2),
        uv0=jnp.asarray(uv0), uv1=jnp.asarray(uv1), uv2=jnp.asarray(uv2),
        mat_id=jnp.asarray(np.asarray(mat_id, np.int32)),
        emitter_id=jnp.asarray(np.asarray(emitter_id, np.int32)),
        valid=jnp.ones(len(f), dtype=bool),
    )


def empty_spheres() -> SphereSoA:
    """A single degenerate (invalid) sphere — keeps shapes static."""
    return SphereSoA(
        center=jnp.zeros((1, 3), jnp.float32),
        radius=jnp.full((1,), -1.0, jnp.float32),
        mat_id=jnp.zeros((1,), jnp.int32),
        emitter_id=jnp.full((1,), -1, jnp.int32),
        valid=jnp.zeros((1,), dtype=bool),
    )


def build_emitters(
    tris: TriangleSoA,
    radiance_by_emitter: np.ndarray,
    env_radiance=(0.0, 0.0, 0.0),
    point_pos: np.ndarray | None = None,
    point_intensity: np.ndarray | None = None,
) -> EmitterTable:
    """Collect emissive triangles into a power-weighted sampling table.

    radiance_by_emitter: (n_emitters, 3) radiance for each emitter id that
    appears in tris.emitter_id.  Each emissive *triangle* becomes one row so
    area sampling is exact (pick triangle ∝ power, then uniform barycentric).
    """
    eid = np.asarray(tris.emitter_id)
    emissive = np.nonzero(eid >= 0)[0]
    if len(emissive) == 0:
        emissive = np.array([0], dtype=np.int64)
        rad = np.zeros((1, 3), np.float32)
        area = np.zeros((1,), np.float32)
        pmf = np.ones((1,), np.float32)
    else:
        e1 = np.asarray(tris.e1)[emissive]
        e2 = np.asarray(tris.e2)[emissive]
        area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1).astype(np.float32)
        rad = np.asarray(radiance_by_emitter, np.float32)[eid[emissive]]
        lum = rad @ np.array([0.212671, 0.715160, 0.072169], np.float32)
        power = np.maximum(lum * area, 1e-12)
        pmf = (power / power.sum()).astype(np.float32)
    cdf = np.cumsum(pmf).astype(np.float32)
    cdf[-1] = 1.0
    if point_pos is None:
        point_pos = np.zeros((0, 3), np.float32)
        point_intensity = np.zeros((0, 3), np.float32)
    return EmitterTable(
        tri_idx=jnp.asarray(emissive.astype(np.int32)),
        radiance=jnp.asarray(rad),
        area=jnp.asarray(area),
        pmf=jnp.asarray(pmf),
        cdf=jnp.asarray(cdf),
        point_pos=jnp.asarray(np.asarray(point_pos, np.float32)),
        point_intensity=jnp.asarray(np.asarray(point_intensity, np.float32)),
        env_radiance=jnp.asarray(np.asarray(env_radiance, np.float32)),
    )


def make_camera(to_world, fov_x_deg: float, aspect: float,
                aperture_radius: float = 0.0,
                focus_distance: float = 1.0) -> Camera:
    tan_x = float(np.tan(np.deg2rad(fov_x_deg) / 2.0))
    return Camera(
        to_world=jnp.asarray(to_world, jnp.float32),
        tan_half_fov_x=jnp.float32(tan_x),
        tan_half_fov_y=jnp.float32(tan_x / aspect),
        aperture_radius=jnp.float32(aperture_radius),
        focus_distance=jnp.float32(focus_distance),
    )
