"""Flat binary scene dump for the native CPU oracle (native/cpu_oracle.cpp).

The oracle is an *independent* scalar C++ renderer used for (a) external
numerical cross-checks of the JAX tracer (a shared bug in trace_paths and
the MCMC layer would be invisible to self-consistency tests; VERDICT.md
missing item 1) and (b) the measured CPU mutations/s anchor that BASELINE.md
demands (the reference itself cannot be built here: its Mitsuba-0.6 core
requires boost + xerces headers + the OpenEXR-2 API, none of which exist in
this image — see BASELINE.md "CPU anchor").

Format (little-endian):
  u32 magic 0x4452544F, u32 version=2
  u32 T (tris), u32 M (materials), u32 E (area-emitter rows), u32 W, u32 H
  u32 S (spheres)
  f32[16] cam_to_world (row major), f32 tan_half_fov_x, f32 tan_half_fov_y
  M × material: i32 kind, f32[3] albedo, f32[3] eta, f32[3] k,
                f32 roughness, i32 two_sided
  T × triangle: f32[3] v0, f32[3] e1, f32[3] e2, f32[3] n0 n1 n2,
                i32 mat_id, i32 emitter_row (-1 = none)
  E × emitter row: i32 tri_idx, f32[3] radiance, f32 area, f32 pmf
  S × sphere: f32[3] center, f32 radius, i32 mat_id
"""
from __future__ import annotations

import struct as _st

import numpy as np

MAGIC = 0x4452544F


def dump_scene(scene, film_cfg, path: str):
    tris = scene.tris
    em = scene.emitters
    mats = scene.materials
    valid = np.asarray(tris.valid)
    idx = np.nonzero(valid)[0]

    kind = np.asarray(em.kind)
    area_rows = np.nonzero(kind == 0)[0]
    row_of_tri = {int(np.asarray(em.tri_idx)[r]): ri
                  for ri, r in enumerate(area_rows)}

    sph = getattr(scene, "spheres", None)
    sph_rows = []
    if sph is not None:
        sv = np.asarray(sph.valid)
        sc_c = np.asarray(sph.center, np.float32)
        sc_r = np.asarray(sph.radius, np.float32)
        sc_m = np.asarray(sph.mat_id)
        sph_rows = [(sc_c[i], float(sc_r[i]), int(sc_m[i]))
                    for i in np.nonzero(sv)[0]]

    with open(path, "wb") as f:
        f.write(_st.pack("<IIIIIII", MAGIC, 2, len(idx),
                         int(np.asarray(mats.kind).shape[0]),
                         len(area_rows), film_cfg.width, film_cfg.height))
        f.write(_st.pack("<I", len(sph_rows)))
        cam = scene.camera
        f.write(np.asarray(cam.to_world, np.float32).reshape(16).tobytes())
        f.write(_st.pack("<ff", float(cam.tan_half_fov_x),
                         float(cam.tan_half_fov_y)))
        ak = np.asarray(mats.kind)
        aalb = np.asarray(mats.albedo, np.float32)
        aeta = np.asarray(mats.eta, np.float32)
        akk = np.asarray(mats.k, np.float32)
        arough = np.asarray(mats.roughness, np.float32)
        atwo = np.asarray(mats.two_sided)
        for m in range(ak.shape[0]):
            f.write(_st.pack("<i", int(ak[m])))
            f.write(aalb[m].tobytes())
            f.write(aeta[m].tobytes())
            f.write(akk[m].tobytes())
            f.write(_st.pack("<fi", float(arough[m]), int(atwo[m])))
        v0 = np.asarray(tris.v0, np.float32)
        e1 = np.asarray(tris.e1, np.float32)
        e2 = np.asarray(tris.e2, np.float32)
        n0 = np.asarray(tris.n0, np.float32)
        n1 = np.asarray(tris.n1, np.float32)
        n2 = np.asarray(tris.n2, np.float32)
        mid = np.asarray(tris.mat_id)
        for t in idx:
            for arr in (v0, e1, e2, n0, n1, n2):
                f.write(arr[t].tobytes())
            f.write(_st.pack("<ii", int(mid[t]),
                             row_of_tri.get(int(t), -1)))
        erad = np.asarray(em.radiance, np.float32)
        earea = np.asarray(em.area, np.float32)
        epmf = np.asarray(em.pmf, np.float32)
        etri = np.asarray(em.tri_idx)
        # remap emitter tri indices into the valid-compacted ordering
        pos_of = {int(t): i for i, t in enumerate(idx)}
        for r in area_rows:
            f.write(_st.pack("<i", pos_of.get(int(etri[r]), -1)))
            f.write(erad[r].tobytes())
            f.write(_st.pack("<ff", float(earea[r]), float(epmf[r])))
        for c, rr, mi in sph_rows:
            f.write(np.asarray(c, np.float32).tobytes())
            f.write(_st.pack("<fi", rr, mi))
