"""Mitsuba 0.6 scene-XML loader (subset).

Capability match for SceneHandler (src/librender/scenehandler.cpp:197-223):
parses the reference's XML dialect — named plugins + typed properties +
`$key` substitution (the CLI `-D key=value` mechanism, mitsuba.cpp:169-175)
— into the flat SoA Scene plus a RenderSettings record carrying the
integrator/sampler/film configuration.

Supported subset (SURVEY.md §2.6 minimum rebuild set):
  shapes   : obj, ply, serialized, rectangle, cube, sphere, disk, cylinder,
             heightfield, instance/shapegroup
  bsdfs    : diffuse, roughdiffuse, conductor, roughconductor, dielectric,
             thindielectric, roughdielectric, plastic, roughplastic, phong,
             ward, difftrans, hk, null; modifiers mask/coating/mixturebsdf/
             blendbsdf (real per-row wrappers), bumpmap/normalmap (baked
             to tangent-space normal pages), twosided
  emitters : area, constant, point, spot, directional, envmap (image,
             importance sampled), sky/sun/sunsky (Preetham bake ->
             envmap, scene/sunsky.py)
  media    : homogeneous, heterogeneous (gridvolume .vol / constvolume)
  sensors  : perspective, thinlens, orthographic, spherical, radiancemeter,
             telecentric, fluencemeter, irradiancemeter, perspective_rdist
             (kc radial distortion, Newton-inverted at ray gen)
  films    : hdrfilm, ldrfilm, mfilm; rfilters box/tent/gaussian/mitchell/
             catmullrom/lanczos
  samplers : independent/stratified/ldsampler/halton/hammersley/sobol (spp
             only; MLT requires independent, enforced like drmlt.cpp:380)
"""
from __future__ import annotations

import dataclasses
import os
import re
import warnings
import xml.etree.ElementTree as ET

import jax.numpy as jnp
import numpy as np

from drmlt_mitsuba_tpu.scene import types as st
from drmlt_mitsuba_tpu.scene.mesh_io import load_mesh

# conductor IOR presets (eta, k) as RGB (from the reference's
# data/ior/*.spd tables, collapsed to sRGB primaries)
CONDUCTORS = {
    "cu": ((0.200, 0.924, 1.102), (3.912, 2.448, 2.138)),
    "au": ((0.143, 0.375, 1.442), (3.983, 2.386, 1.603)),
    "ag": ((0.155, 0.116, 0.138), (4.818, 3.122, 2.146)),
    "al": ((1.345, 0.965, 0.617), (7.475, 6.400, 5.303)),
    "cr": ((4.361, 2.910, 1.651), (5.196, 4.222, 3.746)),
    "ni": ((2.361, 1.663, 1.468), (4.498, 3.051, 2.344)),
    "none": ((0.0, 0.0, 0.0), (1.0, 1.0, 1.0)),
}

# dielectric IOR presets (ref: src/bsdfs/ior.h)
IORS = {
    "vacuum": 1.0, "air": 1.000277, "water": 1.3330, "ethanol": 1.361,
    "diamond": 2.419, "glass": 1.5046, "bk7": 1.5046, "pyrex": 1.470,
    "acrylic glass": 1.49, "polypropylene": 1.49, "pet": 1.575,
    "water ice": 1.31, "fused quartz": 1.458, "sodium chloride": 1.544,
    "amber": 1.55, "sapphire": 1.77, "bromine": 1.661,
}


@dataclasses.dataclass
class RenderSettings:
    integrator: dict
    width: int = 256
    height: int = 256
    filter_name: str = "gaussian"
    spp: int = 32
    sampler: str = "independent"
    # True when the sensor's shutter is open over moving geometry: the
    # scene carries TriangleMotion and path-technique configs should set
    # motion=True (one extra trailing PSS time dim)
    motion: bool = False
    # dipole subsurface requests (dicts for prepare_dipole); the CLI runs
    # the irradiance preprocess and attaches Scene.subsurface
    subsurface: list | None = None


# Jensen et al. 2001 measured scattering coefficients (public data; the
# reference ships the same table in libcore/util lookupMaterial): a few
# common presets, (sigma_s, sigma_a) in 1/mm.
SSS_PRESETS = {
    "skin1": ((0.74, 0.88, 1.01), (0.032, 0.17, 0.48)),
    "skin2": ((1.09, 1.59, 1.79), (0.013, 0.070, 0.145)),
    "marble": ((2.19, 2.62, 3.00), (0.0021, 0.0041, 0.0071)),
    "skimmilk": ((0.70, 1.22, 1.90), (0.0014, 0.0025, 0.0142)),
    "wholemilk": ((2.55, 3.21, 3.77), (0.0011, 0.0024, 0.014)),
    "ketchup": ((0.18, 0.07, 0.03), (0.061, 0.97, 1.45)),
    "potato": ((0.68, 0.70, 0.55), (0.0024, 0.0090, 0.12)),
}


def _subst(text, defaults):
    if text is None:
        return text
    for k, v in defaults.items():
        text = text.replace(f"${k}", str(v))
    return text


def _props(node, defaults):
    """Collect typed child properties into a dict."""
    out = {}
    for c in node:
        name = _subst(c.get("name"), defaults)
        val = _subst(c.get("value"), defaults)
        if c.tag == "integer":
            out[name] = int(float(val))
        elif c.tag == "float":
            out[name] = float(val)
        elif c.tag == "boolean":
            out[name] = val.lower() == "true"
        elif c.tag == "string":
            out[name] = val
        elif c.tag in ("rgb", "srgb", "spectrum"):
            out[name] = _parse_color(val)
        elif c.tag == "point" or c.tag == "vector":
            out[name] = np.array(
                [float(_subst(c.get(a), defaults) or 0) for a in "xyz"],
                np.float32,
            )
    return out


def _parse_color(val):
    val = val.replace(",", " ")
    parts = [float(x) for x in val.split()]
    if len(parts) == 1:
        return np.full(3, parts[0], np.float32)
    return np.asarray(parts[:3], np.float32)


def _parse_transform(node, defaults):
    m = np.eye(4, dtype=np.float64)
    for c in node:
        t = np.eye(4, dtype=np.float64)
        g = lambda a, d="0": float(_subst(c.get(a), defaults) or d)
        if c.tag == "translate":
            t[:3, 3] = [g("x"), g("y"), g("z")]
        elif c.tag == "scale":
            if c.get("value") is not None:
                s = float(_subst(c.get("value"), defaults))
                t[0, 0] = t[1, 1] = t[2, 2] = s
            else:
                t[0, 0], t[1, 1], t[2, 2] = g("x", "1"), g("y", "1"), g("z", "1")
        elif c.tag == "rotate":
            axis = np.array([g("x"), g("y"), g("z")])
            n = np.linalg.norm(axis)
            axis = axis / (n if n > 0 else 1.0)
            a = np.deg2rad(float(_subst(c.get("angle"), defaults)))
            cth, sth = np.cos(a), np.sin(a)
            x, y, z = axis
            t[:3, :3] = [
                [cth + x * x * (1 - cth), x * y * (1 - cth) - z * sth,
                 x * z * (1 - cth) + y * sth],
                [y * x * (1 - cth) + z * sth, cth + y * y * (1 - cth),
                 y * z * (1 - cth) - x * sth],
                [z * x * (1 - cth) - y * sth, z * y * (1 - cth) + x * sth,
                 cth + z * z * (1 - cth)],
            ]
        elif c.tag == "matrix":
            vals = [float(x) for x in _subst(c.get("value"), defaults).split()]
            t = np.asarray(vals, np.float64).reshape(4, 4)
        elif c.tag.lower() == "lookat":   # reference writes both spellings
            origin = _parse_color(_subst(c.get("origin"), defaults))
            target = _parse_color(_subst(c.get("target"), defaults))
            up = _parse_color(_subst(c.get("up", "0, 1, 0"), defaults))
            d = target - origin
            d = d / np.linalg.norm(d)
            left = np.cross(up / np.linalg.norm(up), d)
            left /= np.linalg.norm(left)
            newup = np.cross(d, left)
            t = np.eye(4)
            t[:3, 0], t[:3, 1], t[:3, 2], t[:3, 3] = left, newup, d, origin
        m = t @ m
    return m.astype(np.float32)


def _resolve_ior(val):
    if isinstance(val, str):
        return IORS.get(val.lower(), 1.5046)
    return float(val)


def _parse_texture(tex_node, defaults, ctx, base_dir, raw=False):
    """Bake a <texture> element into a 256x256 atlas page; returns tex_id.
    raw=True skips the sRGB->linear decode (normal/height data)."""
    ttype = _subst(tex_node.get("type"), defaults)
    props = _props(tex_node, defaults)
    size = 256
    if ttype == "checkerboard":
        c0 = props.get("color0", np.full(3, 0.4, np.float32))
        c1 = props.get("color1", np.full(3, 0.2, np.float32))
        us = max(1, int(round(float(props.get("uscale", 1.0)))))
        vs = max(1, int(round(float(props.get("vscale", 1.0)))))
        yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
        cell = ((xx * 2 * us // size) + (yy * 2 * vs // size)) % 2
        page = np.where(cell[..., None] == 0, c0, c1).astype(np.float32)
    elif ttype == "bitmap":
        from PIL import Image

        fname = props.get("filename")
        fpath = fname if os.path.isabs(fname) else os.path.join(base_dir,
                                                                fname)
        if fname.lower().endswith(".exr"):
            from drmlt_mitsuba_tpu.utils.exr import read_exr

            img = read_exr(fpath)[..., :3]
        else:
            img = np.asarray(
                Image.open(fpath).convert("RGB"), np.float32
            ) / 255.0
            if not raw:
                img = np.where(img <= 0.04045, img / 12.92,
                               ((img + 0.055) / 1.055) ** 2.4)  # sRGB->lin
        im = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
        page = np.asarray(im.resize((size, size)), np.float32) / 255.0
    elif ttype == "gridtexture":
        # grid lines of color1 on a color0 field (ref: src/textures/grid
        # texture plugin): lines of `lineWidth` at integer uv multiples
        c0 = props.get("color0", np.full(3, 0.4, np.float32))
        c1 = props.get("color1", np.full(3, 0.2, np.float32))
        lw = float(props.get("lineWidth", 0.01))
        us = max(1e-6, float(props.get("uscale", 1.0)))
        vs = max(1e-6, float(props.get("vscale", 1.0)))
        uu = (np.arange(size) + 0.5) / size * us % 1.0
        vv = (np.arange(size) + 0.5) / size * vs % 1.0
        on_u = (uu < lw) | (uu > 1.0 - lw)
        on_v = (vv < lw) | (vv > 1.0 - lw)
        line = on_u[None, :] | on_v[:, None]
        page = np.where(line[..., None], c1, c0).astype(np.float32)
    elif ttype == "wireframe":
        # edge highlight (ref: src/textures/wireframe.cpp draws mesh
        # edges); in uv space approximate with triangle-diagonal lines
        c_int = props.get("interiorColor", np.full(3, 0.5, np.float32))
        c_edge = props.get("edgeColor", np.full(3, 0.1, np.float32))
        lw = float(props.get("lineWidth", 0.01))
        uu = (np.arange(size) + 0.5) / size % 1.0
        vv = (np.arange(size) + 0.5) / size % 1.0
        on_u = (uu < lw) | (uu > 1.0 - lw)
        on_v = (vv < lw) | (vv > 1.0 - lw)
        diag = np.abs(uu[None, :] + vv[:, None] - 1.0) < lw
        line = on_u[None, :] | on_v[:, None] | diag
        page = np.where(line[..., None], c_edge, c_int).astype(np.float32)
    elif ttype == "scale":
        # scale wrapper: nested texture (or constant) times `scale`
        sc = np.asarray(props.get("scale", 1.0), np.float32) * np.ones(3)
        inner = tex_node.find("texture")
        if inner is not None:
            tid = _parse_texture(inner, defaults, ctx, base_dir)
            page = ctx["textures"][tid] * sc
            ctx["textures"][tid] = page.astype(np.float32)
            return tid
        base_v = np.asarray(props.get("value", 1.0), np.float32) * np.ones(3)
        page = np.broadcast_to(base_v * sc, (size, size, 3)).astype(
            np.float32).copy()
    elif ttype == "vertexcolors":
        # sentinel tex id: the albedo lookup interpolates the mesh's
        # per-vertex colors barycentrically (Scene.vcolors; ref:
        # src/textures/vertexcolors.cpp reading TriMesh colors)
        ctx["want_vcolors"] = True
        return -2
    else:
        warnings.warn(f"unsupported texture '{ttype}', using constant 0.5")
        page = np.full((size, size, 3), 0.5, np.float32)
    ctx["textures"].append(page)
    return len(ctx["textures"]) - 1


def _parse_bsdf(node, defaults, ctx, base_dir=""):
    """Parse a bsdf element into a material dict; returns material index."""
    btype = _subst(node.get("type"), defaults)
    props = _props(node, defaults)
    tex_id = -1
    tex = node.find("texture")
    if tex is not None:
        tex_id = _parse_texture(tex, defaults, ctx, base_dir)
    two_sided = False
    mods: dict = {}
    # Modifier wrappers are collected into per-row parameters applied by
    # render/bsdf.py around the core lobes (mask -> coating -> 2-way
    # mixture; ref: src/bsdfs/{mask,coating,mixturebsdf,blendbsdf}.cpp).
    # bumpmap/normalmap still collapse to the nested bsdf with a warning.
    while btype in ("twosided", "mask", "bumpmap", "normalmap", "coating",
                    "roughcoating", "mixturebsdf", "blendbsdf"):
        node_props = _props(node, defaults)
        if btype == "twosided":
            two_sided = True
        elif btype == "mask":
            op = np.broadcast_to(
                np.asarray(node_props.get("opacity", 0.5), np.float32), (3,)
            )
            mods["opacity"] = mods.get("opacity", np.ones(3, np.float32)) * op
        elif btype in ("coating", "roughcoating"):
            ii = _resolve_ior(node_props.get("intIOR", 1.5046))
            ee = _resolve_ior(node_props.get("extIOR", 1.000277))
            mods["coat_eta"] = float(ii / ee)
            sa = np.asarray(node_props.get("sigmaA", 0.0), np.float32)
            mods["coat_sigma_a"] = np.broadcast_to(
                sa * float(node_props.get("thickness", 1.0)), (3,)
            ).copy()
            if btype == "roughcoating":
                warnings.warn("roughcoating treated as a smooth coating")
        elif btype in ("bumpmap", "normalmap"):
            # bake to a tangent-space normal page encoded as (n+1)/2
            # (ref: src/bsdfs/{bumpmap,normalmap}.cpp)
            tnode = node.find("texture")
            if tnode is None:
                warnings.warn(f"{btype} without a texture child; ignored")
            else:
                tid = _parse_texture(tnode, defaults, ctx, base_dir,
                                     raw=True)
                page = ctx["textures"][tid]
                if btype == "bumpmap":
                    h = page.mean(-1) * float(node_props.get("scale", 1.0))
                    # central differences in texel units scaled to uv
                    sz = h.shape[0]
                    dhdu = (np.roll(h, -1, 1) - np.roll(h, 1, 1)) * sz * 0.5
                    dhdv = (np.roll(h, -1, 0) - np.roll(h, 1, 0)) * sz * 0.5
                    n = np.stack(
                        [-dhdu, -dhdv, np.ones_like(h)], -1)
                    n /= np.maximum(
                        np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
                    ctx["textures"][tid] = ((n + 1.0) * 0.5).astype(
                        np.float32)
                mods["normal_tex"] = tid
        else:   # mixturebsdf / blendbsdf
            kids = [("bsdf", c) if c.tag == "bsdf" else ("ref", c.get("id"))
                    for c in node if c.tag in ("bsdf", "ref")]
            if btype == "blendbsdf":
                w = float(np.mean(node_props.get("weight", 0.5)))
                weights = [1.0 - w, w]
            else:
                ws = str(node_props.get("weights", "")).replace(",", " ")
                weights = [float(x) for x in ws.split()]
            weights += [1.0] * (len(kids) - len(weights))
            if len(kids) >= 2:
                total = sum(weights[: len(kids)]) or 1.0
                mods["mix_other"] = _parse_mixture_rest(
                    kids[1:], weights[1:len(kids)], defaults, ctx, base_dir
                )
                mods["mix_weight"] = sum(weights[1:len(kids)]) / total
            if kids and kids[0][0] == "ref":
                # first component by reference: give the modifiers a
                # private copy of the referenced row
                i0 = ctx["mat_by_id"].get(kids[0][1])
                mat = (dict(ctx["materials"][i0]) if i0 is not None
                       else dict(kind=st.BSDF_DIFFUSE))
                mat.update(mods)
                ctx["materials"].append(mat)
                return len(ctx["materials"]) - 1
        inner = node.find("bsdf")
        if inner is None:
            break
        node = inner
        btype = _subst(node.get("type"), defaults)
        props.update(_props(node, defaults))
        if tex_id < 0:
            tex = node.find("texture")
            if tex is not None:
                tex_id = _parse_texture(tex, defaults, ctx, base_dir)

    kind_map = {
        "diffuse": st.BSDF_DIFFUSE,
        "roughdiffuse": st.BSDF_ROUGH_DIFFUSE,
        "conductor": st.BSDF_CONDUCTOR,
        "roughconductor": st.BSDF_ROUGH_CONDUCTOR,
        "dielectric": st.BSDF_DIELECTRIC,
        "thindielectric": st.BSDF_THIN_DIELECTRIC,
        "roughdielectric": st.BSDF_ROUGH_DIELECTRIC,
        "plastic": st.BSDF_PLASTIC,
        "roughplastic": st.BSDF_ROUGH_PLASTIC,
        "phong": st.BSDF_PHONG,
        "ward": st.BSDF_WARD,
        "difftrans": st.BSDF_DIFFTRANS,
        "hk": st.BSDF_HK,
        "null": st.BSDF_NULL,
        "mirror": st.BSDF_MIRROR,
    }
    kind = kind_map.get(btype)
    if btype == "irawan":
        # woven cloth (ref: src/bsdfs/irawan.cpp): parse the .wft weave,
        # stash the packed pattern on the scene (one pattern per scene —
        # it parameterizes every BSDF_IRAWAN row), fall back to the
        # average yarn kd as the diffuse albedo for uv-less callers
        from drmlt_mitsuba_tpu.render.irawan import build_pattern, parse_wft

        fname = props.get("filename")
        fpath = fname if os.path.isabs(fname) else os.path.join(base_dir,
                                                                fname)
        with open(fpath) as f:
            spec = parse_wft(f.read(), props)
        pat = build_pattern(spec,
                            repeat_u=float(props.get("repeatU", 1.0)),
                            repeat_v=float(props.get("repeatV", 1.0)))
        if ctx.get("irawan") is not None:
            warnings.warn("multiple irawan bsdfs: the last weave pattern "
                          "wins (one pattern per scene)")
        ctx["irawan"] = pat
        kd_avg = np.asarray(pat.yarn_kd).mean(axis=0)
        mat = dict(kind=st.BSDF_IRAWAN, two_sided=True, tex_id=-1,
                   albedo=kd_avg.astype(np.float32))
        mat.update(mods)
        ctx["materials"].append(mat)
        return len(ctx["materials"]) - 1
    if kind is None:
        warnings.warn(f"unsupported bsdf '{btype}', using diffuse")
        kind = st.BSDF_DIFFUSE

    mat = dict(kind=kind, two_sided=True, tex_id=tex_id)
    refl = props.get("reflectance", props.get("diffuseReflectance"))
    if kind == st.BSDF_DIFFTRANS:
        refl = props.get("transmittance", refl)
    if refl is not None:
        mat["albedo"] = refl
    if "specularReflectance" in props:
        mat["spec_refl"] = props["specularReflectance"]
    if "specularTransmittance" in props:
        mat["spec_trans"] = props["specularTransmittance"]
    if kind in (st.BSDF_CONDUCTOR, st.BSDF_ROUGH_CONDUCTOR):
        m = props.get("material", "cu")
        eta, k = CONDUCTORS.get(str(m).lower(), CONDUCTORS["cu"])
        mat["eta"] = props.get("eta", np.asarray(eta, np.float32))
        mat["k"] = props.get("k", np.asarray(k, np.float32))
    if kind in (st.BSDF_DIELECTRIC, st.BSDF_THIN_DIELECTRIC,
                st.BSDF_ROUGH_DIELECTRIC, st.BSDF_PLASTIC,
                st.BSDF_ROUGH_PLASTIC):
        int_ior = _resolve_ior(props.get("intIOR", 1.5046))
        ext_ior = _resolve_ior(props.get("extIOR", 1.000277))
        mat["eta"] = np.full(3, int_ior / ext_ior, np.float32)
    if "alpha" in props:
        mat["roughness"] = float(np.mean(props["alpha"]))
    elif "exponent" in props:   # phong exponent -> GGX-ish alpha
        mat["roughness"] = float(np.sqrt(2.0 / (2.0 + np.mean(props["exponent"]))))
    if kind == st.BSDF_HK:
        # slab medium parameters (see BSDF_HK field mapping in types.py)
        mat["spec_refl"] = props.get("sigmaS", np.full(3, 2.0, np.float32))
        mat["spec_trans"] = props.get("sigmaA", np.full(3, 0.05, np.float32))
        mat["roughness"] = float(props.get("thickness", 1.0))
        g_hk = 0.0
        ph = node.find("phase")
        if ph is not None:
            g_hk = float(_props(ph, defaults).get("g", 0.0))
        mat["k"] = np.asarray([g_hk, 0.0, 0.0], np.float32)

    mat.update(mods)
    ctx["materials"].append(mat)
    return len(ctx["materials"]) - 1


def _parse_mixture_rest(kids, weights, defaults, ctx, base_dir):
    """Collapse mixture components 1..N-1 into a chain of 2-way rows:
    mixture(w0*A, w1*B, w2*C) == A blended with [B blended with C], with
    renormalized weights at each link (the chained-row encoding of N-way
    mixtures over MaterialTable.mix_other/mix_weight)."""

    def row_for(kid):
        tag, v = kid
        if tag == "ref":
            idx = ctx["mat_by_id"].get(v)
            if idx is not None:
                return idx
            warnings.warn(f"mixture ref '{v}' unknown; using diffuse")
            ctx["materials"].append(dict(kind=st.BSDF_DIFFUSE))
            return len(ctx["materials"]) - 1
        return _parse_bsdf(v, defaults, ctx, base_dir)

    idx = row_for(kids[-1])
    acc = weights[-1]
    for kid, w in zip(reversed(kids[:-1]), reversed(weights[:-1])):
        m = dict(ctx["materials"][row_for(kid)])   # private copy per link
        if m.get("mix_other", -1) >= 0:
            warnings.warn("mixture component is itself a mixture; its own "
                          "blend is overridden by the chain link")
        m["mix_other"] = idx
        m["mix_weight"] = acc / max(acc + w, 1e-9)
        ctx["materials"].append(m)
        idx = len(ctx["materials"]) - 1
        acc += w
    return idx


def _unit_rect():
    v = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    return v, f, None, uv


def _unit_cube():
    corners = np.array(
        [[x, y, z] for z in (-1, 1) for y in (-1, 1) for x in (-1, 1)],
        np.float32,
    )
    quads = [
        (0, 2, 3, 1), (4, 5, 7, 6),   # z-, z+
        (0, 1, 5, 4), (2, 6, 7, 3),   # y-, y+
        (0, 4, 6, 2), (1, 3, 7, 5),   # x-, x+
    ]
    faces = []
    for q in quads:
        faces.append([q[0], q[1], q[2]])
        faces.append([q[0], q[2], q[3]])
    return corners, np.asarray(faces, np.int32), None, None


def _unit_sphere_mesh(n_theta=12, n_phi=24):
    """UV-sphere triangulation (unit radius, origin center) with smooth
    per-vertex normals.  Used to realize area emitters attached to sphere
    shapes: the emitter table scans triangles only, so emissive spheres are
    tessellated at load (ref: src/shapes/sphere.cpp supports area emitters
    natively)."""
    th = np.linspace(0.0, np.pi, n_theta + 1)
    ph = np.linspace(0.0, 2.0 * np.pi, n_phi, endpoint=False)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    v = np.stack(
        [np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp), np.cos(tt)], -1
    ).reshape(-1, 3).astype(np.float32)
    idx = np.arange((n_theta + 1) * n_phi).reshape(n_theta + 1, n_phi)
    faces = []
    for i in range(n_theta):
        a, b = idx[i], idx[i + 1]
        an, bn = np.roll(a, -1), np.roll(b, -1)
        if i > 0:                       # skip degenerate pole strip
            faces.append(np.stack([a, b, an], -1))
        if i < n_theta - 1:
            faces.append(np.stack([an, b, bn], -1))
    f = np.concatenate(faces).astype(np.int32)
    uv = np.stack([pp / (2.0 * np.pi), 1.0 - tt / np.pi], -1).reshape(-1, 2)
    return v, f, v.copy(), uv.astype(np.float32)


def _apply_transform(m, v, n):
    v2 = v @ m[:3, :3].T + m[:3, 3]
    n2 = None
    if n is not None:
        inv = np.linalg.inv(m[:3, :3])
        n2 = n @ inv
        ln = np.linalg.norm(n2, axis=-1, keepdims=True)
        n2 = n2 / np.maximum(ln, 1e-20)
    return v2.astype(np.float32), n2


def read_vol(path: str):
    """Read a Mitsuba binary grid volume (.vol): 'VOL' magic, version 3,
    encoding int32 (1=float32), res (x,y,z) int32, channels int32, aabb
    6*float32, then x-fastest data.  Returns (density (D,H,W), bb_min,
    bb_max).  Ref format: gridvolume's on-disk layout (SURVEY §2.6 media)."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:3] != b"VOL":
        raise ValueError(f"{path}: not a VOL file")
    enc, xr, yr, zr, ch = np.frombuffer(raw[4:24], np.int32)
    bb = np.frombuffer(raw[24:48], np.float32)
    if enc != 1:
        raise ValueError(f"{path}: only float32 encoding supported")
    data = np.frombuffer(raw[48:48 + 4 * xr * yr * zr * ch], np.float32)
    data = data.reshape(zr, yr, xr, ch)[..., 0]
    return np.ascontiguousarray(data), bb[:3].copy(), bb[3:].copy()


def read_vol_rgb(path: str):
    """Like read_vol but keeps all channels, broadcast to 3 (the albedo /
    orientation volume layouts of the reference gridvolume)."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:3] != b"VOL":
        raise ValueError(f"{path}: not a VOL file")
    enc, xr, yr, zr, ch = np.frombuffer(raw[4:24], np.int32)
    bb = np.frombuffer(raw[24:48], np.float32)
    if enc != 1:
        raise ValueError(f"{path}: only float32 encoding supported")
    data = np.frombuffer(raw[48:48 + 4 * xr * yr * zr * ch], np.float32)
    data = data.reshape(zr, yr, xr, ch)
    if ch == 1:
        data = np.repeat(data, 3, axis=-1)
    return (np.ascontiguousarray(data[..., :3]), bb[:3].copy(),
            bb[3:].copy())


def write_vol(path: str, density, bb_min, bb_max):
    """Write a float32 single-channel .vol grid (inverse of read_vol)."""
    density = np.asarray(density, np.float32)
    zr, yr, xr = density.shape
    with open(path, "wb") as f:
        f.write(b"VOL" + bytes([3]))
        f.write(np.asarray([1, xr, yr, zr, 1], np.int32).tobytes())
        f.write(np.asarray(list(bb_min) + list(bb_max),
                           np.float32).tobytes())
        f.write(density.tobytes())


def _medium_coeffs(props):
    """(sigma_t, albedo) from either sigmaT/albedo or sigmaS/sigmaA props
    (ref: HomogeneousMedium's two parameter conventions)."""
    sigma_t = props.get("sigmaT")
    albedo = props.get("albedo")
    if sigma_t is None and "sigmaS" in props:
        ss = np.asarray(props["sigmaS"], np.float32) * np.ones(3)
        sa = np.asarray(props.get("sigmaA", 0.0), np.float32) * np.ones(3)
        sigma_t = ss + sa
        albedo = ss / np.maximum(sigma_t, 1e-20)
    if sigma_t is None:
        sigma_t = np.ones(3, np.float32)
    if albedo is None:
        albedo = np.full(3, 0.75, np.float32)
    sigma_t = np.asarray(sigma_t, np.float32) * float(
        props.get("scale", 1.0)) * np.ones(3)
    return sigma_t, np.asarray(albedo, np.float32) * np.ones(3)


def _interior_medium_row(md, defaults, ctx):
    """Parse a shape-interior medium into a MediumTable row (homogeneous;
    HG/Rayleigh/kkay/microflake phase per row); returns its row index."""
    from drmlt_mitsuba_tpu.render.medium import (
        PHASE_KKAY, PHASE_MICROFLAKE, PHASE_RAYLEIGH,
    )

    mtype = _subst(md.get("type"), defaults)
    props = _props(md, defaults)
    g = 0.0
    phase_kind = 0
    fiber = np.asarray([0.0, 0.0, 1.0], np.float32)
    ph_a = np.zeros(4, np.float32)
    ph = md.find("phase")
    if ph is not None:
        ptype = _subst(ph.get("type"), defaults)
        pprops = _props(ph, defaults)
        if ptype == "hg":
            g = float(pprops.get("g", 0.0))
        elif ptype == "rayleigh":
            phase_kind = PHASE_RAYLEIGH
        elif ptype == "kkay":
            from drmlt_mitsuba_tpu.render.phase import kkay_normalization

            phase_kind = PHASE_KKAY
            expo = float(pprops.get("exponent", 4.0))
            ph_a = np.asarray(
                [float(pprops.get("ks", 0.4)),
                 float(pprops.get("kd", 0.2)), expo,
                 kkay_normalization(expo)], np.float32)
            fiber = np.asarray(
                pprops.get("orientation", (0.0, 0.0, 1.0)), np.float32)
        elif ptype == "microflake":
            phase_kind = PHASE_MICROFLAKE
            ph_a = np.asarray(
                [float(pprops.get("stddev", 0.3)), 0, 0, 0], np.float32)
            fiber = np.asarray(
                pprops.get("orientation", (0.0, 0.0, 1.0)), np.float32)
        elif ptype == "mixturephase":
            # 2-component encoding: comp1 = HG(g), comp2 in ph_a
            from drmlt_mitsuba_tpu.render.medium import PHASE_MIXTURE

            phase_kind = PHASE_MIXTURE
            wstr = str(pprops.get("weights", "0.5 0.5"))
            ws = [float(x) for x in wstr.replace(",", " ").split()] or [0.5]
            subs = ph.findall("phase")
            if len(subs) > 2:
                warnings.warn("interior mixturephase: only the first two "
                              "components are used")
            g2 = 0.0
            kind2 = 0.0
            if subs:
                sp0 = _props(subs[0], defaults)
                s0t = _subst(subs[0].get("type"), defaults)
                g = float(sp0.get("g", 0.0)) if s0t == "hg" else 0.0
            if len(subs) > 1:
                s1t = _subst(subs[1].get("type"), defaults)
                sp1 = _props(subs[1], defaults)
                if s1t == "rayleigh":
                    kind2 = 1.0
                elif s1t == "hg":
                    g2 = float(sp1.get("g", 0.0))
            w_tot = sum(ws[:2]) or 1.0
            ph_a = np.asarray([g2, ws[0] / w_tot, kind2, 0.0], np.float32)
        elif ptype != "isotropic":
            warnings.warn(
                f"interior phase '{ptype}' approximated as isotropic")
    if mtype != "homogeneous":
        warnings.warn(
            f"interior medium '{mtype}' approximated as homogeneous")
    sigma_t, albedo = _medium_coeffs(props)
    ctx["media"].append(dict(sigma_t=sigma_t, albedo=albedo, g=g,
                             phase_kind=phase_kind, fiber=fiber,
                             ph_a=ph_a))
    return len(ctx["media"]) - 1


def load_scene_xml(path: str, defaults: dict | None = None):
    """Load a Mitsuba scene XML -> (Scene, RenderSettings)."""
    defaults = dict(defaults or {})
    base = os.path.dirname(os.path.abspath(path))
    tree = ET.parse(path)
    root = tree.getroot()

    for d in root.findall("default"):
        defaults.setdefault(d.get("name"), d.get("value"))

    ctx = dict(materials=[], mat_by_id={}, textures=[], groups={})
    meshes = []     # (v, f, n, uv, mat_idx, emitter_radiance|None)
    mesh_vcolors = {}   # mesh list index -> (V, 3) per-vertex colors
    spheres = []    # (center, radius, mat_idx, radiance|None)
    env_radiance = np.zeros(3, np.float32)
    env_img = None
    points = []       # (pos, intensity)
    spots = []        # (pos, intensity, axis, cutoff_deg)
    collimateds = []  # (pos, direction, power)
    directionals = []  # (direction, irradiance)
    settings = RenderSettings(integrator=dict(type="path"))
    camera = None
    mesh_motion = {}   # mesh list index -> (v_close, n_close|None)
    sss_requests = []  # dipole subsurface declarations (prepare at render)

    # shutter interval (pre-parsed: shapes need it before the sensor block;
    # ref: include/mitsuba/render/sensor.h shutterOpen/shutterClose)
    shutter_open, shutter_close = 0.0, 0.0
    _sens0 = root.find("sensor")
    if _sens0 is not None:
        _sp0 = _props(_sens0, defaults)
        shutter_open = float(_sp0.get("shutterOpen", 0.0))
        shutter_close = float(_sp0.get("shutterClose", shutter_open))

    # top-level named bsdfs
    for b in root.findall("bsdf"):
        idx = _parse_bsdf(b, defaults, ctx, base)
        if b.get("id"):
            ctx["mat_by_id"][b.get("id")] = idx

    def shape_material(sh):
        ref = sh.find("ref")
        if ref is not None and ref.get("id") in ctx["mat_by_id"]:
            return ctx["mat_by_id"][ref.get("id")]
        b = sh.find("bsdf")
        if b is not None:
            return _parse_bsdf(b, defaults, ctx, base)
        ctx["materials"].append(dict(kind=st.BSDF_DIFFUSE))
        return len(ctx["materials"]) - 1

    # ---- per-shape interior media (ref: shapes carry interior/exterior
    # medium refs, src/librender/shape.cpp addChild) -----------------------
    ctx["media"] = []
    ctx["media_by_id"] = {}
    shape_med_elems = set()
    interior_ref_ids = set()
    for sh in root.iter("shape"):
        for mnode in sh.findall("medium"):
            shape_med_elems.add(id(mnode))
        for rnode in sh.findall("ref"):
            if rnode.get("name") == "interior":
                interior_ref_ids.add(rnode.get("id"))
    for md in root.findall("medium"):
        if md.get("id") and md.get("id") in interior_ref_ids:
            ctx["media_by_id"][md.get("id")] = _interior_medium_row(
                md, defaults, ctx)

    def shape_interior(sh, mat_idx):
        """Attach a shape's interior medium via a private material row."""
        med_idx = -1
        for mnode in sh.findall("medium"):
            if mnode.get("name", "interior") != "exterior":
                med_idx = _interior_medium_row(mnode, defaults, ctx)
        for rnode in sh.findall("ref"):
            if rnode.get("name") == "interior":
                med_idx = ctx["media_by_id"].get(rnode.get("id"), med_idx)
        if med_idx < 0:
            return mat_idx
        mrow = dict(ctx["materials"][mat_idx])
        mrow["interior_medium"] = med_idx
        ctx["materials"].append(mrow)
        return len(ctx["materials"]) - 1

    for sh in root.findall("shape"):
        stype = _subst(sh.get("type"), defaults)
        props = _props(sh, defaults)
        tnode = sh.find("transform")
        m = _parse_transform(tnode, defaults) if tnode is not None else np.eye(
            4, dtype=np.float32
        )
        mat_idx = shape_interior(sh, shape_material(sh))
        sss = sh.find("subsurface")
        if sss is not None and _subst(sss.get("type"), defaults) == "dipole":
            # ref: src/subsurface/dipole.cpp — clone the material row so
            # the dipole instance keys a UNIQUE mat_id (the reference
            # attaches subsurface to the shape; our tracer keys by
            # material), then record the request for prepare_dipole.
            sprops = _props(sss, defaults)
            ctx["materials"].append(dict(ctx["materials"][mat_idx]))
            mat_idx = len(ctx["materials"]) - 1
            preset = SSS_PRESETS.get(str(sprops.get("material", "")))
            sig_s = np.asarray(sprops.get(
                "sigmaS", preset[0] if preset else (2.6, 3.2, 3.9)),
                np.float32)
            sig_a = np.asarray(sprops.get(
                "sigmaA", preset[1] if preset else (0.0021, 0.0041, 0.0071)),
                np.float32)
            scale_s = float(sprops.get("scale", 1.0))
            sss_requests.append(dict(
                mat_id=mat_idx,
                sigma_s=sig_s * scale_s, sigma_a=sig_a * scale_s,
                g=float(np.mean(np.asarray(sprops.get("g", 0.0)))),
                eta=float(sprops.get("intIOR", 1.33))
                / float(sprops.get("extIOR", 1.0)),
                irr_samples=int(sprops.get("irrSamples", 16)),
                indirect=bool(sprops.get("irrIndirect", True)),
            ))
        em = sh.find("emitter")
        radiance = None
        if em is not None and em.get("type") == "area":
            radiance = _props(em, defaults).get("radiance", np.ones(3, np.float32))

        if stype in ("obj", "ply", "serialized"):
            from drmlt_mitsuba_tpu.scene.mesh_io import load_mesh_ex

            fname = props.get("filename")
            fpath = fname if os.path.isabs(fname) else os.path.join(base, fname)
            v, f, n, uv, vcol = load_mesh_ex(fpath,
                                             props.get("shapeIndex", 0))
            if props.get("faceNormals"):
                n = None
            v, n = _apply_transform(m, v, n)
            if vcol is not None:
                mesh_vcolors[len(meshes)] = vcol
            meshes.append((v, f, n, uv, mat_idx, radiance))
        elif stype == "rectangle":
            v, f, n, uv = _unit_rect()
            v, n = _apply_transform(m, v, n)
            meshes.append((v, f, n, uv, mat_idx, radiance))
        elif stype == "cube":
            v, f, n, uv = _unit_cube()
            v, n = _apply_transform(m, v, n)
            meshes.append((v, f, n, uv, mat_idx, radiance))
        elif stype == "disk":
            nseg = 32
            ang = np.linspace(0, 2 * np.pi, nseg, endpoint=False)
            v = np.concatenate(
                [np.zeros((1, 3), np.float32),
                 np.stack([np.cos(ang), np.sin(ang), np.zeros(nseg)], 1)
                 .astype(np.float32)]
            )
            f = np.asarray(
                [[0, 1 + i, 1 + (i + 1) % nseg] for i in range(nseg)], np.int32
            )
            v, _ = _apply_transform(m, v, None)
            meshes.append((v, f, None, None, mat_idx, radiance))
        elif stype == "cylinder":
            p0 = props.get("p0", np.asarray([0, 0, 0], np.float32))
            p1 = props.get("p1", np.asarray([0, 0, 1], np.float32))
            radius = float(props.get("radius", 1.0))
            nseg = 32
            axis = np.asarray(p1, np.float64) - np.asarray(p0, np.float64)
            ln = np.linalg.norm(axis)
            axis = axis / max(ln, 1e-9)
            ref_v = np.array([1.0, 0, 0]) if abs(axis[0]) < 0.9 else \
                np.array([0, 1.0, 0])
            t1 = np.cross(axis, ref_v); t1 /= np.linalg.norm(t1)
            t2 = np.cross(axis, t1)
            ang = np.linspace(0, 2 * np.pi, nseg, endpoint=False)
            ring = (np.outer(np.cos(ang), t1) + np.outer(np.sin(ang), t2)) \
                * radius
            v = np.concatenate([np.asarray(p0) + ring,
                                np.asarray(p1) + ring]).astype(np.float32)
            f = []
            for i in range(nseg):
                j = (i + 1) % nseg
                f.append([i, j, nseg + j])
                f.append([i, nseg + j, nseg + i])
            v2, _ = _apply_transform(m, v, None)
            meshes.append((v2, np.asarray(f, np.int32), None, None,
                           mat_idx, radiance))
        elif stype == "deformable":
            # keyframe-animated mesh (ref: src/shapes/deformable.cpp).
            # The reference interpolates per-ray via a space-time kd-tree;
            # this design has no shutter dimension, so the keyframes are
            # interpolated ONCE at a fixed render time ($time, default the
            # keyframe midpoint) into a static mesh — scenes load and
            # render, without motion-blur smear (documented in PARITY.md).
            tstr = str(props.get("times", "0 1"))
            times = [float(x) for x in
                     tstr.replace(",", " ").replace(";", " ").split()]
            frames = []
            for child in sh.findall("shape"):
                ctype = _subst(child.get("type"), defaults)
                cprops = _props(child, defaults)
                if ctype not in ("obj", "ply", "serialized"):
                    warnings.warn(
                        f"deformable keyframe '{ctype}' unsupported")
                    continue
                fname = cprops.get("filename")
                fpath = fname if os.path.isabs(fname) else os.path.join(
                    base, fname)
                frames.append(load_mesh(fpath, cprops.get("shapeIndex", 0)))
            if len(frames) < 1:
                warnings.warn("deformable without keyframes, skipped")
                continue
            times = times[: len(frames)] or [0.0]

            def lerp_frames(t_eval):
                if len(frames) == 1:
                    return frames[0]
                idx = int(np.clip(np.searchsorted(times, t_eval) - 1, 0,
                                  max(len(frames) - 2, 0)))
                t0, t1 = times[idx], times[idx + 1]
                alpha = 0.0 if t1 == t0 else float(
                    np.clip((t_eval - t0) / (t1 - t0), 0.0, 1.0))
                v0, f, n0, uv = frames[idx]
                v1, _, n1, _ = frames[idx + 1]
                v = ((1.0 - alpha) * v0 + alpha * v1).astype(np.float32)
                nvec = None
                if n0 is not None and n1 is not None and len(n0) == len(n1):
                    nvec = (1.0 - alpha) * n0 + alpha * n1
                    nvec = (nvec / np.maximum(np.linalg.norm(
                        nvec, axis=-1, keepdims=True), 1e-12)).astype(
                        np.float32)
                return v, f, nvec, uv

            if shutter_close > shutter_open and len(frames) > 1:
                # real motion blur: keyframes at shutter open AND close;
                # the per-ray time dim lerps between them in the tracer
                # (ref: deformable.cpp per-ray space-time interpolation)
                v, f, nvec, uv = lerp_frames(shutter_open)
                vc, _, nc, _ = lerp_frames(shutter_close)
                v, nvec = _apply_transform(m, v, nvec)
                vc, nc = _apply_transform(m, vc, nc)
                mesh_motion[len(meshes)] = (vc, nc)
                meshes.append((v, f, nvec, uv, mat_idx, radiance))
                continue
            t_render = float(defaults.get(
                "time", 0.5 * (times[0] + times[-1]) if times else 0.0))
            v, f, nvec, uv = lerp_frames(t_render)
            v, nvec = _apply_transform(m, v, nvec)
            meshes.append((v, f, nvec, uv, mat_idx, radiance))
        elif stype == "hair":
            from drmlt_mitsuba_tpu.scene.hair import (
                load_hair, simplify_fibers, tessellate_hair,
            )

            fname = props.get("filename")
            fpath = fname if os.path.isabs(fname) else os.path.join(base,
                                                                    fname)
            hv, hf = load_hair(fpath)
            hv, hf = simplify_fibers(
                hv, hf, float(props.get("angleThreshold", 1.0)))
            radius = float(props.get("radius", 0.025))
            # world-space radius follows the transform's scale
            # (hair.cpp:633); ring tessellation happens post-transform so
            # the tube cross-section stays circular under anisotropy
            hv4 = np.concatenate([hv, np.ones((len(hv), 1), np.float32)], 1)
            hv_w = (hv4 @ m.T)[:, :3].astype(np.float32)
            radius *= float(np.linalg.norm(m[:3, 2]))
            v, f, nrm = tessellate_hair(hv_w, hf, radius,
                                        sides=int(props.get("sides", 3)))
            meshes.append((v, f, nrm, None, mat_idx, radiance))
        elif stype == "heightfield":
            from PIL import Image

            fname = props.get("filename")
            if fname:
                fp = fname if os.path.isabs(fname) else os.path.join(base,
                                                                     fname)
                hm = np.asarray(Image.open(fp).convert("L"),
                                np.float32) / 255.0
            else:
                hm = np.zeros((16, 16), np.float32)
            hm = hm * float(props.get("scale", 1.0))
            hh, ww = hm.shape
            xs = np.linspace(-1, 1, ww)
            zs = np.linspace(-1, 1, hh)
            XX, ZZ = np.meshgrid(xs, zs, indexing="xy")
            v = np.stack([XX, hm, ZZ], -1).reshape(-1, 3).astype(np.float32)
            f = []
            for iy in range(hh - 1):
                for ix in range(ww - 1):
                    a = iy * ww + ix
                    f.append([a, a + 1, a + ww + 1])
                    f.append([a, a + ww + 1, a + ww])
            v2, _ = _apply_transform(m, v, None)
            meshes.append((v2, np.asarray(f, np.int32), None, None,
                           mat_idx, radiance))
        elif stype == "shapegroup":
            ctx["groups"][sh.get("id")] = [
                child for child in sh.findall("shape")
            ]
        elif stype == "instance":
            gref = sh.find("ref")
            group = ctx["groups"].get(gref.get("id") if gref is not None
                                      else None, [])
            for child in group:
                cstype = _subst(child.get("type"), defaults)
                cprops = _props(child, defaults)
                cmat = shape_material(child)
                cem = child.find("emitter")
                crad = None
                if cem is not None and cem.get("type") == "area":
                    crad = _props(cem, defaults).get(
                        "radiance", np.ones(3, np.float32))
                ctnode = child.find("transform")
                cm = _parse_transform(ctnode, defaults) \
                    if ctnode is not None else np.eye(4, dtype=np.float32)
                total = (m @ cm).astype(np.float32)
                if cstype in ("obj", "ply", "serialized"):
                    fname = cprops.get("filename")
                    fp = fname if os.path.isabs(fname) else \
                        os.path.join(base, fname)
                    v, f, n, uvx = load_mesh(fp, cprops.get("shapeIndex", 0))
                elif cstype == "rectangle":
                    v, f, n, uvx = _unit_rect()
                elif cstype == "cube":
                    v, f, n, uvx = _unit_cube()
                else:
                    warnings.warn(
                        f"instance child '{cstype}' unsupported, skipped")
                    continue
                v, n = _apply_transform(total, v, n)
                meshes.append((v, f, n, uvx, cmat, crad))
        elif stype == "sphere":
            center = props.get("center", np.zeros(3, np.float32))
            radius = float(props.get("radius", 1.0))
            center = (m[:3, :3] @ center + m[:3, 3]).astype(np.float32)
            radius = radius * float(np.linalg.norm(m[:3, 0]))
            if radiance is not None:
                # emissive sphere: tessellate so build_emitters (triangles
                # only) picks it up; analytic spheres carry no emitter rows
                v, f, n, uvx = _unit_sphere_mesh()
                v = (v * radius + center).astype(np.float32)
                meshes.append((v, f, n, uvx, mat_idx, radiance))
            else:
                spheres.append((center, radius, mat_idx, radiance))
        else:
            warnings.warn(f"unsupported shape '{stype}', skipped")

    for em in root.findall("emitter"):
        etype = em.get("type")
        props = _props(em, defaults)
        if etype == "constant":
            env_radiance = props.get("radiance", np.ones(3, np.float32))
        elif etype in ("point", "spot"):
            tnode = em.find("transform")
            pos = props.get("position", np.zeros(3, np.float32))
            axis = np.asarray([0, 0, 1], np.float32)
            if tnode is not None:
                m = _parse_transform(tnode, defaults)
                pos = m[:3, :3] @ pos + m[:3, 3]
                axis = m[:3, :3] @ axis
            inten = props.get("intensity", np.ones(3, np.float32))
            if etype == "spot":
                spots.append(
                    (pos, inten, axis, float(props.get("cutoffAngle", 20.0)))
                )
            else:
                points.append((pos, inten))
        elif etype == "collimated":
            # ref: collimated.cpp — a zero-divergence beam (position +
            # direction Dirac).  Exact: light-subpath walks start on the
            # beam; direct sampling fails by definition, so only media /
            # light-tracing strategies see it (as in the reference).
            tnode = em.find("transform")
            d = np.asarray([0, 0, 1], np.float32)
            p = np.zeros(3, np.float32)
            if tnode is not None:
                m = _parse_transform(tnode, defaults)
                d = m[:3, :3] @ d
                p = m[:3, :3] @ p + m[:3, 3]
            collimateds.append(
                (p, d, props.get("power", np.ones(3, np.float32)))
            )
        elif etype == "directional":
            tnode = em.find("transform")
            d = props.get("direction", np.asarray([0, 0, 1], np.float32))
            if tnode is not None:
                m = _parse_transform(tnode, defaults)
                d = m[:3, :3] @ np.asarray([0, 0, 1], np.float32)
            directionals.append(
                (d, props.get("irradiance", np.ones(3, np.float32)))
            )
        elif etype == "envmap":
            fname = props.get("filename")
            fpath = fname if os.path.isabs(fname) else os.path.join(base,
                                                                    fname)
            if not os.path.exists(fpath):
                warnings.warn(f"envmap '{fname}' not found; using a "
                              "constant unit environment")
                env_radiance = np.maximum(
                    env_radiance,
                    np.full(3, float(props.get("scale", 1.0)), np.float32))
                continue
            if fname.lower().endswith(".exr"):
                from drmlt_mitsuba_tpu.utils.exr import read_exr

                env_img = read_exr(fpath)[..., :3]
            else:
                from PIL import Image

                im = np.asarray(Image.open(fpath).convert("RGB"),
                                np.float32) / 255.0
                env_img = np.where(im <= 0.04045, im / 12.92,
                                   ((im + 0.055) / 1.055) ** 2.4)
            env_img = env_img * float(props.get("scale", 1.0))
        elif etype in ("sky", "sun", "sunsky"):
            # analytic daylight baked to an envmap (scene/sunsky.py)
            from drmlt_mitsuba_tpu.scene.sunsky import (
                bake_sky, sun_direction_from_time,
            )

            sd = props.get("sunDirection")
            if sd is None:
                sd = sun_direction_from_time(
                    year=int(props.get("year", 2010)),
                    month=int(props.get("month", 7)),
                    day=int(props.get("day", 10)),
                    hour=float(props.get("hour", 15.0)),
                    latitude=float(props.get("latitude", 35.6894)),
                    longitude=float(props.get("longitude", 139.6917)),
                    timezone=float(props.get("timezone", 9.0)),
                )
            scale = float(props.get("scale", 1.0))
            baked = bake_sky(
                turbidity=float(props.get("turbidity", 3.0)),
                sun_dir=sd,
                height=int(props.get("resolution", 512)) // 4,
                with_sky=etype != "sun",
                with_sun=etype != "sky",
                sky_scale=float(props.get("skyScale", 1.0)) * scale,
                sun_scale=float(props.get("sunScale", 1.0))
                * float(props.get("sunRadiusScale", 1.0)) ** 0 * scale,
                ground_albedo=float(np.mean(np.asarray(
                    props.get("albedo", 0.15), np.float32))),
            )
            env_img = baked if env_img is None else env_img + baked
        else:
            warnings.warn(f"unsupported emitter '{etype}', skipped")

    # ---- participating media (ref: medium plugins, SURVEY §2.6) ----------
    # Global (exterior) medium: first <medium> that is NOT shape-attached
    # and NOT referenced as a shape interior (those became MediumTable rows
    # above; Mitsuba scenes attach the exterior medium to the sensor or
    # reference it by id).
    medium = None
    for md in root.iter("medium"):
        if id(md) in shape_med_elems:
            continue
        if md.get("id") and md.get("id") in interior_ref_ids:
            continue
        mtype = _subst(md.get("type"), defaults)
        props = _props(md, defaults)
        g = 0.0
        phase_kind = 0
        phase_kw = {}
        ph = md.find("phase")
        if ph is not None:
            from drmlt_mitsuba_tpu.render.medium import (
                PHASE_KKAY, PHASE_MICROFLAKE, PHASE_MIXTURE, PHASE_RAYLEIGH,
            )

            ptype = _subst(ph.get("type"), defaults)
            pprops = _props(ph, defaults)
            if ptype == "hg":
                g = float(pprops.get("g", 0.0))
            elif ptype == "rayleigh":
                phase_kind = PHASE_RAYLEIGH
            elif ptype == "kkay":
                phase_kind = PHASE_KKAY
                phase_kw["kkay"] = (float(pprops.get("ks", 0.4)),
                                    float(pprops.get("kd", 0.2)),
                                    float(pprops.get("exponent", 4.0)))
                phase_kw["fiber"] = np.asarray(
                    pprops.get("orientation", (0.0, 0.0, 1.0)), np.float32)
            elif ptype == "microflake":
                phase_kind = PHASE_MICROFLAKE
                phase_kw["stddev"] = float(pprops.get("stddev", 0.3))
                phase_kw["fiber"] = np.asarray(
                    pprops.get("orientation", (0.0, 0.0, 1.0)), np.float32)
            elif ptype == "mixturephase":
                phase_kind = PHASE_MIXTURE
                wstr = str(pprops.get("weights", ""))
                ws = [float(w) for w in wstr.replace(",", " ").split()]
                comps = []
                for i, sub in enumerate(ph.findall("phase")):
                    stype = _subst(sub.get("type"), defaults)
                    sprops = _props(sub, defaults)
                    w_i = ws[i] if i < len(ws) else 1.0
                    if stype == "rayleigh":
                        comps.append(("rayleigh", 0.0, w_i))
                    elif stype == "hg":
                        comps.append(("hg", float(sprops.get("g", 0.0)), w_i))
                    else:
                        if stype != "isotropic":
                            warnings.warn(
                                f"mixturephase component '{stype}' "
                                "approximated as isotropic")
                        comps.append(("isotropic", 0.0, w_i))
                phase_kw["mixture"] = comps
            elif ptype != "isotropic":
                warnings.warn(f"phase '{ptype}' approximated as isotropic")
        sigma_t, albedo = _medium_coeffs(props)
        if mtype == "heterogeneous":
            from drmlt_mitsuba_tpu.render.medium import make_hetero_medium

            density, w2g = None, None
            albedo_grid = None
            orient_grid = None
            for vol in md.findall("volume"):
                vname = _subst(vol.get("name"), defaults)
                vtype = _subst(vol.get("type"), defaults)
                vprops = _props(vol, defaults)
                if vname == "albedo":
                    if vtype == "gridvolume":
                        fname = vprops["filename"]
                        fpath = fname if os.path.isabs(fname) else \
                            os.path.join(base, fname)
                        albedo_grid, _, _ = read_vol_rgb(fpath)
                    elif vtype == "constvolume":
                        albedo = np.broadcast_to(np.asarray(
                            vprops.get("value", 1.0), np.float32), (3,))
                    else:
                        warnings.warn(
                            f"unsupported albedo volume '{vtype}'")
                    continue
                if vname == "orientation":
                    if vtype == "gridvolume":
                        fname = vprops["filename"]
                        fpath = fname if os.path.isabs(fname) else \
                            os.path.join(base, fname)
                        orient_grid, _, _ = read_vol_rgb(fpath)
                    elif vtype == "constvolume":
                        phase_kw["fiber"] = np.asarray(
                            vprops.get("value", (0.0, 0.0, 1.0)),
                            np.float32)
                    else:
                        warnings.warn(
                            f"unsupported orientation volume '{vtype}'")
                    continue
                if vname != "density":
                    continue
                if vtype == "gridvolume":
                    fname = vprops["filename"]
                    fpath = fname if os.path.isabs(fname) else os.path.join(
                        base, fname)
                    density, bb_min, bb_max = read_vol(fpath)
                elif vtype == "constvolume":
                    density = np.full((2, 2, 2),
                                      float(vprops.get("value", 1.0)),
                                      np.float32)
                    bb_min = np.full(3, -1e4, np.float32)
                    bb_max = np.full(3, 1e4, np.float32)
                else:
                    warnings.warn(f"unsupported volume '{vtype}'")
                    continue
                ext = np.maximum(bb_max - bb_min, 1e-20)
                w2g = np.eye(4, dtype=np.float32)
                w2g[:3, :3] = np.diag(1.0 / ext)
                w2g[:3, 3] = -bb_min / ext
                tnode = vol.find("transform")
                if tnode is not None:
                    to_w = _parse_transform(tnode, defaults)
                    w2g = w2g @ np.linalg.inv(to_w).astype(np.float32)
            if density is None:
                warnings.warn("heterogeneous medium without density volume, "
                              "skipped")
                continue
            medium = make_hetero_medium(density, w2g, sigma_t, albedo, g,
                                        albedo_grid=albedo_grid,
                                        orient_grid=orient_grid,
                                        phase_kind=phase_kind, **phase_kw)
        else:
            from drmlt_mitsuba_tpu.render.medium import make_medium

            if mtype != "homogeneous":
                warnings.warn(
                    f"medium '{mtype}' approximated as homogeneous")
            medium = make_medium(sigma_t, albedo, g,
                                 phase_kind=phase_kind, **phase_kw)
        break

    sensor = root.find("sensor")
    if sensor is None:
        # reference test scenes attach meter sensors to shapes
        # (e.g. data/tests/test_bidir_0.xml); position such a sensor by
        # its transform rather than integrating over the carrier shape
        for sh_el in root.iter("shape"):
            nested = sh_el.find("sensor")
            if nested is not None:
                warnings.warn(
                    "shape-attached sensor: positioned by its transform "
                    "(not integrated over the carrier shape)")
                sensor = nested
                break
    sensor_kind = 0
    fov = 39.3077
    aspect = None
    to_world = np.eye(4, dtype=np.float32)
    aperture = 0.0
    focus = 1.0
    if sensor is not None:
        stype_s = _subst(sensor.get("type"), defaults)
        kc = None
        sensor_kind = {"perspective": 0, "thinlens": 0, "orthographic": 1,
                       "spherical": 2, "radiancemeter": 3, "telecentric": 4,
                       "fluencemeter": 5, "irradiancemeter": 6}.get(stype_s, 0)
        sprops = _props(sensor, defaults)
        if stype_s == "perspective_rdist":
            # ref: src/sensors/perspective_rdist.cpp — "kc" is a comma
            # list of the two radial distortion coefficients
            kcs = str(sprops.get("kc", "0, 0")).replace(",", " ").split()
            kc = [float(v) for v in (kcs + ["0", "0"])[:2]]
        fov = float(sprops.get("fov", fov))
        fov_axis = sprops.get("fovAxis", "x")
        aperture = float(sprops.get("apertureRadius", 0.0))
        focus = float(sprops.get("focusDistance", 1.0))
        tnode = sensor.find("transform")
        if tnode is not None:
            to_world = _parse_transform(tnode, defaults)
        film = sensor.find("film")
        if film is not None:
            fprops = _props(film, defaults)
            settings.width = int(fprops.get("width", 256))
            settings.height = int(fprops.get("height", 256))
            rf = film.find("rfilter")
            if rf is not None:
                settings.filter_name = {
                    "box": "box", "tent": "tent", "gaussian": "gaussian",
                    "mitchell": "mitchell", "catmullrom": "catmullrom",
                    "lanczos": "lanczos", "lanczossinc": "lanczos",
                }.get(rf.get("type"), "gaussian")
        samp = sensor.find("sampler")
        if samp is not None:
            settings.sampler = samp.get("type", "independent")
            settings.spp = int(_props(samp, defaults).get("sampleCount", 32))
        if fov_axis == "y":
            aspect0 = settings.width / settings.height
            fov = np.rad2deg(
                2 * np.arctan(np.tan(np.deg2rad(fov) / 2) * aspect0)
            )

    integrator = root.find("integrator")
    if integrator is not None:
        props_i = _props(integrator, defaults)
        # a property named "type" (the drmlt variant selector) must not
        # shadow the plugin name
        if "type" in props_i:
            props_i["variant"] = props_i.pop("type")
        icfg = dict(type=_subst(integrator.get("type", "path"), defaults))
        icfg.update(props_i)
        settings.integrator = icfg

    # ---- assemble SoA scene ----------------------------------------------
    all_v, all_f, all_n, all_uv, all_mat, all_emid = [], [], [], [], [], []
    voff = 0
    emitter_rads = []
    for v, f, n, uv, mat_idx, radiance in meshes:
        all_v.append(v)
        all_f.append(np.asarray(f) + voff)
        all_n.append(n if n is not None else None)
        all_uv.append(uv)
        nf = len(f)
        all_mat.append(np.full(nf, mat_idx, np.int32))
        if radiance is not None:
            emitter_rads.append(radiance)
            all_emid.append(np.full(nf, len(emitter_rads) - 1, np.int32))
        else:
            all_emid.append(np.full(nf, -1, np.int32))
        voff += len(v)

    if not all_v:
        all_v = [np.zeros((3, 3), np.float32)]
        all_f = [np.asarray([[0, 1, 2]], np.int32)]
        all_n = [None]
        all_uv = [None]
        all_mat = [np.zeros(1, np.int32)]
        all_emid = [np.full(1, -1, np.int32)]
        if not ctx["materials"]:
            ctx["materials"].append(dict(kind=st.BSDF_DIFFUSE))

    verts = np.concatenate(all_v)
    faces = np.concatenate(all_f)
    have_normals = all(n is not None for n in all_n if n is not None) and any(
        n is not None for n in all_n
    )
    normals = None
    if any(n is not None for n in all_n):
        normals = np.concatenate([
            n if n is not None else np.zeros_like(v)
            for (v, n) in zip(all_v, all_n)
        ])
        # zero normals fall back to geometric in build_triangles consumers
    uvs = None
    if any(uv is not None for uv in all_uv):
        uvs = np.concatenate([
            uv if uv is not None else np.zeros((len(v), 2), np.float32)
            for (v, uv) in zip(all_v, all_uv)
        ])
    vcolors_tri = None
    if ctx.get("want_vcolors") and mesh_vcolors:
        vc = np.concatenate([
            mesh_vcolors.get(i, np.full((len(v), 3), 0.5, np.float32))
            for i, (v, *_rest) in enumerate(meshes)
        ]) if meshes else np.full((len(verts), 3), 0.5, np.float32)
        vcolors_tri = np.stack(
            [vc[faces[:, 0]], vc[faces[:, 1]], vc[faces[:, 2]]], axis=1
        ).astype(np.float32)   # (T, 3 corners, 3)

    tris = st.build_triangles(
        verts, faces, np.concatenate(all_mat), np.concatenate(all_emid),
        normals=None, uvs=uvs,
    )
    if normals is not None:
        # replace zero shading normals by geometric ones per vertex triple
        import jax.numpy as jnp

        def pick(nv, default):
            bad = np.abs(nv).sum(-1) < 1e-8
            out = nv.copy()
            out[bad] = default[bad]
            return jnp.asarray(out)

        gn = np.cross(np.asarray(tris.e1), np.asarray(tris.e2))
        gn /= np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
        f0, f1, f2 = faces[:, 0], faces[:, 1], faces[:, 2]
        tris = tris.replace(
            n0=pick(normals[f0], gn), n1=pick(normals[f1], gn),
            n2=pick(normals[f2], gn),
        )

    # ---- motion deltas (deformable under an open shutter) ----------------
    motion = None
    if mesh_motion:
        verts_c = np.concatenate([
            mesh_motion[i][0] if i in mesh_motion else v
            for i, (v, *_rest) in enumerate(meshes)
        ])
        normals_c = None
        if normals is not None:
            normals_c = np.concatenate([
                (mesh_motion[i][1] if i in mesh_motion
                 and mesh_motion[i][1] is not None else
                 (n if n is not None else np.zeros_like(v)))
                for i, (v, f_, n, *_rest) in enumerate(meshes)
            ])
        tris_c = st.build_triangles(
            verts_c, faces, np.concatenate(all_mat),
            np.concatenate(all_emid), normals=None, uvs=uvs,
        )
        if normals_c is not None:
            gn_c = np.cross(np.asarray(tris_c.e1), np.asarray(tris_c.e2))
            gn_c /= np.maximum(
                np.linalg.norm(gn_c, axis=-1, keepdims=True), 1e-20)
            f0, f1, f2 = faces[:, 0], faces[:, 1], faces[:, 2]
            tris_c = tris_c.replace(
                n0=pick(normals_c[f0], gn_c), n1=pick(normals_c[f1], gn_c),
                n2=pick(normals_c[f2], gn_c),
            )
        motion = st.build_motion(tris, tris_c)
        settings.motion = True

    if emitter_rads:
        rad_table = np.stack(emitter_rads)
    else:
        rad_table = np.zeros((1, 3), np.float32)
    emitters = st.build_emitters(
        tris, rad_table, env_radiance=env_radiance,
        point_pos=np.stack([p for p, _ in points]) if points else None,
        point_intensity=np.stack([i for _, i in points]) if points else None,
        directional=directionals or None,
        spots=spots or None,
        collimated=collimateds or None,
        env_image=env_img,
    )
    area_rows = np.nonzero(np.asarray(emitters.kind) == 0)[0]
    row_of_tri = np.full(len(faces), -1, np.int32)
    row_of_tri[np.asarray(emitters.tri_idx)[area_rows]] = area_rows.astype(
        np.int32
    )
    # only rows with actual emitters
    import jax.numpy as jnp
    emid = np.asarray(tris.emitter_id)
    row_of_tri[emid < 0] = -1
    tris = tris.replace(emitter_id=jnp.asarray(row_of_tri))

    if spheres:
        sph = st.SphereSoA(
            center=jnp.asarray(np.stack([c for c, *_ in spheres])),
            radius=jnp.asarray(np.asarray([r for _, r, *_ in spheres], np.float32)),
            mat_id=jnp.asarray(np.asarray([m for _, _, m, _ in spheres], np.int32)),
            emitter_id=jnp.full((len(spheres),), -1, jnp.int32),
            valid=jnp.ones((len(spheres),), bool),
        )
    else:
        sph = st.empty_spheres()

    aspect = settings.width / settings.height
    fov_arg = fov if sensor_kind == 0 else 1.0
    camera = st.make_camera(to_world, fov_arg, aspect, aperture, focus,
                            kind=sensor_kind,
                            kc=kc if sensor is not None else None)
    textures = None
    if ctx["textures"]:
        textures = st.TextureAtlas(
            data=jnp.asarray(np.stack(ctx["textures"]))
        )
    scene = st.Scene(
        tris=tris, spheres=sph,
        materials=st.make_material_table(ctx["materials"]),
        emitters=emitters, camera=camera, textures=textures,
        medium=medium,
        media=st.make_medium_table(ctx["media"]) if ctx["media"] else None,
        irawan=ctx.get("irawan"),
        vcolors=None if vcolors_tri is None else jnp.asarray(vcolors_tri),
        motion=motion,
    )
    if sss_requests:
        settings.subsurface = sss_requests
    return scene, settings
