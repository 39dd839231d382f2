"""Scalar recursive reference integrator (test oracle).

A direct, per-ray recursive NumPy implementation of the reference's
shading semantics (raytrace.rs:30-276), using the *same* counter-based
RNG streams as the wavefront integrator.  The wavefront render must agree
with this oracle to float tolerance on every pixel — that validates the
recursion→level-loop restructuring, the masked material polymorphism and
the child-slot bookkeeping, independent of Monte-Carlo statistics.

This file intentionally mirrors the *reference semantics*, not the
wavefront code: it is the second entry in a double-entry bookkeeping
scheme, written from raytrace.rs directly.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from raytrace_tpu.ops import rng
from raytrace_tpu.scene.schema import (
    BG_SKYBOX, CAM_DEPTH_OF_FIELD, LIGHT_AREA, LIGHT_DIRECTIONAL,
    LIGHT_POINT, MAT_FRESNEL, MAT_INDIRECT_PHONG, MAT_PHONG,
    MAT_TRANSPARENT, SHAPE_PLANE, SHAPE_SPHERE)


def _draw(k1, k2, purpose):
    return float(rng.draw(jnp.uint32(k1), jnp.uint32(k2), purpose,
                          jnp.float64))


def _derive(k1, k2, slot):
    a, b = rng.derive(jnp.uint32(k1), jnp.uint32(k2), slot)
    return int(a), int(b)


def _intersect_one(data, spec, i, ro, rd):
    """Sphere/plane hit (shapes.rs:51-88, 101-111). Returns (t, n) or None."""
    p = np.asarray(data.prim_p[i], np.float64)
    q = np.asarray(data.prim_q[i], np.float64)
    if spec.shape_type[i] == SHAPE_SPHERE:
        oc = ro - p
        a = rd @ rd
        b = 2.0 * (rd @ oc)
        c = oc @ oc - q[0] * q[0]
        disc = b * b - 4 * a * c
        if disc <= 0:
            return None
        sq = math.sqrt(disc)
        t = (-b - sq) / (2 * a)
        if t <= 0:
            t = (-b + sq) / (2 * a)
            if t <= 0:
                return None
        n = ro + rd * t - p
        return t, n / np.linalg.norm(n)
    assert spec.shape_type[i] == SHAPE_PLANE
    denom = q @ rd
    if denom == 0:
        return None
    t = (q @ (p - ro)) / denom
    if t <= 0:
        return None
    return t, q


def _closest(data, spec, ro, rd):
    best = None
    for i in range(spec.n_objects):
        if spec.shape_type[i] < 0:
            continue
        r = _intersect_one(data, spec, i, ro, rd)
        if r is not None and (best is None or r[0] < best[1]):
            best = (i, r[0], r[1])
    return best


def _occluded(data, spec, ro, rd, sqr):
    """Shadow test (raytrace.rs:43-50): closest hit inside range blocks."""
    best = _closest(data, spec, ro, rd)
    if best is None:
        return False
    if sqr is None:
        return True
    return best[1] * best[1] < sqr


def _light_dir(data, spec, li, pt, k1, k2):
    lt = spec.light_type[li]
    if lt == LIGHT_DIRECTIONAL:
        return -np.asarray(data.light_e1[li], np.float64), None
    if lt == LIGHT_AREA:
        u = _draw(k1, k2, rng.PURPOSE_LIGHT_U + 2 * li)
        v = _draw(k1, k2, rng.PURPOSE_LIGHT_V + 2 * li)
        loc = (np.asarray(data.light_p[li], np.float64)
               + np.asarray(data.light_e1[li], np.float64) * u
               + np.asarray(data.light_e2[li], np.float64) * v)
    else:
        assert lt == LIGHT_POINT
        loc = np.asarray(data.light_p[li], np.float64)
    rel = loc - pt
    sq = rel @ rel
    return rel / math.sqrt(sq), sq


def _background(data, spec, rd):
    if spec.bg_type != BG_SKYBOX:
        return np.asarray(data.bg_color, np.float64).copy()
    d = rd
    ax, ay, az = abs(d[0]), abs(d[1]), abs(d[2])
    if ax > az and ax > ay:
        face = 0 if d[0] > 0 else 1
        u, v = -d[2] / d[0], -d[1] / ax
    elif ay > ax and ay > az:
        face = 2 if d[1] > 0 else 3
        u, v = d[0] / ay, d[2] / d[1]
    elif az > ax and az > ay:
        face = 4 if d[2] > 0 else 5
        u, v = d[0] / d[2], -d[1] / az
    else:
        return np.zeros(3)
    u, v = u * 0.5 + 0.5, v * 0.5 + 0.5
    h, w = spec.face_sizes[face]
    tex = np.asarray(data.bg_cube[face, :h, :w], np.float64)
    x = min(max(u, 0.0), 1.0) * (w - 1)
    y = min(max(v, 0.0), 1.0) * (h - 1)
    x0, y0 = int(x), int(y)
    x1, y1 = min(x0 + 1, w - 1), min(y0 + 1, h - 1)
    xx, yy = x - x0, y - y0
    cx0 = tex[y0, x0] * (1 - yy) + tex[y1, x0] * yy
    cx1 = tex[y0, x1] * (1 - yy) + tex[y1, x1] * yy
    return cx0 * (1 - xx) + cx1 * xx


def _clamp0(x):
    return max(x, 0.0)


def _clamp1(x):
    return min(x, 1.0)


def ray_color(data, spec, ro, rd, sig, depth, k1, k2):
    """raytrace.rs:261-267 + the four Material::color impls."""
    best = _closest(data, spec, ro, rd)
    if best is None:
        return _background(data, spec, rd)
    obj, t, n_raw = best
    mt = spec.mat_type[obj]
    diffuse = np.asarray(data.mat_diffuse[obj], np.float64)
    specular = np.asarray(data.mat_specular[obj], np.float64)
    exponent = float(data.mat_exponent[obj])
    ambient = np.asarray(data.mat_ambient[obj], np.float64)
    ior = float(data.mat_ior[obj])
    samples = int(float(data.mat_samples[obj]))
    ms = spec.min_significance

    res = ambient.copy() if mt != MAT_TRANSPARENT else np.zeros(3)
    if depth > spec.max_depth:
        return res
    pt = ro + rd * t
    nd = n_raw @ rd
    normal = -n_raw if nd > 0 else n_raw

    # fresnel for Fresnel / Transparent materials
    fres = 1.0
    refract_dir = None
    if mt == MAT_FRESNEL:
        r0 = ((ior - 1) / (ior + 1)) ** 2
        omc = 1.0 - abs(nd)
        fres = _clamp1(r0 + (1 - r0) * omc ** 5)
    elif mt == MAT_TRANSPARENT:
        ndv = normal @ rd
        n_ratio = ior if nd > 0 else 1.0 / ior
        sin2 = n_ratio * n_ratio * (1.0 - nd * nd)
        if sin2 < 1.0:
            cos = math.sqrt(1.0 - sin2)
            refract_dir = rd * n_ratio - normal * (n_ratio * abs(nd) + cos)
        r0 = ((ior - 1) / (ior + 1)) ** 2
        if nd > 0:
            omc = 1.0 - normal @ refract_dir if refract_dir is not None else 0.0
        else:
            omc = 1.0 - abs(nd)
        fres = (_clamp1(r0 + (1 - r0) * omc ** 5)
                if refract_dir is not None else 1.0)

    diffuse_gate = diffuse.sum() * sig > ms and mt != MAT_TRANSPARENT
    spec_gate = specular.sum() * fres * sig > ms

    # direct lighting
    if diffuse_gate or spec_gate:
        for li in range(spec.n_lights):
            ldir, sqr = _light_dir(data, spec, li, pt, k1, k2)
            if _occluded(data, spec, pt + ldir * 1e-5, ldir, sqr):
                continue
            lcol = np.asarray(data.light_color[li], np.float64)
            if diffuse_gate:
                res = res + diffuse * lcol * (
                    _clamp0(ldir @ normal) / math.pi)
            if spec_gate:
                hv = ldir - rd
                hv = hv / np.linalg.norm(hv)
                res = res + specular * lcol * fres * (
                    _clamp0(normal @ hv) ** exponent)

    # child slots (same static numbering as the wavefront integrator)
    slot = 0
    if spec.has_reflect:
        if spec_gate and mt != MAT_INDIRECT_PHONG:
            rdir = rd - normal * (2.0 * (rd @ normal))
            ck1, ck2 = _derive(k1, k2, slot)
            child = ray_color(data, spec, pt + rdir * 1e-5, rdir,
                              sig * specular.sum() * fres, depth + 1,
                              ck1, ck2)
            res = res + specular * fres * child
        slot += 1
    if spec.has_refract:
        if mt == MAT_TRANSPARENT and fres < 1.0 and refract_dir is not None:
            omf = _clamp1(1.0 - fres)
            rdir = refract_dir / np.linalg.norm(refract_dir)
            ck1, ck2 = _derive(k1, k2, slot)
            child = ray_color(data, spec, pt + rdir * 1e-5, rdir,
                              omf * sig, depth + 1, ck1, ck2)
            res = res + omf * child
        slot += 1
    for k in range(spec.n_indirect):
        if (mt == MAT_INDIRECT_PHONG and (diffuse_gate or spec_gate)
                and k < samples and diffuse_gate):
            r1 = _draw(k1, k2, rng.PURPOSE_INDIRECT_R1 + 2 * k) * 2.0 - 1.0
            phi = _draw(k1, k2, rng.PURPOSE_INDIRECT_R2 + 2 * k) * 2 * math.pi
            s = 1.0 - r1 * r1
            d = np.array([s * math.cos(phi), r1, s * math.sin(phi)])
            if d @ normal < 0:
                d = -d
            ck1, ck2 = _derive(k1, k2, slot)
            child = ray_color(data, spec, pt + d * 1e-5, d, sig, depth + 1,
                              ck1, ck2)
            fac = samples * 0.5
            res = res + diffuse * child * ((normal @ d) / fac)
        slot += 1
    return res


def render_pixel(data, spec, px, py, aa_ids, seed):
    """main.rs:45-55 + raytrace.rs:270-276 for one pixel: mean radiance
    over the given AA sample ids and the camera's lens samples."""
    halfw, halfh = spec.width / 2.0, spec.height / 2.0
    scale = max(1.0 / halfw, 1.0 / halfh)
    cam_mat = np.asarray(data.cam_matrix, np.float64)
    cam_pos = np.asarray(data.cam_position, np.float64)
    total = np.zeros(3)
    for aa in aa_ids:
        jk1, jk2 = rng.make_keys(seed, jnp.uint32(px), jnp.uint32(py),
                                 jnp.uint32(aa))
        u = _draw(int(jk1), int(jk2), rng.PURPOSE_AA_X)
        v = _draw(int(jk1), int(jk2), rng.PURPOSE_AA_Y)
        pos_x = ((px + u) - halfw) * scale
        pos_y = ((py + v) - halfh) * scale
        for cam in range(spec.cam_samples):
            k1, k2 = rng.make_keys(seed, jnp.uint32(px), jnp.uint32(py),
                                   jnp.uint32(aa), jnp.uint32(cam))
            k1, k2 = int(k1), int(k2)
            d = cam_mat @ np.array([pos_x, pos_y, 1.0])
            if spec.cam_type == CAM_DEPTH_OF_FIELD:
                ip = cam_pos + d
                fp = cam_pos + d * (float(data.cam_focus)
                                    / float(data.cam_im_dist))
                theta = _draw(k1, k2, rng.PURPOSE_LENS_THETA) * 2 * math.pi
                r = math.sqrt(_draw(k1, k2, rng.PURPOSE_LENS_R)) * float(
                    data.cam_aperture)
                orig = ip + cam_mat @ np.array(
                    [math.cos(theta) * r, math.sin(theta) * r, 0.0])
                rd = fp - orig
                rd = rd / np.linalg.norm(rd)
                ro = orig
            else:
                ro = cam_pos
                rd = d / np.linalg.norm(d)
            total += ray_color(data, spec, ro, rd, 1.0, 0, k1, k2)
    return total / (len(aa_ids) * spec.cam_samples)
