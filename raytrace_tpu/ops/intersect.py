"""Batched ray-scene intersection (closest hit + shadow queries).

TPU-native re-design of the reference's geometry kernel (SURVEY.md §2
#2-5): ``Sphere::intersect`` (shapes.rs:43-89), ``Plane::intersect``
(shapes.rs:93-112) and the linear-scan ``Scene::intersect``
(scene.rs:244-250).  The reference tests one ray against one boxed shape
at a time through a vtable; here a structure-of-arrays batch of N rays is
tested against all O objects at once as pure VPU arithmetic, and the
closest hit is a masked argmin over the object axis.

Semantics preserved exactly:

* sphere: strict ``discriminant > 0``; near root ``(-b - sqrt(D)) / 2a``
  if ``t > 0`` else far root; unit outward normal ``(p - c)/|p - c|``
  (shapes.rs:60-87);
* plane: ``t = n.(p0 - o) / n.d``, reject ``t <= 0``; the returned normal
  is the *stored* plane normal, un-normalized and un-flipped
  (shapes.rs:102-110);
* closest hit: first minimum in scene-file object order (``min_by_key``
  keeps the earliest minimum, scene.rs:248; ``jnp.argmin`` does the same);
* shadow query: blocked iff the closest hit satisfies ``t^2 < range^2``
  (or any hit at all for range-free directional lights, raytrace.rs:43-50)
  — since ``min(t)^2 < r^2  <=>  any(t^2 < r^2)`` for positive t, the
  shadow query needs no argmin at all.

Documented divergences (guarded edge cases, SURVEY.md §2 #4):

* a ray exactly parallel to a plane gives ``t = ±inf`` (or NaN when also
  contained in the plane) in the reference; ±inf "hits" are accepted
  there and a NaN ``t`` would win the min (Option<FloatNotNan> orders
  ``None`` first).  Both are measure-zero float accidents; here they are
  rejected (``denominator == 0`` => miss) to keep gradients finite.

Differentiability: the winning object *index* is integral (no gradient,
= subgradient semantics at visibility silhouettes); ``t`` and the normal
are recomputed from the winning object's parameters, so gradients flow
into sphere centers/radii and plane points/normals.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from raytrace_tpu.scene.schema import SHAPE_PLANE, SHAPE_SPHERE, SceneData, SceneSpec

_EPS_GUARD = 0.0  # reference has no epsilon anywhere; keep exact


@dataclasses.dataclass
class Hit:
    """SoA hit record: the TPU-native ``IntersectionResult`` + object id
    (shapes.rs:28-33, scene.rs:215-221)."""

    t: jnp.ndarray        # (N,) hit distance; +inf on miss
    normal: jnp.ndarray   # (N, 3) geometric normal (reference semantics)
    obj: jnp.ndarray      # (N,) int32 object index (scene-file order)
    hit: jnp.ndarray      # (N,) bool


jax.tree_util.register_dataclass(Hit, data_fields=["t", "normal", "obj", "hit"],
                                 meta_fields=[])


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _sphere_t(center, radius, ro, rd):
    """All-pairs sphere intersection (shapes.rs:51-88).

    center (S,3), radius (S,), ro/rd (N,3) -> t (N,S), valid (N,S).
    """
    oc = ro[:, None, :] - center[None, :, :]            # (N,S,3)
    a = _dot(rd, rd)[:, None]                           # (N,1)
    b = 2.0 * jnp.einsum("nd,nsd->ns", rd, oc)
    c = jnp.sum(oc * oc, axis=-1) - (radius * radius)[None, :]
    disc = b * b - 4.0 * a * c
    has = disc > 0.0
    sq = jnp.sqrt(jnp.where(has, disc, 1.0))            # NaN-safe for grads
    inv2a = 0.5 / a
    t1 = (-b - sq) * inv2a
    t2 = (-b + sq) * inv2a
    t = jnp.where(t1 > 0.0, t1, t2)
    valid = has & (t > 0.0)
    return t, valid


def _plane_t(point, normal, ro, rd):
    """All-pairs plane intersection (shapes.rs:101-111).

    point/normal (P,3), ro/rd (N,3) -> t (N,P), valid (N,P).
    """
    denom = rd @ normal.T                               # (N,P)
    numer = jnp.einsum("npd,pd->np", point[None, :, :] - ro[:, None, :], normal)
    ok = denom != 0.0
    t = numer / jnp.where(ok, denom, 1.0)
    valid = ok & (t > 0.0)
    return t, valid


def _partition(spec: SceneSpec):
    """Static object-type partition, preserving scene-file order."""
    st = np.asarray(spec.shape_type)
    sph = np.nonzero(st == SHAPE_SPHERE)[0]
    pln = np.nonzero(st == SHAPE_PLANE)[0]
    order = np.concatenate([sph, pln]).astype(np.int32)
    inv = np.zeros(len(st), np.int32)
    inv[order] = np.arange(len(order), dtype=np.int32)
    # padded lanes (shape_type < 0) are absent from order; route them to
    # column 0 and mask them out via `live`
    live = st >= 0
    inv[~live] = 0
    return sph, pln, inv, live


def _all_object_t(data: SceneData, spec: SceneSpec, ro, rd):
    """t-matrix (N, O) + validity over all objects in file order."""
    sph, pln, inv, live = _partition(spec)
    cols_t, cols_v = [], []
    if len(sph):
        ts, vs = _sphere_t(data.prim_p[sph], data.prim_q[sph, 0], ro, rd)
        cols_t.append(ts)
        cols_v.append(vs)
    if len(pln):
        tp, vp = _plane_t(data.prim_p[pln], data.prim_q[pln], ro, rd)
        cols_t.append(tp)
        cols_v.append(vp)
    if not cols_t:  # empty scene: one dummy always-miss column
        n = ro.shape[0]
        return (jnp.full((n, 1), jnp.inf, ro.dtype),
                jnp.zeros((n, 1), bool))
    t = jnp.concatenate(cols_t, axis=1)[:, inv]
    v = jnp.concatenate(cols_v, axis=1)[:, inv]
    v = v & jnp.asarray(live)[None, :]
    return t, v


def intersect(data: SceneData, spec: SceneSpec, ro, rd) -> Hit:
    """Closest-hit query for a ray batch (scene.rs:247-249).

    ro, rd: (N, 3).  Returns :class:`Hit` with file-order-first-min
    tie-breaking and reference normal semantics.
    """
    t_all, v_all = _all_object_t(data, spec, ro, rd)
    t_masked = jnp.where(v_all, t_all, jnp.inf)
    obj = jnp.argmin(t_masked, axis=1).astype(jnp.int32)
    t = jnp.min(t_masked, axis=1)
    hit = jnp.any(v_all, axis=1)

    # recompute the winning normal from object parameters (differentiable)
    p = data.prim_p[obj]                                # (N,3)
    q = data.prim_q[obj]
    is_sphere = jnp.asarray(np.asarray(spec.shape_type) == SHAPE_SPHERE)[obj]
    t_safe = jnp.where(hit, t, 0.0)
    pt = ro + rd * t_safe[:, None]
    rel = pt - p
    nrm2 = jnp.sum(rel * rel, axis=-1, keepdims=True)
    sph_n = rel * jax.lax.rsqrt(jnp.where(nrm2 > 0, nrm2, 1.0))
    normal = jnp.where(is_sphere[:, None], sph_n, q)
    return Hit(t=t, normal=normal, obj=obj, hit=hit)


def occluded(data: SceneData, spec: SceneSpec, ro, rd,
             sq_range, has_range: bool) -> jnp.ndarray:
    """Shadow query (raytrace.rs:43-50): is the closest hit inside range?

    ``has_range`` is static (directional lights have none, scene.rs:135-139).
    Equivalent to the reference's closest-hit test but argmin-free.
    """
    t_all, v_all = _all_object_t(data, spec, ro, rd)
    if has_range:
        v_all = v_all & (t_all * t_all < sq_range[:, None])
    return jnp.any(v_all, axis=1)
