"""Primitive-sharded ring intersection (the TP / ring-attention analog).

For scenes too large to keep resident per-device during intersection,
the object set is sharded over the mesh's data axis and *circulated*
around the ICI ring with ``lax.ppermute`` (SURVEY.md §5.7): at every one
of the k steps each device intersects its ray shard against the object
shard currently resident, folds the result into a running
``min(t)`` — an associative reduction, so the ring form is exact — and
forwards the shard to its neighbor.  After k steps every ray has seen
every object while only 1/k of the geometry was ever resident per
device.

There is no softmax-like coupling across the object axis (unlike
attention), so no blockwise/Ulysses variant is needed — the ring is the
whole story.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P

from raytrace_tpu.ops.vec import V3, dot
from raytrace_tpu.scene.schema import SceneData, SceneSpec
from raytrace_tpu.ops.intersect import _typed_geometry


def _local_min(rows, ids, ro, rd, a, t_best, obj, hit, kind: str):
    """Fold one resident object shard into the running min.

    rows: (C, 4) spheres or (C, 6) planes (padded rows have id -1);
    ids: (C,) int32 global object indices.
    """
    c = rows.shape[0]
    for j in range(c):
        row = rows[j]
        if kind == "sphere":
            oc = ro - V3(row[0], row[1], row[2])
            b = 2.0 * dot(rd, oc)
            cc = dot(oc, oc) - row[3] * row[3]
            disc = b * b - 4.0 * a * cc
            has = disc > 0.0
            sq = jnp.sqrt(jnp.where(has, disc, 1.0))
            inv2a = 0.5 / a
            t1 = (-b - sq) * inv2a
            t2 = (-b + sq) * inv2a
            t = jnp.where(t1 > 0.0, t1, t2)
            v = has & (t > 0.0)
        else:
            nrm = V3(row[3], row[4], row[5])
            p_dot_n = row[0] * row[3] + row[1] * row[4] + row[2] * row[5]
            denom = dot(rd, nrm)
            numer = p_dot_n - dot(ro, nrm)
            ok = denom != 0.0
            t = numer / jnp.where(ok, denom, 1.0)
            v = ok & (t > 0.0)
        v = v & (ids[j] >= 0)
        t = jnp.where(v, t, jnp.inf)
        # first-minimum-in-file-order tie-break across shards: on an
        # exact t tie, the lower global object id wins (scene.rs:248)
        better = (t < t_best) | ((t == t_best) & v & (ids[j] < obj))
        t_best = jnp.where(better, t, t_best)
        obj = jnp.where(better, ids[j], obj)
        hit = hit | v
    return t_best, obj, hit


def _pad_shard(arr, ids: np.ndarray, k: int):
    """Pad the object axis to a multiple of k (pad ids = -1); traceable."""
    o = arr.shape[0]
    pad = (-o) % k
    if pad:
        arr = jnp.concatenate([arr, jnp.zeros((pad,) + arr.shape[1:],
                                              arr.dtype)])
        ids = np.concatenate([ids, np.full(pad, -1, np.int64)])
    return arr, ids.astype(np.int32)


def shard_geometry(data: SceneData, spec: SceneSpec, k: int):
    """Split typed geometry into k object shards (traceable: the index
    maps are static from SceneSpec, the values stay jnp).

    Returns (sph_rows (k, S/k, 4), sph_ids (k, S/k), pln_rows, pln_ids).
    """
    sph, pln = _typed_geometry(data, spec)
    dt = data.prim_p.dtype
    sph_rows = (jnp.concatenate(
        [data.prim_p[sph], data.prim_q[sph, 0:1]], axis=1)
        if len(sph) else jnp.zeros((0, 4), dt))
    pln_rows = (jnp.concatenate(
        [data.prim_p[pln], data.prim_q[pln]], axis=1)
        if len(pln) else jnp.zeros((0, 6), dt))
    sph_rows, sph_ids = _pad_shard(sph_rows, sph, k)
    pln_rows, pln_ids = _pad_shard(pln_rows, pln, k)
    return (sph_rows.reshape(k, -1, 4),
            jnp.asarray(sph_ids.reshape(k, -1)),
            pln_rows.reshape(k, -1, 6),
            jnp.asarray(pln_ids.reshape(k, -1)))


def ring_closest_hit_local(sph_rows, sph_ids, pln_rows, pln_ids,
                           ro: V3, rd: V3, axis: str):
    """Ring intersection body — call inside ``shard_map``.

    Each device holds its ray shard (ro/rd) and one object shard
    (sph/pln rows+ids); shards circulate ``axis_size`` times.
    Returns (t (N,), obj (N,), hit (N,)) for the local ray shard.
    """
    k = lax.axis_size(axis)
    perm = [(i, (i + 1) % k) for i in range(k)]
    a = dot(rd, rd)
    t_best = jnp.full_like(ro.x, jnp.inf)
    obj = jnp.full(ro.x.shape, jnp.int32(2 ** 31 - 1))
    hit = jnp.zeros(ro.x.shape, bool)

    for step in range(k):
        t_best, obj, hit = _local_min(sph_rows, sph_ids, ro, rd, a,
                                      t_best, obj, hit, "sphere")
        t_best, obj, hit = _local_min(pln_rows, pln_ids, ro, rd, a,
                                      t_best, obj, hit, "plane")
        if step + 1 < k:
            sph_rows = lax.ppermute(sph_rows, axis, perm)
            sph_ids = lax.ppermute(sph_ids, axis, perm)
            pln_rows = lax.ppermute(pln_rows, axis, perm)
            pln_ids = lax.ppermute(pln_ids, axis, perm)
    obj = jnp.where(hit, obj, 0)
    return t_best, obj, hit


def make_ring_intersector(spec: SceneSpec, mesh, axis: str = "d"):
    """Jitted end-to-end ring intersection over ``mesh``.

    Returns ``fn(data, ro (N,3), rd (N,3)) -> (t, obj, hit)`` with rays
    and objects both sharded over ``axis`` (N divisible by the mesh
    size).
    """
    k = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))

    def run(data, ro, rd):
        shards = shard_geometry(data, spec, k)

        def body(sph_r, sph_i, pln_r, pln_i, ro, rd):
            t, o, h = ring_closest_hit_local(
                sph_r[0], sph_i[0], pln_r[0], pln_i[0],
                V3(ro[:, 0], ro[:, 1], ro[:, 2]),
                V3(rd[:, 0], rd[:, 1], rd[:, 2]), axis)
            return t, o, h

        fn = shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis)))
        return fn(*shards, ro, rd)

    return jax.jit(run)
