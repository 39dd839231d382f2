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

The per-step shard intersection is the same unified-table primitive as
the single-device scanned path: the Pallas kernel
(ops/intersect_pallas.py) on TPU f32, ``lax.scan`` elsewhere — so the
per-device program size is O(1) in shard size and the hot loop runs in
VMEM on hardware.

There is no softmax-like coupling across the object axis (unlike
attention), so no blockwise/Ulysses variant is needed — the ring is the
whole story.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P

from raytrace_tpu.ops import intersect_pallas as ip
from raytrace_tpu.ops.intersect import _typed_geometry
from raytrace_tpu.ops.vec import V3
from raytrace_tpu.scene.schema import SceneData, SceneSpec


def shard_geometry(data: SceneData, spec: SceneSpec, k: int):
    """Split the scene into k equal unified-table object shards.

    Returns ``(tables (k, C, 4), ids (k, C), n_sph_pad)`` where every
    shard holds ``n_sph_pad`` sphere rows (cx, cy, cz, r) followed by
    plane rows (n, p.n); zero-padding rows are masked by the kernel's
    r > 0 / n != 0 validity and carry id -1.  Index maps are static
    (from SceneSpec); values stay jnp so gradients flow back into
    ``data``.
    """
    sph, pln = _typed_geometry(data, spec)
    dt = data.prim_p.dtype
    ck = ip._OBJ_CHUNK

    def shard_rows(rows, ids):
        o = rows.shape[0]
        per = -(-max(o, 1) // k)
        per = -(-per // ck) * ck          # chunk-aligned shard size
        pad = per * k - o
        rows = jnp.concatenate(
            [rows, jnp.zeros((pad, 4), dt)]) if o else jnp.zeros(
                (per * k, 4), dt)
        ids = np.concatenate([ids, np.full(pad, -1, np.int64)])
        return rows.reshape(k, per, 4), ids.reshape(k, per), per

    sph_rows = (jnp.concatenate(
        [data.prim_p[sph], data.prim_q[sph, 0:1]], axis=1)
        if len(sph) else jnp.zeros((0, 4), dt))
    pn = jnp.sum(data.prim_p[pln] * data.prim_q[pln], axis=1,
                 keepdims=True)
    pln_rows = (jnp.concatenate([data.prim_q[pln], pn], axis=1)
                if len(pln) else jnp.zeros((0, 4), dt))

    sph_rows, sph_ids, n_sph_pad = shard_rows(sph_rows, sph)
    pln_rows, pln_ids, _ = shard_rows(pln_rows, pln)

    tables = jnp.concatenate([sph_rows, pln_rows], axis=1)
    ids = jnp.asarray(
        np.concatenate([sph_ids, pln_ids], axis=1).astype(np.int32))
    return tables, ids, n_sph_pad


def _shard_hit(table, ids, n_sph_pad: int, ro: V3, rd: V3):
    """(t, global obj id, hit) of one resident shard vs the ray shard.

    scan_hit folds on global ids directly, so within a shard an exact
    t tie already resolves to the lowest global id (scene.rs:248);
    the cross-shard fold in ring_closest_hit_local does the same.
    """
    if ip.usable(ro.x.dtype) and ro.x.ndim == 1:
        return ip.scan_hit(table, ids, n_sph_pad, ro, rd)
    return ip._jnp_scan_reference(table, ids, n_sph_pad, ro, rd)


def ring_closest_hit_local(table, ids, n_sph_pad: int, ro: V3, rd: V3,
                           axis: str):
    """Ring intersection body — call inside ``shard_map``.

    Each device holds its ray shard (ro/rd) and one object shard
    (table+ids); shards circulate ``axis_size`` times.  Returns
    (t (N,), obj (N,), hit (N,)) for the local ray shard, with the
    first-minimum-in-file-order tie-break across shards: on an exact t
    tie the lower global object id wins (scene.rs:248).
    """
    k = lax.axis_size(axis)
    perm = [(i, (i + 1) % k) for i in range(k)]
    t_best = jnp.full_like(ro.x, jnp.inf)
    obj = jnp.full(ro.x.shape, jnp.int32(2 ** 31 - 1))
    hit = jnp.zeros(ro.x.shape, bool)

    for step in range(k):
        t_s, gid, h_s = _shard_hit(table, ids, n_sph_pad, ro, rd)
        t_s = jnp.where(h_s, t_s, jnp.inf)
        better = (t_s < t_best) | ((t_s == t_best) & h_s & (gid < obj))
        t_best = jnp.where(better, t_s, t_best)
        obj = jnp.where(better, gid, obj)
        hit = hit | h_s
        if step + 1 < k:
            table = lax.ppermute(table, axis, perm)
            ids = lax.ppermute(ids, axis, perm)
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
        tables, ids, n_sph_pad = shard_geometry(data, spec, k)

        def body(table, ids, ro, rd):
            return ring_closest_hit_local(
                table[0], ids[0], n_sph_pad,
                V3(ro[:, 0], ro[:, 1], ro[:, 2]),
                V3(rd[:, 0], rd[:, 1], rd[:, 2]), axis)

        fn = shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis)))
        return fn(tables, ids, ro, rd)

    return jax.jit(run)
