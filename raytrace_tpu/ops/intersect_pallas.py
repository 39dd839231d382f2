"""Pallas TPU kernel for LARGE-scene closest-hit queries.

The jnp large-scene path (ops/intersect.py::_scan_all_objects) walks the
primitive axis with ``lax.scan`` over 16-object chunks: every chunk
round-trips the running (t_best, obj, hit) carry through HBM.  Here the
primitive axis is the *inner grid dimension* of one ``pallas_call``:
each (row-block, obj-chunk) step keeps the ray block in VMEM, streams
an 8-primitive chunk through a pipelined (8, 4) table block, and folds
the running minimum directly in the output refs (the standard Pallas
reduction pattern — outputs are revisited across the inner grid axis,
initialized under ``pl.when(j == 0)``).  HBM traffic per level is rays
in + one hit record out, independent of scene size.

Semantics are identical to the jnp scan (same formulas, same
first-minimum tie-break in sphere-partition-then-plane-partition order,
matching _scan_all_objects; scene.rs:248 semantics within each type).
Used only for the scanned regime (> LARGE_SCENE_THRESHOLD live
objects), f32, TPU; other regimes/backends keep the jnp code.

Differentiability: a ``jax.custom_vjp`` re-traces a jnp scan in the
backward pass (the megakernel's strategy, render/megakernel.py), so
inverse rendering over huge scenes keeps the fast forward.

Table layout (one unified (C*8, 4) f32 table, spheres first):

* sphere row: (cx, cy, cz, r)            shapes.rs:60-87
* plane row:  (nx, ny, nz, p.n)          shapes.rs:102-110 (the kernel
  only needs ``n.(p0 - o) = p.n - o.n``, so the point is pre-reduced)
* zero padding rows are masked explicitly: sphere validity requires
  r > 0 (f32 cancellation in the discriminant can be spuriously
  positive for rays grazing the origin, so algebraic self-masking is
  not reliable); plane pad rows have n = 0 giving denom = 0.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytrace_tpu.ops.vec import V3

LANE = 128
BLOCK_ROWS = int(os.environ.get("RAYTRACE_TPU_INTERSECT_ROWS", "128"))
# primitives per inner grid step: bigger chunks = fewer grid steps (the
# per-step fixed cost — block copy handshake + revisited-output fold —
# dominates tiny chunks), at the price of a longer unrolled fold body.
# Measured on v5e, 4102-object field, 2M lanes (multi-k slope, r3):
# coherent beam 72/77/87/83 G tests/s at chunk 8/16/32/64; incoherent
# 61 -> 77 G at 8 -> 32; full render path 55.5 -> 64.2 G.  32 wins all.
_OBJ_CHUNK = int(os.environ.get("RAYTRACE_TPU_OBJ_CHUNK", "32"))


def _env_flag(name: str) -> bool:
    return os.environ.get(name, "") not in ("", "0")


def usable(dtype) -> bool:
    if _env_flag("RAYTRACE_TPU_NO_INTERSECT_KERNEL"):
        return False
    interpret = _env_flag("RAYTRACE_TPU_MEGAKERNEL_INTERPRET")
    if not interpret and jax.default_backend() != "tpu":
        return False
    return jnp.dtype(dtype) == jnp.float32


_ID_SENTINEL = np.int32(2 ** 31 - 1)  # obj value on miss lanes


def _kernel(ids_ref, bnd_ref, tab_ref, rox, roy, roz, rdx, rdy, rdz,
            t_out, obj_out, hit_out, *, n_sph_chunks: int, cull: bool):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_out[...] = jnp.full(t_out.shape, jnp.inf, t_out.dtype)
        obj_out[...] = jnp.full(obj_out.shape, _ID_SENTINEL, jnp.int32)
        hit_out[...] = jnp.zeros(hit_out.shape, jnp.int32)

    ro = V3(rox[...], roy[...], roz[...])
    rd = V3(rdx[...], rdy[...], rdz[...])
    a = rd.x * rd.x + rd.y * rd.y + rd.z * rd.z
    inv2a = 0.5 / jnp.where(a > 0, a, 1.0)  # zero-rd-safe (intersect.safe_inv2a)
    rows = tab_ref[...]                      # (OBJ_CHUNK, 4) in VMEM

    def fold(ts, vs):
        t_best, obj, hit = t_out[...], obj_out[...], hit_out[...]
        for k, (t_i, v_i) in enumerate(zip(ts, vs)):
            gid = ids_ref[j, k]              # global object id (SMEM)
            t_i = jnp.where(v_i, t_i, jnp.inf)
            # strict < keeps the earliest minimum in *table* order;
            # the gid comparison restores min_by_key's first-in-scene-
            # order tie-break (scene.rs:248) across the sphere/plane
            # partitions on an exact t tie
            better = (t_i < t_best) | ((t_i == t_best) & v_i & (gid < obj))
            t_best = jnp.where(better, t_i, t_best)
            obj = jnp.where(better, gid, obj)
            hit = hit | (v_i.astype(jnp.int32))
        t_out[...] = t_best
        obj_out[...] = obj
        hit_out[...] = hit

    def sphere_fold():
        ts, vs = [], []
        for k in range(_OBJ_CHUNK):
            cx, cy, cz, r = rows[k, 0], rows[k, 1], rows[k, 2], rows[k, 3]
            ocx, ocy, ocz = ro.x - cx, ro.y - cy, ro.z - cz
            b = 2.0 * (rd.x * ocx + rd.y * ocy + rd.z * ocz)
            cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            disc = b * b - 4.0 * a * cc
            has = disc > 0.0
            sq = jnp.sqrt(jnp.where(has, disc, 1.0))
            t1 = (-b - sq) * inv2a
            t2 = (-b + sq) * inv2a
            t = jnp.where(t1 > 0.0, t1, t2)
            ts.append(t)
            # r > 0 guards zero-padding rows: f32 cancellation in
            # b*b - 4ac can yield a spuriously positive disc for rays
            # grazing the origin, which would register a phantom hit.
            vs.append(has & (t > 0.0) & (r > 0.0))
        fold(ts, vs)

    if cull:
        # chunk culling (the TPU-shaped acceleration structure): every
        # sphere chunk carries a conservative bounding sphere (built in
        # _chunk_bounds; table order gives chunks spatial locality).  A
        # lane MAY be improved by the chunk only if its ray enters the
        # bound in front of the origin and not beyond its running best
        # t; if NO lane in the whole block may, the 8-object fold is
        # skipped.  Output-invariant by construction (any interior
        # object hit implies a strictly earlier bound entry), asserted
        # bit-for-bit vs the jnp scan in tests/test_intersect_pallas.
        @pl.when(j < n_sph_chunks)
        def _():
            bx, by, bz = bnd_ref[j, 0], bnd_ref[j, 1], bnd_ref[j, 2]
            br = bnd_ref[j, 3]
            ocx, ocy, ocz = ro.x - bx, ro.y - by, ro.z - bz
            b = 2.0 * (rd.x * ocx + rd.y * ocy + rd.z * ocz)
            cc = ocx * ocx + ocy * ocy + ocz * ocz - br * br
            disc = b * b - 4.0 * a * cc
            # f32 cancellation in b*b - 4ac grows ~eps*b^2 with the
            # origin-to-chunk distance squared, while the bound's own
            # inflation (_chunk_bounds) covers only ~r^2 — a grazing
            # ray from far away could see a spuriously NEGATIVE disc
            # and falsely cull a chunk containing a real hit (silent
            # wrong pixel; tests/test_intersect_pallas.py covers the
            # large-coordinate case).  All three tests take relative
            # slack proportional to the quantities that carry the
            # rounding error.
            pos = disc > -1e-5 * (b * b)
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            margin = 1e-5 * jnp.abs(b) * inv2a + 1e-4
            enters = pos & ((-b + sq) * inv2a > -margin)  # exit in front
            may = enters & ((-b - sq) * inv2a <= t_out[...] + margin)

            @pl.when(jnp.any(may))
            def _():
                sphere_fold()
    else:
        @pl.when(j < n_sph_chunks)
        def _():
            sphere_fold()

    @pl.when(j >= n_sph_chunks)
    def _():
        ts, vs = [], []
        for k in range(_OBJ_CHUNK):
            nx, ny, nz, pn = rows[k, 0], rows[k, 1], rows[k, 2], rows[k, 3]
            denom = rd.x * nx + rd.y * ny + rd.z * nz
            numer = pn - (ro.x * nx + ro.y * ny + ro.z * nz)
            ok = denom != 0.0
            t = numer / jnp.where(ok, denom, 1.0)
            ts.append(t)
            vs.append(ok & (t > 0.0))
        fold(ts, vs)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def scan_hit(table, ids, n_sph_pad, ro, rd):
    """(t_best, global obj id, hit) for rays vs the unified table.

    table: (C*8, 4) f32, spheres in rows [0, n_sph_pad), planes after;
    ids: (C*8,) int32 global object id per row (pad rows: -1 — never
    valid, so the sentinel only marks would-be phantom hits);
    n_sph_pad: static sphere-partition size (multiple of 8);
    ro/rd: V3 of (N,) lanes.  On an exact t tie the lowest global id
    wins (min_by_key first-in-scene-order, scene.rs:248); miss lanes
    carry id 2^31-1 — mask with ``hit`` before gathering.
    """
    return _scan_hit_fwd_kernel(table, ids, n_sph_pad, ro, rd)


def _jnp_scan_reference(table, ids, n_sph_pad, ro, rd):
    """The kernel's semantics in plain lax.scan (VJP + parity)."""
    a = rd.x * rd.x + rd.y * rd.y + rd.z * rd.z
    # derive the carry init from ro.x so it inherits ro's vma (inside
    # shard_map a replicated zeros init would mismatch the carry type);
    # vma_zeros also sanitizes non-finite dead-lane origins
    from raytrace_tpu.ops.intersect import vma_zeros
    zero = vma_zeros(ro.x)
    init = (zero + jnp.inf, zero.astype(jnp.int32) + _ID_SENTINEL,
            zero > 1)

    def step(carry, xs):
        row, gid, rowid = xs
        is_sph = rowid < n_sph_pad
        # sphere branch
        ocx, ocy, ocz = ro.x - row[0], ro.y - row[1], ro.z - row[2]
        b = 2.0 * (rd.x * ocx + rd.y * ocy + rd.z * ocz)
        cc = ocx * ocx + ocy * ocy + ocz * ocz - row[3] * row[3]
        disc = b * b - 4.0 * a * cc
        has = disc > 0.0
        sq = jnp.sqrt(jnp.where(has, disc, 1.0))
        inv2a = 0.5 / jnp.where(a > 0, a, 1.0)  # zero-rd-safe (intersect.safe_inv2a)
        ts1 = (-b - sq) * inv2a
        ts2 = (-b + sq) * inv2a
        ts = jnp.where(ts1 > 0.0, ts1, ts2)
        vs = has & (ts > 0.0) & (row[3] > 0.0)  # r > 0: mask pad rows
        # plane branch
        denom = rd.x * row[0] + rd.y * row[1] + rd.z * row[2]
        numer = row[3] - (ro.x * row[0] + ro.y * row[1] + ro.z * row[2])
        ok = denom != 0.0
        tp = numer / jnp.where(ok, denom, 1.0)
        vp = ok & (tp > 0.0)

        t_i = jnp.where(is_sph, ts, tp)
        v_i = jnp.where(is_sph, vs, vp)
        t_best, obj, hit = carry
        t_i = jnp.where(v_i, t_i, jnp.inf)
        better = (t_i < t_best) | ((t_i == t_best) & v_i & (gid < obj))
        return (jnp.where(better, t_i, t_best),
                jnp.where(better, gid, obj), hit | v_i), None

    rowids = jnp.arange(table.shape[0], dtype=jnp.int32)
    (t, obj, hit), _ = jax.lax.scan(step, init, (table, ids, rowids))
    return t, obj, hit


def _chunk_bounds(table, n_sph_pad, n_chunks):
    """Conservative per-chunk bounding spheres (cx, cy, cz, R) for the
    sphere partition, (n_chunks, 4) f32; plane chunks (unbounded — never
    culled) and all-pad chunks carry R = 0.

    The bound is the member-center centroid with radius
    ``max(|c_i - C| + r_i)`` inflated by an f32-safety margin, so any
    ray that hits a member sphere at t > 0 strictly enters the bound
    earlier — which is what makes the kernel's chunk skip
    output-invariant.  Gradients never see this: the backward pass
    re-traces the (cull-free) jnp scan.
    """
    sph = jax.lax.stop_gradient(table[:n_sph_pad]).reshape(
        -1, _OBJ_CHUNK, 4)
    valid = sph[..., 3] > 0                                   # (C, 8)
    cnt = jnp.maximum(valid.sum(axis=1, keepdims=True), 1)
    ctr = (jnp.where(valid[..., None], sph[..., :3], 0.0).sum(axis=1)
           / cnt)                                             # (C, 3)
    dist = jnp.sqrt(jnp.sum((sph[..., :3] - ctr[:, None, :]) ** 2,
                            axis=-1)) + sph[..., 3]
    r = jnp.max(jnp.where(valid, dist, 0.0), axis=1)
    r = jnp.where(r > 0, r * 1.0001 + 1e-4, 0.0)
    bounds = jnp.concatenate([ctr, r[:, None]], axis=1)       # (C, 4)
    pad = n_chunks - bounds.shape[0]
    if pad:
        bounds = jnp.concatenate(
            [bounds, jnp.zeros((pad, 4), bounds.dtype)])
    return bounds.astype(jnp.float32)


def _scan_hit_fwd_kernel(table, ids, n_sph_pad, ro, rd):
    n = ro.x.shape[0]
    rows = -(-n // LANE)
    rows_pad = -(-rows // BLOCK_ROWS) * BLOCK_ROWS
    total = rows_pad * LANE
    n_chunks = table.shape[0] // _OBJ_CHUNK
    assert table.shape[0] % _OBJ_CHUNK == 0
    cull = not _env_flag("RAYTRACE_TPU_NO_CULL")

    def block(arr):
        arr = jnp.concatenate([arr, jnp.zeros(total - n, arr.dtype)])
        return arr.reshape(rows_pad, LANE)

    # grid: outer = ray row-blocks (parallel), inner = object chunks
    # (sequential reduction into the revisited output block)
    grid = (rows_pad // BLOCK_ROWS, n_chunks)
    lane = pl.BlockSpec((BLOCK_ROWS, LANE), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)
    tab = pl.BlockSpec((_OBJ_CHUNK, 4), lambda i, j: (j, 0),
                       memory_space=pltpu.VMEM)
    # whole-array SMEM resident (tiny); blocked SMEM windows would hit
    # the (8, 128)-divisibility rule on real TPU lowering
    idt = pl.BlockSpec(memory_space=pltpu.SMEM)
    vma = getattr(jax.typeof(ro.x), "vma", frozenset())
    shp = lambda dt: jax.ShapeDtypeStruct(  # noqa: E731
        (rows_pad, LANE), dt, vma=vma)

    fn = pl.pallas_call(
        partial(_kernel, n_sph_chunks=n_sph_pad // _OBJ_CHUNK, cull=cull),
        grid=grid,
        in_specs=[idt, idt, tab, lane, lane, lane, lane, lane, lane],
        out_specs=(lane, lane, lane),
        out_shape=(shp(ro.x.dtype), shp(jnp.int32), shp(jnp.int32)),
        interpret=_env_flag("RAYTRACE_TPU_MEGAKERNEL_INTERPRET"),
    )
    t, obj, hit = fn(ids.reshape(n_chunks, _OBJ_CHUNK),
                     _chunk_bounds(table, n_sph_pad, n_chunks), table,
                     block(ro.x), block(ro.y), block(ro.z),
                     block(rd.x), block(rd.y), block(rd.z))
    unb = lambda x: x.reshape(-1)[:n]  # noqa: E731
    return unb(t), unb(obj), unb(hit) != 0


def _vjp_fwd(table, ids, n_sph_pad, ro, rd):
    out = _scan_hit_fwd_kernel(table, ids, n_sph_pad, ro, rd)
    return out, (table, ids, ro, rd)


def _vjp_bwd(n_sph_pad, res, g):
    table, ids, ro, rd = res
    gt = g[0]  # obj/hit are integral: no cotangent

    def fwd_t(table, ro, rd):
        t, _, _ = _jnp_scan_reference(table, ids, n_sph_pad, ro, rd)
        return t

    _, vjp = jax.vjp(fwd_t, table, ro, rd)
    d_table, d_ro, d_rd = vjp(gt)
    d_ids = np.zeros(ids.shape, jax.dtypes.float0)  # int primal
    return d_table, d_ids, d_ro, d_rd


scan_hit.defvjp(_vjp_fwd, _vjp_bwd)
