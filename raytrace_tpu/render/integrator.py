"""Wavefront integrator: the TPU-native re-design of the recursive core
``ray_color`` / ``raytrace`` (raytrace.rs:261-276) and the driver pixel
loop (main.rs:45-59).

The reference recurses per ray with data-dependent branching.  XLA wants
one traced program with static shapes, so recursion becomes a statically
unrolled *level loop* (SURVEY.md §7): level ``d`` holds all rays at
recursion depth ``d`` — ``N * B^d`` lanes where ``B`` is the static
branching factor (reflect + refract + n_indirect slots derived from the
material set actually in the scene).  Each level does one batched
closest-hit query, one batched shade, accumulates ``throughput * emit``
into the per-primary-sample radiance, and emits the next level's rays.
Significance/depth pruning (raytrace.rs:17-18) becomes lane masking, and
the whole loop is differentiable: ``jax.grad`` of any function of the
returned radiance flows into every SceneData leaf.

Radiance decomposition note: the reference computes
``res = local + Σ_child weight_child * ray_color(child)`` bottom-up; by
linearity this equals the top-down sum over all tree nodes of
``(Π ancestors' weights) * local``, which is what the level loop
accumulates — no recursion stack needed.

Levels run ``0 ‥ max_depth+1`` inclusive: depths 0‥4 shade fully and
spawn, depth 5 is intersected then shaded ambient/background-only
(raytrace.rs:18,33 semantics ⇒ 6 intersection rounds per primary sample,
matching BASELINE.md).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from raytrace_tpu.models.backgrounds import background_color_v
from raytrace_tpu.models.cameras import project
from raytrace_tpu.models.materials import shade
from raytrace_tpu.ops import rng, vec
from raytrace_tpu.ops.intersect import closest_hit
from raytrace_tpu.ops.vec import V3
from raytrace_tpu.scene.schema import Scene, SceneData, SceneSpec
from raytrace_tpu.utils.profiling import annotate


def _flatten_slots(parts):
    """[(N,), ...] per child slot -> (N*B,) interleaved per parent.

    Slot arrays are stacked on a new minor axis then flattened, so the
    B children of parent i occupy lanes [i*B, (i+1)*B) — keeping the
    per-primary grouping contiguous for the level-sum reshape.
    """
    if len(parts) == 1:
        return parts[0]
    return jnp.stack(parts, axis=1).reshape(-1)


def _compact_children(b: int, m: int, live, ro, rd, sig, tp, k1, k2):
    """Compact B child slots down to m live lanes per parent.

    The child gates are material-exclusive (SceneSpec.max_live_children)
    so each parent has at most m live children among its b slots; a
    branchless per-parent selection network (O(b*m) masked selects)
    moves them into the first m output slots.  RNG keys are derived
    *before* compaction, so every surviving lane keeps its exact stream
    identity — compacted and uncompacted renders are bit-identical
    while deep levels shrink from N*B^d to N*m^d lanes (a 4-slot
    transparent+indirect scene does (4/2)^5 = 32x less work at the
    deepest level).
    """
    n = live.shape[0] // b
    live2 = live.reshape(n, b)
    # exclusive running count of live slots = each live child's
    # destination slot within its parent
    prefix = jnp.cumsum(live2, axis=1) - live2.astype(jnp.int32)

    def comp(arr, default):
        a2 = arr.reshape(n, b)
        cols = []
        for j in range(m):
            col = jnp.full((n,), default, a2.dtype)
            for s in range(b):
                take = live2[:, s] & (prefix[:, s] == j)
                col = jnp.where(take, a2[:, s], col)
            cols.append(col)
        return jnp.stack(cols, axis=1).reshape(-1)

    def compv(v: V3) -> V3:
        return V3(comp(v.x, 0), comp(v.y, 0), comp(v.z, 0))

    return (comp(live, False), compv(ro), compv(rd), comp(sig, 0),
            compv(tp), comp(k1, 0), comp(k2, 0))


def radiance_linear_v(data: SceneData, spec: SceneSpec, ro: V3, rd: V3,
                      k1, k2, significance=None, miss_records=None) -> V3:
    """Radiance chain for scenes whose wavefront never fans out
    (``spec.children_per_ray <= 1`` — e.g. the golden scene's single
    indirect slot, or pure mirror-Phong scenes).

    Unlike :func:`radiance_v` this is *shape-agnostic*: every op is
    elementwise over whatever shape ``ro.x`` has, with no reshapes —
    which is what lets the Pallas megakernel
    (:mod:`raytrace_tpu.render.megakernel`) run the exact same code on
    2D ``(rows, 128)`` register blocks inside VMEM.

    ``miss_records``: when a list is passed, background shading is
    DEFERRED — miss lanes contribute 0 here and ONE merged
    ``(miss_mask, rd, tp)`` tuple is appended for the whole chain: a
    live linear-chain lane misses at most once (a missed lane spawns no
    children — materials.shade gates every slot on ``hit.hit`` — so it
    is dead at every later level), making the per-lane miss set a
    single record.  The megakernel uses this for skybox scenes: the
    bilinear texture gather cannot run on VMEM blocks inside the kernel
    (faces exceed VMEM; Mosaic has no per-lane gather), so the kernel
    emits the merged miss event and a fused jnp post-pass adds
    ``tp * skybox(rd)``.  Exact: a lane's contributions are
    hit-XOR-miss per level, so deferring the single miss term changes
    only the order of exact +0 additions.
    """
    dtype = ro.x.dtype
    sig = (jnp.ones_like(ro.x) if significance is None
           else jnp.broadcast_to(significance, ro.x.shape).astype(dtype))
    live = jnp.ones(ro.x.shape, bool)
    tp = vec.full_like(sig, 1.0)
    acc = vec.full_like(sig, 0.0)
    zero = vec.full_like(sig, 0.0)
    m_any = jnp.zeros(ro.x.shape, bool)
    m_rd = zero
    m_tp = zero

    for depth in range(spec.max_depth + 2):
        hit = closest_hit(data, spec, ro, rd)
        emit, children = shade(data, spec, ro, rd, hit, sig, live, k1, k2,
                               depth)
        assert len(children) <= 1, "use radiance_v for fan-out scenes"
        if miss_records is None:
            bg = background_color_v(data, spec, rd)
            local = vec.where(hit.hit, emit, bg)
        else:
            miss = live & ~hit.hit
            m_any = m_any | miss
            m_rd = vec.where(miss, rd, m_rd)
            m_tp = vec.where(miss, tp, m_tp)
            local = vec.where(hit.hit, emit, vec.full_like(sig, 0.0))
        contrib = vec.where(live, tp.mul(local), vec.full_like(sig, 0.0))
        acc = acc + contrib

        if not children:
            break
        c = children[0]
        ro, rd, sig, live = c.ro, c.rd, c.sig, c.live
        tp = tp.mul(c.weight)
        tp = vec.where(live, tp, vec.full_like(sig, 0.0))
        k1, k2 = rng.derive(k1, k2, c.slot)

    if miss_records is not None:
        miss_records.append((m_any, m_rd, m_tp))
    return acc


def radiance_linear_loop_v(data: SceneData, spec: SceneSpec, ro: V3,
                           rd: V3, k1, k2, significance=None,
                           miss_records=None) -> V3:
    """:func:`radiance_linear_v` as a ``lax.fori_loop`` over levels —
    O(1) program size in ``max_depth`` (the linear twin of
    :func:`radiance_tree_loop_v`).

    The unrolled chain inlines one closest-hit + shade round per level;
    for the megakernel's LARGE-scene regime that multiplies the already
    sizeable in-kernel table fold (ops/intersect_inline.py) by
    ``max_depth + 2`` program copies, which Mosaic compiles painfully.
    Here ONE traced level body runs under a ``fori_loop``: ``shade``
    takes the depth as a traced scalar (the stack-DFS loop's mechanism,
    raytrace.rs:33 cutoff as ``lax.cond``), and the single child slot's
    RNG derivation uses the same static slot id every level, so every
    draw keeps the exact stream identity of the unrolled chain — the
    two forms agree to FMA-contraction roundoff.

    Linear scenes only (``children_per_ray <= 1``).  ``miss_records``
    works exactly as in :func:`radiance_linear_v`: ONE merged
    ``(miss, rd, tp)`` record for the whole chain (a live linear lane
    misses at most once), carried through the loop as 0/1 float + two
    vectors — which is what lets the LARGE skybox regime run the O(1)
    loop form instead of unrolling the table fold per level.
    """
    assert spec.children_per_ray <= 1
    dtype = ro.x.dtype
    levels = (spec.max_depth + 2 if spec.children_per_ray == 1 else 1)
    sig = (jnp.ones_like(ro.x) if significance is None
           else jnp.broadcast_to(significance, ro.x.shape).astype(dtype))
    # liveness rides the carry as 0/1 float, not bool: Mosaic cannot
    # legalize i1 vector loop-carries (scf.for over vector<8x128xi1>
    # fails to lower on v5e), and this loop body runs inside the
    # megakernel's fori_loop in the large-scene regime
    live_f = jnp.ones(ro.x.shape, dtype)
    tp = vec.full_like(sig, 1.0)
    acc = vec.full_like(sig, 0.0)
    zero = vec.full_like(sig, 0.0)
    defer = miss_records is not None
    m = (jnp.zeros(ro.x.shape, dtype), zero, zero)  # (miss01, rd, tp)

    def body(d, carry):
        ro, rd, sig, live_f, tp, k1, k2, acc, m = carry
        live = live_f > 0.5
        hit = closest_hit(data, spec, ro, rd)
        emit, children = shade(data, spec, ro, rd, hit, sig, live, k1,
                               k2, d)
        if defer:
            miss = live & ~hit.hit
            m01, mrd, mtp = m
            m = (jnp.where(miss, 1.0, m01),
                 vec.where(miss, rd, mrd),
                 vec.where(miss, tp, mtp))
            local = vec.where(hit.hit, emit, vec.full_like(sig, 0.0))
        else:
            bg = background_color_v(data, spec, rd)
            local = vec.where(hit.hit, emit, bg)
        acc = acc + vec.where(live, tp.mul(local), vec.full_like(sig, 0.0))
        if children:
            c = children[0]
            ro, rd, sig = c.ro, c.rd, c.sig
            live_f = jnp.where(c.live, jnp.ones_like(live_f),
                               jnp.zeros_like(live_f))
            tp = tp.mul(c.weight)
            tp = vec.where(c.live, tp, vec.full_like(sig, 0.0))
            k1, k2 = rng.derive(k1, k2, c.slot)
        return (ro, rd, sig, live_f, tp, k1, k2, acc, m)

    carry = jax.lax.fori_loop(
        0, levels, body, (ro, rd, sig, live_f, tp, k1, k2, acc, m))
    if defer:
        m01, mrd, mtp = carry[-1]
        miss_records.append((m01 > 0.5, mrd, mtp))
    return carry[-2]


def _route_children(children, m: int, tp: V3, k1, k2):
    """b child slots -> m virtual children, routed per lane in registers.

    The elementwise analog of :func:`_compact_children` for the DFS tree
    walk (:func:`radiance_tree_v`).  There a lane's b child slots are
    separate register values (not segments of a widened lane axis), so
    routing the <=m live ones into the first m virtual slots is a pure
    per-lane selection network with no reshape — which is what lets it
    run on ``(rows, 128)`` VMEM blocks inside the Pallas megakernel.

    RNG keys are derived from the ORIGINAL slot index before routing, so
    every surviving child keeps the exact stream identity it has in the
    (un)compacted wavefront.  Returns m tuples
    ``(ro, rd, sig, tp, live, k1, k2)`` where ``tp`` is the parent
    throughput already multiplied by the child's weight.
    """
    b = len(children)
    keys = [rng.derive(k1, k2, c.slot) for c in children]
    tps = [tp.mul(c.weight) for c in children]

    # exclusive running count of live slots = destination virtual slot
    run = jnp.zeros(children[0].live.shape, jnp.int32)
    prefix = []
    for c in children:
        prefix.append(run)
        run = run + c.live.astype(jnp.int32)

    virt = []
    for j in range(m):
        take = [children[s].live & (prefix[s] == j) for s in range(b)]

        def sel(getter):
            out = jnp.zeros_like(getter(0))
            for s in range(1, b):
                out = jnp.where(take[s], getter(s), out)
            return jnp.where(take[0], getter(0), out)

        def selv(getter):
            return V3(sel(lambda s: getter(s).x),
                      sel(lambda s: getter(s).y),
                      sel(lambda s: getter(s).z))

        live = take[0]
        for s in range(1, b):
            live = live | take[s]
        virt.append((selv(lambda s: children[s].ro),
                     selv(lambda s: children[s].rd),
                     sel(lambda s: children[s].sig),
                     selv(lambda s: tps[s]),
                     live,
                     sel(lambda s: keys[s][0]),
                     sel(lambda s: keys[s][1])))
    return virt


def radiance_tree_v(data: SceneData, spec: SceneSpec, ro: V3, rd: V3,
                    k1, k2, significance=None, miss_records=None) -> V3:
    """Radiance for fan-out scenes as a static DFS over the virtual
    child tree — the *shape-agnostic* counterpart of :func:`radiance_v`.

    :func:`radiance_v` widens the lane axis by the branching factor at
    each level and compacts it with reshapes, which a Pallas kernel
    operating on fixed ``(rows, 128)`` register blocks cannot do.  Here
    the recursion tree of ``ray_color`` (raytrace.rs:261-267) is walked
    depth-first instead: each node performs one closest-hit + shade on
    the SAME lane shape, routes its b child slots into
    ``m = spec.max_live_children`` virtual children per lane
    (:func:`_route_children` — the slot gates are material-exclusive,
    raytrace.rs:59-64/99-117/154-164/214-223, so at most m are live),
    and recurses into each.  Total work is ``sum_d m^d`` node visits —
    identical lane-work to the compacted wavefront, with zero lane-axis
    reshapes.

    Visits the same child set with the same RNG stream identities as
    :func:`radiance_v`; only the floating-point accumulation ORDER
    differs (DFS vs per-level block sums), so the two agree to roundoff
    rather than bit-for-bit.

    ``miss_records``: when a list is passed, background shading is
    DEFERRED exactly as in :func:`radiance_linear_v` — one
    ``(miss, rd, tp)`` record per DFS node, ``tree_nodes(spec)`` in
    total, appended in preorder.  The Pallas megakernel uses this for
    skybox x fan-out scenes: a lane can miss at several nodes (one per
    live subtree branch), so the per-node record set is the exact
    bounded encoding of its background contributions — the post-pass
    adds ``tp * skybox(rd)`` per record (raytrace.rs:234-256 parity).
    """
    dtype = ro.x.dtype
    sig = (jnp.ones_like(ro.x) if significance is None
           else jnp.broadcast_to(significance, ro.x.shape).astype(dtype))
    live = jnp.ones(ro.x.shape, bool)
    tp = vec.full_like(sig, 1.0)

    def node(ro, rd, sig, live, tp, k1, k2, depth):
        hit = closest_hit(data, spec, ro, rd)
        emit, children = shade(data, spec, ro, rd, hit, sig, live, k1, k2,
                               depth)
        if miss_records is None:
            bg = background_color_v(data, spec, rd)
            local = vec.where(hit.hit, emit, bg)
        else:
            miss = live & ~hit.hit
            miss_records.append((miss, rd, vec.where(
                miss, tp, vec.full_like(sig, 0.0))))
            local = vec.where(hit.hit, emit, vec.full_like(sig, 0.0))
        acc = vec.where(live, tp.mul(local), vec.full_like(sig, 0.0))
        if not children:
            return acc
        m = min(max(spec.max_live_children, 1), len(children))
        if m < len(children):
            virt = _route_children(children, m, tp, k1, k2)
        else:
            virt = [(c.ro, c.rd, c.sig, tp.mul(c.weight), c.live)
                    + rng.derive(k1, k2, c.slot) for c in children]
        for cro, crd, csig, ctp, clive, ck1, ck2 in virt:
            ctp = vec.where(clive, ctp, vec.full_like(csig, 0.0))
            acc = acc + node(cro, crd, csig, clive, ctp, ck1, ck2,
                             depth + 1)
        return acc

    return node(ro, rd, sig, live, tp, k1, k2, 0)


def tree_nodes(spec: SceneSpec) -> int:
    """Closest-hit rounds per lane in :func:`radiance_tree_v` (the DFS
    node count): ``sum_{d=0}^{max_depth+1} m^d``."""
    m = max(min(spec.max_live_children, spec.children_per_ray), 1)
    total, w = 0, 1
    for _ in range(spec.max_depth + 2):
        total += w
        w *= m
    return total


def _dfs_schedule(m: int, levels: int):
    """Static preorder schedule of the uniform m-ary virtual-child tree:
    (per-visit depth list, peak stack occupancy).  The tree SHAPE is
    lane-independent (liveness is masked, never structural), so the
    stack pointer and each visit's depth are compile-time constants —
    which is what lets :func:`radiance_tree_loop_v` run the whole DFS as
    one traced loop body."""
    depths = []

    def walk(d):
        depths.append(d)
        if d + 1 < levels:
            for _ in range(m):
                walk(d + 1)

    walk(0)
    sp, cap = 1, 1
    for d in depths:
        sp -= 1
        if d + 1 < levels:
            sp += m
            cap = max(cap, sp)
    return depths, cap


def tree_loop_stack(spec: SceneSpec):
    """(m, levels, node count, stack capacity) of the DFS loop.

    Closed form — NOT via :func:`_dfs_schedule`, which enumerates every
    node and would make ``megakernel.usable()`` (called per trace)
    O(m^levels): a uniform m-ary preorder pops 1 and pushes m at each
    interior node, so the peak along the leftmost spine is
    ``1 + (levels - 1) * (m - 1)``; node count is the geometric sum.
    Equality with the enumerated schedule is asserted in
    tests/test_tree.py::test_tree_loop_stack_closed_form.
    """
    m = max(min(spec.max_live_children, spec.children_per_ray), 1)
    levels = spec.max_depth + 2
    n_nodes = levels if m == 1 else (m ** levels - 1) // (m - 1)
    cap = 1 + (levels - 1) * (m - 1)
    return m, levels, n_nodes, cap


def radiance_tree_loop_v(data: SceneData, spec: SceneSpec, ro: V3, rd: V3,
                         k1, k2, significance=None,
                         depth_lookup=None, miss_records=None,
                         miss_slots: int = 0, overflow_out=None) -> V3:
    """Radiance for fan-out scenes as a stack-based DFS *loop* — the
    O(1)-code-size counterpart of :func:`radiance_tree_v`.

    The static DFS inlines one closest-hit + shade round per tree node,
    so its program size grows linearly with ``tree_nodes(spec)`` — a
    4-sample IndirectPhong scene at depth 4 is 1365 nodes, far past any
    reasonable compile budget.  Here the SAME per-node body (closest-hit
    → shade → route to m virtual children, exactly
    :func:`radiance_tree_v`'s) runs once inside a ``lax.fori_loop`` over
    the precomputed preorder schedule; pending siblings live on an
    explicit stack of lane blocks carried through the loop.  Because the
    tree is uniform and static, the per-visit depth and the stack
    pointer are schedule constants — ``shade`` takes the depth as a
    traced scalar and applies the depth cutoff (raytrace.rs:33)
    dynamically, and pushes are a ``lax.cond`` on interior visits.

    Work per lane is identical to :func:`radiance_tree_v` (same node
    set, same RNG stream identities via :func:`_route_children`); only
    the accumulation order differs (one running preorder sum instead of
    recursive subtree sums), so results agree to roundoff — except that
    a 1-ulp f32 difference (different XLA fusion boundaries) can flip a
    measure-zero discrete branch (hemisphere sign, shadow, grazing hit)
    on rare lanes, which in an MC estimator is just a different sample
    (measured: 2/512 lanes, mean radiance agreeing to 3e-5; f64 agrees
    to 8e-15 everywhere).

    ``depth_lookup`` maps the traced visit index to the node's depth;
    the default closes over the schedule as a jnp constant, while the
    Pallas megakernel supplies an SMEM-ref reader (captured array
    constants are not allowed in kernels).

    ``miss_records`` + ``miss_slots=K``: deferred-skybox accumulation.
    A lane can miss at SEVERAL tree nodes (once per live branch that
    dies by escaping), and the loop form cannot emit per-node records
    (n_nodes outputs would explode), so each lane keeps its first K
    miss events in K bounded slots — slot j takes a lane's j-th miss
    via a masked select over a per-lane miss counter — appended to
    ``miss_records`` as K ``(miss, rd, tp)`` tuples.  Zero-throughput
    misses are skipped (their background term is exactly 0), which is
    what keeps K small in practice.  Lanes whose miss count exceeds K
    set the mask appended to ``overflow_out``; the caller must
    recompute those lanes exactly (megakernel: a lax.cond fallback to
    this very function with inline backgrounds).
    """
    dtype = ro.x.dtype
    lane_shape = ro.x.shape
    m, levels, n_nodes, cap = tree_loop_stack(spec)
    if depth_lookup is None:
        depths, _ = _dfs_schedule(m, levels)
        depth_c = jnp.asarray(np.asarray(depths, np.int32)[:, None])
        depth_lookup = lambda i: depth_c[i, 0]  # noqa: E731

    sig0 = (jnp.ones_like(ro.x) if significance is None
            else jnp.broadcast_to(significance, lane_shape).astype(dtype))
    one = jnp.ones(lane_shape, dtype)
    zero = jnp.zeros(lane_shape, dtype)
    defer = miss_records is not None
    k_slots = miss_slots if defer else 0

    def st0(x):
        s = jnp.zeros((cap,) + lane_shape, x.dtype)
        return jax.lax.dynamic_update_index_in_dim(s, x, 0, 0)

    stack = tuple(st0(v) for v in tree_loop_entry(
        ro, rd, sig0, V3(one, one, one), one, k1, k2, dtype))
    acc = vec.full_like(zero, 0.0)
    # K miss slots, each (miss01, rdx, rdy, rdz, tpx, tpy, tpz), plus
    # the per-lane miss counter (f32 — see the i1 loop-carry note)
    slots0 = tuple(tuple(zero for _ in range(7)) for _ in range(k_slots))
    cnt0 = zero

    def body(i, carry):
        acc, sp, st, slots, cnt = carry
        sp = sp - 1
        pop = [jax.lax.dynamic_index_in_dim(s, sp, 0, keepdims=False)
               for s in st]
        depth = depth_lookup(i)
        if defer:
            contrib, virt, (miss, mrd, mtp) = tree_loop_node(
                data, spec, m, pop, depth, defer_bg=True)
            # zero-throughput misses contribute exactly 0 — don't
            # burn a slot on them
            eff = miss & ((jnp.abs(mtp.x) + jnp.abs(mtp.y)
                           + jnp.abs(mtp.z)) > 0)
            new_slots = []
            for j, sl in enumerate(slots):
                take = eff & (cnt == float(j))
                new_slots.append((
                    jnp.where(take, 1.0, sl[0]),
                    jnp.where(take, mrd.x, sl[1]),
                    jnp.where(take, mrd.y, sl[2]),
                    jnp.where(take, mrd.z, sl[3]),
                    jnp.where(take, mtp.x, sl[4]),
                    jnp.where(take, mtp.y, sl[5]),
                    jnp.where(take, mtp.z, sl[6])))
            slots = tuple(new_slots)
            cnt = cnt + jnp.where(eff, 1.0, 0.0)
        else:
            contrib, virt = tree_loop_node(data, spec, m, pop, depth)
        acc2 = acc + contrib

        def push(st):
            # child j lands at sp + (m-1-j): popped in preorder
            for j, entry in enumerate(virt):
                idx = sp + (m - 1 - j)
                st = tuple(
                    jax.lax.dynamic_update_index_in_dim(s, v, idx, 0)
                    for s, v in zip(st, entry))
            return st, sp + m

        interior = depth < levels - 1
        st, sp = jax.lax.cond(interior, push, lambda st: (st, sp), st)
        return acc2, sp, st, slots, cnt

    acc, _, _, slots, cnt = jax.lax.fori_loop(
        0, n_nodes, body, (acc, jnp.int32(1), stack, slots0, cnt0))
    if defer:
        for sl in slots:
            miss_records.append((sl[0] > 0.5, V3(sl[1], sl[2], sl[3]),
                                 V3(sl[4], sl[5], sl[6])))
        if overflow_out is not None:
            overflow_out.append(cnt > float(k_slots))
    return acc


def tree_loop_entry(ro: V3, rd: V3, sig, tp: V3, live01, k1, k2, dtype):
    """Pack one DFS stack entry as the 13-component tuple shared by the
    jnp carry driver and the megakernel's scratch-ref driver: rox..z,
    rdx..z, sig, tpx..z, live (0/1 in compute dtype), k1, k2."""
    return (ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, sig, tp.x, tp.y, tp.z,
            live01.astype(dtype),
            k1.astype(jnp.uint32), k2.astype(jnp.uint32))


def tree_loop_node(data: SceneData, spec: SceneSpec, m: int, entry,
                   depth, defer_bg: bool = False):
    """One DFS node visit — the shared body of the two tree-loop
    drivers.  ``entry`` is a popped 13-tuple (:func:`tree_loop_entry`);
    ``depth`` is a traced scalar.  Returns ``(contrib: V3, virt)`` where
    ``virt`` is a list of m packed child entries (dead children carry
    live = 0 and zero throughput).

    ``defer_bg``: miss lanes contribute 0 and the return gains a third
    element ``(miss: bool, rd: V3, tp: V3)`` — this visit's background
    event, for the K-slot deferred-skybox accumulation of the loop
    drivers (the in-kernel bilinear gather is impossible; see
    :func:`radiance_linear_v`)."""
    dtype = entry[0].dtype
    ro = V3(entry[0], entry[1], entry[2])
    rd = V3(entry[3], entry[4], entry[5])
    sig = entry[6]
    tp = V3(entry[7], entry[8], entry[9])
    live = entry[10] > 0.5
    k1, k2 = entry[11], entry[12]

    hit = closest_hit(data, spec, ro, rd)
    emit, children = shade(data, spec, ro, rd, hit, sig, live, k1, k2,
                           depth)
    if defer_bg:
        miss = live & ~hit.hit
        miss_info = (miss, rd, vec.where(miss, tp,
                                         vec.full_like(sig, 0.0)))
        local = vec.where(hit.hit, emit, vec.full_like(sig, 0.0))
    else:
        bg = background_color_v(data, spec, rd)
        local = vec.where(hit.hit, emit, bg)
    contrib = vec.where(live, tp.mul(local), vec.full_like(sig, 0.0))

    if len(children) > m:
        virt = _route_children(children, m, tp, k1, k2)
    else:
        virt = [(c.ro, c.rd, c.sig, tp.mul(c.weight), c.live)
                + rng.derive(k1, k2, c.slot) for c in children]
    packed = []
    for cro, crd, csig, ctp, clive, ck1, ck2 in virt:
        ctp = vec.where(clive, ctp, vec.full_like(csig, 0.0))
        packed.append(tree_loop_entry(
            cro, crd, csig, ctp, jnp.where(clive, 1.0, 0.0).astype(dtype),
            ck1, ck2, dtype))
    if defer_bg:
        return contrib, packed, miss_info
    return contrib, packed


def radiance_v(data: SceneData, spec: SceneSpec, ro: V3, rd: V3, k1, k2,
               significance=None) -> V3:
    """Radiance for a batch of primary rays — ``ray_color`` for a
    wavefront (raytrace.rs:261-267), component layout.

    ro/rd: V3 of (N,) lanes; k1/k2: (N,) per-lane RNG streams;
    significance: initial per-ray significance (default 1.0, main.rs:54).
    Returns V3 of (N,) linear radiance components.
    """
    if spec.children_per_ray <= 1:
        return radiance_linear_v(data, spec, ro, rd, k1, k2, significance)
    n = ro.x.shape[0]
    dtype = ro.x.dtype
    sig = (jnp.ones(n, dtype) if significance is None
           else jnp.broadcast_to(significance, (n,)).astype(dtype))
    live = jnp.ones(n, bool)
    tp = vec.full_like(sig, 1.0)
    acc = vec.full_like(sig, 0.0)

    for depth in range(spec.max_depth + 2):
        hit = closest_hit(data, spec, ro, rd)
        emit, children = shade(data, spec, ro, rd, hit, sig, live, k1, k2,
                               depth)
        bg = background_color_v(data, spec, rd)
        local = vec.where(hit.hit, emit, bg)
        contrib = vec.where(live, tp.mul(local), vec.full_like(sig, 0.0))
        # sum this level's lanes back onto the primary-ray axis
        acc = V3(acc.x + contrib.x.reshape(n, -1).sum(axis=1),
                 acc.y + contrib.y.reshape(n, -1).sum(axis=1),
                 acc.z + contrib.z.reshape(n, -1).sum(axis=1))

        if not children:
            break
        # flatten child slots: (N_level, B, ...) -> (N_level * B, ...)
        ro = V3(*(_flatten_slots([c.ro[i] for c in children])
                  for i in range(3)))
        rd = V3(*(_flatten_slots([c.rd[i] for c in children])
                  for i in range(3)))
        sig = _flatten_slots([c.sig for c in children])
        live_n = _flatten_slots([c.live for c in children])
        tp_children = [tp.mul(c.weight) for c in children]
        tp = V3(*(_flatten_slots([t[i] for t in tp_children])
                  for i in range(3)))
        live = live_n
        tp = vec.where(live, tp, vec.full_like(sig, 0.0))
        ks = [rng.derive(k1, k2, c.slot) for c in children]
        k1 = _flatten_slots([k[0] for k in ks])
        k2 = _flatten_slots([k[1] for k in ks])

        b, m = len(children), spec.max_live_children
        if 0 < m < b and not os.environ.get("RAYTRACE_TPU_NO_COMPACTION"):
            live, ro, rd, sig, tp, k1, k2 = _compact_children(
                b, m, live, ro, rd, sig, tp, k1, k2)

    return acc


def radiance(data: SceneData, spec: SceneSpec, ro, rd, k1, k2,
             significance=None) -> jnp.ndarray:
    """(N,3)-layout wrapper around :func:`radiance_v`."""
    out = radiance_v(data, spec, vec.splat(ro), vec.splat(rd), k1, k2,
                     significance)
    return vec.pack(out)


@annotate("raygen")
def primary_rays(data: SceneData, spec: SceneSpec, pix, piy, aa, cam,
                 seed: int):
    """Jittered primary rays for per-lane (pixel-x, pixel-y, aa-sample,
    lens-sample) integer identity arrays — the NDC transform of
    main.rs:39-53 plus the camera projection, shape-agnostic (used on 1D
    lane vectors by :func:`sample_pixels` and on 2D register blocks by
    the Pallas megakernel).

    Returns ``(ro: V3, rd: V3, k1, k2)`` where k1/k2 are the per-lane
    RNG streams (the lens index already folded in).
    """
    dtype = data.prim_p.dtype

    pix = pix.astype(jnp.uint32)
    piy = piy.astype(jnp.uint32)
    aa = aa.astype(jnp.uint32)
    cam = cam.astype(jnp.uint32)

    # jitter streams keyed by (x, y, aa) only — shared across lens samples
    jk1, jk2 = rng.make_keys(seed, pix, piy, aa)
    u = rng.draw(jk1, jk2, rng.PURPOSE_AA_X, dtype)
    v = rng.draw(jk1, jk2, rng.PURPOSE_AA_Y, dtype)

    # NDC transform (main.rs:39-53): unit square inscribed in the image
    halfw = spec.width / 2.0
    halfh = spec.height / 2.0
    scale = max(1.0 / halfw, 1.0 / halfh)
    pos_x = ((rng.to_float(pix, dtype) + u) - halfw) * scale
    pos_y = ((rng.to_float(piy, dtype) + v) - halfh) * scale

    # full per-lane streams fold in the lens sample index
    k1, k2 = rng.make_keys(seed, pix, piy, aa, cam)
    ro, rd = project(data, spec, pos_x, pos_y, k1, k2)
    return ro, rd, k1, k2


def sample_pixels(data: SceneData, spec: SceneSpec, px, py, sample_ids,
                  seed: int) -> jnp.ndarray:
    """Render a set of samples for a batch of pixels — the TPU-native
    driver loop body (main.rs:45-55 × raytrace.rs:270-276).

    px/py: (P,) integer pixel coordinates (x from the left, y from the
    *bottom*, matching the BMP bottom-up row order the reference streams,
    main.rs:45-58); sample_ids: (S,) integer antialias sample indices in
    [0, antialias).  Returns the (P, 3) *mean* radiance over the S
    samples and the camera's lens samples.

    The AA jitter is drawn per (pixel, aa-sample) (main.rs:50-53); the
    camera's own ``samples()`` lens loop (raytrace.rs:272-275) adds an
    inner axis of ``spec.cam_samples`` lens draws per AA sample.
    """
    dtype = data.prim_p.dtype
    p, s = px.shape[0], sample_ids.shape[0]
    c = spec.cam_samples

    # lane axis = (pixel, aa_sample, cam_sample), flattened
    pix = jnp.repeat(px, s * c)
    piy = jnp.repeat(py, s * c)
    aa = jnp.tile(jnp.repeat(sample_ids, c), p)
    cam = jnp.tile(jnp.arange(c, dtype=jnp.uint32), p * s)

    from raytrace_tpu.render import megakernel
    # traced seeds (per-step optimizer reseeding) can't parameterize the
    # kernel's closure; they take the jnp path
    if isinstance(seed, (int, np.integer)) and megakernel.usable(data, spec):
        rad = megakernel.radiance_lanes(data, spec, pix, piy, aa, cam, seed)
    else:
        ro, rd, k1, k2 = primary_rays(data, spec, pix, piy, aa, cam, seed)
        rad = radiance_v(data, spec, ro, rd, k1, k2)
    out = V3(rad.x.reshape(p, s * c).mean(axis=1),
             rad.y.reshape(p, s * c).mean(axis=1),
             rad.z.reshape(p, s * c).mean(axis=1))
    return vec.pack(out)


@partial(jax.jit, static_argnames=("spec", "seed"))
def _render_tile(data, spec, px, py, sample_ids, seed):
    return sample_pixels(data, spec, px, py, sample_ids, seed)


@partial(jax.jit, static_argnames=("spec", "seed", "s_launch", "n_chunks",
                                   "p_launch"))
def _render_chunks(data, spec, px, py, s0, s_launch, n_chunks, seed,
                   p_launch):
    """``n_chunks`` sample chunks x all pixel tiles, accumulated ON
    DEVICE in one launch.

    The naive host loop fetches every (pixel-tile, sample-chunk)
    launch's output — through a remote-device link whose round trips
    dominate wall-clock ~100x over the render itself (measured: 134s
    vs ~1.3s of device time for the full golden workload; 360s for a
    branching-4 scene whose lane budget forces tiny pixel tiles).
    Here both loops are ``fori_loop``s inside one jit: the outer loop
    walks ``p_launch``-pixel tiles (the lane-budget knob), the inner
    loop walks sample chunks; only the final (P, 3) mean crosses the
    link.
    """
    dtype = data.prim_p.dtype
    n = px.shape[0]
    p_launch = min(p_launch, n)
    pad = (-n) % p_launch
    if pad:
        px = jnp.concatenate([px, jnp.zeros(pad, px.dtype)])
        py = jnp.concatenate([py, jnp.zeros(pad, py.dtype)])
    n_tiles = (n + pad) // p_launch

    # seed carries from px so they inherit px's vma (inside shard_map
    # the outputs vary over the mesh; a replicated zeros init would
    # make the fori_loop carry types mismatch)
    def vzeros(p):
        return (p * 0).astype(dtype)[:, None] + jnp.zeros((1, 3), dtype)

    def tile_body(tidx, acc):
        off = tidx * p_launch
        pxt = jax.lax.dynamic_slice(px, (off,), (p_launch,))
        pyt = jax.lax.dynamic_slice(py, (off,), (p_launch,))

        def chunk_body(i, tacc):
            sids = (s0 + i * s_launch
                    + jnp.arange(s_launch, dtype=jnp.uint32))
            return tacc + sample_pixels(data, spec, pxt, pyt, sids, seed)

        t = jax.lax.fori_loop(0, n_chunks, chunk_body, vzeros(pxt))
        return jax.lax.dynamic_update_slice(acc, t / n_chunks, (off, 0))

    out = jax.lax.fori_loop(0, n_tiles, tile_body, vzeros(px))
    return out[:n]


def _wavefront_widest(spec: SceneSpec) -> int:
    """Widest wavefront level in lanes-per-primary-sample: each level
    expands to B slots, then compaction (if enabled and useful) shrinks
    to m live lanes before the next level."""
    b = max(spec.children_per_ray, 1)
    m = max(spec.max_live_children, 1)
    if m >= b or os.environ.get("RAYTRACE_TPU_NO_COMPACTION"):
        return b ** (spec.max_depth + 1)
    return b * m ** spec.max_depth


def _lane_width(data: SceneData, spec: SceneSpec) -> int:
    """Peak device arrays per primary-sample lane.  The Pallas megakernel
    never widens the lane axis (fan-out runs as a register DFS,
    radiance_tree_v), so a launch costs O(1) memory per lane; the jnp
    wavefront materializes the widest level.  Sizing launches by the
    wavefront width when the kernel is active starves the device with
    tiny launches (measured: 64x-undersized launches made a branching-4
    render 100% tunnel-latency-bound)."""
    from raytrace_tpu.render import megakernel
    if megakernel.usable(data, spec):
        return 1
    return _wavefront_widest(spec)


def _s_p_launch(spec: SceneSpec, aa: int, max_lanes: int, widest: int = 1):
    """Pick (samples, pixels) per launch so the wavefront's widest level
    stays within the device lane budget — and *fills* that budget: TPU
    throughput rises ~3.5x from 262k to 2M lanes per launch, so small
    images take more samples per launch."""
    lane_budget = max(max_lanes // (widest * spec.cam_samples), 1)
    n_pix = spec.width * spec.height
    if n_pix <= lane_budget:
        p_launch = n_pix
        s_launch = min(aa, max(lane_budget // n_pix, 1))
    else:
        p_launch = lane_budget
        s_launch = 1
    return s_launch, p_launch


# runtime failures worth re-issuing a pure launch for
_TRANSIENT_ERRORS = (getattr(jax.errors, "JaxRuntimeError", RuntimeError),)
# deterministic XLA statuses that a retry cannot fix: re-raise at once
# (an OOM retry even actively hurts — it thrashes the allocator)
_PERMANENT_MARKERS = ("RESOURCE_EXHAUSTED", "RESOURCE EXHAUSTED",
                      "INVALID_ARGUMENT", "INVALID ARGUMENT",
                      "OUT_OF_RANGE", "UNIMPLEMENTED", "FAILED_PRECONDITION",
                      "out of memory", "Out of memory")


def _is_transient(err: BaseException) -> bool:
    """Whether a JaxRuntimeError is plausibly transient (dropped device
    tunnel, worker deadline, preemption) rather than a deterministic
    failure.  JaxRuntimeError carries the XLA status in its message;
    anything matching a permanent status class is NOT retried."""
    msg = str(err)
    return not any(m in msg for m in _PERMANENT_MARKERS)


def _retry_launch(fn, *args, retries: int = 2):
    """Run a device launch, retrying on transient runtime failures.

    Every render launch is a pure function of (scene, pixel/sample
    identity arrays) — idempotent by construction — so a launch killed
    by a dropped device tunnel or a worker deadline is safely re-issued
    (SURVEY.md §5.3: tile-level retry; the reference's closest analog
    is its valid-prefix row streaming, main.rs:56-58).  Only transient
    runtime errors are retried (``_is_transient``); programming errors
    and deterministic XLA failures (OOM, invalid argument) propagate
    immediately.  ``block_until_ready`` inside the guarded region
    surfaces async device failures here rather than at the later host
    fetch.
    """
    import sys
    import time as _time

    for attempt in range(retries + 1):
        try:
            return jax.block_until_ready(fn(*args))
        except _TRANSIENT_ERRORS as e:
            if attempt == retries or not _is_transient(e):
                raise
            print(f"[raytrace_tpu] launch failed (attempt {attempt + 1}/"
                  f"{retries + 1}); retrying", file=sys.stderr)
            _time.sleep(0.5 * (attempt + 1))


def _save_checkpoint(path: str, **arrays) -> None:
    """Atomic checkpoint write: temp file + ``os.replace`` so a kill
    mid-write never corrupts the resume state the feature exists to
    protect (SURVEY.md §5.3-5.4; the reference's analog is its
    valid-prefix row streaming, main.rs:56-58)."""
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    # np.savez appends .npz when the name has no extension
    if not os.path.exists(tmp) and os.path.exists(tmp + ".npz"):
        tmp = tmp + ".npz"
    os.replace(tmp, path)


def _image_loop(scene: Scene, launch, *, seed: int, spp: int | None,
                max_lanes: int, progress, checkpoint: str | None,
                launch_chunks=None, chunk_group: int = 32,
                lane_width: int | None = None) -> np.ndarray:
    """Host tiling loop shared by single-device and sharded rendering.

    Outer loop over AA-sample chunks, inner loop over pixel tiles; the
    f64 host accumulator is checkpointed to ``checkpoint`` (npz) after
    every completed sample chunk, so a killed long render resumes at the
    last chunk boundary — the TPU-native analog of the reference's
    valid-prefix row streaming (main.rs:56-58; SURVEY.md §5.4).

    ``progress``: called with one float, the completed fraction in
    [0, 1] (samples fully accumulated plus the in-flight chunk's pixel
    share).
    """
    data, spec = scene.data, scene.spec
    w, h = spec.width, spec.height
    aa = spp if spp is not None else max(spec.antialias, 1)
    # ``lane_width``: callers whose launch path disables the megakernel
    # at trace time (object-sharded ring rendering: ppermute cannot run
    # inside the kernel) must size launches for the jnp wavefront —
    # _lane_width evaluated here, outside the ring context, would
    # return 1 and overshoot the device lane budget by the wavefront's
    # widest-level factor.
    s_launch, p_launch = _s_p_launch(
        spec, aa, max_lanes,
        lane_width if lane_width is not None else _lane_width(data, spec))

    image = np.zeros((h * w, 3), np.float64)
    s_done = 0
    if checkpoint is not None and os.path.exists(checkpoint):
        ck = np.load(checkpoint)
        ident = (ck["width"] == w and ck["height"] == h
                 and ck["aa"] == aa and ck["seed"] == seed)
        if ident:
            image = ck["image"]
            s_done = int(ck["s_done"])
        else:
            raise ValueError(
                f"checkpoint {checkpoint} was written for a different "
                f"render config; refusing to mix")

    pix = np.arange(h * w, dtype=np.uint32)
    px_all, py_all = pix % w, pix // w

    if launch_chunks is not None:
        # accumulate (pixel tile x sample chunk) launches on device,
        # fetching only once per group of chunks.  The group size is
        # bounded by a per-launch WORK budget in lane-levels — a single
        # XLA execution that runs for minutes can trip device worker
        # deadlines, so heavy fan-out scenes take smaller groups.
        work_per_chunk = (h * w * s_launch * spec.cam_samples
                          * _wavefront_widest(spec))
        budget = 1 << 28
        g_cap = max(min(chunk_group, budget // max(work_per_chunk, 1)), 1)
        px_d, py_d = jnp.asarray(px_all), jnp.asarray(py_all)
        s0 = s_done
        while s0 < aa:
            rem = aa - s0
            if rem >= s_launch:
                g, sl = min(g_cap, rem // s_launch), s_launch
            else:
                g, sl = 1, rem          # ragged tail chunk
            n_s = g * sl
            out = _retry_launch(launch_chunks, data, spec, px_d, py_d,
                                jnp.uint32(s0), sl, g, seed, p_launch)
            image += np.asarray(out, np.float64) * (n_s / aa)
            s0 += n_s
            if progress is not None:
                progress(s0 / aa)
            if checkpoint is not None:
                _save_checkpoint(checkpoint, image=image, s_done=s0,
                                 width=w, height=h, aa=aa, seed=seed)
        return image.reshape(h, w, 3)

    for s0 in range(s_done, aa, s_launch):
        sids = jnp.arange(s0, min(s0 + s_launch, aa), dtype=jnp.uint32)
        s_weight = len(sids) / aa
        for p0 in range(0, h * w, p_launch):
            sl = slice(p0, min(p0 + p_launch, h * w))
            out = _retry_launch(launch, data, spec, jnp.asarray(px_all[sl]),
                                jnp.asarray(py_all[sl]), sids, seed)
            image[sl] += np.asarray(out, np.float64) * s_weight
            if progress is not None:
                # fully-done samples + the in-flight chunk's pixel share
                progress((s0 + len(sids) * sl.stop / (h * w)) / aa)
        if checkpoint is not None:
            _save_checkpoint(checkpoint, image=image, s_done=s0 + len(sids),
                             width=w, height=h, aa=aa, seed=seed)
    return image.reshape(h, w, 3)


def render_image(scene: Scene, *, seed: int = 0, spp: int | None = None,
                 max_lanes: int = 1 << 22, progress=None,
                 checkpoint: str | None = None) -> np.ndarray:
    """Render the full image on one device: host tiling loop around the
    jitted per-tile sampler.  Returns an (H, W, 3) float array of linear
    radiance, row 0 = *bottom* row (BMP order).

    ``spp`` overrides the scene's antialias count.  ``max_lanes`` bounds
    device memory (see :func:`_s_p_launch`); ``checkpoint`` enables
    chunk-level resume.
    """
    def launch(data, spec, px, py, sids, seed):
        return _render_tile(data, spec, px, py, sids, seed)

    return _image_loop(scene, launch, seed=seed, spp=spp,
                       max_lanes=max_lanes, progress=progress,
                       checkpoint=checkpoint, launch_chunks=_render_chunks)
