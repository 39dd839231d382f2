"""Compile-cost bisect for the LARGE-scene fused megakernel on TPU.

The r4 large regime (ops/intersect_inline.py) compiles a chunk fold +
material pass inside the megakernel; this script times each composition
stage separately so a blowup can be attributed: (a) the bare inline
fold in a minimal kernel, (b) fold + material pass, (c) the full
megakernel in loop form.  Run manually:
    python tools/large_kernel_bisect.py [n_spheres]

Diagnosis it produced (r4): the "pathological compile" was not compile
COST at all — Mosaic cannot legalize bool (i1) vector loop-carries
(``scf.for`` over ``vector<8x128xi1>`` fails), which the fold's ``hit``
carry and radiance_linear_loop_v's ``live`` carry both were.  With the
carries int/float-ified (intersect_inline._fold_chunk,
integrator.radiance_linear_loop_v) all three stages compile in 2-5 s.
Keep this harness for future regressions.

Each stage prints compile + run time; do NOT kill mid-compile (a killed
remote compile can wedge the device tunnel for minutes — observed r4).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from raytrace_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from functools import partial  # noqa: E402

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from raytrace_tpu.ops import intersect_inline as ii  # noqa: E402
from raytrace_tpu.ops import intersect_pallas as ip  # noqa: E402
from raytrace_tpu.ops.intersect import (_packed_tables,  # noqa: E402
                                        packed_object_table)
from raytrace_tpu.ops.vec import V3  # noqa: E402
from raytrace_tpu.scene.procedural import make_sphere_field  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200
R, L = 32, 128


def stage(name, fn, *args):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    t1 = time.time()
    jax.block_until_ready(fn(*args))
    t2 = time.time()
    print(f"[{name}] compile+first {t1 - t0:.1f}s  second {t2 - t1:.3f}s",
          flush=True)
    return out


def main():
    sc = make_sphere_field(N, mix_materials=False)
    data, spec = sc.data, sc.spec
    table, n_sph_pad, idmap = _packed_tables(data, spec)
    ck = ip._OBJ_CHUNK
    n_chunks = table.shape[0] // ck
    bounds = ip._chunk_bounds(table, n_sph_pad, n_chunks)
    mat = packed_object_table(data, spec)
    mat_rows = jnp.take(mat, jnp.maximum(idmap, 0), axis=0)
    ids2 = idmap.reshape(n_chunks, ck)
    ranges = ii.chunk_id_ranges(idmap, ck)
    meta = dict(chunk=ck, n_sph_chunks=n_sph_pad // ck,
                n_chunks=n_chunks, cull=True)
    print(f"{N} spheres -> {table.shape[0]} rows, {n_chunks} chunks",
          flush=True)

    lane = pl.BlockSpec((R, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((R, L), jnp.float32)

    rng = np.random.RandomState(0)
    ro = [jnp.asarray(rng.rand(R, L) * 2 + v, jnp.float32)
          for v in (0.0, 4.0, 28.0)]
    rd = [jnp.asarray(rng.randn(R, L), jnp.float32) for _ in range(3)]

    # (a) bare fold
    def k_fold(tab, ids, rngs, bnd, rox, roy, roz, rdx, rdy, rdz, t_o,
               o_o, h_o):
        ctx = ii.InlineCtx(tab_ref=tab, mat_ref=None, ids_ref=ids,
                           rng_ref=rngs, bnd_ref=bnd, **meta)
        t, o, _, h = ii.inline_fold(ctx, V3(rox[...], roy[...], roz[...]),
                                    V3(rdx[...], rdy[...], rdz[...]))
        t_o[...] = t
        o_o[...] = o
        h_o[...] = h.astype(jnp.int32)

    import os
    interp = os.environ.get("RAYTRACE_TPU_MEGAKERNEL_INTERPRET", "") \
        not in ("", "0")
    fold = pl.pallas_call(
        k_fold, grid=(1,),
        in_specs=[vmem, smem, smem, smem] + [lane] * 6,
        out_specs=(lane,) * 3,
        out_shape=(shp, jax.ShapeDtypeStruct((R, L), jnp.int32),
                   jax.ShapeDtypeStruct((R, L), jnp.int32)),
        interpret=interp)
    t, o, h = stage("a: fold", jax.jit(fold), table, ids2, ranges,
                    bounds, *ro, *rd)
    print("   hits:", int(np.asarray(h).sum()), flush=True)

    # (b) fold + material pass (full inline closest hit)
    def k_hit(tab, matr, ids, rngs, bnd, rox, roy, roz, rdx, rdy, rdz,
              t_o, d_o):
        ctx = ii.InlineCtx(tab, matr, ids, rngs, bnd, **meta)
        hit = ii.inline_closest_hit(
            ctx, V3(rox[...], roy[...], roz[...]),
            V3(rdx[...], rdy[...], rdz[...]))
        t_o[...] = hit.t
        d_o[...] = hit.diffuse.x + hit.normal.x

    hitk = pl.pallas_call(
        k_hit, grid=(1,),
        in_specs=[vmem, vmem, smem, smem, smem] + [lane] * 6,
        out_specs=(lane,) * 2, out_shape=(shp, shp), interpret=interp)
    stage("b: closest_hit", jax.jit(hitk), table, mat_rows, ids2,
          ranges, bounds, *ro, *rd)

    # (c) full megakernel (loop-form linear chain)
    from raytrace_tpu.render import megakernel
    from raytrace_tpu.render.integrator import sample_pixels

    assert megakernel.usable(data, spec)
    pix = np.arange(1 << 14, dtype=np.uint32)
    px = jnp.asarray(pix % spec.width)
    py = jnp.asarray(pix // spec.width)
    sids = jnp.arange(4, dtype=jnp.uint32)
    full = jax.jit(lambda px, py: sample_pixels(data, spec, px, py,
                                                sids, 0))
    out = stage("c: megakernel", full, px, py)
    print("   mean:", float(np.asarray(out).mean()), flush=True)


if __name__ == "__main__":
    main()
