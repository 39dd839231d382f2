"""Per-regime throughput + exact op count + VPU-utilization report.

The roofline/MFU backing for PERF.md (VERDICT r2 #1): for each render
regime, measures the marginal launch time (multi-k least-squares chain
slope, bench.py methodology) and counts the *exact* elementwise VPU ops
of the traced per-lane program (tools/flops.py walks the jaxpr of the
same Python functions the Pallas kernel traces), then reports

    achieved op/s = ops_per_lane x lanes/s
    VPU utilization = achieved / VPU issue ceiling

v5e VPU issue ceiling: 8 sublanes x 128 lanes x 4 ALUs x 1.74 GHz
= 7.13e12 op/s (one op per ALU slot per cycle; transcendentals, div and
rsqrt occupy MULTIPLE slots and every op here is counted as 1, so the
reported utilization is a lower bound on real issue-slot occupancy).
The MXU is idle by design — the hot ops are 3-vector arithmetic, not
matmuls — so the VPU ceiling, not the 197 Tflop/s bf16 MXU number, is
the meaningful "peak" for this workload.  HBM roofline: the megakernel
moves 16 B/lane in + 12 B/lane out; at measured lane rates that is <5%
of the 819 GB/s v5e HBM bandwidth => all regimes are compute-bound and
the VPU is the only binding roof.

Regimes (run each in its own process — the megakernel gate reads env):
  linear  golden scene, fused megakernel (fan-out <= 1)
  tree    materials_showcase (fan-out 4 -> m=2, 63-node static DFS)
  jnp     golden scene with RAYTRACE_TPU_NO_MEGAKERNEL=1 (XLA wavefront)
  scan    4096-sphere field, SPLIT path (Pallas scan-intersect kernel +
          jnp wavefront shading; megakernel gate forced off)
  large   4096-sphere field, FUSED path (megakernel with the in-kernel
          VMEM-table fold, the r4 default for large linear scenes)

Usage: python tools/mfu_report.py <regime>   (on the real TPU)
"""

import dataclasses
import json
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = os.environ.get("RAYTRACE_TPU_REFERENCE_DIR", "/root/reference")
VPU_PEAK = 8 * 128 * 4 * 1.74e9      # v5e issue slots/s


def measure(regime: str):
    import jax
    import jax.numpy as jnp
    from raytrace_tpu.scene.builder import load_scene_file
    from raytrace_tpu.scene.procedural import make_sphere_field
    from raytrace_tpu.render.integrator import sample_pixels, tree_nodes
    from raytrace_tpu.utils.cache import enable_compile_cache
    from tools.flops import count_jaxpr

    enable_compile_cache()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    if regime in ("jnp", "scan"):
        # scan = the SPLIT fallback (Pallas scan-intersect kernel + jnp
        # wavefront shading).  Since r4 the fused megakernel covers
        # large linear scenes too, so isolating the split path needs
        # the gate forced off (the `large` regime measures the fused
        # in-kernel fold on the same scene).
        os.environ["RAYTRACE_TPU_NO_MEGAKERNEL"] = "1"

    if regime in ("linear", "jnp"):
        sc = load_scene_file(os.path.join(REFERENCE_DIR, "test_scene.txt"),
                             dtype=jnp.float32)
        spec = dataclasses.replace(sc.spec, width=1024, height=1024)
        n_pix, n_s = 1 << 17, 16
    elif regime == "tree":
        sc = load_scene_file(
            os.path.join(repo, "examples", "materials_showcase.txt"),
            dtype=jnp.float32)
        spec = sc.spec
        n_pix, n_s = 1 << 15, 4       # 63 intersect rounds/lane
    elif regime in ("scan", "large"):
        # mix_materials=False keeps the wavefront linear (6 rounds), so
        # the measurement isolates the intersector (scan kernel for
        # `scan`, in-kernel VMEM-table fold for `large`) instead of
        # compounding it with the fan-out tree walk
        sc = make_sphere_field(4096, mix_materials=False,
                               dtype=jnp.float32)
        spec = sc.spec
        n_pix, n_s = 1 << 15, 4
    else:
        raise SystemExit(f"unknown regime {regime}")
    data = sc.data

    # rounds of closest-hit per lane
    rounds = (tree_nodes(spec) if spec.children_per_ray > 1
              else spec.max_depth + 2)

    pix = np.arange(n_pix, dtype=np.uint32)
    px = jnp.asarray(pix % spec.width)
    py = jnp.asarray((pix // spec.width) % spec.height)
    sids = jnp.arange(n_s, dtype=jnp.uint32)
    lanes = n_pix * n_s * spec.cam_samples

    @partial(jax.jit, static_argnames=("k",))
    def chain(px, py, k):
        def body(i, acc):
            o = sample_pixels(data, spec, (px + i) % spec.width, py,
                              sids, 0)
            return acc + jnp.sum(o)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    # THE measurement methodology lives in bench._measure_slope — one
    # source of truth for bench + audit tools (review finding r3)
    from bench import _measure_slope
    ks = (2, 4, 8) if regime in ("tree", "scan", "large") else (4, 16, 64)
    slope, icpt, _ = _measure_slope(chain, px, py, ks=ks)

    # exact ops/lane of the same traced program (megakernel = same trace).
    # scan/large regimes: count the lax.scan twin of the scan kernel
    # (its per-chunk body computes ONE shape branch where the twin
    # computes both, so the kernel's true count is lower — utilization
    # reported from this count is an upper bound for those regimes)
    if regime in ("scan", "large"):
        os.environ["RAYTRACE_TPU_NO_INTERSECT_KERNEL"] = "1"
    ids = jnp.zeros(256, jnp.uint32)
    from raytrace_tpu.render.megakernel import _jnp_reference
    jaxpr = jax.make_jaxpr(
        lambda d: _jnp_reference(d, spec, ids, ids, ids, ids, 0))(data)
    ops_lane = sum(count_jaxpr(jaxpr.jaxpr).values()) / 256
    if regime in ("scan", "large"):
        del os.environ["RAYTRACE_TPU_NO_INTERSECT_KERNEL"]

    lanes_per_s = lanes / slope
    achieved = ops_lane * lanes_per_s
    n_live = sum(1 for t in spec.shape_type if t >= 0)
    print(json.dumps({
        "regime": regime,
        "lanes_per_launch": lanes,
        "launch_ms": round(float(slope) * 1e3, 3),
        "fixed_overhead_ms": round(float(icpt) * 1e3, 1),
        "intersect_rounds_per_lane": rounds,
        "rays_per_sec": round(lanes_per_s * rounds),
        "ray_obj_tests_per_sec": round(lanes_per_s * rounds * n_live),
        "n_objects": n_live,
        "ops_per_lane": round(float(ops_lane), 1),
        "achieved_Top_per_s": round(achieved / 1e12, 3),
        "vpu_util_pct": round(100 * achieved / VPU_PEAK, 1),
        "hbm_GBps": round(28 * lanes_per_s / 1e9, 2),
    }))


if __name__ == "__main__":
    measure(sys.argv[1] if len(sys.argv) > 1 else "linear")
