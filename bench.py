"""Benchmark harness: rays/sec/chip on the BASELINE workload.

Metric (BASELINE.json): rays/sec/chip at 1024^2, depth-4 bounces — one
"ray" = one scene-intersection round of a wavefront lane (the golden
scene traces max_depth+2 = 6 per primary sample, BASELINE.md).

Measurement methodology: the launch loop runs *inside* jit as a
``lax.fori_loop`` whose body input varies per iteration and whose
output feeds a scalar sum fetched at the end — so every launch really
executes on device, in order, with no host round-trips.  Throughput is
the **least-squares slope of median chain time over several chain
lengths** (k = 4, 16, 64), which cancels the fixed dispatch + transfer
+ fetch overhead (timing individual async dispatches through a remote-
device tunnel is unreliable: result caching and lazy queues both
inflate numbers).  A two-point difference (the r2 method) is fragile —
tens of ms of tunnel-latency drift between the two chain lengths moved
the reported number by 2.4x (13.97G vs the true 5.9G, VERDICT r2 #1);
the multi-k fit is robust to that (measured residuals <2% of slope;
see tools/perf_audit.py and PERF.md "Measurement methodology").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured against the reference's own workload ground
truth: the reference publishes no numbers (BASELINE.md), so the anchor
is REF_CPU_RAYS_PER_SEC, the rust binary's estimated single-thread
throughput (see BASELINE.md §"de novo"); update it if re-measured.
"""

import dataclasses
import json
import os
import sys
import time
from functools import partial

import numpy as np

# upstream reference snapshot (the golden workload's scene file)
REFERENCE_DIR = os.environ.get("RAYTRACE_TPU_REFERENCE_DIR",
                               "/root/reference")

# Anchor: the reference Rust binary is single-thread scalar f64.  Rust
# is unavailable in this image, so the anchor was MEASURED with a
# faithful C++ stand-in (native/ref_anchor.cpp: same recursion, same
# golden-scene math per bounce, same xorshift128 RNG; g++ -O2
# -march=native, this machine's CPU): 8.51M scene-intersections/sec,
# radiance mean cross-checked against this renderer (0.433 vs 0.441).
REF_CPU_RAYS_PER_SEC = 8.5e6


def main():
    import jax
    import jax.numpy as jnp
    from raytrace_tpu.scene.builder import load_scene_file
    from raytrace_tpu.render.integrator import sample_pixels
    from raytrace_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    sc = load_scene_file(os.path.join(REFERENCE_DIR, "test_scene.txt"),
                         dtype=jnp.float32)
    # BASELINE config: 1024^2, depth-4 (golden scene constants)
    spec = dataclasses.replace(sc.spec, width=1024, height=1024)
    data = sc.data
    levels = spec.max_depth + 2  # intersect rounds per primary sample

    # one launch: 2M lanes saturates the chip (smaller launches leave
    # VPU utilization on the table; measured sweep in PROGRESS notes)
    n_pix = 1 << 17
    n_s = 16
    pix = np.arange(n_pix, dtype=np.uint32)
    px = jnp.asarray(pix % spec.width)
    py = jnp.asarray(pix // spec.width)
    sids = jnp.arange(n_s, dtype=jnp.uint32)

    @partial(jax.jit, static_argnames=("k",))
    def chain(px, py, k):
        def body(i, acc):
            o = sample_pixels(data, spec, (px + i) % spec.width, py, sids, 0)
            return acc + jnp.sum(o)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    # every timed call gets fresh inputs: a remote-device tunnel may
    # serve repeated (executable, args) pairs from cache.  Medians of
    # interleaved reps + a least-squares fit over chain lengths make
    # the slope robust to per-call latency outliers and drift.
    ks, reps = (4, 16, 64), 5
    for k in ks:
        chain(px, py, k).block_until_ready()   # compile + warm
    times = {k: [] for k in ks}
    bias = 0
    for _ in range(reps):
        for k in ks:
            bias += 1
            t0 = time.perf_counter()
            float(chain(px + bias, py, k))
            times[k].append(time.perf_counter() - t0)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    a = np.array([[k, 1.0] for k in ks])
    y = np.array([med(times[k]) for k in ks])
    (per_launch, overhead), *_ = np.linalg.lstsq(a, y, rcond=None)

    primary = n_pix * n_s * spec.cam_samples
    rays_per_sec = primary * levels / per_launch
    print(json.dumps({
        "metric": "rays_per_sec_per_chip_1024sq_depth4",
        "value": round(rays_per_sec),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REF_CPU_RAYS_PER_SEC, 2),
        "per_launch_ms": round(float(per_launch) * 1e3, 3),
        "fixed_overhead_ms": round(float(overhead) * 1e3, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
