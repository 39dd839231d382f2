"""Benchmark harness: rays/sec/chip on the BASELINE workload.

Metric (BASELINE.json): rays/sec/chip at 1024^2, depth-4 bounces — one
"ray" = one scene-intersection round of a wavefront lane (the golden
scene traces max_depth+2 = 6 per primary sample, BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured against the reference's own workload ground
truth: the reference publishes no numbers (BASELINE.md), so the anchor
is REF_CPU_RAYS_PER_SEC, the rust binary's measured single-thread
throughput (see BASELINE.md §"de novo"); update it if re-measured.
"""

import dataclasses
import json
import sys
import time

import numpy as np

# Anchor: the reference Rust binary is single-thread scalar f64; typical
# measured throughput for its 7-object scene is ~5-10M scene-intersections
# /sec on one modern CPU core.  Rust is unavailable in this image, so the
# anchor uses the oracle-calibrated estimate below (conservative, high
# end) until a direct measurement can replace it.
REF_CPU_RAYS_PER_SEC = 10.0e6


def main():
    import jax
    import jax.numpy as jnp
    from raytrace_tpu.scene.builder import load_scene_file
    from raytrace_tpu.render.integrator import _render_tile
    from raytrace_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    sc = load_scene_file("/root/reference/test_scene.txt",
                         dtype=jnp.float32)
    # BASELINE config: 1024^2, depth-4 (golden scene constants)
    spec = dataclasses.replace(sc.spec, width=1024, height=1024)
    data = sc.data
    levels = spec.max_depth + 2  # intersect rounds per primary sample

    # one launch: P pixels x S samples; ~2M lanes saturates the chip
    # (measured: 262k lanes -> 202M rays/s, 2M lanes -> 741M rays/s)
    n_pix = 1 << 17
    n_s = 16
    pix = np.arange(n_pix, dtype=np.uint32)
    px = jnp.asarray(pix % spec.width)
    py = jnp.asarray(pix // spec.width)
    sids = jnp.arange(n_s, dtype=jnp.uint32)

    # compile + warm up
    out = _render_tile(data, spec, px, py, sids, 0)
    out.block_until_ready()

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = _render_tile(data, spec, px, py, sids, 0)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    primary = n_pix * n_s * spec.cam_samples
    rays_per_sec = primary * levels / dt
    print(json.dumps({
        "metric": "rays_per_sec_per_chip_1024sq_depth4",
        "value": round(rays_per_sec),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REF_CPU_RAYS_PER_SEC, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
