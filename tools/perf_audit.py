"""Perf audit: linearity sweep + device-time profile of the bench chain.

Reconciles bench.py's marginal-time number against a least-squares fit
over chain lengths and against the profiler's device-side kernel time
(VERDICT r2 #1).  Run on the real TPU.
"""
import dataclasses
import os
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from raytrace_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

REFERENCE_DIR = os.environ.get("RAYTRACE_TPU_REFERENCE_DIR", "/root/reference")


def main(ks=(2, 4, 8, 16, 32, 64), reps=5, trace_dir=None):
    from raytrace_tpu.scene.builder import load_scene_file
    from raytrace_tpu.render.integrator import sample_pixels

    sc = load_scene_file(os.path.join(REFERENCE_DIR, "test_scene.txt"),
                         dtype=jnp.float32)
    spec = dataclasses.replace(sc.spec, width=1024, height=1024)
    data = sc.data
    levels = spec.max_depth + 2
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

    # THE measurement methodology lives in bench._measure_slope — one
    # source of truth for bench + audit tools (review finding r3); this
    # tool's job is the per-k table + linearity check on its raw times
    from bench import _measure_slope
    slope, icpt, res = _measure_slope(chain, px, py, ks=ks, reps=reps)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    lanes = n_pix * n_s
    print(f"lanes/launch = {lanes}, levels = {levels}")
    for k in ks:
        m = med(res[k])
        print(f"k={k:3d}: median {m*1e3:9.3f} ms  "
              f"({m/k*1e3:7.3f} ms/launch raw)  all="
              + ",".join(f"{t*1e3:.1f}" for t in sorted(res[k])))
    print(f"LSQ slope = {slope*1e3:.3f} ms/launch, "
          f"intercept = {icpt*1e3:.1f} ms")
    print(f"=> rays/s = {lanes*levels/slope/1e9:.2f} G")

    if trace_dir:
        jax.profiler.start_trace(trace_dir)
        float(chain(px + 999, py, ks[-1]))
        jax.profiler.stop_trace()
        print("trace written to", trace_dir)


if __name__ == "__main__":
    main(trace_dir=sys.argv[1] if len(sys.argv) > 1 else None)
