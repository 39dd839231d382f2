"""Large-scene (scan) intersection path vs the unrolled path."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from raytrace_tpu.ops import vec
from raytrace_tpu.ops.intersect import (
    LARGE_SCENE_THRESHOLD, _closest_hit_scanned, closest_hit, occluded_v)
from raytrace_tpu.scene.procedural import make_sphere_field
from raytrace_tpu.render.integrator import render_image


def _rays(n, seed=0):
    r = np.random.RandomState(seed)
    ro = vec.V3(*(jnp.asarray(r.randn(n) * 2, jnp.float64) for _ in range(3)))
    d = r.randn(3, n)
    d /= np.linalg.norm(d, axis=0)
    rd = vec.V3(*(jnp.asarray(c, jnp.float64) for c in d))
    return ro, rd


def test_scan_path_matches_unrolled():
    # 40 objects: below the threshold => unrolled; call the scanned
    # implementation directly and require identical results
    sc = make_sphere_field(34, dtype=jnp.float64)
    assert sc.spec.n_objects == 34 + 6
    assert sc.spec.n_objects <= LARGE_SCENE_THRESHOLD
    ro, rd = _rays(512)
    a = closest_hit(sc.data, sc.spec, ro, rd)       # unrolled
    b = _closest_hit_scanned(sc.data, sc.spec, ro, rd)
    np.testing.assert_array_equal(np.asarray(a.obj), np.asarray(b.obj))
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(vec.pack(a.normal)),
                               np.asarray(vec.pack(b.normal)), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(vec.pack(a.diffuse)),
                               np.asarray(vec.pack(b.diffuse)), rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(a.is_transp),
                                  np.asarray(b.is_transp))


def test_large_scene_auto_dispatch_and_render():
    sc = make_sphere_field(200, width=8, height=8, antialias=1,
                           dtype=jnp.float64)
    assert sc.spec.n_objects > LARGE_SCENE_THRESHOLD
    img = render_image(sc, seed=3, spp=2)
    assert np.isfinite(img).all()
    assert img.max() > 0


def test_occluded_scan_matches():
    sc = make_sphere_field(80, dtype=jnp.float64)
    ro, rd = _rays(256, seed=2)
    sqr = jnp.full(256, 25.0, jnp.float64)
    blocked = occluded_v(sc.data, sc.spec, ro, rd, sqr, True)
    # brute force in numpy via the scanned hit
    h = _closest_hit_scanned(sc.data, sc.spec, ro, rd)
    want = np.asarray(h.hit) & (np.asarray(h.t) ** 2 < 25.0)
    np.testing.assert_array_equal(np.asarray(blocked), want)


def test_one_hot_lookup_bit_exact_f32():
    """The scanned regime's winning-row lookup uses the one-hot MXU
    contraction (ops/gather.py) below ONE_HOT_LOOKUP_MAX_OBJECTS; at
    HIGHEST precision it must be bit-exact vs jnp.take (gather.py
    docstring — default MXU precision rounds through bf16)."""
    from raytrace_tpu.ops.gather import one_hot, take

    r = np.random.RandomState(7)
    table = jnp.asarray(r.rand(200, 22), jnp.float32)
    idx = jnp.asarray(r.randint(0, 200, 4096), jnp.int32)
    got = take(table, one_hot(idx, 200, jnp.float32))
    want = jnp.take(table, idx, axis=0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_scanned_f32_one_hot_path_matches_f64():
    """f32 scanned closest-hit (one-hot lookup active) agrees with the
    f64 scan on winning object id and material rows."""
    sc32 = make_sphere_field(100, dtype=jnp.float32)
    sc64 = make_sphere_field(100, dtype=jnp.float64)
    ro, rd = _rays(256, seed=5)
    ro32 = vec.V3(*(c.astype(jnp.float32) for c in ro))
    rd32 = vec.V3(*(c.astype(jnp.float32) for c in rd))
    a = _closest_hit_scanned(sc32.data, sc32.spec, ro32, rd32)
    b = _closest_hit_scanned(sc64.data, sc64.spec, ro, rd)
    same = np.asarray(a.obj) == np.asarray(b.obj)
    assert same.mean() > 0.98  # f32 vs f64 t-ordering may flip rare ties
    np.testing.assert_allclose(np.asarray(vec.pack(a.diffuse))[same],
                               np.asarray(vec.pack(b.diffuse))[same],
                               rtol=1e-6)
