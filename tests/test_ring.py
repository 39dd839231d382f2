"""Ring-sharded intersection vs the dense single-device result."""

import numpy as np
import pytest
import jax.numpy as jnp

from raytrace_tpu.ops import vec
from raytrace_tpu.ops.intersect import closest_hit
from raytrace_tpu.parallel.mesh import make_mesh
from raytrace_tpu.parallel.ring import make_ring_intersector
from raytrace_tpu.scene.procedural import make_sphere_field


def test_ring_matches_dense():
    sc = make_sphere_field(100, dtype=jnp.float64)  # 106 objects
    n = 512                                          # 64 rays per device
    r = np.random.RandomState(5)
    ro = jnp.asarray(r.randn(n, 3) * 2, jnp.float64)
    d = r.randn(n, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rd = jnp.asarray(d, jnp.float64)

    mesh = make_mesh()
    ring = make_ring_intersector(sc.spec, mesh)
    t, obj, hit = ring(sc.data, ro, rd)

    dense = closest_hit(sc.data, sc.spec, vec.splat(ro), vec.splat(rd))
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(dense.hit))
    np.testing.assert_allclose(np.asarray(t), np.asarray(dense.t),
                               rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(obj), np.asarray(dense.obj))


def test_ring_empty_miss_rays():
    sc = make_sphere_field(20, dtype=jnp.float64)
    n = 64
    # rays pointing away from everything (+z from far +z)
    ro = jnp.tile(jnp.asarray([[0.0, 0.0, 100.0]], jnp.float64), (n, 1))
    rd = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float64), (n, 1))
    ring = make_ring_intersector(sc.spec, make_mesh())
    t, obj, hit = ring(sc.data, ro, rd)
    assert not bool(np.asarray(hit).any())
    assert (np.asarray(t) == np.inf).all()


@pytest.mark.slow
def test_scan_hit_kernel_inside_ring_interpret(monkeypatch):
    # [slow tier — fast twin: test_ring_matches_dense covers the ring
    # protocol; the Pallas scan kernel has its own parity tests]
    """The Pallas scan kernel composed with shard_map + ppermute — the
    exact composition the TPU path runs — exercised in interpret mode
    on the 8-virtual-device mesh (f32 so ip.usable() is True)."""
    from raytrace_tpu.ops import intersect_pallas as ip

    monkeypatch.setenv("RAYTRACE_TPU_MEGAKERNEL_INTERPRET", "1")
    assert ip.usable(jnp.float32)

    sc = make_sphere_field(40, dtype=jnp.float32)
    n = 256
    r = np.random.RandomState(11)
    ro = jnp.asarray(r.randn(n, 3) * 2, jnp.float32)
    d = r.randn(n, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rd = jnp.asarray(d, jnp.float32)

    ring = make_ring_intersector(sc.spec, make_mesh(), check_vma=False)
    t, obj, hit = ring(sc.data, ro, rd)

    dense = closest_hit(sc.data, sc.spec, vec.splat(ro), vec.splat(rd))
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(dense.hit))
    np.testing.assert_array_equal(np.asarray(obj), np.asarray(dense.obj))
    np.testing.assert_allclose(np.asarray(t), np.asarray(dense.t),
                               rtol=2e-6)


@pytest.mark.slow
def test_render_image_ring_matches_dense():
    # [slow tier — fast twin: test_ring_matches_dense covers the ring
    # protocol; the CLI --shard-objects test covers the driver wiring]
    """End-to-end object-sharded render through the public API: the
    huge-scene path (geometry + material tables ring-sharded over the
    mesh) must be bit-identical to the dense single-device render
    (identity-keyed RNG + order-free (t, id)-lexicographic min fold)."""
    from raytrace_tpu.parallel.ring import render_image_ring
    from raytrace_tpu.render.integrator import render_image

    sc = make_sphere_field(100, width=8, height=8, antialias=1,
                           mix_materials=False, dtype=jnp.float32)
    dense = render_image(sc, seed=2, spp=2)
    ring = render_image_ring(sc, seed=2, spp=2, mesh=make_mesh())
    np.testing.assert_array_equal(np.asarray(ring), np.asarray(dense))


@pytest.mark.slow
def test_render_image_ring_materials_and_lights():
    # [slow tier — fast twin: test_render_image_ring_matches_dense]
    """Ring render with all four material kinds (reflect/refract fan-out
    + shadow queries through ring_occluded) matches dense."""
    from raytrace_tpu.parallel.ring import render_image_ring
    from raytrace_tpu.render.integrator import render_image
    from raytrace_tpu.scene import dsl
    from raytrace_tpu.scene.builder import build_scene

    # a small mixed scene with a light (shadow rays) — ring path is
    # forced regardless of object count by the installed context.
    # depth 2 keeps the fan-out wavefront 4x smaller than the default
    # depth-4 tree; the ring closest-hit/occluded code is depth-blind.
    import dataclasses
    sc = make_sphere_field(70, width=6, height=6, antialias=1,
                           mix_materials=True, dtype=jnp.float32)
    sc = dataclasses.replace(
        sc, spec=dataclasses.replace(sc.spec, max_depth=2))
    dense = render_image(sc, seed=5, spp=1)
    ring = render_image_ring(sc, seed=5, spp=1, mesh=make_mesh())
    np.testing.assert_array_equal(np.asarray(ring), np.asarray(dense))
