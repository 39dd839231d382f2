"""Ring-sharded intersection vs the dense single-device result."""

import numpy as np
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
