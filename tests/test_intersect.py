"""Geometry kernel tests vs closed forms (shapes.rs / scene.rs semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytrace_tpu.scene.schema import (
    MAT_PHONG, SHAPE_PLANE, SHAPE_SPHERE, SceneData, SceneSpec)
from raytrace_tpu.ops.intersect import intersect, occluded


def make_scene(shapes, dtype=jnp.float64):
    """shapes: list of ('sphere', center, radius) | ('plane', point, normal)."""
    n = len(shapes)
    p = np.zeros((n, 3))
    q = np.zeros((n, 3))
    st = []
    for i, s in enumerate(shapes):
        if s[0] == "sphere":
            st.append(SHAPE_SPHERE)
            p[i] = s[1]
            q[i, 0] = s[2]
        else:
            st.append(SHAPE_PLANE)
            p[i] = s[1]
            q[i] = s[2]
    zeros3 = jnp.zeros((n, 3), dtype)
    data = SceneData(
        prim_p=jnp.asarray(p, dtype), prim_q=jnp.asarray(q, dtype),
        mat_diffuse=zeros3, mat_specular=zeros3,
        mat_exponent=jnp.ones(n, dtype), mat_ambient=zeros3,
        mat_ior=jnp.ones(n, dtype), mat_samples=jnp.zeros(n, dtype),
        light_p=jnp.zeros((1, 3), dtype), light_e1=jnp.zeros((1, 3), dtype),
        light_e2=jnp.zeros((1, 3), dtype), light_color=jnp.zeros((1, 3), dtype),
        cam_position=jnp.zeros(3, dtype), cam_matrix=jnp.eye(3, dtype=dtype),
        cam_focus=jnp.zeros((), dtype), cam_aperture=jnp.zeros((), dtype),
        cam_im_dist=jnp.ones((), dtype),
        bg_color=jnp.zeros(3, dtype), bg_cube=jnp.zeros((6, 1, 1, 3), dtype),
    )
    spec = SceneSpec(shape_type=tuple(st), mat_type=(MAT_PHONG,) * n,
                     light_type=())
    return data, spec


def ray(o, d):
    return jnp.asarray([o], jnp.float64), jnp.asarray([d], jnp.float64)


def test_sphere_two_root_near():
    data, spec = make_scene([("sphere", (0, 0, -5), 1.0)])
    h = intersect(data, spec, *ray((0, 0, 0), (0, 0, -1)))
    assert bool(h.hit[0])
    assert float(h.t[0]) == pytest.approx(4.0)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, 1], atol=1e-12)


def test_sphere_inside_far_root():
    # origin inside the sphere: near root negative, far root accepted
    # (shapes.rs:75-83), normal points outward (away from viewer)
    data, spec = make_scene([("sphere", (0, 0, 0), 2.0)])
    h = intersect(data, spec, *ray((0, 0, 0), (0, 0, -1)))
    assert bool(h.hit[0])
    assert float(h.t[0]) == pytest.approx(2.0)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, -1], atol=1e-12)


def test_sphere_behind_origin_rejected():
    data, spec = make_scene([("sphere", (0, 0, 5), 1.0)])
    h = intersect(data, spec, *ray((0, 0, 0), (0, 0, -1)))
    assert not bool(h.hit[0])
    assert float(h.t[0]) == float("inf")


def test_sphere_grazing_disc_zero_is_miss():
    # tangent ray: discriminant == 0 fails the strict > 0 test (shapes.rs:66)
    data, spec = make_scene([("sphere", (0, 1, -5), 1.0)])
    h = intersect(data, spec, *ray((0, 0, 0), (0, 0, -1)))
    assert not bool(h.hit[0])


def test_sphere_unnormalized_direction():
    # reference divides by a = |d|^2, so t is in units of |d|
    data, spec = make_scene([("sphere", (0, 0, -6), 2.0)])
    h = intersect(data, spec, *ray((0, 0, 0), (0, 0, -2)))
    assert float(h.t[0]) == pytest.approx(2.0)


def test_plane_basic_and_normal_passthrough():
    # plane normal returned raw & unnormalized (shapes.rs:108)
    data, spec = make_scene([("plane", (0, -1, 0), (0, 2.0, 0))])
    h = intersect(data, spec, *ray((0, 0, 0), (0, -1, 0)))
    assert float(h.t[0]) == pytest.approx(1.0)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 2.0, 0])


def test_plane_parallel_misses():
    data, spec = make_scene([("plane", (0, -1, 0), (0, 1, 0))])
    h = intersect(data, spec, *ray((0, 0, 0), (1, 0, 0)))
    assert not bool(h.hit[0])


def test_plane_behind_rejected():
    data, spec = make_scene([("plane", (0, 1, 0), (0, 1, 0))])
    h = intersect(data, spec, *ray((0, 0, 0), (0, -1, 0)))
    assert not bool(h.hit[0])


def test_closest_hit_first_min_tiebreak():
    # two coincident spheres: argmin returns the first in file order,
    # matching min_by_key's earliest-minimum (scene.rs:248)
    data, spec = make_scene([("sphere", (0, 0, -5), 1.0),
                             ("sphere", (0, 0, -5), 1.0)])
    h = intersect(data, spec, *ray((0, 0, 0), (0, 0, -1)))
    assert int(h.obj[0]) == 0


def test_closest_hit_ordering():
    data, spec = make_scene([
        ("plane", (0, 0, -20), (0, 0, 1)),
        ("sphere", (0, 0, -5), 1.0),
        ("sphere", (0, 0, -10), 1.0),
    ])
    h = intersect(data, spec, *ray((0, 0, 0), (0, 0, -1)))
    assert int(h.obj[0]) == 1
    assert float(h.t[0]) == pytest.approx(4.0)


def test_mixed_file_order_preserved():
    # plane in front of sphere, interleaved ordering (builder partition
    # must restore file order)
    data, spec = make_scene([
        ("sphere", (0, 0, -10), 1.0),
        ("plane", (0, 0, -5), (0, 0, 1)),
        ("sphere", (0, 0, -3), 1.0),
    ])
    h = intersect(data, spec, *ray((0, 0, 0), (0, 0, -1)))
    assert int(h.obj[0]) == 2
    assert float(h.t[0]) == pytest.approx(2.0)


def test_occluded_with_range():
    data, spec = make_scene([("sphere", (0, 0, -5), 1.0)])
    ro, rd = ray((0, 0, 0), (0, 0, -1))
    # light beyond the sphere: blocked
    assert bool(occluded(data, spec, ro, rd, jnp.asarray([100.0]), True)[0])
    # light in front of the sphere (r^2 = 9 < t^2 = 16): not blocked
    assert not bool(occluded(data, spec, ro, rd, jnp.asarray([9.0]), True)[0])
    # rangeless (directional): any hit blocks
    assert bool(occluded(data, spec, ro, rd, jnp.asarray([0.0]), False)[0])


def test_gradients_flow_to_geometry():
    # d t / d radius for a head-on sphere hit: t = dist - r  =>  -1
    data, spec = make_scene([("sphere", (0, 0, -5), 1.0)])
    ro, rd = ray((0, 0, 0), (0, 0, -1))

    def t_of_radius(r):
        d2 = data.prim_q.at[0, 0].set(r)
        import dataclasses
        return intersect(dataclasses.replace(data, prim_q=d2), spec, ro, rd).t[0]

    g = jax.grad(t_of_radius)(jnp.asarray(1.0, jnp.float64))
    assert float(g) == pytest.approx(-1.0)


def test_batch_shapes():
    data, spec = make_scene([("sphere", (0, 0, -5), 1.0),
                             ("plane", (0, -1, 0), (0, 1, 0))])
    n = 64
    ro = jnp.zeros((n, 3), jnp.float64)
    rd = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float64), (n, 1))
    h = intersect(data, spec, ro, rd)
    assert h.t.shape == (n,)
    assert h.normal.shape == (n, 3)
    assert bool(jnp.all(h.obj == 0))
