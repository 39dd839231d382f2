"""Gradient correctness: jax.grad of the render loss vs central finite
differences, away from visibility silhouettes (SURVEY.md §4, §7.6).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytrace_tpu.scene import dsl
from raytrace_tpu.scene.builder import build_scene
from raytrace_tpu.optim import fit, loss_and_grad, render_loss

SCENE = """{
  objects: [
    { bounds: Plane { point: (0, -1, 0) normal: (0, 1, 0) }
      material: PhongMaterial { diffuse: rgb(0.6,0.5,0.4) specular: rgb(0,0,0)
        exponent: 1 ambient: rgb(0.05,0.05,0.05) } }
    { bounds: Sphere { center: (0, 0, -4) radius: 1 }
      material: PhongMaterial { diffuse: rgb(0.8,0.3,0.2)
        specular: rgb(0.2,0.2,0.2) exponent: 16 ambient: rgb(0,0,0) } }
  ]
  lights: [
    { model: PointLight { location: (2, 3, -1) } color: rgb(1.2, 1.1, 1.0) }
  ]
  camera: SimplePerspectiveCamera new((0, 0, 0), (0, 0, -1), (0, 1, 0), 2)
  background: SolidColorBackground { color: rgb(0.1, 0.12, 0.15) }
  options: { width: 8 height: 8 antialias: 1 }
}"""


def _setup():
    sc = build_scene(dsl.parse(SCENE), dtype=jnp.float64)
    # max_depth=2 (3 shaded levels: direct + mirror + mirror^2) exercises
    # every gradient path while keeping the unrolled-AD compile small
    sc = dataclasses.replace(
        sc, spec=dataclasses.replace(sc.spec, max_depth=2))
    w, h = sc.spec.width, sc.spec.height
    pix = np.arange(w * h, dtype=np.uint32)
    px, py = jnp.asarray(pix % w), jnp.asarray(pix // w)
    sids = jnp.arange(2, dtype=jnp.uint32)
    # target: the scene's own render with perturbed-but-fixed params
    target = jnp.full((w * h, 3), 0.25, jnp.float64)
    return sc, px, py, sids, target


def _fd_check(sc, px, py, sids, target, get, set_, eps=1e-6, rtol=5e-4):
    """central finite difference on one scalar parameter."""
    def loss_of(v):
        return render_loss(set_(sc.data, v), sc.spec, px, py, sids,
                           jnp.uint32(0), target)

    v0 = get(sc.data)
    g = jax.grad(loss_of)(v0)
    fd = (loss_of(v0 + eps) - loss_of(v0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=rtol, atol=1e-8)
    return float(g)


def test_grad_sphere_radius():
    sc, px, py, sids, target = _setup()
    g = _fd_check(
        sc, px, py, sids, target,
        get=lambda d: d.prim_q[1, 0],
        set_=lambda d, v: dataclasses.replace(
            d, prim_q=d.prim_q.at[1, 0].set(v)))
    assert g != 0.0


def test_grad_sphere_center():
    sc, px, py, sids, target = _setup()
    _fd_check(
        sc, px, py, sids, target,
        get=lambda d: d.prim_p[1, 2],
        set_=lambda d, v: dataclasses.replace(
            d, prim_p=d.prim_p.at[1, 2].set(v)))


def test_grad_material_diffuse():
    sc, px, py, sids, target = _setup()
    g = _fd_check(
        sc, px, py, sids, target,
        get=lambda d: d.mat_diffuse[1, 0],
        set_=lambda d, v: dataclasses.replace(
            d, mat_diffuse=d.mat_diffuse.at[1, 0].set(v)))
    assert g != 0.0


def test_grad_light_color_and_position():
    sc, px, py, sids, target = _setup()
    _fd_check(
        sc, px, py, sids, target,
        get=lambda d: d.light_color[0, 1],
        set_=lambda d, v: dataclasses.replace(
            d, light_color=d.light_color.at[0, 1].set(v)))
    _fd_check(
        sc, px, py, sids, target,
        get=lambda d: d.light_p[0, 0],
        set_=lambda d, v: dataclasses.replace(
            d, light_p=d.light_p.at[0, 0].set(v)))


def test_grad_camera_position():
    sc, px, py, sids, target = _setup()
    _fd_check(
        sc, px, py, sids, target,
        get=lambda d: d.cam_position[1],
        set_=lambda d, v: dataclasses.replace(
            d, cam_position=d.cam_position.at[1].set(v)))


def test_grad_plane_normal():
    sc, px, py, sids, target = _setup()
    _fd_check(
        sc, px, py, sids, target,
        get=lambda d: d.prim_q[0, 1],
        set_=lambda d, v: dataclasses.replace(
            d, prim_q=d.prim_q.at[0, 1].set(v)))


def test_grad_background():
    sc, px, py, sids, target = _setup()
    _fd_check(
        sc, px, py, sids, target,
        get=lambda d: d.bg_color[2],
        set_=lambda d, v: dataclasses.replace(
            d, bg_color=d.bg_color.at[2].set(v)))


def test_grads_finite_everywhere():
    sc, px, py, sids, target = _setup()
    _, grads = loss_and_grad(sc.data, sc.spec, px, py, sids,
                             jnp.uint32(0), target)
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.slow
def test_fit_recovers_diffuse_color():
    """Inverse rendering: perturb the sphere's diffuse color, fit it back
    to the original from the original's render."""
    sc, px, py, sids, _ = _setup()
    from raytrace_tpu.render.integrator import sample_pixels

    target = sample_pixels(sc.data, sc.spec, px, py, sids, 0)
    true_color = np.asarray(sc.data.mat_diffuse[1])

    perturbed = dataclasses.replace(
        sc.data, mat_diffuse=sc.data.mat_diffuse.at[1].set(
            jnp.asarray([0.3, 0.6, 0.6])))
    mask = jax.tree.map(lambda _: False, perturbed)
    mask = dataclasses.replace(mask, mat_diffuse=True)

    fitted, hist = fit(perturbed, sc.spec, px, py, target, seed=0,
                       steps=60, learning_rate=5e-2, spp=2,
                       trainable=mask, vary_seed=False)
    assert hist[-1] < hist[0] * 1e-2
    np.testing.assert_allclose(np.asarray(fitted.mat_diffuse[1]),
                               true_color, atol=0.03)
