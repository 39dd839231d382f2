"""Differentiable / inverse rendering: fit scene parameters to images.

Net-new capability over the reference (which has no gradients at all,
SURVEY.md §4): the wavefront integrator is pure jnp, so ``jax.grad`` of
any image loss flows into every SceneData leaf — sphere centers/radii,
plane points/normals, material colors/exponents/ior, light positions and
colors, camera parameters, background.  Hit *selection* (argmin index)
is integral and contributes subgradient-zero at visibility silhouettes;
``t`` and normals are recomputed from the winning object's parameters so
geometry gradients flow (ops/intersect.py docstring).

Two training steps:

* :func:`loss_and_grad` — single device;
* :func:`make_sharded_step` — pixels sharded over a mesh via
  ``shard_map``; per-shard gradients are all-reduced with ``lax.psum``
  (the data-parallel gradient-sync analog, SURVEY.md §5.8), so every
  device holds identical averaged gradients for the replicated scene.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from raytrace_tpu.render.integrator import sample_pixels
from raytrace_tpu.scene.schema import SceneData, SceneSpec


def render_loss(data: SceneData, spec: SceneSpec, px, py, sample_ids,
                seed: int, target) -> jnp.ndarray:
    """Summed squared error between rendered pixels and target (P, 3)."""
    img = sample_pixels(data, spec, px, py, sample_ids, seed)
    return jnp.sum((img - target) ** 2)


@partial(jax.jit, static_argnames=("spec",))
def loss_and_grad(data: SceneData, spec: SceneSpec, px, py, sample_ids,
                  seed, target):
    """Single-device value+grad of the render loss w.r.t. all of
    SceneData.  ``seed`` is traced (uint32 scalar) so per-step seed
    changes don't recompile."""
    return jax.value_and_grad(render_loss)(data, spec, px, py, sample_ids,
                                           seed, target)


def make_sharded_step(spec: SceneSpec, mesh, seed: int):
    """Build a jitted sharded training step.

    Returned ``step(data, px, py, sample_ids, target)`` shards the pixel
    axis (px/py/target rows) over the mesh's axes, computes per-shard
    gradients of the replicated SceneData, and ``psum``s loss and grads
    over every mesh axis.  Pixel count must be divisible by the mesh
    size.
    """
    axes = mesh.axis_names

    def local(data, px, py, sample_ids, target):
        loss, grads = jax.value_and_grad(render_loss)(
            data, spec, px, py, sample_ids, seed, target)
        # grads need no explicit psum: ``data`` enters replicated
        # (in_spec P(), vma-invariant), so shard_map's AD already
        # all-reduces its cotangent across the mesh — adding our own
        # psum would double-count (verified in tests/test_parallel.py).
        with jax.named_scope("grad_psum"):
            for ax in axes:
                loss = jax.lax.psum(loss, ax)
        return loss, grads

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axes), P(axes), P(), P(axes)),
        out_specs=(P(), P()))
    return jax.jit(fn)


def fit(data: SceneData, spec: SceneSpec, px, py, target, *,
        seed: int = 0, steps: int = 100, learning_rate: float = 1e-2,
        spp: int = 4, optimizer=None, trainable=None, callback=None,
        vary_seed: bool = True):
    """Gradient-descent scene fitting (inverse rendering) with optax.

    ``trainable``: optional pytree-of-bools (same structure as SceneData)
    masking which leaves to update; default: all.  ``vary_seed``
    re-randomizes the MC sampler each step (stochastic gradients; avoids
    fitting to sampler noise) — turn off when the target was rendered
    with the same seed and exact convergence is wanted.  Returns the
    fitted SceneData and the loss history.
    """
    import optax

    opt = optimizer if optimizer is not None else optax.adam(learning_rate)
    sample_ids = jnp.arange(spp, dtype=jnp.uint32)

    mask = (trainable if trainable is not None
            else jax.tree.map(lambda _: True, data))
    state = opt.init(data)
    history = []
    for i in range(steps):
        loss, grads = loss_and_grad(
            data, spec, px, py, sample_ids,
            jnp.uint32(seed + i if vary_seed else seed), target)
        grads = jax.tree.map(
            lambda g, m: g if m else jnp.zeros_like(g), grads, mask)
        updates, state = opt.update(grads, state, data)
        data = optax.apply_updates(data, updates)
        history.append(float(loss))
        if callback is not None:
            callback(i, float(loss), data)
    return data, history
