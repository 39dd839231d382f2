"""Light models: batched light-direction / range queries.

TPU-native equivalent of the reference's ``LightModel`` trait
(scene.rs:101-155).  ``light_dir_and_sq_range_for`` becomes a batched
function per light; the light *type* is static per light index
(SceneSpec.light_type), so the per-light code path is resolved at trace
time with no runtime dispatch.

Semantics preserved exactly:

* Point (scene.rs:122-127): direction = unit(location - pt), squared
  range = |location - pt|^2;
* Directional (scene.rs:135-139): direction = -direction **un-normalized**
  (the reference negates without normalizing), no range => every shadow
  hit blocks;
* Area (scene.rs:151-155): uniform random point on the parallelogram
  origin + side1*u + side2*v, then Point semantics.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytrace_tpu.ops import rng
from raytrace_tpu.scene.schema import (
    LIGHT_AREA, LIGHT_DIRECTIONAL, LIGHT_POINT, SceneData)


def light_dir_and_sq_range(data: SceneData, light_type: int, li: int,
                           pt, k1, k2):
    """Direction from ``pt`` (N,3) to light ``li``; draws fold the light
    index into the purpose id so each area light gets its own stream.

    Returns (ldir (N,3), sq_range (N,), has_range: bool static).
    """
    dtype = pt.dtype
    if light_type == LIGHT_DIRECTIONAL:
        ldir = jnp.broadcast_to(-data.light_e1[li], pt.shape)
        return ldir, jnp.zeros(pt.shape[:-1], dtype), False

    if light_type == LIGHT_AREA:
        u = rng.draw(k1, k2, rng.PURPOSE_LIGHT_U + 2 * li, dtype)
        v = rng.draw(k1, k2, rng.PURPOSE_LIGHT_V + 2 * li, dtype)
        loc = (data.light_p[li] + data.light_e1[li] * u[..., None]
               + data.light_e2[li] * v[..., None])
    else:
        assert light_type == LIGHT_POINT
        loc = jnp.broadcast_to(data.light_p[li], pt.shape)

    rel = loc - pt
    sq = jnp.sum(rel * rel, axis=-1)
    ldir = rel / jnp.sqrt(jnp.where(sq > 0, sq, 1.0))[..., None]
    return ldir, sq, True
