"""Camera models: batched primary-ray generation.

TPU-native equivalent of the reference's ``Camera`` trait
(camera.rs:19-27) and its two impls: ``SimplePerspectiveCamera::project``
(camera.rs:77-79) and ``DepthOfFieldCamera::project`` (camera.rs:110-122).
The per-pixel virtual call becomes one batched matmul + elementwise pass
over an (N,) lane axis; the camera *type* is a static switch from
SceneSpec so only one code path is ever compiled.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytrace_tpu.ops import rng
from raytrace_tpu.scene.schema import CAM_DEPTH_OF_FIELD, SceneData, SceneSpec


def _unit(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def project(data: SceneData, spec: SceneSpec, pos_x, pos_y, k1, k2):
    """Project normalized image coordinates to rays.

    ``pos_x``/``pos_y``: (N,) NDC coordinates ((-1,-1)..(1,1) = largest
    centered square in the image, camera.rs:22-24).  ``k1``/``k2``:
    per-lane RNG streams (used only by the depth-of-field lens sampler).
    Returns ``(origin (N,3), direction (N,3))``.
    """
    dtype = data.cam_matrix.dtype
    # dir = M @ (x, y, 1)  (camera.rs:78, 111) — batched as hom @ M^T
    hom = jnp.stack([pos_x, pos_y, jnp.ones_like(pos_x)], axis=-1)
    d = hom @ data.cam_matrix.T                                   # (N,3)

    if spec.cam_type != CAM_DEPTH_OF_FIELD:
        origin = jnp.broadcast_to(data.cam_position, d.shape)
        return origin, _unit(d)

    # DepthOfFieldCamera::project (camera.rs:110-121): d stays
    # un-normalized; lens point sampled uniformly on a disc via
    # theta ~ U[0,2pi), r = sqrt(u) * aperture.
    ip = data.cam_position + d                                    # image plane
    fp = data.cam_position + d * (data.cam_focus / data.cam_im_dist)
    theta = rng.draw(k1, k2, rng.PURPOSE_LENS_THETA, dtype) * (2.0 * jnp.pi)
    u = rng.draw(k1, k2, rng.PURPOSE_LENS_R, dtype)
    r = jnp.sqrt(u) * data.cam_aperture
    lens = jnp.stack([jnp.cos(theta) * r, jnp.sin(theta) * r,
                      jnp.zeros_like(r)], axis=-1)
    origin = ip + lens @ data.cam_matrix.T
    return origin, _unit(fp - origin)
