"""Tile-sharded rendering: the image's pixel axis sharded over the mesh.

Net-new vs the reference (whose pixel loop is serial, main.rs:45-55).
Each device renders its own contiguous pixel shard through the same
wavefront integrator; the scene pytree is replicated (scenes are small —
broadcast is cheap, SURVEY.md §5.7).  Because every RNG draw is a pure
function of (pixel, sample, level, slot) identity — never of array
position — the sharded render is **bit-identical** to the single-device
render; tests/test_parallel.py asserts exactly that.

Forward rendering needs zero collectives (embarrassingly parallel); the
gradient path in :mod:`raytrace_tpu.optim` adds the ``psum`` all-reduce
of replicated scene-parameter gradients (the DP grad-sync analog).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from raytrace_tpu.parallel.mesh import make_mesh
from raytrace_tpu.render.integrator import sample_pixels
from raytrace_tpu.scene.schema import Scene


@partial(jax.jit, static_argnames=("spec", "seed", "mesh"))
def _render_tile_sharded(data, spec, px, py, sample_ids, seed, mesh):
    """One sharded launch: pixels split over the mesh's data axis."""
    axes = mesh.axis_names

    def local(data, px, py, sample_ids):
        return sample_pixels(data, spec, px, py, sample_ids, seed)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axes), P(axes), P()),
        out_specs=P(axes))
    return fn(data, px, py, sample_ids)


@partial(jax.jit,
         static_argnames=("spec", "seed", "s_launch", "n_chunks", "mesh",
                          "p_local"))
def _render_chunks_sharded(data, spec, px, py, s0, s_launch, n_chunks,
                           seed, mesh, p_local):
    """Device-accumulated (pixel tile x sample chunk) launches
    (integrator._render_chunks) with the pixel axis sharded over the
    mesh — both loops run collective-free inside shard_map, one host
    fetch per group.  ``p_local`` is the per-device pixel-tile size."""
    from raytrace_tpu.render.integrator import _render_chunks
    axes = mesh.axis_names

    def local(data, px, py, s0):
        return _render_chunks(data, spec, px, py, s0, s_launch, n_chunks,
                              seed, p_local)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axes), P(axes), P()),
        out_specs=P(axes))
    return fn(data, px, py, s0)


def render_image_sharded(scene: Scene, *, seed: int = 0,
                         spp: int | None = None, mesh=None,
                         max_lanes: int = 1 << 22, progress=None,
                         checkpoint: str | None = None) -> np.ndarray:
    """Full-image render with the pixel axis sharded over all devices.

    Same host tiling/checkpoint behavior as
    :func:`raytrace_tpu.render.integrator.render_image`; the per-launch
    lane budget is per *device*, so a launch covers
    ``n_devices x`` more pixels.
    """
    from raytrace_tpu.render.integrator import _image_loop

    mesh = mesh if mesh is not None else make_mesh()
    n_dev = int(np.prod(list(mesh.shape.values())))

    def _pad(px, py):
        n = px.shape[0]
        pad = (-n) % n_dev
        if pad:
            px = jnp.concatenate([px, jnp.zeros(pad, px.dtype)])
            py = jnp.concatenate([py, jnp.zeros(pad, py.dtype)])
        return px, py, n

    def launch(data, spec, px, py, sids, seed):
        px, py, n = _pad(px, py)
        out = _render_tile_sharded(data, spec, px, py, sids, seed, mesh)
        return out[:n]

    def launch_chunks(data, spec, px, py, s0, s_launch, n_chunks, seed,
                      p_launch):
        px, py, n = _pad(px, py)
        p_local = max(p_launch // n_dev, 1)
        out = _render_chunks_sharded(data, spec, px, py, s0, s_launch,
                                     n_chunks, seed, mesh, p_local)
        return out[:n]

    return _image_loop(scene, launch, seed=seed, spp=spp,
                       max_lanes=max_lanes * n_dev, progress=progress,
                       checkpoint=checkpoint, launch_chunks=launch_chunks)
