"""Inverse rendering demo: recover scene appearance by gradient descent.

Net-new capability over the reference (which has no gradients at all,
SURVEY.md §4): renders the golden scene as the target, perturbs the
diffuse sphere's color and the emitter sphere's brightness, then fits
both back with Adam through ``jax.grad`` of the photometric loss — the
full wavefront integrator (6 bounce levels of closest-hit + shade,
Monte-Carlo indirect lighting included) is differentiated end to end.

Geometry leaves (centers, radii, plane params) take gradients too
(tests/test_grad.py checks them against finite differences), but
*silhouette coverage* is a discrete event with subgradient zero, so
large geometric misalignments are not recoverable by photometric
descent alone — the demo therefore fits the smooth appearance
parameters, which is the well-posed inverse problem.

Run anywhere (TPU or ``RAYTRACE_TPU_FORCE_CPU=1``):

    python examples/fit_demo.py [steps]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = os.environ.get("RAYTRACE_TPU_REFERENCE_DIR",
                               "/root/reference")


def main(steps=60):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from raytrace_tpu.optim import fit, loss_and_grad
    from raytrace_tpu.render.integrator import sample_pixels
    from raytrace_tpu.scene.builder import load_scene_file
    from raytrace_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    if os.environ.get("RAYTRACE_TPU_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")

    sc = load_scene_file(os.path.join(REFERENCE_DIR, "test_scene.txt"),
                         dtype=jnp.float32)
    spec = dataclasses.replace(sc.spec, width=48, height=48)

    pix = np.arange(spec.width * spec.height, dtype=np.uint32)
    px = jnp.asarray(pix % spec.width)
    py = jnp.asarray(pix // spec.width)
    sids = jnp.arange(8, dtype=jnp.uint32)

    # target: the true scene, rendered with a fixed seed
    target = sample_pixels(sc.data, spec, px, py, sids, 0)

    # perturb the diffuse sphere's color (obj 5, test_scene.txt:82-87)
    # and the emitter's brightness (obj 6's ambient, test_scene.txt:88-93)
    data = sc.data
    diff = data.mat_diffuse.at[5].set(jnp.asarray([0.2, 0.6, 0.7]))
    amb = data.mat_ambient.at[6].multiply(0.5)
    perturbed = dataclasses.replace(data, mat_diffuse=diff,
                                    mat_ambient=amb)

    # fit only the appearance leaves (see module docstring)
    mask = jax.tree.map(lambda _: False, perturbed)
    mask = dataclasses.replace(mask, mat_diffuse=True, mat_ambient=True)

    loss0 = float(loss_and_grad(perturbed, spec, px, py, sids,
                                jnp.uint32(0), target)[0])

    def cb(i, loss, _):
        if i % 10 == 0:
            print(f"step {i:4d}  loss {loss:.4f}")

    # vary_seed=False: the target uses seed 0, so the loss is an exact
    # deterministic function with minimum 0 at the true parameters
    fitted, hist = fit(perturbed, spec, px, py, target, steps=steps,
                       learning_rate=5e-2, spp=8, seed=0,
                       trainable=mask, vary_seed=False, callback=cb)

    print(f"\nloss: {loss0:.4f} -> {hist[-1]:.4f} "
          f"({loss0 / max(hist[-1], 1e-9):.0f}x)")
    print("diffuse color err:",
          float(jnp.abs(fitted.mat_diffuse[5] - data.mat_diffuse[5]).max()))
    print("emitter ambient err:",
          float(jnp.abs(fitted.mat_ambient[6] - data.mat_ambient[6]).max()))
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 60))
