"""Statistical quality tests of the hand-rolled counter-based RNG.

The renderer's production backend is the splitmix-style sponge
(``ops/rng.py``: hash_words / make_keys / derive / draw).  The golden
parity tests only constrain it indirectly (bad RNG would surface as
image bias / extra noise), so this file tests the generator directly:

* chi-square uniformity of ``draw`` / ``hash_words`` bucket histograms;
* independence across the axes the renderer keys streams by
  (purpose id, child slot, pixel id, seed) via cross-correlation and
  bit-avalanche checks;
* the threefry backend (``u01(..., backend="threefry")``, a completely
  independent generator built on jax.random) as a cross-check oracle:
  the mix backend's sample means/moments must agree with threefry's
  within Monte-Carlo error;
* a rendered-image cross-check: an MC render whose *jitter* stream is
  replaced by threefry must agree with the stock render within MC
  noise (the per-pixel std of the estimator), so any systematic bias
  of the mix sponge visible at image level would fail here.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from raytrace_tpu.ops import rng


def _chi2_uniform(u: np.ndarray, bins: int = 64) -> float:
    """Chi-square statistic of u ~ U[0,1) against a uniform histogram,
    normalized by dof so ~1.0 is expected; > ~1.5 at n >> bins is bad."""
    n = u.size
    hist, _ = np.histogram(u, bins=bins, range=(0.0, 1.0))
    expected = n / bins
    chi2 = ((hist - expected) ** 2 / expected).sum()
    return chi2 / (bins - 1)


def _draws(seed, n, purpose=0, slot=None):
    pix = jnp.arange(n, dtype=jnp.uint32)
    k1, k2 = rng.make_keys(seed, pix, pix * 0 + 7, pix * 0 + 3)
    if slot is not None:
        k1, k2 = rng.derive(k1, k2, slot)
    return np.asarray(rng.draw(k1, k2, purpose, jnp.float32))


N = 1 << 16


def test_draw_uniform_chi2():
    for purpose in (rng.PURPOSE_AA_X, rng.PURPOSE_LIGHT_U,
                    rng.PURPOSE_INDIRECT_R1):
        u = _draws(0, N, purpose)
        assert 0.5 < _chi2_uniform(u) < 1.6, purpose
        assert 0.0 <= u.min() and u.max() < 1.0
        # first two moments of U[0,1): mean 1/2, var 1/12
        assert abs(u.mean() - 0.5) < 4.0 / np.sqrt(12 * N)
        assert abs(u.var() - 1 / 12) < 0.002


def test_hash_words_bit_balance():
    """Every output bit of hash_words is ~50/50 over a counter sweep."""
    w = jnp.arange(N, dtype=jnp.uint32)
    h = np.asarray(rng.hash_words(123, w, w * 0 + 5)).astype(np.uint64)
    for bit in range(32):
        frac = ((h >> bit) & 1).mean()
        assert abs(frac - 0.5) < 4.0 / (2 * np.sqrt(N)), bit


def test_hash_words_avalanche():
    """Flipping one input bit flips ~half the output bits (the property
    that makes adjacent pixel/sample ids independent streams)."""
    w = jnp.arange(N, dtype=jnp.uint32)
    base = np.asarray(rng.hash_words(0, w)).astype(np.uint64)
    for flip_bit in (0, 7, 19, 31):
        flipped = np.asarray(
            rng.hash_words(0, w ^ np.uint32(1 << flip_bit))).astype(np.uint64)
        diff = base ^ flipped
        popcount = np.unpackbits(
            diff.astype(">u4").view(np.uint8)).reshape(N, 32).sum(1)
        assert abs(popcount.mean() - 16.0) < 0.2, flip_bit


def test_independence_across_purposes_and_slots():
    """Draws from the same lane under different purposes / child slots
    are uncorrelated (the renderer relies on this for jitter vs lens vs
    light vs indirect sampling independence)."""
    streams = [
        _draws(0, N, rng.PURPOSE_AA_X),
        _draws(0, N, rng.PURPOSE_AA_Y),
        _draws(0, N, rng.PURPOSE_INDIRECT_R1),
        _draws(0, N, rng.PURPOSE_AA_X, slot=0),
        _draws(0, N, rng.PURPOSE_AA_X, slot=1),
        _draws(1, N, rng.PURPOSE_AA_X),  # different seed
    ]
    for i in range(len(streams)):
        for j in range(i + 1, len(streams)):
            r = np.corrcoef(streams[i], streams[j])[0, 1]
            assert abs(r) < 4.0 / np.sqrt(N), (i, j, r)


def test_mix_vs_threefry_moments():
    """The mix sponge agrees with the independent threefry generator on
    distribution moments within MC error — the cross-check the module
    docstring promises."""
    pix = jnp.arange(N, dtype=jnp.uint32)
    mix = np.asarray(rng.u01(0, pix, pix * 0 + 1, dtype=jnp.float32))
    tf = np.asarray(rng.u01(0, pix, pix * 0 + 1, dtype=jnp.float32,
                            backend="threefry"))
    se = 1.0 / np.sqrt(12 * N)  # std error of a U[0,1) mean
    assert abs(mix.mean() - tf.mean()) < 5 * se
    assert abs(mix.var() - tf.var()) < 0.003
    assert abs(_chi2_uniform(mix) - 1.0) < 0.6
    assert abs(_chi2_uniform(tf) - 1.0) < 0.6
    # and they are genuinely different generators, not accidental twins
    assert np.corrcoef(mix, tf)[0, 1] < 0.05


_MC_SCENE = """{
  objects: [
    { bounds: Plane { point: (0, -1, 0) normal: (0, 1, 0) }
      material: IndirectPhongMaterial { diffuse: rgb(0.6, 0.5, 0.4)
        specular: rgb(0,0,0) exponent: 1 ambient: rgb(0,0,0) samples: 1 } }
    { bounds: Sphere { center: (0, 1.5, -4) radius: 1 }
      material: IndirectPhongMaterial { diffuse: rgb(0,0,0)
        specular: rgb(0,0,0) exponent: 1 ambient: rgb(3, 2.5, 2)
        samples: 1 } }
  ]
  lights: []
  camera: SimplePerspectiveCamera new((0, 0.5, 1), (0, -0.2, -1), (0, 1, 0), 1.8)
  background: SolidColorBackground { color: rgb(0.05, 0.05, 0.08) }
  options: { width: 16 height: 8 antialias: 1 }
}"""


def test_rendered_mean_mix_vs_threefry(monkeypatch):
    """Image-level cross-check: rendering with threefry substituted for
    the mix sponge's uniform draws yields the same mean radiance within
    Monte-Carlo error.  This is the end-to-end statistical-parity test
    (SURVEY.md §4): a biased production generator would shift the mean
    beyond the estimator's noise floor.  The scene is MC-dominated
    (indirect hemisphere sampling lights every pixel)."""
    from raytrace_tpu.render.integrator import primary_rays, radiance_v
    from raytrace_tpu.scene import dsl
    from raytrace_tpu.scene.builder import build_scene

    scene = build_scene(dsl.parse(_MC_SCENE), dtype=jnp.float32)
    data, spec = scene.data, scene.spec
    n_pix, n_s = 16 * 8, 16
    pix = jnp.arange(n_pix, dtype=jnp.uint32)
    px, py = pix % 16, pix // 16

    def render(use_threefry: bool):
        if use_threefry:
            real_draw = rng.draw

            def tf_draw(k1, k2, purpose, dtype):
                # same stream identity (k1, k2, purpose), independent
                # generator: threefry over the identity words
                return rng._u01_threefry(
                    0, k1, k2,
                    k1 * 0 + np.uint32(purpose % (1 << 16)), dtype=dtype)

            monkeypatch.setattr(rng, "draw", tf_draw)
        try:
            vals = []
            for s in range(n_s):
                lane_pix = px
                lane_piy = py
                aa = px * 0 + np.uint32(s)
                cam = px * 0
                ro, rd, k1, k2 = primary_rays(data, spec, lane_pix,
                                              lane_piy, aa, cam, 0)
                rad = radiance_v(data, spec, ro, rd, k1, k2)
                vals.append(np.asarray(rad.x + rad.y + rad.z))
            return np.stack(vals)
        finally:
            if use_threefry:
                monkeypatch.setattr(rng, "draw", real_draw)

    a = render(False)
    b = render(True)
    # per-pixel MC std of the mean estimator, pooled
    sem = np.sqrt((a.var(0) + b.var(0)) / n_s + 1e-12)
    diff = np.abs(a.mean(0) - b.mean(0))
    # individual pixels within 6 sigma; image mean much tighter
    assert (diff < 6 * sem + 1e-6).mean() > 0.99
    assert abs(a.mean() - b.mean()) < 4 * sem.mean() / np.sqrt(n_pix)
