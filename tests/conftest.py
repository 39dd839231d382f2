"""Test configuration: force a deterministic 8-virtual-device CPU backend.

Sharding tests run on a simulated 8-device mesh
(``--xla_force_host_platform_device_count=8``, SURVEY.md §4) so that
``shard_map`` correctness is validated without real multi-chip hardware.

Note: the environment may pre-register a TPU PJRT plugin at interpreter
startup and pin ``jax_platforms`` via ``jax.config.update`` (which takes
precedence over the JAX_PLATFORMS env var), so we must override through
``jax.config`` too — env vars alone are not enough.  XLA_FLAGS must still
be set before the CPU backend is first initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# NOTE on --xla_backend_optimization_level=0: tried for the cold-time
# target (r5) — it cut the cold fast tier 9:02 -> 7:18, but the
# heaviest interpret-mode slow-tier parities appeared to regress at
# runtime (emulated-op execution leans on XLA:CPU optimization), and
# it changes FMA/fusion choices, which broke cross-process
# bit-identity until the multihost worker matched the flag.  Kept at
# the DEFAULT level for stability; revisit with per-tier processes if
# the cold target must be met on this machine.
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # f64 available for parity tests

# Timing record (r5, this machine: 2 CPUs), measured with
# `rm -rf .jax_cache_cpu; pytest -m "not slow" -n 2`:
#   r4: 121 tests, COLD 11:19.
#   r5 after the two-round re-tier (every demoted parity has a named
#   fast twin in its docstring) + one-geometry trims: COLD 9:02
#   (112 tests, 2026-08-21; a further 7:18 was measured with
#   --xla_backend_optimization_level=0, rejected — see the NOTE above).
#   Warm cache: ~5:20 with -n 2.  The <5:00 target is still unmet on
#   this 2-core machine — documented honestly rather than met by
#   removing fast-tier coverage of the r5 regimes; the structural
#   floor analysis is below.
# The remaining floor is structural: ~25 DISTINCT regime programs
# (linear/tree/loop x small/large x solid/skybox x fused/jnp, sharded
# variants, grads) each cost a 15-40 s XLA:CPU compile, shared via the
# jaxpr-keyed cache within and across runs, on 2 cores.  Cutting
# further means removing fast-tier coverage of real regimes — the
# r5 additions (large fan-out fold, K-slot skybox, gather resolve,
# row-aligned multihost) added 4 new program families relative to the
# r4 record.  The slow tier holds the demoted full parities; run it
# with `-m slow`.
#
# CPU wavefront programs take seconds-to-minutes to compile; cache them
# across runs (keyed on jaxpr, so source edits invalidate precisely)
from raytrace_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache(os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")))

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.default_backend())
assert jax.device_count() == 8

# ---------------------------------------------------------------------------
# Shared path anchors (no hardcoded checkout locations, ADVICE.md r1)

from pathlib import Path  # noqa: E402

import pytest  # noqa: E402

REPO_ROOT = Path(__file__).resolve().parent.parent
# upstream reference snapshot; optional — tests needing it skip if absent
REFERENCE_DIR = Path(os.environ.get("RAYTRACE_TPU_REFERENCE_DIR",
                                    "/root/reference"))


def reference_path(*parts) -> Path:
    """Path under the reference snapshot, skipping if unavailable."""
    p = REFERENCE_DIR.joinpath(*parts)
    if not p.exists():
        pytest.skip(f"reference snapshot not available: {p}",
                    allow_module_level=True)
    return p


def repo_path(*parts) -> Path:
    return REPO_ROOT.joinpath(*parts)
