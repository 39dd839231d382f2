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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # f64 available for parity tests

# Timing record (r4, this machine: 2 CPUs): fast tier
# (-m "not slow") = 120 tests, COLD (.jax_cache_cpu removed) 11:19
# wall with `-n 2` (pytest-xdist; user time 19:26 — the suite is
# CPU-bound and fully parallel, so more cores cut wall-clock
# proportionally); warm cache ~10:50 single-process, ~6 min with -n 2.
# The dominant costs are interpret-mode Pallas parity tests and
# shard_map AD compiles; heavy tests run at reduced max_depth (the
# code under test is depth-blind) — see the r4 trim commit.
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
