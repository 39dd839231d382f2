"""Device mesh construction.

One logical axis family for this workload (SURVEY.md §5.7-5.8):

* ``"d"`` — the ray/pixel data axis, sharded over every device.  When
  spanning multiple slices/hosts, build a 2-level ``("dcn", "ici")`` mesh
  so XLA keeps the heavy collectives on ICI.
* ``"p"`` — optional primitive axis for ring-sharded intersection of
  huge scenes (parallel/ring.py).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up (SURVEY.md §5.8): ``jax.distributed
    .initialize`` with standard env-based auto-detection.

    On single-process runs this is a no-op; on TPU pods the runtime
    env usually provides everything, so bare ``init_distributed()``
    suffices.  Idempotent: repeated calls are ignored.
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        pass  # already initialized (or single-process backend)


def maybe_init_distributed() -> bool:
    """Initialize multi-process JAX iff the environment asks for it —
    called by the CLI and bench BEFORE any device query.

    Two triggers (first match wins):

    * ``RAYTRACE_TPU_COORDINATOR`` (+ ``RAYTRACE_TPU_NUM_PROCESSES`` /
      ``RAYTRACE_TPU_PROCESS_ID``): explicit cluster spec — the
      2-process CPU-cluster test drives this path;
    * ``RAYTRACE_TPU_DISTRIBUTED=1``: TPU-pod auto-detection
      (``jax.distributed.initialize()`` with no args — the runtime env
      provides coordinator/count/id on Cloud TPU).

    Returns True when an initialization was attempted.
    """
    import os

    coord = os.environ.get("RAYTRACE_TPU_COORDINATOR")
    if coord:
        init_distributed(
            coordinator=coord,
            num_processes=int(os.environ["RAYTRACE_TPU_NUM_PROCESSES"]),
            process_id=int(os.environ["RAYTRACE_TPU_PROCESS_ID"]))
        return True
    if os.environ.get("RAYTRACE_TPU_DISTRIBUTED", "") not in ("", "0"):
        init_distributed()
        return True
    return False


def make_mesh(devices=None, axis_name: str = "d") -> Mesh:
    """Flat 1-D mesh over all (or the given) devices."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(n_dcn: int | None = None, devices=None) -> Mesh:
    """Two-level ("dcn", "ici") mesh: outer axis across process groups
    (slices / hosts), inner axis across the chips of each group.

    With a single process, ``n_dcn`` defaults to 1 (all devices on ICI).
    """
    devices = jax.devices() if devices is None else devices
    if n_dcn is None:
        n_dcn = max(getattr(jax, "process_count", lambda: 1)(), 1)
    n = len(devices)
    assert n % n_dcn == 0, (n, n_dcn)
    arr = np.asarray(devices).reshape(n_dcn, n // n_dcn)
    return Mesh(arr, ("dcn", "ici"))
