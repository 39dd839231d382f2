"""Gather-free table lookups: one-hot matmuls on the MXU.

TPU gathers with dynamic indices lower to slow scalar paths; for the
small padded tables of this workload (objects, materials — tens to
hundreds of rows) the TPU-native formulation is a one-hot expansion
``(N, O)`` contracted against the table ``(O, K)`` on the MXU.

Measured on v5e (524k lanes, (O, 22) f32 table, marginal chained-launch
cost — the bench.py methodology): ``jnp.take`` costs ~1.3 ms at every O;
the one-hot matmul at HIGHEST precision costs 0.44 ms @ O=128,
1.18 ms @ O=1024, 3.5 ms @ O=2048.  HIGHEST precision is required for
**bit-exactness**: a one-hot row selects exactly one table entry, but
the MXU's default f32 path rounds operands through bf16 (verified:
default-precision results differ from the gather), while the HIGHEST
multi-pass decomposition reproduces the f32 values exactly.  Used by
``ops.intersect._closest_hit_scanned`` below
``ONE_HOT_LOOKUP_MAX_OBJECTS``; big tables keep ``jnp.take``.

The contraction is linear, so gradients w.r.t. table entries are exactly
those of the gather formulation (used by the differentiable path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def one_hot(idx: jnp.ndarray, n: int, dtype) -> jnp.ndarray:
    """(N,) int -> (N, n) one-hot in the compute dtype."""
    cols = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    return (idx[:, None].astype(jnp.int32) == cols).astype(dtype)


def take(table: jnp.ndarray, oh: jnp.ndarray) -> jnp.ndarray:
    """Row lookup via one-hot contraction, bit-exact vs ``jnp.take``.

    table: (O, ...) — trailing dims are flattened into one matmul;
    oh: (N, O) one-hot.  Returns (N, ...).
    """
    o = table.shape[0]
    flat = table.reshape(o, -1)
    out = jnp.dot(oh, flat.astype(oh.dtype),
                  preferred_element_type=oh.dtype,
                  precision=jax.lax.Precision.HIGHEST)
    return out.reshape(oh.shape[0], *table.shape[1:])
