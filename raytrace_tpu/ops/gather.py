"""Gather-free table lookups: one-hot matmuls on the MXU.

TPU gathers with dynamic indices lower to slow scalar paths; for the
small padded tables of this workload (objects, materials — tens to
thousands of rows) the TPU-native formulation is a one-hot expansion
``(N, O)`` contracted against the table ``(O, K)`` on the MXU.  Measured
on v5e: 6 separate ``table[obj]`` gathers over 524k lanes cost ~4 ms;
the equivalent one-hot matmul costs well under 1 ms — and the one-hot
matrix is built once per wavefront level and reused for every table.

The contraction is linear, so gradients w.r.t. table entries are exactly
those of the gather formulation (used by the differentiable path).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def one_hot(idx: jnp.ndarray, n: int, dtype) -> jnp.ndarray:
    """(N,) int -> (N, n) one-hot in the compute dtype."""
    cols = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    return (idx[:, None].astype(jnp.int32) == cols).astype(dtype)


def take(table: jnp.ndarray, oh: jnp.ndarray) -> jnp.ndarray:
    """Row lookup via one-hot contraction.

    table: (O, ...) — trailing dims are flattened into one matmul;
    oh: (N, O) one-hot.  Returns (N, ...).
    """
    o = table.shape[0]
    flat = table.reshape(o, -1)
    out = jnp.dot(oh, flat.astype(oh.dtype),
                  preferred_element_type=oh.dtype)
    return out.reshape(oh.shape[0], *table.shape[1:])
