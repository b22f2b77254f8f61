"""Fast row gathers for small tables.

TPU gathers cost ~1 row/cycle; for the per-bounce shading path (12+ row
lookups per ray) that dominates the bounce.  For tables of <= ~2048 rows a
one-hot matmul on the MXU is far faster: build (R, T) one-hot in bf16 and
contract with the (T, C) table in f32 accumulation.  Larger tables fall
back to a single packed-row gather (one gather instead of a dozen).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

ONEHOT_MAX_ROWS = 2048


def onehot_gather(table, idx):
    """table (T, C) f32, idx (R,) int -> (R, C).

    Exact for values representable in bf16*onehot f32-accum (the one-hot
    has exactly one 1.0 per row, so the matmul is a exact row-select).
    """
    T = table.shape[0]
    if T > ONEHOT_MAX_ROWS:
        return table[jnp.clip(idx, 0, T - 1)]
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], T), 1)
    onehot = (cols == idx[:, None]).astype(jnp.float32)
    # one-hot row select; HIGHEST precision makes the bf16x-pass MXU
    # matmul exact for 0/1 coefficients (default bf16 would round the rows)
    return jax.lax.dot_general(
        onehot, table,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def pack_rows(*arrays):
    """Concatenate per-row fields into a (N, C) matrix for row-select.

    1-D arrays become single columns (ints cast to f32 — exact < 2^24).
    Built from the LIVE pytree fields each trace, so parameter gradients
    flow and there is no stale-copy hazard; XLA hoists the concat out of
    the bounce scan.
    """
    cols = []
    for a in arrays:
        if a.ndim == 1:
            a = a[:, None]
        cols.append(a.astype(jnp.float32))
    return jnp.concatenate(cols, axis=1)
