"""Dense one-hot contractions: TPU-native replacements for batched
row/element gathers.

On a v5e, a data-dependent row gather ``table[idx]`` with a
(particles,)-sized index vector lowers to serialized element addressing
(~0.18 µs/row — the dominant cost of a discrete-state particle filter
step). The MXU-native alternative: materialize the index as a one-hot
matrix and contract it against the table — ``P×S×S`` MACs the systolic
array does in microseconds. At S ≤ a few hundred states the matmul is
thousands of times cheaper than the gather.

Precision: XLA lowers f32 matmuls on TPU via the bf16×3 decomposition;
a one-hot row selection therefore reproduces the table values to f32
roundoff (±1 ulp), not bitwise. For sampling logits and log-density
accumulation this is harmless; for bit-exact selection use an actual
gather.

No reference counterpart: the reference's discrete-HMM cookbook uses
``torch``-style fancy indexing; this formulation exists because of the
TPU cost model (see ``ops/resample.py`` and BASELINE.md §cost-model).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["one_hot_rows", "take_rows", "take_elems"]


def one_hot_rows(idx: jax.Array, n: int,
                 dtype=jnp.float32) -> jax.Array:
    """``(P,) int → (P, n)`` one-hot matrix (iota compare; no gather)."""
    return (
        idx[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    ).astype(dtype)


def take_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """``table[idx]`` for a ``(S, …)`` table and ``(P,)`` int index —
    as a one-hot matmul on the MXU instead of a row gather. Returns
    ``(P, …)`` to f32 roundoff of the table values."""
    oh = one_hot_rows(idx, table.shape[0], dtype=table.dtype)
    flat = table.reshape(table.shape[0], -1)
    out = jnp.dot(oh, flat, preferred_element_type=flat.dtype)
    return out.reshape((idx.shape[0],) + table.shape[1:])


def take_elems(table: jax.Array, idx: jax.Array) -> jax.Array:
    """``table[idx]`` for a ``(S,)`` vector and ``(P,)`` int index —
    one-hot matvec (returns ``(P,)``)."""
    oh = one_hot_rows(idx, table.shape[0], dtype=table.dtype)
    return jnp.dot(oh, table, preferred_element_type=table.dtype)
