"""TPU-fast systematic-resampling expansion (the VERDICT r1 "DMA-run"
perf item).

Problem: resampling expands sources by offspring counts — ``dest[j] =
src[a_j]`` with ``a_j`` the monotone ancestor sequence. The obvious
lowerings are element-level gathers/scatters, which on TPU v5e all hit
the same ~18.7 ms floor at 1M particles (measured,
``benchmarks/tpu_micro.py``: gather 18.6 ms, counts+scatter 18.7 ms,
``jnp.repeat`` 18.9 ms, scatter+fill-forward 13.7 ms) — 8–18 ns per
element against a ~1.4 ms dispatch/bandwidth floor.

What IS fast is moving whole (8, 128)-aligned rows: gathering 8192 rows
of 128 lanes measured 1.5 ms (12x), and within-register compare/reduce
math is ~free (64 fused elementwise ops on 1M values time the same as
1). So this module expands by counts with **no element-level gather or
scatter at all**:

1. View sources as ``(G, 128)`` lane rows. Each source ``i`` owns the
   contiguous dest interval ``[start_i, end_i)`` (exclusive/inclusive
   offspring-count cumsum) — systematic resampling's ancestors are
   monotone, so every dest block reads a contiguous RUN of source rows.
2. Compact away empty rows (index-space argsort; one row-level gather
   per iteration window) so weight degeneracy cannot stretch a run.
3. For each dest block (``R`` rows = ``B = 128·R`` dests), gather a slab
   of ``W`` candidate compacted source rows — whole-row DMA traffic —
   and select by interval membership: ``(start_i <= j) & (j < end_i)``,
   a VPU compare mask contracted against the slab values. Exactly one
   source interval contains each dest, so the contraction IS the
   expansion.
4. A global ``lax.while_loop`` advances the (rare) blocks whose run is
   longer than ``W`` rows; typical filters cover every block in one
   window (run length ≈ R+1 rows).

No reference counterpart: the reference (CUDA/torch) resamples with
``torch.gather``; this layout-aware formulation exists because of the
TPU cost model above.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
from jax import lax

__all__ = ["expand_by_counts", "supports_fast_expand"]


def supports_fast_expand(n_src: int, n_dest: int, lanes: int = 128,
                         rows_per_block: int = 1) -> bool:
    """Fast path requires src == dest count, divisible into lane rows
    and dest blocks."""
    block = lanes * rows_per_block
    return (
        n_src == n_dest
        and n_src % block == 0
        and n_src // lanes >= rows_per_block
    )


def expand_by_counts(tree, counts: jax.Array, n: int, *,
                     lanes: int = 128, rows_per_block: int = 1,
                     margin: int = 3):
    """``tree_map(lambda v: jnp.repeat(v, counts, total_repeat_length=n),
    tree)`` — bitwise the same dest layout — via blocked interval
    expansion (module docstring). ``counts`` must sum to ``n`` and every
    leaf's leading dim must equal ``n`` (== source count).
    """
    leaves, treedef = jtu.tree_flatten(tree)
    assert leaves, "expand_by_counts: empty tree"
    assert all(l.shape[0] == n for l in leaves)

    L = lanes
    G = n // L
    R = rows_per_block
    B = R * L
    D = n // B
    W = R + margin  # slab rows per iteration window

    c_inc = jnp.cumsum(counts).astype(jnp.int32)          # (N,) ends
    c_st = c_inc - counts                                  # (N,) starts
    ends2 = c_inc.reshape(G, L)
    starts2 = c_st.reshape(G, L)
    rowend = ends2[:, -1]
    rowstart = starts2[:, 0]
    nonempty = rowend > rowstart

    # Index-space compaction: nonempty rows first, original order kept
    # (stable), so contributing runs are contiguous in compacted space.
    order = jnp.argsort(jnp.logical_not(nonempty), stable=True)  # (G,)
    k_live = jnp.sum(nonempty)
    pad_k = jnp.arange(G) >= k_live
    # Padding (ex-empty) rows get the terminal interval [n, n): they
    # contribute nothing and certify coverage, so the loop terminates.
    rowend_c = jnp.where(pad_k, n, rowend[order])          # (G,) sorted
    # Pad with W extra terminal rows so in-loop dynamic slices never
    # clamp (a clamped slice would re-read — and re-accumulate — rows).
    rowend_cp = jnp.concatenate(
        [rowend_c, jnp.full((W,), n, jnp.int32)]
    )
    order_p = jnp.concatenate([order, jnp.zeros((W,), order.dtype)])
    ends_cp = jnp.where(pad_k[:, None], n, ends2[order])
    ends_cp = jnp.concatenate(
        [ends_cp, jnp.full((W, L), n, jnp.int32)]
    )
    starts_cp = jnp.where(pad_k[:, None], n, starts2[order])
    starts_cp = jnp.concatenate(
        [starts_cp, jnp.full((W, L), n, jnp.int32)]
    )

    # First compacted row of each dest block: the row whose interval
    # contains dest j0 = b·B (rowend_c is nondecreasing).
    block_lo = jnp.arange(D, dtype=jnp.int32) * B          # (D,)
    k0 = jnp.sum(
        rowend_c[None, :] <= block_lo[:, None], axis=1
    ).astype(jnp.int32)                                    # (D,)

    js = block_lo[:, None] + jnp.arange(B, dtype=jnp.int32)[None, :]

    rows2 = [l.reshape((G, L) + l.shape[1:]) for l in leaves]

    def slab(arr, k):
        """(D, W, ...) window rows arr[k_b : k_b + W] for every block —
        a whole-row gather (the fast primitive)."""
        idx = k[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
        return arr[idx]

    def body(state):
        k, covered, accs = state
        live = jnp.logical_not(covered)                    # (D,)
        st = slab(starts_cp, k).reshape(D, W * L)          # (D, WL)
        en = slab(ends_cp, k).reshape(D, W * L)
        # Membership: dest j is owned by source i iff st_i <= j < en_i.
        m = (
            (st[:, None, :] <= js[:, :, None])
            & (js[:, :, None] < en[:, None, :])
            & live[:, None, None]
        )                                                  # (D, B, WL)
        src_rows = slab(order_p, k)                        # (D, W)
        new_accs = []
        for rows, acc in zip(rows2, accs):
            vals = rows[src_rows]                          # (D, W, L, E…)
            vals = vals.reshape((D, 1, W * L) + vals.shape[3:])
            mm = m.reshape(m.shape + (1,) * (vals.ndim - 3))
            if vals.dtype == jnp.bool_:
                contrib = jnp.any(jnp.logical_and(mm, vals), axis=2)
                new_accs.append(jnp.logical_or(acc, contrib))
            else:
                contrib = jnp.sum(
                    jnp.where(mm, vals, jnp.zeros((), vals.dtype)),
                    axis=2,
                )                                          # (D, B, E…)
                new_accs.append(acc + contrib)
        done = slab(rowend_cp, k)[:, -1] >= (block_lo + B)  # (D,)
        return (
            jnp.where(covered, k, k + W),
            covered | done,
            tuple(new_accs),
        )

    def cond(state):
        _, covered, _ = state
        return jnp.logical_not(jnp.all(covered))

    accs0 = tuple(
        jnp.zeros((D, B) + l.shape[1:], l.dtype) for l in leaves
    )
    _, _, accs = lax.while_loop(
        cond, body, (k0, jnp.zeros((D,), bool), accs0)
    )
    out_leaves = [
        a.reshape((n,) + l.shape[1:]) for a, l in zip(accs, leaves)
    ]
    return jtu.tree_unflatten(treedef, out_leaves)
