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

__all__ = ["expand_by_counts", "expand_by_cumulative",
           "supports_fast_expand"]


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
    leaf's leading dim must equal ``n`` (== source count)."""
    return expand_by_cumulative(
        tree, jnp.cumsum(counts).astype(jnp.int32), n,
        lanes=lanes, rows_per_block=rows_per_block, margin=margin,
    )


def expand_by_cumulative(tree, counts_cum: jax.Array, n: int, *,
                         lanes: int = 128, rows_per_block: int = 1,
                         margin: int = 3):
    """Blocked interval expansion from the INCLUSIVE cumulative count
    array (``counts_cum[i]`` = end of source ``i``'s dest interval).
    Systematic resampling produces this directly from the weight CDF
    (``smc.systematic_offspring_cumulative``), so taking it here skips a
    second length-``n`` cumsum per resample. ``counts_cum`` must be
    nondecreasing with ``counts_cum[-1] == n``."""
    leaves, treedef = jtu.tree_flatten(tree)
    assert leaves, "expand_by_cumulative: empty tree"
    assert all(l.shape[0] == n for l in leaves)

    L = lanes
    G = n // L
    R = rows_per_block
    B = R * L
    D = n // B
    W = R + margin  # slab rows per iteration window

    c_inc = counts_cum.astype(jnp.int32)                  # (N,) ends
    ends2 = c_inc.reshape(G, L)
    rowend = ends2[:, -1]
    rowstart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), rowend[:-1]]
    )
    nonempty = rowend > rowstart

    # Index-space compaction: nonempty rows first, original order kept
    # (stable), so contributing runs are contiguous in compacted space.
    order = jnp.argsort(jnp.logical_not(nonempty), stable=True)  # (G,)
    k_live = jnp.sum(nonempty)
    pad_k = jnp.arange(G) >= k_live
    # Padding (ex-empty) rows get the terminal interval [n, n): they
    # contribute nothing and certify coverage, so the loop terminates.
    rowend_c = jnp.where(pad_k, n, rowend[order])          # (G,) sorted
    ends_c = jnp.where(pad_k[:, None], n, ends2[order])    # (G, L)

    # Ends-only slab source with a leading all-zero SENTINEL row.
    # Profiled round 2: the separate (D, W) element gathers of the
    # rowend/starts/order arrays cost ~0.23 ms each at 1M (the
    # element-gather floor), and widening rows past 128 lanes breaks
    # (8,128) tiling. Instead: gather W+1 aligned rows starting one row
    # EARLY; the last lane of the early row is the window's start
    # boundary, and row ends / the done-check fall out of the last lane
    # for free.
    comb = jnp.concatenate([
        jnp.zeros((1, L), jnp.int32),                      # sentinel
        ends_c,
        # W terminal pad rows so in-loop slab indices never clamp (a
        # clamped gather would re-read — and re-accumulate — rows).
        jnp.full((W, L), n, jnp.int32),
    ])                                                     # (1+G+W, L)

    # First compacted row of each dest block: the row whose interval
    # contains dest j0 = b·B (rowend_c is nondecreasing).
    block_lo = jnp.arange(D, dtype=jnp.int32) * B          # (D,)
    k0 = jnp.sum(
        rowend_c[None, :] <= block_lo[:, None], axis=1
    ).astype(jnp.int32)                                    # (D,)

    js = block_lo[:, None] + jnp.arange(B, dtype=jnp.int32)[None, :]

    # Values as INTEGER BIT PATTERNS, pre-gathered into compacted row
    # order once per call (removes the per-iteration order element
    # gather). Bit patterns make the suffix-difference contraction below
    # exact: int adds/subs telescope exactly (mod 2^k), where float
    # telescoping would reintroduce rounding.
    bits = []
    for l in leaves:
        if l.dtype == jnp.bool_:
            bl = l.astype(jnp.int8)
        elif l.dtype.itemsize == 1:
            bl = lax.bitcast_convert_type(l, jnp.int8)
        elif l.dtype.itemsize == 2:
            bl = lax.bitcast_convert_type(l, jnp.int16)
        else:  # 4- and 8-byte dtypes (8-byte gains a trailing pair dim)
            bl = lax.bitcast_convert_type(l, jnp.int32)
        r2 = bl.reshape((G, L) + bl.shape[1:])
        rc = r2[order]                                     # (G, L, E…)
        rc = jnp.concatenate(
            [rc, jnp.zeros((W,) + rc.shape[1:], rc.dtype)]
        )                                                  # (G+W, L, E…)
        bits.append(rc)

    def body(state):
        k, covered, accs = state
        live = jnp.logical_not(covered)                    # (D,)
        # Rows k-1 .. k+W-1 of the sentinel-shifted comb (compacted row
        # i lives at comb[i+1], so the slab index is just k + arange).
        idxe = k[:, None] + jnp.arange(W + 1, dtype=jnp.int32)[None, :]
        eslab = comb[idxe].reshape(D, (W + 1) * L)         # (D, (W+1)L)
        en = eslab[:, L:]                                  # (D, WL)
        winstart = eslab[:, L - 1]                         # (D,)
        # Deactivated dests (covered block, or owner before this window
        # — already accumulated) get the sentinel j = B, which matches
        # no suffix (relative ends are clamped to B).
        valid = live[:, None] & (js >= winstart[:, None])
        js_rel = jnp.where(
            valid, js - block_lo[:, None], B
        ).astype(jnp.int16)                                # (D, B)
        # Block-RELATIVE clamped ends: j < en ≡ j_rel < min(en−lo, B)
        # for j_rel < B (ends of this block's window are ≥ block_lo, and
        # any end beyond the block clamps to B > j_rel). B = R·128 fits
        # int16, so the hot compare below runs at double VPU width.
        en_rel = jnp.clip(
            en - block_lo[:, None], 0, B
        ).astype(jnp.int16)                                # (D, WL)
        # Suffix-difference contraction. Ownership of dest j is "first
        # i with en_i > j" (ends are nondecreasing; empty intervals
        # share their predecessor's end so they are never first). With
        # w_i = v_i − v_{i+1} (and w_last = v_last), the masked sum
        #   Σ_i [j < en_i] · w_i  =  v_{owner}
        # telescopes EXACTLY in integer bit-pattern arithmetic — one
        # compare per candidate instead of the two-sided interval test.
        suf = js_rel[:, :, None] < en_rel[:, None, :]      # (D, B, WL)
        idxo = k[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
        new_accs = []
        for rc, acc in zip(bits, accs):
            vals = rc[idxo]                                # (D, W, L, E…)
            flat = vals.reshape((D, W * L) + vals.shape[3:])
            shifted = jnp.concatenate(
                [flat[:, 1:], jnp.zeros_like(flat[:, :1])], axis=1
            )
            w = flat - shifted                             # w_i = v_i − v_{i+1}
            mm = suf.reshape(suf.shape + (1,) * (w.ndim - 2))
            contrib = jnp.sum(
                jnp.where(mm, w[:, None], jnp.zeros((), w.dtype)),
                axis=2, dtype=w.dtype,
            )                                              # (D, B, E…): mod-2^k sum
            new_accs.append(acc + contrib)
        done = en[:, -1] >= (block_lo + B)                 # (D,)
        return (
            jnp.where(covered, k, k + W),
            covered | done,
            tuple(new_accs),
        )

    def cond(state):
        _, covered, _ = state
        return jnp.logical_not(jnp.all(covered))

    accs0 = tuple(
        jnp.zeros((D, B) + rc.shape[2:], rc.dtype) for rc in bits
    )
    _, _, accs = lax.while_loop(
        cond, body, (k0, jnp.zeros((D,), bool), accs0)
    )
    out_leaves = []
    for a, l in zip(accs, leaves):
        flat = a.reshape((n,) + a.shape[2:])
        if l.dtype == jnp.bool_:
            out_leaves.append(flat.astype(jnp.bool_))
        elif flat.dtype != l.dtype:
            out_leaves.append(lax.bitcast_convert_type(flat, l.dtype))
        else:
            out_leaves.append(flat)
    return jtu.tree_unflatten(treedef, out_leaves)
