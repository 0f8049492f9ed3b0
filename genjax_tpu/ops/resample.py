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
   and select by suffix membership: exactly one source interval
   contains each dest, and the suffix-difference contraction (see the
   window pass below) recovers its value with ONE compare per
   candidate.
4. **Straggler compaction** (round-2 rework of the original global
   ``lax.while_loop``): pass 1 runs ONE unconditional window over every
   block — enough for any block whose run fits ``W`` rows (the typical
   case for all blocks). The rare blocks spanning more rows (weight
   degeneracy spreading a block's dests over many thinly-populated
   rows) are *compacted* into batches of ``straggler_batch`` block
   slots and redone from scratch with wider windows — so a handful of
   stragglers costs a ``S·B``-sized loop, not a rerun of the full
   ``n``-sized contraction. (Profiled on-chip: the global while
   averaged 1.48 full-size iterations because ~half of resamples had
   at least one straggler block.)

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


#: Row count above which the block-start computation recurses instead of
#: running the (D, G) brute-force compare. The quadratic compare is VPU-
#: cheap up to ~2^14 rows (67M compares ≈ 0.02 ms at 1M particles) but
#: grows O((n/128)²) — 0.7 ms/resample at 2^23 particles. Tests shrink
#: this to force the recursive path at small sizes.
_K0_RECURSE_MIN_ROWS = 16384


def _first_rows(rowend_c, block_lo, G: int, D: int, B: int):
    """``k0[b] = #{i : rowend_c[i] <= b*B}`` — the first compacted row
    of each dest block (both sequences nondecreasing).

    Large ensembles recurse: with ``c_i = ceil(rowend_c[i]/B)`` (also
    nondecreasing, ``c[-1] == D``), ``k0[b] = #{i : c_i <= b}`` is the
    ownership inverse of the monotone map ``c`` — exactly what
    :func:`expand_by_cumulative` computes (``dest[b] = src[first i
    with c_i > b]`` over ``src = arange``), at 1/128 the size. One
    recursion level makes the block-start cost O(n); below the
    threshold the brute-force compare wins (fully vectorized, operands
    VMEM-resident)."""
    if (
        D == G
        and G >= _K0_RECURSE_MIN_ROWS
        and supports_fast_expand(G, G)
    ):
        c = (rowend_c + (B - 1)) // B                      # ceil, exact
        return expand_by_cumulative(
            jnp.arange(G, dtype=jnp.int32), c.astype(jnp.int32), G
        )
    return jnp.sum(
        rowend_c[None, :] <= block_lo[:, None], axis=1
    ).astype(jnp.int32)


def expand_by_counts(tree, counts: jax.Array, n: int, *,
                     lanes: int = 128, rows_per_block: int = 1,
                     margin: int = 3, straggler_margin: int = 15,
                     straggler_batch: int = 256):
    """``tree_map(lambda v: jnp.repeat(v, counts, total_repeat_length=n),
    tree)`` — bitwise the same dest layout — via blocked interval
    expansion (module docstring). ``counts`` must sum to ``n`` and every
    leaf's leading dim must equal ``n`` (== source count)."""
    return expand_by_cumulative(
        tree, jnp.cumsum(counts).astype(jnp.int32), n,
        lanes=lanes, rows_per_block=rows_per_block, margin=margin,
        straggler_margin=straggler_margin,
        straggler_batch=straggler_batch,
    )


#: Trailing-element count above which a leaf expands by ancestor-index
#: + row gather instead of the blocked masked-sum contraction. Measured
#: v5e at 512k particles, (N, 64) f32 leaf: blocked contraction 32.9 ms
#: (the per-pair select-add multiplies by every event element) vs
#: ancestor-expand + ``jnp.take`` rows 7.4 ms; at E=16 the narrow-row
#: gather (20.5 ms) loses to the contraction, and at E=1 the element
#: gather floor (~8 ms/1M) loses to the 0.6 ms blocked expansion — so
#: the crossover sits between. The ancestor expansion itself runs
#: through the same blocked machinery on an ``arange`` leaf (bitwise
#: identical dest layout), so wide and narrow leaves always agree.
_WIDE_EVENT_MIN = 64


def expand_by_cumulative(tree, counts_cum: jax.Array, n: int, *,
                         lanes: int = 128, rows_per_block: int = 1,
                         margin: int = 3, straggler_margin: int = 15,
                         straggler_batch: int = 256):
    """Blocked interval expansion from the INCLUSIVE cumulative count
    array (``counts_cum[i]`` = end of source ``i``'s dest interval).
    Systematic resampling produces this directly from the weight CDF
    (``smc.systematic_offspring_cumulative``), so taking it here skips a
    second length-``n`` cumsum per resample. ``counts_cum`` must be
    nondecreasing with ``counts_cum[-1] == n``.

    Leaves with ≥ ``_WIDE_EVENT_MIN`` trailing elements expand by
    row-gathering at the blocked-expanded ancestor indices (see the
    constant above); narrow leaves run the contraction directly.

    ``margin`` sets pass-1's window (``W1 = rows_per_block + margin``
    slab rows per block); ``straggler_margin`` the redo window for
    blocks pass 1 could not cover; ``straggler_batch`` how many such
    blocks one redo iteration processes."""
    kw = dict(lanes=lanes, rows_per_block=rows_per_block, margin=margin,
              straggler_margin=straggler_margin,
              straggler_batch=straggler_batch)
    leaves, treedef = jtu.tree_flatten(tree)
    assert leaves, "expand_by_cumulative: empty tree"
    assert all(l.shape[0] == n for l in leaves)
    wide = [
        i for i, l in enumerate(leaves)
        if int(jnp.size(l)) // n >= _WIDE_EVENT_MIN
    ]
    if wide:
        wide_set = set(wide)
        narrow = [l for i, l in enumerate(leaves) if i not in wide_set]
        base = _expand_blocked(
            narrow + [jnp.arange(n, dtype=jnp.int32)], counts_cum, n,
            **kw,
        )
        anc = base[-1]
        it = iter(base[:-1])
        out = [
            jnp.take(l, anc, axis=0) if i in wide_set else next(it)
            for i, l in enumerate(leaves)
        ]
        return jtu.tree_unflatten(treedef, out)
    return jtu.tree_unflatten(
        treedef, _expand_blocked(leaves, counts_cum, n, **kw)
    )


def _expand_blocked(leaves, counts_cum: jax.Array, n: int, *,
                    lanes: int = 128, rows_per_block: int = 1,
                    margin: int = 3, straggler_margin: int = 15,
                    straggler_batch: int = 256):
    """The blocked masked-sum contraction over a list of (narrow)
    leaves; returns the expanded leaves as a list."""

    L = lanes
    G = n // L
    R = rows_per_block
    B = R * L
    D = n // B
    W1 = R + margin                      # pass-1 slab rows per block
    W2 = R + straggler_margin            # straggler redo slab rows
    Wp = max(W1, W2)                     # comb/value pad rows
    S = min(straggler_batch, D)

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
    # contribute nothing and certify coverage, so every block's window
    # sequence terminates.
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
        # Wp terminal pad rows so slab indices never clamp (a clamped
        # gather would re-read — and re-accumulate — rows).
        jnp.full((Wp, L), n, jnp.int32),
    ])                                                     # (1+G+Wp, L)

    # First compacted row of each dest block: the row whose interval
    # contains dest j0 = b·B (rowend_c is nondecreasing).
    block_lo = jnp.arange(D, dtype=jnp.int32) * B          # (D,)
    k0 = _first_rows(rowend_c, block_lo, G, D, B)          # (D,)

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
            [rc, jnp.zeros((Wp,) + rc.shape[1:], rc.dtype)]
        )                                                  # (G+Wp, L, E…)
        bits.append(rc)

    def window(lo, js, k, covered, accs, W):
        """One slab window over an arbitrary set of blocks.

        ``lo``: (M,) first dest of each block; ``js``: (M, B) dest
        indices; ``k``: (M,) current compacted row; ``covered``: (M,)
        done flags; ``accs``: per-leaf (M, B, E…) accumulators. Returns
        the advanced state. Already-covered blocks are inert (mask
        only; their slab reads still execute at in-range indices)."""
        live = jnp.logical_not(covered)                    # (M,)
        # Rows k-1 .. k+W-1 of the sentinel-shifted comb (compacted row
        # i lives at comb[i+1], so the slab index is just k + arange).
        idxe = k[:, None] + jnp.arange(W + 1, dtype=jnp.int32)[None, :]
        eslab = comb[idxe].reshape(-1, (W + 1) * L)        # (M, (W+1)L)
        en = eslab[:, L:]                                  # (M, WL)
        winstart = eslab[:, L - 1]                         # (M,)
        # Deactivated dests (covered block, or owner before this window
        # — already accumulated) get the sentinel j = B, which matches
        # no suffix (relative ends are clamped to B).
        valid = live[:, None] & (js >= winstart[:, None])
        # Narrowest dtype holding 0..B: uint8 for the default 128-dest
        # blocks packs (4,1) sublanes — the hot compare below is the
        # kernel's dominant cost (633 µs of a 1.15 ms filter step at 1M,
        # round-3 trace), so every halving of its element width counts.
        rel_dtype = jnp.uint8 if B <= 255 else jnp.int16
        js_rel = jnp.where(
            valid, js - lo[:, None], B
        ).astype(rel_dtype)                                # (M, B)
        # Block-RELATIVE clamped ends: j < en ≡ j_rel < min(en−lo, B)
        # for j_rel < B (ends of this block's window are ≥ block_lo, and
        # any end beyond the block clamps to B > j_rel).
        en_rel = jnp.clip(
            en - lo[:, None], 0, B
        ).astype(rel_dtype)                                # (M, WL)
        # Suffix-difference contraction. Ownership of dest j is "first
        # i with en_i > j" (ends are nondecreasing; empty intervals
        # share their predecessor's end so they are never first). With
        # w_i = v_i − v_{i+1} (and w_last = v_last), the masked sum
        #   Σ_i [j < en_i] · w_i  =  v_{owner}
        # telescopes EXACTLY in integer bit-pattern arithmetic — one
        # compare per candidate instead of the two-sided interval test.
        # Round-3 negative result (measured on-chip): routing the
        # multiply-sum onto the MXU (f32 0/1 mask × exact ≤11-bit value
        # limbs, u32 recombination) is bitwise-equivalent but ~25 %
        # SLOWER end-to-end — the (M, B, WL) f32 mask must materialize
        # through HBM (~2 GB/resample) because XLA cannot fuse the
        # compare into a dot operand, while this formulation fuses
        # compare + select + accumulate into one VPU pass that never
        # materializes the pair tensor. The fusion profiles at ~88 % of
        # its VPU op floor (633 µs of a 1.15 ms step at 1M) — this IS
        # the documented floor of the expansion.
        suf = js_rel[:, :, None] < en_rel[:, None, :]      # (M, B, WL)
        idxo = k[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
        new_accs = []
        for rc, acc in zip(bits, accs):
            vals = rc[idxo]                                # (M, W, L, E…)
            flat = vals.reshape(
                (vals.shape[0], W * L) + vals.shape[3:]
            )
            shifted = jnp.concatenate(
                [flat[:, 1:], jnp.zeros_like(flat[:, :1])], axis=1
            )
            w = flat - shifted                             # w_i = v_i − v_{i+1}
            mm = suf.reshape(suf.shape + (1,) * (w.ndim - 2))
            contrib = jnp.sum(
                jnp.where(mm, w[:, None], jnp.zeros((), w.dtype)),
                axis=2, dtype=w.dtype,
            )                                              # (M, B, E…): mod-2^k sum
            new_accs.append(acc + contrib)
        done = en[:, -1] >= (lo + B)                       # (M,)
        return (
            jnp.where(covered, k, k + W),
            covered | done,
            tuple(new_accs),
        )

    js_full = block_lo[:, None] + jnp.arange(B, dtype=jnp.int32)[None, :]
    accs0 = tuple(
        jnp.zeros((D, B) + rc.shape[2:], rc.dtype) for rc in bits
    )

    # ---- Pass 1: one unconditional window over every block. ----------
    _, cov1, accs1 = window(
        block_lo, js_full, k0, jnp.zeros((D,), bool), accs0, W1
    )

    # ---- Straggler redo: compact uncovered blocks into batches of S
    # slots and redo them FROM SCRATCH (their pass-1 partials are
    # replaced wholesale) with the wider W2 window. Typical resamples
    # have zero or a handful of stragglers, so this loop usually runs
    # zero or one iteration over an S·B-sized problem instead of
    # re-running the full n-sized contraction. ------------------------
    def outer_cond(state):
        live, _ = state
        return jnp.any(live)

    def outer_body(state):
        live, accs = state
        # First S live block indices (stable → ascending block order).
        order_s = jnp.argsort(jnp.logical_not(live), stable=True)[:S]
        v_s = jnp.arange(S) < jnp.sum(live)                # slot valid
        lo_s = (order_s * B).astype(jnp.int32)
        js_s = lo_s[:, None] + jnp.arange(B, dtype=jnp.int32)[None, :]
        k_s = jnp.where(v_s, k0[order_s], G)
        accs_s = tuple(
            jnp.zeros((S, B) + rc.shape[2:], rc.dtype) for rc in bits
        )

        def inner_cond(st):
            _, cov, _ = st
            return jnp.logical_not(jnp.all(cov))

        def inner_body(st):
            k, cov, a = st
            return window(lo_s, js_s, k, cov, a, W2)

        _, _, accs_s = lax.while_loop(
            inner_cond, inner_body,
            (k_s, jnp.logical_not(v_s), accs_s),
        )
        # Scatter the redone rows back; invalid slots drop (their
        # row index is pushed out of range) so they cannot zero out a
        # finished block.
        safe = jnp.where(v_s, order_s, D).astype(jnp.int32)
        accs = tuple(
            a.at[safe].set(a_s, mode="drop")
            for a, a_s in zip(accs, accs_s)
        )
        live = live.at[safe].set(False, mode="drop")
        return live, accs

    _, accs = lax.while_loop(
        outer_cond, outer_body, (jnp.logical_not(cov1), accs1)
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
    return out_leaves
