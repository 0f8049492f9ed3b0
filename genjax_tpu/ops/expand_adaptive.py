"""Adaptive-window Pallas kernel for the systematic-resampling
expansion (round-2 follow-up to ``ops/resample.py``).

The XLA blocked expansion must pick ONE window width for every dest
block: pass 1 runs ``W1 = 1 + margin`` slab rows over all blocks
(margin 3 measured optimal — narrower windows push too many blocks
into the straggler redo, and XLA re-runs whole passes). But the
TYPICAL block's source run spans only 1–2 compacted rows, so margin 3
does ~2x the compares and masked adds actually needed, and the
straggler machinery (argsort compaction + a second while) exists only
because XLA cannot give each block its own trip count.

This kernel can: one grid step owns ``TB`` dest blocks; each block
runs a data-dependent ``while`` over ``W0 = 2``-row windows starting
at its own ``k0`` and stops the moment its run is covered. Typical
blocks do ONE iteration; weight-degenerate blocks iterate as long as
they need — no margin overshoot, no redo pass, no second copy of the
accumulators in HBM.

Layout (chosen so the kernel needs NO transposes or relayouts):

- dests ride the SUBLANE axis as a ``broadcasted_iota`` — free;
- candidate ends/values ride the LANE axis — natural ``(row, 128)``
  reads of the same sentinel-shifted ``comb`` / compacted value arrays
  the XLA path builds;
- the all-pairs suffix compare is ``(128 dests, W0*128 candidates)``
  per window, and the value contraction is the same exact
  integer-bit-pattern suffix-difference telescope as ``resample.py``
  (``w_i = v_i - v_{i+1}`` in mod-2^32 arithmetic, one compare per
  candidate);
- the per-block accumulator is a ``(128, 1)`` column; the kernel
  writes ``outT`` of shape ``(128, D)`` and the caller un-transposes
  once (one 4 MB pass at 1M, measured cheap next to the saved window
  work).

Applicability: single 4-byte leaves (the particle-filter headline
resamples ONE f32 state leaf; weights are reset, not expanded) with
``n`` a multiple of 128·TB and the comb + value arrays fitting VMEM
(n ≤ 2^20). Everything else falls back to the XLA expansion.

No reference counterpart (the reference resamples with
``torch.gather``): this kernel exists because of the TPU cost model —
see ``ops/resample.py``'s module docstring for the measurements.

**MEASURED RESULT (v5e, 1M particles): NEGATIVE — this kernel is NOT
on the product path.** Bitwise-correct on-chip, but the full expansion
takes ~5.4 ms vs ~0.8 ms for the XLA blocked window
(``benchmarks/tpu_micro.py --exp adaptive_expand``; mild and
degenerate weight regimes time the same). The per-block
data-dependent ``while`` pays ~600 scalar-core cycles of loop/branch/
dynamic-address overhead per dest block against only ~40 vector ops
of useful work, and Mosaic cannot pipeline loads across iterations —
8192 sequential whiles swamp the 2x compare saving that adaptivity
buys. Kept (with its oracle tests) as the recorded experiment: the
brute-force fully-vectorized XLA window is the right TPU formulation
at this granularity, and future reworks should start from ≥1024-dest
control granularity or an entirely different decomposition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["expand_adaptive", "supports_adaptive_expand"]

LANES = 128
W0 = 2          # slab rows per while iteration
TB = 128        # dest blocks per grid step (output block (128, TB):
                # Mosaic requires the lane dim be a 128-multiple)
VMEM_CAP_BYTES = 12 * 1024 * 1024


def supports_adaptive_expand(n_src: int, n_dest: int, leaves) -> bool:
    """Kernel preconditions: square expansion, one 4-byte-wide vector
    leaf, lane/grid-aligned size, comb+values+out fit in VMEM."""
    if n_src != n_dest or n_src % (LANES * TB) != 0:
        return False
    if len(leaves) != 1:
        return False
    (leaf,) = leaves
    if leaf.ndim != 1 or leaf.dtype.itemsize != 4:
        return False
    # comb + values resident + an output block; keep clear headroom.
    return 2 * 4 * n_src <= VMEM_CAP_BYTES


def _kernel(k0_ref, comb_ref, vals_ref, out_ref, *, tb):
    """One grid step = ``tb`` dest blocks of 128 dests each.

    ``k0_ref``: (D // tb, tb) SMEM, unblocked — first compacted slab
    index per block (the
    sentinel-shifted ``comb`` row whose LAST LANE is the block's
    window-start boundary, exactly the XLA path's ``idxe`` origin).
    ``comb_ref``: (1 + G + pad, 128) VMEM int32 — zero sentinel row,
    compacted interval ends, terminal ``n`` pad rows.
    ``vals_ref``: (G + pad, 128) VMEM int32 — compacted value bit
    patterns, zero pad rows (``vals_ref[k + r]`` pairs with end row
    ``comb_ref[k + 1 + r]``).
    ``out_ref``: (128, TB) VMEM int32 — dest values, dests on sublanes.
    """
    step = pl.program_id(0)
    sub_iota = lax.broadcasted_iota(jnp.int32, (LANES, 1), 0)
    lane_iota = lax.broadcasted_iota(jnp.int32, (LANES, tb), 1)

    def one_block(t, tile):
        lo = (step * tb + t) * LANES
        js = sub_iota + lo                                 # (128, 1)

        def cond(carry):
            k, _ = carry
            # Last end of the PREVIOUS window (comb row k is the
            # boundary row; its last lane is that window's start, so
            # the previous window's final end is comb[k, 127]).
            return comb_ref[k, LANES - 1] < lo + LANES

        def body(carry):
            k, acc = carry
            # Ends rows k+1 .. k+W0; row k's last lane = winstart.
            eslab = comb_ref[pl.ds(k, W0 + 1), :]          # (W0+1, 128)
            winstart = eslab[0:1, LANES - 1 :]             # (1, 1)
            valid = js >= winstart                         # (128, 1)
            # Values rows k .. k+W0-1 (row r pairs with ends row r+1).
            vslab = vals_ref[pl.ds(k, W0), :]              # (W0, 128)
            lane = lax.broadcasted_iota(
                jnp.int32, (1, LANES), 1
            )
            for r in range(W0):
                en = eslab[r + 1 : r + 2, :]               # (1, 128)
                v = vslab[r : r + 1, :]                    # (1, 128)
                # w_i = v_i - v_{i+1}: lane-roll left. The successor of
                # each row's last lane is the next row's lane 0; the
                # WINDOW's last candidate gets successor 0, so the
                # suffix sum telescopes to exactly v_owner within this
                # window (a dest owned here is masked out of all later
                # windows by ``valid``, so nothing may leak across).
                succ_last = (
                    vslab[r + 1 : r + 2, 0:1]
                    if r < W0 - 1
                    else jnp.zeros((1, 1), jnp.int32)
                )
                # Circular left-roll by one lane (pltpu.roll only takes
                # non-negative shifts; 127 == -1 mod 128).
                v_next = jnp.where(
                    lane == LANES - 1, succ_last,
                    pltpu.roll(v, LANES - 1, 1),
                )
                w = v - v_next                             # (1, 128)
                suf = jnp.logical_and(js < en, valid)      # (128, 128)
                acc = acc + jnp.sum(
                    jnp.where(suf, w, 0), axis=1, keepdims=True,
                    dtype=jnp.int32,
                )                                          # (128, 1)
            return k + W0, acc

        _, acc = lax.while_loop(
            cond, body,
            (k0_ref[step, t], jnp.zeros((LANES, 1), jnp.int32)),
        )
        # Mosaic cannot store a (128, 1) column at a dynamic lane
        # offset (lane offsets must be 128-multiples), so merge the
        # block's accumulator into lane column t of a carried
        # (128, tb) tile and store the tile once per grid step.
        return jnp.where(lane_iota == t, acc, tile)

    out_ref[:, :] = lax.fori_loop(
        0, tb, one_block, jnp.zeros((LANES, tb), jnp.int32),
        unroll=False,
    )


@functools.partial(
    jax.jit, static_argnames=("n", "interpret", "tb")
)
def expand_adaptive(leaf: jax.Array, counts_cum: jax.Array, n: int,
                    interpret: bool = False, tb: int = TB) -> jax.Array:
    """``jnp.repeat(leaf, diff(counts_cum), total_repeat_length=n)``
    (bitwise) for one 4-byte ``(n,)`` leaf, via the adaptive-window
    kernel. ``counts_cum`` is the inclusive cumulative offspring count
    array (nondecreasing, ``counts_cum[-1] == n``) — the same contract
    as ``ops.resample.expand_by_cumulative``."""
    L = LANES
    G = n // L
    D = n // L                                      # R = 1: block = row
    pad = W0 + 1

    # --- XLA prep: identical compaction to resample.py ----------------
    c_inc = counts_cum.astype(jnp.int32)
    ends2 = c_inc.reshape(G, L)
    rowend = ends2[:, -1]
    rowstart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), rowend[:-1]]
    )
    nonempty = rowend > rowstart
    order = jnp.argsort(jnp.logical_not(nonempty), stable=True)
    k_live = jnp.sum(nonempty)
    pad_k = jnp.arange(G) >= k_live
    rowend_c = jnp.where(pad_k, n, rowend[order])
    ends_c = jnp.where(pad_k[:, None], n, ends2[order])

    comb = jnp.concatenate([
        jnp.zeros((1, L), jnp.int32),
        ends_c,
        jnp.full((pad, L), n, jnp.int32),
    ])                                              # (1 + G + pad, 128)

    block_lo = jnp.arange(D, dtype=jnp.int32) * L
    k0 = jnp.sum(
        rowend_c[None, :] <= block_lo[:, None], axis=1
    ).astype(jnp.int32)                             # (D,)

    bl = lax.bitcast_convert_type(leaf, jnp.int32)
    vals = jnp.concatenate([
        bl.reshape(G, L)[order],
        jnp.zeros((pad, L), jnp.int32),
    ])                                              # (G + pad, 128)

    outT = pl.pallas_call(
        functools.partial(_kernel, tb=tb),
        grid=(D // tb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, tb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, D), jnp.int32),
        interpret=interpret,
    )(k0.reshape(D // tb, tb), comb, vals)

    flat = outT.T.reshape(n)                        # out[b*128+j] = outT[j, b]
    if flat.dtype != leaf.dtype:
        flat = lax.bitcast_convert_type(flat, leaf.dtype)
    return flat
