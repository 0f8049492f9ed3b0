"""Explicit-collective inference reductions: ``shard_map`` implementations
of log-Z̄ / ESS (``psum``) and distributed systematic resampling
(``ppermute`` ring redistribution), living NEXT TO the GSPMD
sharding-constraint path (``parallel/smc.py``).

Why both paths (VERDICT round-1 item 5): the GSPMD path trusts XLA's
sharding propagation to insert collectives — simple, fast, but opaque.
This module states the communication explicitly, so (a) the lowered HLO
can be asserted to contain collectives and NOT a full gather of particle
state (``tests/parallel/test_collectives.py``), and (b) the communication
volume is known by construction:

- log-Z̄ / ESS: one ``psum`` of per-shard partial reductions (2 scalars).
- resampling: one ``all_gather`` of D per-shard weight sums (D scalars —
  never the particle state), then D−1 ``ppermute`` ring steps streaming
  each shard's particle block around the ring. Peak per-device memory is
  O(2·N/D); the full N-particle state is never materialized on one device.

The ring redistribution is EXACT for any offspring imbalance: each output
slot j takes the unique particle whose offspring run [sᵢ, sᵢ+cᵢ) covers
j, found per incoming block by binary search over the block's run starts.
New scope vs the reference (no distributed backend there, SURVEY §2.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = [
    "shardmap_logz",
    "shardmap_ess",
    "shardmap_systematic_resample",
]


def _local_logsumexp(lw):
    m = jnp.max(lw)
    return m, jnp.sum(jnp.exp(lw - m))


def shardmap_logz(log_weights: jax.Array, mesh: Mesh,
                  axis_name: str = "particles") -> jax.Array:
    """log Z̄ = logsumexp(lw) − log K via explicit psum/pmax."""
    n = log_weights.shape[0]

    def local(lw):
        m_loc, _ = _local_logsumexp(lw)
        m = lax.pmax(m_loc, axis_name)
        s = lax.psum(jnp.sum(jnp.exp(lw - m)), axis_name)
        return (m + jnp.log(s) - jnp.log(n))[None]

    out = jax.shard_map(
        local, mesh=mesh, in_specs=P(axis_name), out_specs=P(axis_name)
    )(log_weights)
    return out[0]


def shardmap_ess(log_weights: jax.Array, mesh: Mesh,
                 axis_name: str = "particles") -> jax.Array:
    """ESS = (Σw)²/Σw² via explicit psum (two shard-local partials)."""

    def local(lw):
        m_loc, _ = _local_logsumexp(lw)
        m = lax.pmax(m_loc, axis_name)
        e = jnp.exp(lw - m)
        s1 = lax.psum(jnp.sum(e), axis_name)
        s2 = lax.psum(jnp.sum(e * e), axis_name)
        return (s1 * s1 / s2)[None]

    out = jax.shard_map(
        local, mesh=mesh, in_specs=P(axis_name), out_specs=P(axis_name)
    )(log_weights)
    return out[0]


def shardmap_systematic_resample(key: jax.Array, log_weights: jax.Array,
                                 tree, mesh: Mesh,
                                 axis_name: str = "particles"):
    """Distributed systematic resampling over the mesh, semantically
    identical to ``inference.smc.resample_tree(..., "systematic")``: the
    same uniform grid ``(j + u0)/N`` inverted against the same weight CDF
    selects the same ancestors; only the float summation order of the CDF
    differs (block-local cumsum + psum'd offsets).
    """
    n = log_weights.shape[0]
    n_dev = mesh.shape[axis_name]
    local_n = n // n_dev

    flat, treedef = jtu.tree_flatten(tree)

    def local(key, lw, *leaves):
        d = lax.axis_index(axis_name)
        # Global normalization: max + sum via collectives (scalars only).
        m = lax.pmax(jnp.max(lw), axis_name)
        e = jnp.exp(lw - m)
        total = lax.psum(jnp.sum(e), axis_name)
        p = e / total
        # Global CDF offset for this shard: exclusive prefix of block
        # sums, from an all_gather of D scalars (NOT particle state).
        block_sum = jnp.sum(p)
        block_sums = lax.all_gather(block_sum, axis_name)  # (D,)
        offset = jnp.cumsum(block_sums)[d] - block_sum
        cum = offset + jnp.cumsum(p)
        # Same u0 on every shard (same key).
        u0 = jax.random.uniform(key, ())
        # Offspring run of local particle i (GLOBAL output indices):
        # [starts_i, ends_i) with ends = ceil(n·F_i − u0) on the global
        # CDF, and the block's first start in closed form from the offset.
        counts_cum = jnp.clip(jnp.ceil(n * cum - u0), 0, n).astype(jnp.int32)
        first = jnp.clip(jnp.ceil(n * offset - u0), 0, n).astype(jnp.int32)
        starts = jnp.concatenate([first[None], counts_cum[:-1]])
        ends = counts_cum

        # My output slots (global indices).
        j_global = d * local_n + jnp.arange(local_n)

        out_leaves = [jnp.zeros((local_n,) + l.shape[1:], l.dtype)
                      for l in leaves]
        filled = jnp.zeros((local_n,), bool)

        # Ring: stream every block through every shard (D steps incl. own).
        def ring_step(step, carry):
            out_leaves, filled, blk_starts, blk_ends, blk_leaves = carry
            # Match my output slots against the current block's runs.
            idx = jnp.clip(
                jnp.searchsorted(blk_starts, j_global, side="right") - 1,
                0, local_n - 1,
            )
            hit = (j_global >= blk_starts[idx]) & (j_global < blk_ends[idx])
            out_leaves = [
                jnp.where(
                    hit.reshape((-1,) + (1,) * (o.ndim - 1)),
                    bl[idx], o,
                )
                for o, bl in zip(out_leaves, blk_leaves)
            ]
            filled = filled | hit
            # Pass the block to the next shard on the ring.
            perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
            blk_starts = lax.ppermute(blk_starts, axis_name, perm)
            blk_ends = lax.ppermute(blk_ends, axis_name, perm)
            blk_leaves = [lax.ppermute(b, axis_name, perm)
                          for b in blk_leaves]
            return out_leaves, filled, blk_starts, blk_ends, blk_leaves

        carry = (out_leaves, filled, starts, ends, list(leaves))
        for step in range(n_dev):
            carry = ring_step(step, carry)
        out_leaves, filled, *_ = carry
        return tuple(out_leaves)

    specs_in = (P(), P(axis_name)) + tuple(P(axis_name) for _ in flat)
    specs_out = tuple(P(axis_name) for _ in flat)
    out_flat = jax.shard_map(
        local, mesh=mesh, in_specs=specs_in, out_specs=specs_out,
        check_vma=False,
    )(key, log_weights, *flat)
    return jtu.tree_unflatten(treedef, list(out_flat))
